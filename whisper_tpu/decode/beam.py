"""Vectorized beam search: beams as a folded batch axis.

The reference decodes greedy-only with a 30-token budget
(whisper.cpp:346-399); beam search is net-new capability (BASELINE.json
configs[2]: beam=5). TPU-native layout (SURVEY.md §2b "beam parallelism"):

* hypotheses live as a flattened [B*K] batch dimension, so every decoder step
  is one batched matmul program — no per-beam control flow;
* per-step selection is ``lax.top_k`` over the [B, K*V] joint score table;
* hypothesis reshuffle is a gather along the batch-beam axis applied to the
  token buffer AND the KV cache (this gather is the beam analogue of the
  reference's per-step tensor re-allocation, but it stays on-device; under
  tensor parallelism it rides ICI as an all-gather XLA inserts);
* finished hypotheses are frozen: they emit only EOT at zero cost, so their
  scores are preserved while shapes stay static.

Scoring is sum-of-logprobs with optional length normalization at
finalization (the public Whisper "length_penalty" behavior: score /
length**penalty; penalty=None → score / length).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from whisper_tpu.config import ModelDims
from whisper_tpu.decode.logits import LogitRules
from whisper_tpu.models.decoder import (
    KVCache,
    decoder_prefill,
    decoder_step,
    init_kv_cache,
    precompute_cross_kv,
)
from whisper_tpu.models.params import Params

NEG_INF = -1e30


class BeamState(NamedTuple):
    pos: jnp.ndarray  # scalar int32
    tokens: jnp.ndarray  # [B*K, L]
    scores: jnp.ndarray  # [B*K] sum logprobs
    cache: KVCache
    finished: jnp.ndarray  # [B*K] bool


def _reorder(x: jnp.ndarray, idx: jnp.ndarray, bk_axis: int) -> jnp.ndarray:
    return jnp.take(x, idx, axis=bk_axis)


def beam_decode(
    params: Params,
    enc_out: jnp.ndarray,  # [B, n_audio_ctx, d]
    prompt: jnp.ndarray,  # [B, P] int32
    dims: ModelDims,
    eot: int,
    max_new_tokens: int,
    beam_size: int = 5,
    rules: Optional[LogitRules] = None,
    length_penalty: Optional[float] = None,
    compute_dtype=jnp.float32,
    cross_kv: Optional[KVCache] = None,  # unreplicated [L, B, H, Dh, Tk]
    kv_cache_dtype=None,  # storage dtype for caches (None => compute_dtype)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (tokens [B, P+max_new], lengths [B], scores [B]) for the best
    hypothesis per batch item (normalized score)."""
    b, p_len = prompt.shape
    k = beam_size
    bk = b * k
    total_len = p_len + max_new_tokens
    if total_len > dims.n_text_ctx:
        raise ValueError("prompt + max_new_tokens exceeds n_text_ctx")

    # Cross-KV once per utterance, then replicated across beams along the
    # batch axis (cache layout [L, B, ctx, H, Dh]) — beams share the same
    # encoder state, so projecting the K-fold replicated enc_out would just
    # repeat identical matmuls K times.
    if cross_kv is None:
        cross_kv = precompute_cross_kv(params, enc_out, dims, kv_dtype=kv_cache_dtype)
    cross_kv = {key: jnp.repeat(v, k, axis=1) for key, v in cross_kv.items()}
    cache = init_kv_cache(dims, bk, total_len, dtype=kv_cache_dtype or compute_dtype)
    prompt_rep = jnp.repeat(prompt, k, axis=0)
    sample_begin = jnp.int32(p_len)

    def logprobs_of(logits, tokens, pos):
        if rules is not None:
            logits = rules.apply(logits, tokens, pos, sample_begin)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # --- prefill all beams (identical content per batch item) ---
    logits, cache = decoder_prefill(
        params, prompt_rep, cache, cross_kv, dims, compute_dtype
    )
    tokens = jnp.full((bk, total_len), eot, dtype=jnp.int32)
    tokens = tokens.at[:, :p_len].set(prompt_rep)

    lp = logprobs_of(logits[:, -1, :], tokens, sample_begin)  # [B*K, V]
    v = lp.shape[-1]
    # First expansion: all beams are identical, so take top-k distinct tokens
    # from beam 0 of each batch item.
    first_lp = lp.reshape(b, k, v)[:, 0, :]  # [B, V]
    top_scores, top_tokens = jax.lax.top_k(first_lp, k)  # [B, K]
    tokens = tokens.at[:, p_len].set(top_tokens.reshape(bk))
    scores = top_scores.reshape(bk)
    finished = tokens[:, p_len] == eot

    state = BeamState(jnp.int32(p_len + 1), tokens, scores, cache, finished)

    def cond(s: BeamState):
        return (s.pos < total_len) & ~jnp.all(s.finished)

    def body(s: BeamState) -> BeamState:
        prev = jax.lax.dynamic_index_in_dim(s.tokens, s.pos - 1, 1, keepdims=False)
        logits, cache = decoder_step(
            params, prev, s.pos - 1, s.cache, cross_kv, dims, compute_dtype
        )
        lp = logprobs_of(logits, s.tokens, s.pos)  # [B*K, V]

        # Finished beams: only EOT continuation, at zero additional cost.
        ids = jax.lax.broadcasted_iota(jnp.int32, (bk, v), 1)
        frozen = jnp.where(ids == eot, 0.0, NEG_INF)
        lp = jnp.where(s.finished[:, None], frozen, lp)

        joint = (s.scores[:, None] + lp).reshape(b, k * v)
        top_scores, flat_idx = jax.lax.top_k(joint, k)  # [B, K]
        src_beam = flat_idx // v  # [B, K] beam index within item
        new_tok = (flat_idx % v).astype(jnp.int32)

        # Global gather indices into the B*K axis.
        batch_base = jax.lax.broadcasted_iota(jnp.int32, (b, k), 0) * k
        gather_idx = (batch_base + src_beam).reshape(bk)

        tokens = _reorder(s.tokens, gather_idx, 0)
        tokens = jax.lax.dynamic_update_index_in_dim(
            tokens, new_tok.reshape(bk), s.pos, axis=1
        )
        cache = {
            "k": _reorder(cache["k"], gather_idx, 1),
            "v": _reorder(cache["v"], gather_idx, 1),
        }
        finished = _reorder(s.finished, gather_idx, 0) | (
            new_tok.reshape(bk) == eot
        )
        return BeamState(
            s.pos + 1, tokens, top_scores.reshape(bk), cache, finished
        )

    final = jax.lax.while_loop(cond, body, state)

    # --- finalize: pick best beam per item by normalized score ---
    after = final.tokens[:, p_len:]
    is_eot = after == eot
    any_eot = jnp.any(is_eot, axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    lengths = jnp.where(any_eot, p_len + first_eot + 1, total_len).astype(jnp.int32)

    gen_len = (lengths - p_len).astype(jnp.float32)
    if length_penalty is None:
        norm = jnp.maximum(gen_len, 1.0)
    else:
        norm = ((5.0 + gen_len) / 6.0) ** length_penalty  # GNMT penalty
    norm_scores = final.scores / norm

    best = jnp.argmax(norm_scores.reshape(b, k), axis=1)  # [B]
    pick_idx = jnp.arange(b, dtype=jnp.int32) * k + best.astype(jnp.int32)
    return (
        jnp.take(final.tokens, pick_idx, axis=0),
        jnp.take(lengths, pick_idx, axis=0),
        jnp.take(norm_scores, pick_idx, axis=0),
    )
