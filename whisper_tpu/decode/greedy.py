"""Greedy autoregressive decoding as one fixed-shape ``lax.while_loop``.

TPU inversion of the reference's hot loop (``Decoder::forward``,
whisper.cpp:314-403): where the reference resizes interpreter tensors and
recomputes the full prefix each step (O(n²), SURVEY.md §3.2), this loop has
static shapes end-to-end — a preallocated token buffer, a KV cache updated in
place (XLA donates/aliases the buffers across iterations), and one compiled
step function. Batch items that emit EOT keep looping but are frozen by a
``finished`` mask; the loop exits early when every item is done, matching the
reference's per-utterance EOT/budget stop (whisper.cpp:363-399).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from whisper_tpu.config import ModelDims
from whisper_tpu.models.decoder import (
    KVCache,
    decoder_prefill,
    decoder_step,
    init_kv_cache,
    precompute_cross_kv,
)
from whisper_tpu.models.params import Params
from whisper_tpu.decode.logits import LogitRules


CTX_BUCKET = 64  # ctx segment-growth granularity (see ctx_bucket_limits)
AUTO_MIN_SEGMENTS = 3  # "auto" enables growth only when ≥3 segments cover
# the budget: short decodes (tiny smoke: total 68 → 2 segments) lose more
# to the grow copies + extra loop than the smaller windows save (measured
# 381 → 293 audio-s/s at tiny beam5 b4), while long budgets win big
# (north star 224-token: 60.1 → 76.5 audio-s/s, +27%).


def resolve_ctx_bucket(ctx_bucket, total_len: int):
    """Map the config value ("auto" | int | None/0) to an int or None."""
    if ctx_bucket == "auto":
        return (
            CTX_BUCKET
            if total_len >= AUTO_MIN_SEGMENTS * CTX_BUCKET
            else None
        )
    return ctx_bucket or None


def ctx_bucket_limits(total_len: int, bucket: int) -> list:
    """Static KV-cache segment sizes: multiples of ``bucket`` covering
    1..total_len.

    With ``ctx_bucket`` set, the decode runs as a SEQUENCE of while_loops —
    one per segment — where segment i's cache buffer is physically
    ``limits[i]`` positions long, grown (one zero-pad copy) at each
    boundary. Early steps therefore stream and (for beam) reorder only a
    fraction of the full cache: averaged over a 224-token budget at
    bucket 64 the self-attention + reorder traffic drops ~40%.

    This is the aliasing-safe formulation of the round-2 ``lax.switch``
    read-window ladder, which was a severe regression: switch branches are
    separate XLA computations, so the carried cache could no longer alias
    in place across steps and XLA materialized full cache copies per step
    (9.5× slower at large-v3 beam=5 batch=4; HBM fault at batch=16 — the
    same xs→ys failure models/decoder.py documents). Sequential
    while_loops keep each loop's carry donation intact; the only extra
    cost is one pad-copy per boundary (~ms at large-v3 scale)."""
    return [min(total_len, bucket * (i + 1)) for i in range((total_len + bucket - 1) // bucket)]


def grow_cache(cache: KVCache, new_len: int) -> KVCache:
    """Zero-pad the cache's position axis (axis 2) up to ``new_len`` — the
    one-time copy at a segment boundary."""
    cur = cache["k"].shape[2]
    if new_len <= cur:
        return cache
    pad = [(0, 0), (0, 0), (0, new_len - cur), (0, 0), (0, 0)]
    return {n: jnp.pad(v, pad) for n, v in cache.items()}


def argmax_last(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Argmax where ties pick the HIGHEST index.

    The reference compares with ``>=`` while scanning ascending indices, so
    the last maximal index wins (whisper.cpp:346-361) — the opposite of
    jnp.argmax. Decoding the flipped array restores that tie-break exactly.
    """
    n = logits.shape[axis]
    return (n - 1) - jnp.argmax(jnp.flip(logits, axis=axis), axis=axis)


class GreedyState(NamedTuple):
    pos: jnp.ndarray  # scalar int32: next position to write
    tokens: jnp.ndarray  # [B, total_len] int32
    cache: KVCache
    finished: jnp.ndarray  # [B] bool


class _SamplingState(NamedTuple):
    greedy: GreedyState
    sum_logprobs: jnp.ndarray  # [B] f32 — zeros when not accounting


def greedy_decode(
    params: Params,
    enc_out: jnp.ndarray,  # [B, n_audio_ctx, d]
    prompt: jnp.ndarray,  # [B, P] int32
    dims: ModelDims,
    eot: int,
    max_new_tokens: int,
    logit_bias: Optional[jnp.ndarray] = None,  # additive [n_vocab] mask
    rules: Optional[LogitRules] = None,  # suppress/timestamp rules
    compute_dtype=jnp.float32,
    cross_kv: Optional[KVCache] = None,  # share with language detection
    kv_cache_dtype=None,  # storage dtype for caches (None => compute_dtype)
    temperature: Optional[jnp.ndarray] = None,  # traced scalar ≥ 0; None =
    # pure argmax with NO noise machinery compiled in (the parity path)
    rng: Optional[jnp.ndarray] = None,  # PRNGKey, required with temperature
    return_logprobs: bool = False,
    no_speech: Optional[Tuple[int, int]] = None,  # (sot_index, nospeech_id)
    ctx_bucket="auto",  # segment-growth granularity: "auto" (default —
    # CTX_BUCKET when ≥3 segments cover the budget, else off), an int, or
    # None/0 for a single full-size buffer (see ctx_bucket_limits)
    merged_read="auto",  # blockdiag merged-layout cache read for the decode
    # steps. "auto" resolves to OFF everywhere — measured 1.35x SLOWER
    # than the eager per-head read at large-v3 greedy shapes (the hybrid
    # BEAM step's win doesn't transfer; benchmarks/greedy_merged_read_
    # r05.json). Force with True or WHISPER_TPU_MERGED_READ=on
    # (models/decoder.py resolve_merged_read).
) -> Tuple[jnp.ndarray, ...]:
    """Returns (tokens [B, P + max_new_tokens], lengths [B]) — plus
    (sum_logprobs [B] f32,) when ``return_logprobs``, plus
    (no_speech_probs [B] f32,) when ``no_speech`` is given.

    ``no_speech=(sot_index, nospeech_id)``: also return the softmax
    probability of the ``<|nospeech|>`` token in the prefill logits at the
    SOT position — openai-whisper's silence signal (DecodingTask
    ``_main_loop``: ``probs_at_sot[:, no_speech]``), read from the raw
    (un-ruled) logits.

    Output rows start with the prompt (the golden tiny.en IDs include the
    prompt tokens — whisper.h:27-32); unused tail positions hold ``eot``.
    ``lengths`` counts valid tokens including the terminating EOT.

    **Temperature sampling, one executable for the whole schedule.** With
    ``temperature`` (a *traced* scalar) the pick becomes
    ``argmax(logits + T * gumbel)``: argmax is invariant to the positive
    rescale ``/T``, so this IS an exact sample from ``softmax(logits / T)``
    (the Gumbel-max trick), and at ``T == 0`` the noise term vanishes and the
    pick is exactly greedy — the temperature fallback schedule
    (openai-whisper DecodingOptions.temperature) therefore reuses ONE
    compiled program with T as a runtime argument instead of compiling per
    temperature. Per-step keys fold the write position into ``rng`` so a
    fixed seed is reproducible and steps are independent.

    ``sum_logprobs`` accumulates ``log_softmax`` of the *rule-constrained*
    logits at each sampled token (including the terminating EOT, excluding
    frozen post-EOT positions) — openai's ``GreedyDecoder.update``
    bookkeeping for the fallback's avg-logprob gate.
    """
    b, p_len = prompt.shape
    total_len = p_len + max_new_tokens
    if total_len > dims.n_text_ctx:
        raise ValueError(
            f"prompt({p_len}) + max_new({max_new_tokens}) exceeds n_text_ctx"
        )

    if temperature is not None and rng is None:
        raise ValueError("temperature sampling requires an rng key")
    if cross_kv is None:
        cross_kv = precompute_cross_kv(params, enc_out, dims, kv_dtype=kv_cache_dtype)
    # Segment plan: cache starts at the smallest bucket that holds the
    # prompt plus one generated row, and grows through the remaining limits.
    ctx_bucket = resolve_ctx_bucket(ctx_bucket, total_len)
    limits = (
        ctx_bucket_limits(total_len, ctx_bucket) if ctx_bucket else [total_len]
    )
    limits = [l for l in limits if l > p_len] or [total_len]
    cache = init_kv_cache(dims, b, limits[0], dtype=kv_cache_dtype or compute_dtype)
    sample_begin = jnp.int32(p_len)

    def pick(logits: jnp.ndarray, tokens: jnp.ndarray, pos):
        """Constrained logits → (chosen token [B], its logprob [B] or None)."""
        if logit_bias is not None:
            logits = logits + logit_bias
        if rules is not None:
            logits = rules.apply(logits, tokens, pos, sample_begin)
        if temperature is not None:
            u = jax.random.uniform(
                jax.random.fold_in(rng, pos), logits.shape,
                minval=jnp.finfo(jnp.float32).tiny, maxval=1.0,
            )
            gumbel = -jnp.log(-jnp.log(u))
            choice = argmax_last(
                logits.astype(jnp.float32)
                + temperature.astype(jnp.float32) * gumbel
            ).astype(jnp.int32)
        else:
            choice = argmax_last(logits).astype(jnp.int32)
        if not return_logprobs:
            return choice, None
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return choice, jnp.take_along_axis(lp, choice[:, None], axis=-1)[:, 0]

    # --- prefill: static prompt, one pass into the first segment's buffer ---
    logits, cache = decoder_prefill(
        params, prompt, cache, cross_kv, dims, compute_dtype,
    )
    if no_speech is not None:
        sot_index, nospeech_id = no_speech
        probs_at_sot = jax.nn.softmax(
            logits[:, sot_index, :].astype(jnp.float32), axis=-1
        )
        no_speech_probs = probs_at_sot[:, nospeech_id]
    tokens = jnp.full((b, total_len), eot, dtype=jnp.int32)
    tokens = tokens.at[:, :p_len].set(prompt)
    first, first_lp = pick(logits[:, -1, :], tokens, sample_begin)  # [B]
    tokens = tokens.at[:, p_len].set(first)
    finished = first == eot
    sum_lp = first_lp if return_logprobs else jnp.zeros((b,), jnp.float32)

    state = _SamplingState(
        GreedyState(jnp.int32(p_len + 1), tokens, cache, finished), sum_lp
    )

    from whisper_tpu.models.decoder import resolve_merged_read

    use_merged = resolve_merged_read(merged_read, dims)

    def body(ss: _SamplingState) -> _SamplingState:
        s = ss.greedy
        prev = jax.lax.dynamic_index_in_dim(s.tokens, s.pos - 1, axis=1, keepdims=False)
        logits, cache = decoder_step(
            params, prev, s.pos - 1, s.cache, cross_kv, dims, compute_dtype,
            merged_read=use_merged,
        )
        nxt, lp = pick(logits, s.tokens, s.pos)
        nxt = jnp.where(s.finished, eot, nxt)
        tokens = jax.lax.dynamic_update_index_in_dim(s.tokens, nxt, s.pos, axis=1)
        sum_lp = ss.sum_logprobs
        if return_logprobs:  # frozen rows stop accumulating
            sum_lp = sum_lp + jnp.where(s.finished, 0.0, lp)
        return _SamplingState(
            GreedyState(s.pos + 1, tokens, cache, s.finished | (nxt == eot)),
            sum_lp,
        )

    # One while_loop per cache segment: the loop's carry (incl. the cache
    # buffer at the segment's physical size) aliases in place; the buffer is
    # grown by one pad-copy at each boundary. A single segment (= no
    # bucketing) is exactly the classic full-window loop. The step at
    # position pos-1 writes its K row at that index, so a segment whose
    # buffer holds ``end`` rows can run while pos < end; a batch fully
    # finished early makes the remaining loops no-ops (cond false at entry).
    for i, end in enumerate(limits):
        seg_end = jnp.int32(min(end, total_len))

        def cond(ss: _SamplingState, _end=seg_end):
            s = ss.greedy
            return (s.pos < _end) & ~jnp.all(s.finished)

        state = jax.lax.while_loop(cond, body, state)
        if i + 1 < len(limits):
            g = state.greedy
            state = _SamplingState(
                GreedyState(
                    g.pos, g.tokens, grow_cache(g.cache, limits[i + 1]),
                    g.finished,
                ),
                state.sum_logprobs,
            )

    final_ss = state
    final = final_ss.greedy

    # Length = index of first EOT at/after the prompt, +1 to include it.
    after = final.tokens[:, p_len:]
    is_eot = after == eot
    any_eot = jnp.any(is_eot, axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    lengths = jnp.where(
        any_eot, p_len + first_eot + 1, jnp.int32(total_len)
    ).astype(jnp.int32)
    out: Tuple[jnp.ndarray, ...] = (final.tokens, lengths)
    if return_logprobs:
        out = out + (final_ss.sum_logprobs,)
    if no_speech is not None:
        out = out + (no_speech_probs,)
    return out
