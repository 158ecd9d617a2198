"""Speculative greedy decoding: a small DRAFT model proposes k tokens, the
target model verifies the whole window in ONE forward.

Decode on TPU is HBM-bound — every step re-reads the weights and both KV
streams regardless of how many tokens it scores (PERF.md) — so scoring
k+1 positions per target forward costs barely more than scoring one
(measured 1.57× at large-v3 k=4, benchmarks/speculative_r05.json),
while advancing `accepted + 1` tokens per round. The output is
**bit-identical to the target's own greedy decode** for ANY draft: a
draft token is accepted only if it equals the target's rule-constrained
``argmax_last`` at that position, and the first mismatch is replaced by
the target's own choice — so every emitted token is exactly the token
``greedy_decode`` would have picked (differential-tested in
tests/test_speculative.py, including a deliberately unrelated draft).

Numeric caveat (measured, PARITY.md): "exactly" means exact up to the
kernel formulation — the (k+1)-token verify window and the 1-token step
are different XLA programs, and at bf16 their logits differ by
reduction order/tiling (max |Δ| ≈ 0.064 measured at large-v3). Random
init gives pathologically thin argmax margins (0.03-0.04 at large-v3 —
BELOW that Δ), so random-weight bf16 parity can flip near-ties at
large scale; f32, and bf16 at tiny scale, are pinned bit-exact on both
CPU and TPU. Real checkpoints decode with far wider margins at the
positions greedy actually takes.
Speedup, not correctness, depends on draft quality: Distil-Whisper
drafts (config.py distil-* entries — 2-layer decoders distilled from
these exact teachers) are the intended pairing, and they inherit the
teacher's ENCODER, so when the geometries match the draft reuses the
target's encoder output outright (``enc_out_d=None``).

TPU-native shape: one ``lax.while_loop`` whose body runs k per-row draft
steps (scanned), one multi-token per-row target window
(models/decoder.py ``decoder_window``), and fully vectorized
accept/commit bookkeeping — per-ROW positions throughout, so each batch
row advances at its own acceptance rate with no host round trips.
Reference match: the reference has one decode mode, the O(n²) greedy
interpreter loop (whisper.cpp:363-399); this is that loop's strongest
TPU inversion — same tokens, ~(1+accepted)× fewer sequential target
passes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from whisper_tpu.config import ModelDims
from whisper_tpu.decode.greedy import argmax_last
from whisper_tpu.decode.logits import LogitRules
from whisper_tpu.models.decoder import (
    KVCache,
    decoder_prefill,
    decoder_step,
    decoder_window,
    init_kv_cache,
    precompute_cross_kv,
)
from whisper_tpu.models.params import Params


class SpecState(NamedTuple):
    pos: jnp.ndarray  # [B] int32 — next position to write, per row
    tokens: jnp.ndarray  # [B, L_buf] int32 (L_buf = total_len + k slack)
    cache_t: KVCache  # target self-attention cache, L_buf positions
    cache_d: KVCache  # draft self-attention cache, L_buf positions
    finished: jnp.ndarray  # [B] bool
    rounds: jnp.ndarray  # scalar int32 — verify rounds executed
    accepted: jnp.ndarray  # scalar int32 — draft tokens accepted in total


def speculative_greedy_decode(
    params_t: Params,
    params_d: Params,
    enc_out_t: jnp.ndarray,  # [B, n_audio_ctx, d_target]
    prompt: jnp.ndarray,  # [B, P] int32
    dims_t: ModelDims,
    dims_d: ModelDims,
    eot: int,
    max_new_tokens: int,
    k_draft: int = 4,
    enc_out_d: Optional[jnp.ndarray] = None,  # None → share the target's
    # encoder output (Distil-Whisper drafts reuse the teacher encoder)
    logit_bias: Optional[jnp.ndarray] = None,
    rules: Optional[LogitRules] = None,
    compute_dtype=jnp.float32,
    kv_cache_dtype=None,
    no_speech: Optional[Tuple[int, int]] = None,  # (sot_index, nospeech_id)
    cross_kv_t: Optional[KVCache] = None,  # target cross-KV, when the
    # caller already computed it (language autodetection shares it)
) -> Tuple[jnp.ndarray, ...]:
    """Returns (tokens [B, P+max_new], lengths [B], stats) — plus
    (no_speech_probs [B],) when ``no_speech`` is given. ``stats`` is a dict
    of scalar arrays {rounds, drafted, accepted}: ``accepted/drafted`` is
    the acceptance rate, ``(P+lengths mean)/rounds`` the tokens-per-target-
    pass speedup factor. Tokens/lengths are bit-identical to
    ``greedy_decode(params_t, ...)``."""
    b, p_len = prompt.shape
    k = int(k_draft)
    if k < 1:
        raise ValueError("k_draft must be >= 1")
    total_len = p_len + max_new_tokens
    if total_len > dims_t.n_text_ctx:
        raise ValueError("prompt + max_new_tokens exceeds n_text_ctx")
    # Slack: a verify window starting at the last budget position may write
    # k positions past it; the slack rows are scratch, never emitted. For
    # positions >= n_text_ctx the position-embedding gather CLIPS to the
    # table's last row (jnp.take default) — garbage logits, but only ever
    # produced for slack positions whose commits the budget clamp zeroes.
    l_buf = min(total_len + k, dims_t.n_text_ctx + k)

    if enc_out_d is None:
        if dims_d.n_audio_state != dims_t.n_audio_state:
            raise ValueError(
                "draft encoder geometry differs from the target's; pass "
                "enc_out_d from the draft's own encoder"
            )
        enc_out_d = enc_out_t.astype(compute_dtype)

    cross_t = cross_kv_t
    if cross_t is None:
        cross_t = precompute_cross_kv(
            params_t, enc_out_t, dims_t, kv_dtype=kv_cache_dtype
        )
    cross_d = precompute_cross_kv(
        params_d, enc_out_d, dims_d, kv_dtype=kv_cache_dtype
    )
    sample_begin = jnp.int32(p_len)

    def constrain(logits, tokens, pos):
        """Rule-constrained f32 logits (same order as greedy_decode.pick)."""
        logits = logits.astype(jnp.float32)
        if logit_bias is not None:
            logits = logits + logit_bias
        if rules is not None:
            logits = rules.apply(logits, tokens, pos, sample_begin)
        return logits

    # --- prefill both models; pick the first token from TARGET logits ---
    cache_t = init_kv_cache(
        dims_t, b, l_buf, dtype=kv_cache_dtype or compute_dtype
    )
    logits_t, cache_t = decoder_prefill(
        params_t, prompt, cache_t, cross_t, dims_t, compute_dtype
    )
    cache_d = init_kv_cache(
        dims_d, b, l_buf, dtype=kv_cache_dtype or compute_dtype
    )
    _, cache_d = decoder_prefill(
        params_d, prompt, cache_d, cross_d, dims_d, compute_dtype
    )
    if no_speech is not None:
        sot_index, nospeech_id = no_speech
        no_speech_probs = jax.nn.softmax(
            logits_t[:, sot_index, :].astype(jnp.float32), axis=-1
        )[:, nospeech_id]

    tokens = jnp.full((b, l_buf), eot, dtype=jnp.int32)
    tokens = tokens.at[:, :p_len].set(prompt)
    first = argmax_last(
        constrain(logits_t[:, -1, :], tokens, sample_begin)
    ).astype(jnp.int32)
    tokens = tokens.at[:, p_len].set(first)
    finished = first == eot

    rows = jnp.arange(b)
    offs = jnp.arange(k + 1, dtype=jnp.int32)  # window-relative positions

    state = SpecState(
        pos=jnp.full((b,), p_len + 1, jnp.int32),
        tokens=tokens,
        cache_t=cache_t,
        cache_d=cache_d,
        finished=finished,
        rounds=jnp.int32(0),
        accepted=jnp.int32(0),
    )

    def body(s: SpecState) -> SpecState:
        pos, tokens = s.pos, s.tokens

        # --- draft phase: k+1 per-row greedy steps on the draft model.
        # The EXTRA step exists to write d_k's own K/V row (position
        # pos+k-1): on a full-accept round the next window starts at
        # pos+k, so that row would otherwise never be written and every
        # later draft read would attend over a permanent zero row,
        # silently degrading acceptance (found by review r5 — the hole
        # was empirically visible as zeroed draft-cache rows after
        # full-accept rounds). On partial accepts the extra row is stale
        # but sits at/above the next window's write frontier and is
        # rewritten before any read, like every other rejected row. The
        # (k+1)-th proposal itself is discarded. ---
        prev = tokens[rows, pos - 1]

        def draft_step(carry, j):
            tok, cache_d, toks = carry
            logits, cache_d = decoder_step(
                params_d, tok, pos - 1 + j, cache_d, cross_d, dims_d,
                compute_dtype,
            )
            nxt = argmax_last(constrain(logits, toks, pos + j)).astype(
                jnp.int32
            )
            # Provisional write: later draft steps' (and the verify pass's)
            # timestamp rules see the proposals as the running context.
            toks = toks.at[rows, pos + j].set(nxt, mode="drop")
            return (nxt, cache_d, toks), nxt

        (_, cache_d, tokens_prov), drafts = jax.lax.scan(
            draft_step, (prev, s.cache_d, tokens),
            jnp.arange(k + 1, dtype=jnp.int32),
        )
        drafts = jnp.swapaxes(drafts, 0, 1)[:, :k]  # [B, k]

        # --- verify: ONE target forward over [prev, d_1..d_k] ---
        window = jnp.concatenate([prev[:, None], drafts], axis=1)  # [B, k+1]
        logits_w, cache_t = decoder_window(
            params_t, window, pos - 1, s.cache_t, cross_t, dims_t,
            compute_dtype,
        )  # [B, k+1, V]

        # Target choices a_j for positions pos+j, j = 0..k, under the same
        # rules — evaluated against the PROVISIONAL buffer, which matches
        # the true context for every position at or before the first
        # mismatch (the only region whose choices are committed).
        def choose(j):
            return argmax_last(
                constrain(logits_w[:, j, :], tokens_prov, pos + j)
            ).astype(jnp.int32)

        a = jnp.stack([choose(j) for j in range(k + 1)], axis=1)  # [B, k+1]

        # --- accept/commit bookkeeping (vectorized) ---
        match = a[:, :k] == drafts  # [B, k]
        m = jnp.sum(
            jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1
        )  # leading matches, 0..k
        adv = m + 1  # accepted drafts + (correction | bonus)
        # Stop at the first EOT within the committed run.
        is_eot = a == eot  # [B, k+1]
        any_eot = jnp.any(is_eot, axis=1)
        first_eot = jnp.argmax(is_eot, axis=1) + 1  # 1-based commit count
        adv = jnp.where(any_eot, jnp.minimum(adv, first_eot), adv)
        # Budget clamp + frozen rows.
        adv = jnp.minimum(adv, jnp.int32(total_len) - pos)
        adv = jnp.where(s.finished, 0, jnp.maximum(adv, 0))

        # Commit a_0..a_{adv-1} at pos..pos+adv-1 (OOB indices drop).
        commit_idx = jnp.where(
            offs[None, :] < adv[:, None], pos[:, None] + offs[None, :], l_buf
        )
        tokens = tokens.at[rows[:, None], commit_idx].set(a, mode="drop")
        # Positions past the commit must NOT keep provisional drafts: the
        # buffer outside committed rows stays EOT-filled exactly like
        # greedy_decode's (rejected drafts were only ever written to the
        # provisional copy fed to the rules).

        new_finished = s.finished | (any_eot & (first_eot <= adv))
        new_pos = pos + adv
        new_finished = new_finished | (new_pos >= total_len)
        # Committed DRAFT tokens: the first min(m, adv) commits are matched
        # proposals — when adv <= m (EOT/budget clamp mid-run) ALL commits
        # are drafts, including a draft-proposed EOT (review r5: min(m,
        # adv-1) treated the clamped last commit as a correction and
        # biased the reported acceptance rate low).
        acc = jnp.sum(
            jnp.where(s.finished, 0, jnp.minimum(m, adv))
        )
        return SpecState(
            pos=new_pos,
            tokens=tokens,
            cache_t=cache_t,
            cache_d=cache_d,
            finished=new_finished,
            rounds=s.rounds + 1,
            accepted=s.accepted + acc.astype(jnp.int32),
        )

    def cond(s: SpecState):
        return jnp.any(~s.finished & (s.pos < total_len))

    final = jax.lax.while_loop(cond, body, state)

    out_tokens = final.tokens[:, :total_len]
    after = out_tokens[:, p_len:]
    is_eot = after == eot
    any_eot = jnp.any(is_eot, axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    lengths = jnp.where(
        any_eot, p_len + first_eot + 1, jnp.int32(total_len)
    ).astype(jnp.int32)
    stats = {
        "rounds": final.rounds,
        # Per-ROW draft count (frozen rows still run the draft scan —
        # wasted proposals count against the acceptance rate honestly).
        "drafted": final.rounds * k * b,
        "accepted": final.accepted,
    }
    out: Tuple[jnp.ndarray, ...] = (out_tokens, lengths, stats)
    if no_speech is not None:
        out = out + (no_speech_probs,)
    return out
