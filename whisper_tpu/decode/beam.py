"""Vectorized beam search: beams as a folded batch axis, openai semantics.

The reference decodes greedy-only with a 30-token budget
(whisper.cpp:346-399); beam search is net-new capability (BASELINE.json
configs[2]: beam=5). TPU-native layout (SURVEY.md §2b "beam parallelism"):

* hypotheses live as a flattened [B*K] batch dimension, so every decoder step
  is one batched matmul program — no per-beam control flow;
* **cross-KV is stored once per utterance, not per beam**: beams share the
  encoder state, and cross-attention is unmasked/position-independent, so
  beam queries fold into the query-row axis of the per-utterance attention
  matmuls (models/decoder.py ``beam_width``). The full cross-KV read is the
  dominant HBM stream of a decode step (~250 MB per large-v3 utterance in
  bf16), so sharing it cuts that traffic and its memory footprint by K;
* per-step candidate work is per-beam ``lax.top_k`` over the vocab followed
  by tiny [B, K*(K+1)] selection tables — exactly openai-whisper's candidate
  pool (top beam_size+1 per beam), vectorized;
* hypothesis reshuffle is a gather along the batch-beam axis applied to the
  token buffer AND the self-attention KV cache (on-device; under tensor
  parallelism it rides ICI as an all-gather XLA inserts).

Semantics match openai-whisper's ``BeamSearchDecoder`` (decoding.py):

* each sample keeps a separate **finished-hypothesis set** of up to K
  entries; active beams are always the top-K *non-EOT* candidates, so a
  finished hypothesis can never be evicted by a longer active beam;
* an EOT candidate is collected only if it sorts before the K-th best
  non-EOT candidate (openai iterates candidates in score order and stops
  after saving K continuations);
* the finished set fills in arrival order and never replaces (openai's
  ``if len(finished_sequences[i]) < beam_size``) — later, better-scoring
  EOTs are dropped once the set is full;
* decode stops when every sample holds K finished hypotheses (or the token
  budget ends); incomplete sets are padded from the surviving active beams
  in raw-score order;
* ranking is by length-normalized score: score/length, or the GNMT penalty
  ``((5+len)/6)**p`` when ``length_penalty`` is given.

Ties sort by (score desc, candidate index asc) — the order of openai's
stable ``sorted`` over dict insertion order (beam-major, then per-beam
top-k rank); ``lax.top_k`` breaks ties in favor of lower index, which
matches. Pinned by tests/test_beam.py (selection unit tests with forced
ties + a differential test against a dict-based reference implementation).
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

# Perf-attribution knobs (comma list): "reorder" skips the cache reshuffle,
# "topk" replaces the vocab top-k with a head slice, "fin" skips finished-set
# insertion. Each produces WRONG transcriptions — they exist only to
# attribute beam-step time on hardware where per-op profiling is unavailable
# (the tunneled single-chip dev setup). Never set in production.
import os as _os

_ABLATE = set(
    filter(None, _os.environ.get("WHISPER_TPU_BEAM_ABLATE", "").split(","))
)


def topk_wide(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a WIDE minor axis (the 51k-token vocab) as k
    argmax+mask passes instead of ``lax.top_k``.

    XLA's top_k on TPU lowers to a sort-based reduction over the full axis —
    measured at tens of ms per decode step for [B*K, 51866], which dominated
    the whole beam step. k is tiny (beam_size+1), so k masked argmax
    reductions are ~k linear passes over the logits (≈100 MB/step at k=6,
    negligible) and exact. Tie order matches lax.top_k: equal values surface
    lowest-index first (argmax picks the lowest index; masking removes it
    before the next pass).

    Returns (values [..., k], indices [..., k] int32).
    """
    vals, idxs = [], []
    cur = x
    for _ in range(k):
        i = jnp.argmax(cur, axis=-1).astype(jnp.int32)
        v = jnp.take_along_axis(cur, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i)
        cur = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, cur.shape, cur.ndim - 1)
            == i[..., None],
            NEG_INF,
            cur,
        )
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


class FinishedSet(NamedTuple):
    """Per-sample finished hypotheses, K fixed slots each."""

    tokens: jnp.ndarray  # [B, K, L] int32
    scores: jnp.ndarray  # [B, K] raw sum-logprob
    lengths: jnp.ndarray  # [B, K] valid tokens incl. terminating EOT
    valid: jnp.ndarray  # [B, K] bool


class BeamState(NamedTuple):
    pos: jnp.ndarray  # scalar int32 — next position to write
    tokens: jnp.ndarray  # [B*K, L] active-beam token buffers
    scores: jnp.ndarray  # [B*K] active sum-logprobs
    cache: KVCache  # self-attention cache [L, B*K, ctx, H, Dh]
    fin: FinishedSet


class FusedBeamState(NamedTuple):
    """Beam state for the fused decode step (ops/fused_step.py): the cache is
    a ping-pong plane pair and the beam reshuffle is PENDING — chosen at this
    step's selection, applied lazily inside the next step's attention read."""

    pos: jnp.ndarray  # scalar int32 — next position to write
    tokens: jnp.ndarray  # [B*K, L]
    scores: jnp.ndarray  # [B*K]
    cache: KVCache  # {"k"/"v": [2, L, B*K, ctx, H*Dh]}
    parity: jnp.ndarray  # scalar int32 — plane the next step READS
    pending: jnp.ndarray  # [B*K] int32 — permutation the next step applies
    fin: FinishedSet


class LineageBeamState(NamedTuple):
    """Beam state for the lineage decode step (decoder_step_lineage): the
    cache is single-plane and slot-stationary; beam reshuffles move only the
    [B*K, ctx] lineage table."""

    pos: jnp.ndarray  # scalar int32 — next position to write
    tokens: jnp.ndarray  # [B*K, L]
    scores: jnp.ndarray  # [B*K]
    cache: KVCache  # [L, B*K, ctx, H, Dh]
    lineage: jnp.ndarray  # [B*K, ctx] int32 (decoder.init_lineage)
    fin: FinishedSet


def resolve_fused(fused, dims: ModelDims, tp: int = 1) -> str:
    """Resolve the beam decode-step mode → "off" | "hybrid" | "lineage".

    * "hybrid" (the "auto" choice on TPU when the merged head dim is
      lane-aligned): the pending-permutation step — Pallas grouped-DMA
      permute kernel + merged-layout XLA attention (~10 ms/step combined
      vs ~20.5 eager at large-v3 beam=5 b16, tools/probe_fused.py).
    * "lineage": the beam permutation virtualized into a mask over
      slot-stationary cache rows (models/decoder.py decoder_step_lineage)
      — zero cache movement, one window stream per step, pure XLA, exact.
      NOT the TPU default despite moving 3x fewer window bytes: its
      attention must run as per-(batch,head) BATCHED matmuls (each query
      row needs all K slots, so the giant-matmul kq fold would re-read the
      cache K times), and XLA streams batched matmul operands at ~84 GB/s
      fp8 vs ~190 for the merged per-row form — measured 3x slower
      end-to-end (43 vs 128 audio-s/s, benchmarks/probe r4, /tmp/
      probe_lin.py table in PERF.md). Wins wherever Pallas is unavailable.
    * "off": the eager XLA step + one-hot cache reorder.

    Booleans are accepted for backward compatibility: True → "hybrid"
    (Pallas interpret mode off-TPU — slow, tests only), False → "off".
    "auto" stays eager on CPU so differential tests compare distinct
    formulations.

    ``tp`` is the model-axis size of the active mesh (1 when unsharded or
    dp-only). The hybrid kernel's DMA row blocks span the full merged
    [ctx, H*Dh] plane, so a tensor-parallel shard of the head dim would
    change the kernel geometry — hybrid runs under dp sharding via
    shard_map (ops/fused_step.py permute_append_sharded) but REFUSES
    tp>1: "auto" falls back, explicit "hybrid" raises (VERDICT r4
    weak#2; pinned in tests/test_fused_step.py).

    Explicit requests are honored or loudly refused (ADVICE r4): "auto"
    may degrade silently, but fused="hybrid" RAISES when the Pallas path
    can't run (non-lane-aligned merged head dim on TPU) and WARNS when it
    would run in interpret mode (CPU — orders of magnitude slower than the
    eager step; tests pass fused=True to opt in quietly)."""
    import warnings

    from whisper_tpu.ops.fused_step import supported

    interpret = jax.default_backend() != "tpu"
    hd = dims.n_text_state
    if fused == "auto":
        if not interpret and tp == 1 and supported(hd, interpret):
            return "hybrid"
        return "off"
    if fused == "lineage":
        return "lineage"
    if fused == "off":
        return "off"
    if fused == "hybrid":
        if tp > 1:
            raise ValueError(
                "fused_step='hybrid' cannot run on a tensor-parallel mesh "
                f"(model axis size {tp}): the DMA kernel's row blocks span "
                "the full merged head dim; use 'auto'/'lineage'/'off'"
            )
        if not supported(hd, interpret):
            raise ValueError(
                f"fused_step='hybrid' requested but the Pallas kernel does "
                f"not support merged head dim {hd} on this backend; use "
                f"'auto' (falls back silently) or 'lineage'/'off'"
            )
        if interpret:
            warnings.warn(
                "fused_step='hybrid' on a non-TPU backend runs the Pallas "
                "kernel in interpret mode (orders of magnitude slower than "
                "the eager step); use 'auto' to fall back automatically",
                stacklevel=3,
            )
        return "hybrid"
    if bool(fused) and tp == 1 and supported(hd, interpret):
        return "hybrid"
    return "off"


def reorder_cache(
    cache: KVCache,
    gather_idx: jnp.ndarray,
    bk: int,
    use_pallas: Optional[bool] = None,
) -> KVCache:
    """Beam-reshuffle the self-attention cache [L, B*K, ctx, H, Dh].

    Default path: a [BK, BK] one-hot contraction — exact: each one-hot row
    has a single 1.0, so every output element is one product x*1 and a sum
    over zeros; sub-byte caches round-trip through bf16 losslessly
    (e4m3/e5m2 ⊂ bf16). Measured on large-v3 beam=5 fp8 (TPU v5e,
    tools/ablate_step.py): XLA gather 66 ms/step, one-hot matmul ~12 ms,
    int8-bitcast one-hot 17 ms (int32 accumulator materializes), Pallas
    per-row DMA kernel (ops/gather.py, ``use_pallas=True``) ~12 ms — the
    elementwise-copy floor is ~3.4 ms, but no formulation tested reaches
    it, so the one-hot matmul stays the default and the win comes from
    shrinking the window instead (reorder_cache_window).
    """
    dtype = cache["k"].dtype
    if use_pallas:
        from whisper_tpu.ops.gather import permute_rows, supported

        # gather.py's caller contract: odd trailing sizes (not a multiple of
        # the 128-lane tile) must fall back to the XLA path rather than
        # raise mid-trace (ADVICE r2 #3).
        if supported(cache["k"].shape) and supported(cache["v"].shape):
            return {n: permute_rows(v, gather_idx) for n, v in cache.items()}
    compute = jnp.bfloat16 if dtype.itemsize == 1 else dtype
    perm = jax.nn.one_hot(gather_idx, bk, dtype=compute)  # [BK(new), BK(old)]

    def apply(x):
        y = jnp.einsum(
            "nj,ljthd->lnthd", perm, x.astype(compute),
            preferred_element_type=compute,
        )
        return y.astype(dtype)

    return {"k": apply(cache["k"]), "v": apply(cache["v"])}


def reorder_cache_window(
    cache: KVCache, gather_idx: jnp.ndarray, bk: int, limit: int
) -> KVCache:
    """reorder_cache over only the first ``limit`` cache positions (static).

    Positions ≥ limit have never been written (zeros) when the caller keeps
    limit ≥ the current decode position, so permuting them is pure wasted
    HBM traffic — this streams the covering window only and writes it back
    in place."""
    ctx = cache["k"].shape[2]
    if limit >= ctx:
        return reorder_cache(cache, gather_idx, bk)
    win = {n: v[:, :, :limit] for n, v in cache.items()}
    win = reorder_cache(win, gather_idx, bk)
    return {
        n: jax.lax.dynamic_update_slice(v, win[n], (0, 0, 0, 0, 0))
        for n, v in cache.items()
    }


class Selection(NamedTuple):
    """Result of one candidate-selection round (see select_candidates)."""

    act_idx: jnp.ndarray  # [B, K] candidate index per continuing beam slot
    act_scores: jnp.ndarray  # [B, K]
    eot_idx: jnp.ndarray  # [B, K] eligible EOT candidates, best first
    eot_scores: jnp.ndarray  # [B, K]
    eot_valid: jnp.ndarray  # [B, K] bool


def select_candidates(
    cand_scores: jnp.ndarray,  # [B, C] joint scores, candidate order =
    # beam-major then per-beam rank (openai dict insertion order)
    cand_is_eot: jnp.ndarray,  # [B, C] bool
    k: int,
) -> Selection:
    """openai BeamSearchDecoder.update's candidate walk, vectorized.

    openai iterates candidates sorted by (score desc, insertion order),
    collecting EOT candidates into the finished pool and non-EOT candidates
    as continuations, stopping after the K-th continuation. Equivalently:

    * continuations = top-K non-EOT candidates;
    * an EOT is eligible iff it sorts strictly before the K-th continuation
      (score greater, or equal score and lower candidate index).

    The candidate pool must contain ≥ K non-EOT entries (per-beam top (K+1)
    guarantees it: at most one EOT per beam row).
    """
    b, c = cand_scores.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (b, c), 1)

    non_eot_scores = jnp.where(cand_is_eot, NEG_INF, cand_scores)
    act_scores, act_idx = jax.lax.top_k(non_eot_scores, k)  # [B, K]
    kth_score = act_scores[:, -1]
    kth_idx = act_idx[:, -1]

    eligible = cand_is_eot & (
        (cand_scores > kth_score[:, None])
        | ((cand_scores == kth_score[:, None]) & (idx < kth_idx[:, None]))
    )
    eot_masked = jnp.where(eligible, cand_scores, NEG_INF)
    eot_scores, eot_idx = jax.lax.top_k(eot_masked, k)
    eot_valid = jnp.take_along_axis(eligible, eot_idx, axis=1)
    return Selection(act_idx, act_scores, eot_idx, eot_scores, eot_valid)


def _insert_finished(
    fin: FinishedSet,
    new_tokens: jnp.ndarray,  # [B, K, L] candidate buffers, best first
    new_scores: jnp.ndarray,  # [B, K]
    new_lengths: jnp.ndarray,  # [B, K]
    new_valid: jnp.ndarray,  # [B, K]
) -> FinishedSet:
    """Fill-no-replace insertion (openai ``if len(finished) < beam_size``):
    existing entries keep their slots in arrival order; new candidates fill
    remaining slots in their own (score) order; a full set never changes."""
    b, k = fin.scores.shape
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    # Priority keys: existing occupants 2K-i (K+1..2K), newcomers K-j (1..K),
    # empty/invalid -1 — existing always outrank new, both preserve order.
    keys = jnp.concatenate(
        [
            jnp.where(fin.valid, 2 * k - slot, -1),
            jnp.where(new_valid, k - slot, -1),
        ],
        axis=1,
    )  # [B, 2K]
    sel_keys, sel_pos = jax.lax.top_k(keys, k)  # [B, K]

    def pick(old, new):  # gather along the 2K pool axis
        pool = jnp.concatenate([old, new], axis=1)
        if pool.ndim == 3:
            return jnp.take_along_axis(pool, sel_pos[:, :, None], axis=1)
        return jnp.take_along_axis(pool, sel_pos, axis=1)

    return FinishedSet(
        tokens=pick(fin.tokens, new_tokens),
        scores=pick(fin.scores, new_scores),
        lengths=pick(fin.lengths, new_lengths),
        valid=sel_keys >= 1,
    )


def _lengths_of(tokens: jnp.ndarray, p_len: int, eot: int) -> jnp.ndarray:
    """Valid-token count incl. terminating EOT; rows without EOT (budget
    exhausted) count the full buffer. Matches greedy_decode's rule."""
    after = tokens[..., p_len:]
    is_eot = after == eot
    any_eot = jnp.any(is_eot, axis=-1)
    first = jnp.argmax(is_eot, axis=-1)
    return jnp.where(any_eot, p_len + first + 1, tokens.shape[-1]).astype(
        jnp.int32
    )


def beam_decode(
    params: Params,
    enc_out: jnp.ndarray,  # [B, n_audio_ctx, d]
    prompt: jnp.ndarray,  # [B, P] int32
    dims: ModelDims,
    eot: int,
    max_new_tokens: int,
    beam_size: int = 5,
    logit_bias: Optional[jnp.ndarray] = None,  # additive [n_vocab] mask
    rules: Optional[LogitRules] = None,
    length_penalty: Optional[float] = None,
    compute_dtype=jnp.float32,
    cross_kv: Optional[KVCache] = None,  # unreplicated [L, B, H, Dh, Tk]
    kv_cache_dtype=None,  # storage dtype for caches (None => compute_dtype)
    no_speech: Optional[Tuple[int, int]] = None,  # (sot_index, nospeech_id)
    ctx_bucket="auto",  # KV segment-growth granularity (sequential
    # while_loops over growing cache buffers — aliasing-safe; see
    # greedy.ctx_bucket_limits). "auto" = CTX_BUCKET when ≥3 segments
    # cover the budget, else a single full-size segment; int/None/0 force.
    fused="auto",  # decode-step mode, resolved by resolve_fused into one
    # of: "hybrid" (Pallas DMA pending-permutation + merged-layout XLA
    # attention — the TPU default under "auto"), "lineage" (slot-stationary
    # cache + ancestry-mask attention, pure XLA, runs anywhere), or "off"
    # (eager step + one-hot cache reorder — the "auto" choice off-TPU).
    # Strings pass through; booleans are legacy (True→hybrid, False→off).
    mesh=None,  # jax Mesh when the engine runs sharded: the hybrid step's
    # Pallas kernel then runs per-shard via shard_map with the [B*K] axis
    # on the data axis (permute_append_sharded); tp>1 refuses hybrid.
    mesh_axis_names: Tuple[str, str] = ("data", "model"),
) -> Tuple[jnp.ndarray, ...]:
    """Returns (tokens [B, P+max_new], lengths [B], scores [B]) for the best
    finished hypothesis per batch item (length-normalized score) — plus
    (no_speech_probs [B],) when ``no_speech`` is given (the prefill-logits
    silence signal, see decode/greedy.py)."""
    b, p_len = prompt.shape
    k = beam_size
    bk = b * k
    total_len = p_len + max_new_tokens
    if total_len > dims.n_text_ctx:
        raise ValueError("prompt + max_new_tokens exceeds n_text_ctx")

    # Cross-KV once per utterance and SHARED by its beams — never replicated
    # (decoder beam_width folds beam queries into the attention query rows).
    if cross_kv is None:
        cross_kv = precompute_cross_kv(params, enc_out, dims, kv_dtype=kv_cache_dtype)
    sample_begin = jnp.int32(p_len)

    def logprobs_of(logits, tokens, pos):
        if logit_bias is not None:
            logits = logits + logit_bias
        if rules is not None:
            logits = rules.apply(logits, tokens, pos, sample_begin)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    from whisper_tpu.decode.greedy import (
        ctx_bucket_limits,
        grow_cache,
        resolve_ctx_bucket,
    )

    ctx_bucket = resolve_ctx_bucket(ctx_bucket, total_len)
    limits = (
        ctx_bucket_limits(total_len, ctx_bucket) if ctx_bucket else [total_len]
    )
    limits = [l for l in limits if l > p_len] or [total_len]
    tp = int(mesh.shape[mesh_axis_names[1]]) if mesh is not None else 1
    mode = resolve_fused(fused, dims, tp=tp)
    use_fused = mode == "hybrid"
    interpret = jax.default_backend() != "tpu"
    if use_fused:
        # Physical segment sizes stay sublane-tile aligned for the kernel's
        # [ctx, HD] row blocks; loop bounds still stop at the logical limit.
        phys = [-(-l // 64) * 64 for l in limits]
    else:
        phys = limits

    # --- prefill ONCE per utterance (beams are identical at the prompt),
    # then fan the self-cache out to the beam axis. The cache starts at the
    # first segment's physical size and grows at segment boundaries
    # (greedy.ctx_bucket_limits) ---
    cache_b = init_kv_cache(dims, b, phys[0], dtype=kv_cache_dtype or compute_dtype)
    logits, cache_b = decoder_prefill(
        params, prompt, cache_b, cross_kv, dims, compute_dtype,
    )
    if no_speech is not None:
        sot_index, nospeech_id = no_speech
        no_speech_probs = jax.nn.softmax(
            logits[:, sot_index, :].astype(jnp.float32), axis=-1
        )[:, nospeech_id]
    if use_fused:
        from whisper_tpu.models.decoder import plane_cache_from_prefill

        cache = plane_cache_from_prefill(cache_b, k)
        if mesh is not None:
            # Pin the plane pair's beam-batch axis to the data axis ONCE at
            # creation so the per-layer shard_map regions see operands
            # already laid out shard-local (no per-step resharding).
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = NamedSharding(
                mesh, P(None, None, mesh_axis_names[0], None, None)
            )
            cache = {
                n: jax.lax.with_sharding_constraint(v, spec)
                for n, v in cache.items()
            }
    else:
        cache = {key: jnp.repeat(v, k, axis=1) for key, v in cache_b.items()}

    tokens_b = jnp.full((b, total_len), eot, dtype=jnp.int32)
    tokens_b = tokens_b.at[:, :p_len].set(prompt)
    lp0 = logprobs_of(logits[:, -1, :], tokens_b, sample_begin)  # [B, V]

    # First expansion: openai's dict dedups the K identical beams down to one
    # candidate set of the top (K+1) tokens; the same selection walk applies.
    c0_scores, c0_tokens = topk_wide(lp0, k + 1)  # [B, K+1]
    sel0 = select_candidates(c0_scores, c0_tokens == eot, k)

    act_tok0 = jnp.take_along_axis(c0_tokens, sel0.act_idx, axis=1)  # [B, K]
    tokens = jnp.repeat(tokens_b, k, axis=0)  # [B*K, L]
    tokens = tokens.at[:, p_len].set(act_tok0.reshape(bk))
    scores = sel0.act_scores.reshape(bk)

    fin = FinishedSet(
        tokens=jnp.broadcast_to(tokens_b[:, None, :], (b, k, total_len)),
        scores=jnp.full((b, k), NEG_INF, jnp.float32),
        lengths=jnp.full((b, k), p_len + 1, jnp.int32),
        valid=jnp.zeros((b, k), bool),
    )
    # Finished buffers for prefill EOTs: prompt + terminating EOT (the buffer
    # is EOT-filled past the prompt already).
    fin = _insert_finished(
        fin,
        jnp.broadcast_to(tokens_b[:, None, :], (b, k, total_len)),
        sel0.eot_scores,
        jnp.full((b, k), p_len + 1, jnp.int32),
        sel0.eot_valid,
    )

    def advance(s_tokens, s_scores, s_fin, lp, pos):
        """One candidate-selection round (shared by the eager and fused
        bodies): logprobs → openai candidate walk → finished insertions →
        continuation gather. Returns (tokens, scores, fin, act_rows) where
        act_rows is the [B*K] source-beam permutation of the continuations.
        """
        # openai's candidate pool: top (K+1) per beam (≥ K non-EOT overall),
        # flattened beam-major → dict insertion order. topk_wide: k argmax
        # passes, NOT lax.top_k (sort-based — dominated the step, see its
        # docstring).
        if "topk" in _ABLATE:  # perf attribution only — WRONG results
            top_lp, top_tok = lp[:, : k + 1], jnp.tile(
                jnp.arange(k + 1, dtype=jnp.int32)[None], (bk, 1)
            )
        else:
            top_lp, top_tok = topk_wide(lp, k + 1)  # [B*K, K+1]
        cand_scores = (s_scores[:, None] + top_lp).reshape(b, k * (k + 1))
        cand_tokens = top_tok.reshape(b, k * (k + 1))
        cand_src = (
            jax.lax.broadcasted_iota(jnp.int32, (b, k * (k + 1)), 1) // (k + 1)
        )

        sel = select_candidates(cand_scores, cand_tokens == eot, k)

        # --- finished insertions: source-beam snapshots already end in the
        # EOT fill at position pos, so the buffer is the hypothesis as-is ---
        eot_src = jnp.take_along_axis(cand_src, sel.eot_idx, axis=1)  # [B, K]
        base = jax.lax.broadcasted_iota(jnp.int32, (b, k), 0) * k
        eot_rows = (base + eot_src).reshape(bk)
        if "fin" in _ABLATE:  # perf attribution only — WRONG results
            fin = s_fin
        else:
            eot_tokens = jnp.take(s_tokens, eot_rows, axis=0).reshape(
                b, k, total_len
            )
            fin = _insert_finished(
                s_fin,
                eot_tokens,
                sel.eot_scores,
                jnp.full((b, k), pos + 1, jnp.int32),
                sel.eot_valid,
            )

        # --- continuations: gather token buffers by source beam, write the
        # chosen token ---
        act_src = jnp.take_along_axis(cand_src, sel.act_idx, axis=1)
        act_tok = jnp.take_along_axis(cand_tokens, sel.act_idx, axis=1)
        act_rows = (base + act_src).reshape(bk)
        tokens = jnp.take(s_tokens, act_rows, axis=0)
        tokens = jax.lax.dynamic_update_index_in_dim(
            tokens, act_tok.reshape(bk), pos, axis=1
        )
        return tokens, sel.act_scores.reshape(bk), fin, act_rows

    def body(s: BeamState) -> BeamState:
        prev = jax.lax.dynamic_index_in_dim(s.tokens, s.pos - 1, 1, keepdims=False)
        logits, cache = decoder_step(
            params, prev, s.pos - 1, s.cache, cross_kv, dims, compute_dtype,
            beam_width=k,
        )
        lp = logprobs_of(logits, s.tokens, s.pos)  # [B*K, V]
        tokens, scores, fin, act_rows = advance(
            s.tokens, s.scores, s.fin, lp, s.pos
        )
        if "reorder" not in _ABLATE:  # ablation: perf attribution only
            # The cache buffer is the current segment's physical size, so
            # the reshuffle streams only the covering window.
            cache = reorder_cache(cache, act_rows, bk)
        return BeamState(s.pos + 1, tokens, scores, cache, fin)

    def body_lineage(s: "LineageBeamState") -> "LineageBeamState":
        from whisper_tpu.models.decoder import decoder_step_lineage

        prev = jax.lax.dynamic_index_in_dim(s.tokens, s.pos - 1, 1, keepdims=False)
        logits, cache, lineage = decoder_step_lineage(
            params, prev, s.pos - 1, s.cache, s.lineage, cross_kv, dims,
            compute_dtype, beam_width=k,
        )
        lp = logprobs_of(logits, s.tokens, s.pos)
        tokens, scores, fin, act_rows = advance(
            s.tokens, s.scores, s.fin, lp, s.pos
        )
        # The beam reshuffle touches ONLY the lineage table (an [B*K, ctx]
        # int32 row gather — ~80 KB at large-v3 beam=5 b16); the cache
        # stays slot-stationary forever.
        if "reorder" not in _ABLATE:  # ablation: perf attribution only
            lineage = jnp.take(lineage, act_rows, axis=0)
        return LineageBeamState(
            s.pos + 1, tokens, scores, cache, lineage, fin
        )

    def body_fused(s: FusedBeamState) -> FusedBeamState:
        from whisper_tpu.models.decoder import decoder_step_fused

        prev = jax.lax.dynamic_index_in_dim(s.tokens, s.pos - 1, 1, keepdims=False)
        logits, cache = decoder_step_fused(
            params, prev, s.pos - 1, s.cache, s.parity, s.pending, cross_kv,
            dims, compute_dtype, beam_width=k, interpret=interpret,
            mesh=mesh, data_axis=mesh_axis_names[0],
        )
        lp = logprobs_of(logits, s.tokens, s.pos)
        tokens, scores, fin, act_rows = advance(
            s.tokens, s.scores, s.fin, lp, s.pos
        )
        # The cache reshuffle is NOT applied here: it becomes the pending
        # permutation the next step's kernel reads through.
        return FusedBeamState(
            s.pos + 1, tokens, scores, cache, 1 - s.parity, act_rows, fin
        )

    # One while_loop per cache segment (greedy.py: segment-growth decode).
    if mode == "lineage":
        from whisper_tpu.models.decoder import grow_lineage, init_lineage

        state = LineageBeamState(
            jnp.int32(p_len + 1), tokens, scores, cache,
            init_lineage(b, k, phys[0], p_len), fin,
        )
        for i, end in enumerate(limits):
            seg_end = jnp.int32(min(end, total_len))

            def cond_l(s: LineageBeamState, _end=seg_end):
                return (s.pos < _end) & ~jnp.all(s.fin.valid)

            state = jax.lax.while_loop(cond_l, body_lineage, state)
            if i + 1 < len(limits):
                state = state._replace(
                    cache=grow_cache(state.cache, phys[i + 1]),
                    lineage=grow_lineage(state.lineage, phys[i + 1]),
                )
    elif use_fused:
        from whisper_tpu.models.decoder import grow_plane_cache

        # Rows within a sample are identical after the prefill fan-out, so
        # the initial pending permutation is the identity.
        state = FusedBeamState(
            jnp.int32(p_len + 1), tokens, scores, cache, jnp.int32(0),
            jnp.arange(bk, dtype=jnp.int32), fin,
        )
        for i, end in enumerate(limits):
            seg_end = jnp.int32(min(end, total_len))

            def cond_f(s: FusedBeamState, _end=seg_end):
                return (s.pos < _end) & ~jnp.all(s.fin.valid)

            state = jax.lax.while_loop(cond_f, body_fused, state)
            if i + 1 < len(limits):
                state = state._replace(
                    cache=grow_plane_cache(state.cache, phys[i + 1])
                )
    else:
        state = BeamState(jnp.int32(p_len + 1), tokens, scores, cache, fin)
        for i, end in enumerate(limits):
            seg_end = jnp.int32(min(end, total_len))

            def cond(s: BeamState, _end=seg_end):
                return (s.pos < _end) & ~jnp.all(s.fin.valid)

            state = jax.lax.while_loop(cond, body, state)
            if i + 1 < len(limits):
                state = BeamState(
                    state.pos, state.tokens, state.scores,
                    grow_cache(state.cache, limits[i + 1]), state.fin,
                )

    final = state

    # --- finalize: pad incomplete finished sets from the surviving active
    # beams in raw-score order (openai GreedyDecoder.finalize appends EOT to
    # unfinished sequences; our buffers already carry the EOT fill) ---
    act_scores_bk = final.scores.reshape(b, k)
    pad_scores, pad_beam = jax.lax.top_k(act_scores_bk, k)  # all K, sorted
    base = jax.lax.broadcasted_iota(jnp.int32, (b, k), 0) * k
    pad_rows = (base + pad_beam).reshape(bk)
    pad_tokens = jnp.take(final.tokens, pad_rows, axis=0).reshape(b, k, total_len)
    pad_lengths = _lengths_of(pad_tokens, p_len, eot)
    fin = _insert_finished(
        final.fin, pad_tokens, pad_scores, pad_lengths,
        jnp.ones((b, k), bool),
    )

    # --- rank by normalized score (openai MaximumLikelihoodRanker) ---
    gen_len = jnp.maximum(fin.lengths - p_len, 1).astype(jnp.float32)
    if length_penalty is None:
        norm = gen_len
    else:
        norm = ((5.0 + gen_len) / 6.0) ** length_penalty  # GNMT penalty
    norm_scores = jnp.where(fin.valid, fin.scores / norm, NEG_INF)

    best = jnp.argmax(norm_scores, axis=1)  # [B]
    take = lambda x: jnp.take_along_axis(  # noqa: E731
        x, best[:, None] if x.ndim == 2 else best[:, None, None], axis=1
    )
    out: Tuple[jnp.ndarray, ...] = (
        take(fin.tokens)[:, 0],
        take(fin.lengths)[:, 0],
        take(norm_scores)[:, 0],
    )
    if no_speech is not None:
        out = out + (no_speech_probs,)
    return out
