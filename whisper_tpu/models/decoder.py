"""Text decoder with KV-cached self-attention and precomputed cross-attention.

The reference decoder (``Decoder::forward``, whisper.cpp:314-403) re-feeds the
whole growing prompt and re-allocates interpreter tensors every step — O(n²)
full recomputes with no KV cache (SURVEY.md §2a.13). Here decoding is the
TPU-idiomatic inverse: fixed-shape buffers, one prefill pass over the static
prompt, then single-token steps against a preallocated cache, all shapes
static so the whole loop jit-compiles once (see whisper_tpu.decode.greedy).

Layout choices:
* caches and cross-KV are stacked along a leading layer axis and the block
  stack runs as ``lax.scan``, mirroring params.py;
* cache layout [L, B, ctx, H, Dh] — attention contracts over the ctx axis
  with einsum, keeping the head axis free for tensor-parallel sharding.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from whisper_tpu.config import ModelDims
from whisper_tpu.models import layers
from whisper_tpu.models.params import Params

# Self-attention cache: {"k"/"v": [L, B, ctx, H, Dh]} (ctx is small: prompt +
# token budget). Cross-attention cache: {"k"/"v": [L, B, H, Dh, n_audio_ctx]}
# — head-major/sequence-minor so every decode step streams it transpose-free
# (layers.cross_attention_T).
KVCache = Dict[str, jnp.ndarray]

NEG_INF = -1e30  # large-negative instead of -inf: keeps softmax NaN-free for
# fully-masked (not yet written) cache rows


def init_kv_cache(
    dims: ModelDims, batch: int, max_len: int | None = None, dtype=jnp.float32
) -> KVCache:
    max_len = max_len or dims.n_text_ctx
    h, dh = dims.n_text_head, dims.n_text_state // dims.n_text_head
    shape = (dims.n_text_layer, batch, max_len, h, dh)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def precompute_cross_kv(
    params: Params, enc_out: jnp.ndarray, dims: ModelDims, kv_dtype=None
) -> KVCache:
    """Cross-attention K/V over encoder states, computed once per utterance:
    [L, B, H, Dh, n_audio_ctx] — head-major, sequence-minor (the layout
    layers.cross_attention_T streams with zero per-step transposes; see its
    docstring). The reference pays this matmul again on every decode step
    inside its graph.

    ``kv_dtype`` optionally downcasts storage (e.g. float8_e4m3fn — this is
    the largest activation block for big models; attention upcasts at use)."""
    n_head = dims.n_text_head

    def per_layer(_, bp):
        k = layers.split_heads(layers.linear(bp["cross"]["k"], enc_out), n_head)
        v = layers.split_heads(layers.linear(bp["cross"]["v"], enc_out), n_head)
        # [B, Tk, H, Dh] → [B, H, Dh, Tk]: one transpose at precompute buys
        # transpose-free reads on every decode step after it.
        k = jnp.transpose(k, (0, 2, 3, 1))
        v = jnp.transpose(v, (0, 2, 3, 1))
        if kv_dtype is not None:
            k, v = k.astype(kv_dtype), v.astype(kv_dtype)
        return None, (k, v)

    _, (xk, xv) = jax.lax.scan(per_layer, None, params["decoder"]["blocks"])
    return {"k": xk, "v": xv}


def _decoder_forward(
    params: Params,
    tokens: jnp.ndarray,  # [B, T] int32, T static
    pos_offset: jnp.ndarray,  # scalar int32 (shared) or [B] int32 (per-row):
    # absolute position of tokens[:, 0]. The vector form requires T == 1 and
    # serves continuous batching, where every slot decodes at its own depth.
    cache: KVCache,
    cross_kv: KVCache,
    dims: ModelDims,
    compute_dtype=jnp.float32,
    beam_width: int = 1,
    ctx_limit: int | None = None,
    merged_read: bool = False,
) -> Tuple[jnp.ndarray, KVCache]:
    """Shared body for prefill (T = prompt length) and step (T = 1).

    ``merged_read`` (T=1 steps only) reads the self-attention cache in its
    MERGED [B, ctx, H*Dh] layout — the blockdiag formulation the hybrid
    beam step landed in round 4 (decoder_step_fused): one elementwise k⊙q
    that fuses into the slice read plus two big non-batched XLA matmuls,
    instead of H per-(b,h) batched einsum instances. Measured 8.9 vs 11.4
    ms/step for the attention read at large-v3 beam shapes (PERF.md
    formulation table); greedy/temperature decode now gets the same read
    (VERDICT r4 next-#5). Numerics: same products, different reduction
    order than qkv_attention (the 0/1 blockdiag matmul reduces in f32
    after bf16 products — ≤1 ulp per score, same class as the hybrid
    step's documented deviation; parity pinned in tests/test_model.py).

    ``ctx_limit`` (static) bounds the self-attention READ to the first
    ``ctx_limit`` cache positions — the decode loops pass the smallest
    64-multiple covering the current position (decode/greedy.py switch
    ladder), so an early step streams a fraction of the cache instead of
    the whole preallocated window. Exact: the caller guarantees every
    written position is < ctx_limit, and rows beyond it carry mask -inf —
    their softmax weight is exactly 0.0 in f32, so removing them leaves
    the logits bit-identical. Cache WRITES always target the full buffer.

    ``beam_width=K>1`` means the token batch axis is a folded [B*K] beam axis
    while ``cross_kv`` stays at true batch B: all K beams of an utterance
    share one cross-KV copy. Cross-attention is unmasked and
    position-independent, so grouping is a pure reshape — beam queries fold
    into the query-row axis of the per-utterance attention matmuls. This cuts
    the decode step's dominant HBM stream (the full cross-KV read, ~250 MB
    per large-v3 utterance in bf16) by K versus replicating the cache.

    Returns (logits [B, T, n_vocab] float32, updated cache).
    """
    dec = params["decoder"]
    n_head = dims.n_text_head
    b, t = tokens.shape
    ctx = cache["k"].shape[2]
    if ctx_limit is not None:
        ctx = min(ctx, int(ctx_limit))
    pos_offset = jnp.asarray(pos_offset)
    per_row = pos_offset.ndim == 1

    if per_row:
        # Per-row absolute positions (continuous batching T=1; speculative
        # verify windows T=k): row b's tokens sit at pos_offset[b] + i.
        row_pos = pos_offset[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
        pos_emb = jnp.take(dec["pos_emb"], row_pos, axis=0)  # [B, T, D]
    else:
        pos_emb = jax.lax.dynamic_slice_in_dim(
            dec["pos_emb"], pos_offset, t, axis=0
        )
    x = layers.embed(dec["tok_emb"], tokens) + pos_emb
    x = x.astype(compute_dtype)

    # Causal mask against absolute cache positions: query at abs position
    # pos_offset + i may see keys at positions <= that. Unwritten cache rows
    # sit above the diagonal and are masked by construction.
    if per_row:
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (b, t, ctx), 2)
        mask = jnp.where(k_pos <= row_pos[:, :, None], 0.0, NEG_INF)
        mask = mask[:, None, :, :].astype(compute_dtype)  # [B,1,T,ctx]
    else:
        q_pos = pos_offset + jax.lax.broadcasted_iota(jnp.int32, (t, ctx), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (t, ctx), 1)
        mask = jnp.where(k_pos <= q_pos, 0.0, NEG_INF).astype(compute_dtype)

    rows = jnp.arange(b)
    merged_read = merged_read and t == 1
    if merged_read:
        hd = dims.n_text_state
        dh = hd // n_head
        # Blockdiag fold/extract mats (see decoder_step_fused): [HD, H]
        # selects head h's Dh-lane block into score column h; [H, HD]
        # extracts head h's true output lanes from the value dot.
        bd_mat = (
            jnp.arange(hd)[:, None] // dh == jnp.arange(n_head)[None]
        ).astype(compute_dtype)
        et_mat = (
            jnp.arange(n_head)[:, None] == jnp.arange(hd)[None] // dh
        ).astype(jnp.float32)
        scale = float(dh) ** -0.5
        # Mask broadcast for head-major [B, H, ctx] scores.
        mask_m = mask.reshape(b, 1, ctx) if per_row else mask.reshape(1, 1, ctx)

    def update_cache(cache_full, layer, new):
        """Write this layer's new K/V rows into the FULL [L, B, ctx, H, Dh]
        cache, which lives in the scan *carry*.

        Carry placement is the load-bearing choice: routing per-layer cache
        slices through scan xs→ys (the v1 structure) forces XLA to
        materialize a fresh full-size cache as stacked ys every step — the
        decode loop then reads AND rewrites the entire cache per token,
        measured at 27.3 ms/step for large-v3 beam=5 on TPU v5e vs 7.4 ms
        with the cache carried and only the new rows written in place
        (3.7×; XLA aliases while_loop/scan carry buffers, so a
        dynamic-update-slice on a carried tensor lowers to an in-place row
        write)."""
        new = new.astype(cache_full.dtype)
        if per_row:
            if t == 1:
                # Scatter each row's single new entry at its own position.
                return cache_full.at[layer, rows, pos_offset].set(new[:, 0])
            # Multi-token per-row window (speculative verify): scatter the
            # [B, T] rows at their per-row absolute positions.
            return cache_full.at[layer, rows[:, None], row_pos].set(new)
        return jax.lax.dynamic_update_slice(
            cache_full, new[None], (layer, 0, pos_offset, 0, 0)
        )

    def block(carry, xs):
        h, cache_k, cache_v = carry
        layer, bp, xk_l, xv_l = xs

        # --- causal self-attention against the cache ---
        hn = layers.layer_norm(bp["ln1"], h)
        q = layers.split_heads(layers.linear(bp["attn"]["q"], hn), n_head)
        k_new = layers.split_heads(layers.linear(bp["attn"]["k"], hn), n_head)
        v_new = layers.split_heads(layers.linear(bp["attn"]["v"], hn), n_head)
        cache_k = update_cache(cache_k, layer, k_new)
        cache_v = update_cache(cache_v, layer, v_new)
        # Static read-window slice (fuses into the attention matmuls — no
        # copy): only the covering ctx bucket streams from HBM.
        k_cache_l = jax.lax.dynamic_index_in_dim(
            cache_k, layer, 0, keepdims=False
        )[:, :ctx]
        v_cache_l = jax.lax.dynamic_index_in_dim(
            cache_v, layer, 0, keepdims=False
        )[:, :ctx]
        if merged_read:
            # Merged-layout blockdiag read (docstring above): the [B, ctx,
            # H, Dh] slice is a free reshape of [B, ctx, HD].
            k2d = k_cache_l.reshape(b, ctx, hd).astype(compute_dtype)
            v2d = v_cache_l.reshape(b, ctx, hd).astype(compute_dtype)
            qm = q.reshape(b, hd).astype(compute_dtype)
            kq = k2d * qm[:, None, :]
            scores = (
                jnp.einsum(
                    "bcj,jh->bhc", kq, bd_mat,
                    preferred_element_type=jnp.float32,
                )
                * scale
                + mask_m
            )
            w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            vout = jax.lax.dot_general(
                w.astype(compute_dtype), v2d,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [B, H, HD]
            attn_m = jnp.sum(vout * et_mat[None], axis=1).astype(compute_dtype)
            h = h + layers.linear(bp["attn"]["o"], attn_m[:, None, :])
        else:
            attn_out = layers.qkv_attention(q, k_cache_l, v_cache_l, mask)
            h = h + layers.linear(
                bp["attn"]["o"], layers.merge_heads(attn_out)
            )

        # --- cross-attention over precomputed encoder K/V ---
        hn = layers.layer_norm(bp["ln2"], h)
        qx = layers.split_heads(layers.linear(bp["cross"]["q"], hn), n_head)
        if beam_width > 1:
            # Fold beams into the query-row axis: [B*K, T, H, Dh] →
            # [B, K*T, H, Dh] against cross-KV stored at batch B.
            dh = qx.shape[-1]
            qx = qx.reshape(b // beam_width, beam_width * t, n_head, dh)
            cross_out = layers.cross_attention_T(qx, xk_l, xv_l)
            cross_out = cross_out.reshape(b, t, n_head, dh)
        else:
            cross_out = layers.cross_attention_T(qx, xk_l, xv_l)
        h = h + layers.linear(bp["cross"]["o"], layers.merge_heads(cross_out))

        # --- MLP ---
        h = h + layers.mlp(bp["mlp"], layers.layer_norm(bp["ln3"], h))
        return (h, cache_k, cache_v), None

    n_layer = dims.n_text_layer
    xs = (
        jnp.arange(n_layer, dtype=jnp.int32),
        dec["blocks"],
        cross_kv["k"],
        cross_kv["v"],
    )
    (x, new_k, new_v), _ = jax.lax.scan(
        block, (x, cache["k"], cache["v"]), xs
    )

    x = layers.layer_norm(dec["ln"], x)
    logits = layers.unembed(dec["tok_emb"], x)
    return logits, {"k": new_k, "v": new_v}


def plane_cache_from_prefill(cache: KVCache, beam: int) -> KVCache:
    """Prefilled standard cache [L, B, ctx, H, Dh] → ping-pong plane pair
    [2, L, B*beam, ctx, H*Dh] for the fused decode step (ops/fused_step.py).

    Plane 0 holds the beam-fanned prefill rows (the first fused step reads
    parity 0); plane 1 is the first write target and starts as zeros — every
    byte of it is rewritten before any step reads it."""
    l, b, ctx, h, dh = cache["k"].shape

    def fan(x):
        merged = x.reshape(l, b, ctx, h * dh)
        rep = jnp.repeat(merged, beam, axis=1)
        return jnp.stack([rep, jnp.zeros_like(rep)])

    return {"k": fan(cache["k"]), "v": fan(cache["v"])}


def grow_plane_cache(cache: KVCache, new_len: int) -> KVCache:
    """Segment-growth pad for the plane-pair layout (position axis = 3)."""
    cur = cache["k"].shape[3]
    if new_len <= cur:
        return cache
    pad = [(0, 0), (0, 0), (0, 0), (0, new_len - cur), (0, 0)]
    return {n: jnp.pad(v, pad) for n, v in cache.items()}


def decoder_step_fused(
    params: Params,
    token: jnp.ndarray,  # [BK] int32 — token at absolute position `pos`
    pos: jnp.ndarray,  # scalar int32
    cache: KVCache,  # {"k"/"v": [2, L, BK, ctx, H*Dh]} ping-pong planes
    parity: jnp.ndarray,  # scalar int32: plane to READ; writes go to 1-parity
    pending_idx: jnp.ndarray,  # [BK] int32 — beam permutation chosen at the
    # PREVIOUS step's selection, applied lazily during this step's cache read
    cross_kv: KVCache,
    dims: ModelDims,
    compute_dtype=jnp.float32,
    beam_width: int = 1,
    interpret: bool = False,
    mesh=None,  # jax Mesh: run the permute kernel per-shard via shard_map,
    # the cache's [B*K] axis sharded along `data_axis` (dp only — see
    # ops/fused_step.py permute_append_sharded; resolve_fused fences tp>1)
    data_axis: str = "data",
) -> Tuple[jnp.ndarray, KVCache]:
    """One autoregressive step with the pending beam permutation applied by
    the DMA permute kernel (ops/fused_step.py permute_append) and the
    attention matmuls in XLA — the division of labor round-4's measurements
    force: Pallas moves the cache at ~590 GB/s (vs ~250 for the one-hot
    reorder) but Mosaic's in-kernel matmuls run ~20x below XLA's, so the
    compute stays out of the kernel. The permute runs PER LAYER inside the
    scan: hoisting all L layers into one whole-cache kernel call before
    the scan (ops/fused_step.py permute_all) measured 5.82 s vs 3.97 on
    the north star — a Pallas output feeding a scan's INITIAL carry defeats
    XLA's carry aliasing and re-copies the cache every step, where the
    per-layer call threads carry→pallas→carry in place (bench r4, PERF.md).
    Numerically matches :func:`decoder_step` composed with a cache reorder
    by ``pending_idx``. Returns (logits [BK, V] f32, cache with plane
    ``1-parity`` current). The caller flips parity each step."""
    from whisper_tpu.ops.fused_step import (
        permute_append,
        permute_append_sharded,
    )

    dec = params["decoder"]
    n_head = dims.n_text_head
    bk = token.shape[0]
    pos = jnp.asarray(pos, jnp.int32)
    pos_emb = jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos, 1, axis=0)
    x = layers.embed(dec["tok_emb"], token[:, None]) + pos_emb
    x = x.astype(compute_dtype)
    ctx = cache["k"].shape[3]
    hd = dims.n_text_state
    dh = hd // n_head
    # Causal mask [1, 1, ctx] for the head-major scores [BK, H, ctx].
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ctx), 2)
    mask = jnp.where(k_pos <= pos, 0.0, NEG_INF)  # f32
    # Block-diagonal head fold: scores/weights stay in the cache's MERGED
    # [.., ctx, H*Dh] layout end-to-end, so the plane slice fuses into an
    # elementwise read + two big XLA matmuls instead of H tiny batched
    # ones. Measured (tools/probe_fused.py PROBE_MODE=hybrid2, large-v3
    # beam=5 b16 fp8): permute+append+attend ≈ 10.6 ms/step net vs 20.5
    # for the eager one-hot reorder + per-head einsum — and the slice
    # never materializes a copy (the naive slice+reshape+qkv path cost
    # +24 ms/step).
    bd = (
        jnp.arange(hd)[:, None] // dh == jnp.arange(n_head)[None]
    ).astype(compute_dtype)  # [HD, H]
    et = (
        jnp.arange(n_head)[:, None] == jnp.arange(hd)[None] // dh
    ).astype(jnp.float32)  # [H, HD] — diagonal-block extraction fold
    scale = float(dh) ** -0.5
    plane = 1 - jnp.asarray(parity, jnp.int32)

    def block(carry, xs):
        h, ck, cv = carry
        layer, bp, xk_l, xv_l = xs

        hn = layers.layer_norm(bp["ln1"], h)
        q = layers.linear(bp["attn"]["q"], hn)[:, 0, :]
        k_new = layers.linear(bp["attn"]["k"], hn)[:, 0, :]
        v_new = layers.linear(bp["attn"]["v"], hn)[:, 0, :]
        if mesh is not None:
            ck, cv = permute_append_sharded(
                ck, cv, pending_idx, layer, pos, parity, k_new, v_new,
                mesh=mesh, data_axis=data_axis, beam=max(beam_width, 1),
                interpret=interpret,
            )
        else:
            ck, cv = permute_append(
                ck, cv, pending_idx, layer, pos, parity, k_new, v_new,
                interpret=interpret,
            )
        # Blockdiag XLA attention over the permuted plane, merged layout.
        k2d = jax.lax.dynamic_index_in_dim(
            jax.lax.dynamic_index_in_dim(ck, plane, 0, keepdims=False),
            layer, 0, keepdims=False,
        )  # [BK, ctx, HD]
        v2d = jax.lax.dynamic_index_in_dim(
            jax.lax.dynamic_index_in_dim(cv, plane, 0, keepdims=False),
            layer, 0, keepdims=False,
        )
        kq = k2d.astype(compute_dtype) * q[:, None, :]
        # Scores head-major ([BK, H, ctx]): the dot's output transpose
        # folds into the matmul and the softmax'd weights feed the value
        # contraction directly — no w_exp blockdiag expansion. The r4-v1
        # w_exp path materialized a [BK, ctx, HD] expansion per layer
        # (~104 MB write+read at large-v3 b16 beam5 ⇒ ~3.3 GB/step of
        # avoidable traffic); this batched-dot value path measured 8.87 vs
        # 9.49 ms/step for the attention read at ctx 256 (/tmp/probe_lin
        # r4 variants G→H, PERF.md table).
        scores = (
            jnp.einsum(
                "bcj,jh->bhc", kq, bd, preferred_element_type=jnp.float32
            )
            * scale
            + mask
        )
        w = jax.nn.softmax(scores, axis=-1)  # f32, over ctx
        vout = jax.lax.dot_general(
            w.astype(compute_dtype), v2d.astype(compute_dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [BK, H, HD]; head h's true output lives in lanes h*dh..(h+1)*dh
        attn = jnp.sum(vout * et[None], axis=1).astype(compute_dtype)
        h = h + layers.linear(bp["attn"]["o"], attn[:, None, :])

        hn = layers.layer_norm(bp["ln2"], h)
        qx = layers.split_heads(layers.linear(bp["cross"]["q"], hn), n_head)
        if beam_width > 1:
            dhx = qx.shape[-1]
            qx = qx.reshape(bk // beam_width, beam_width, n_head, dhx)
            cross_out = layers.cross_attention_T(qx, xk_l, xv_l)
            cross_out = cross_out.reshape(bk, 1, n_head, dhx)
        else:
            cross_out = layers.cross_attention_T(qx, xk_l, xv_l)
        h = h + layers.linear(bp["cross"]["o"], layers.merge_heads(cross_out))

        h = h + layers.mlp(bp["mlp"], layers.layer_norm(bp["ln3"], h))
        return (h, ck, cv), None

    n_layer = dims.n_text_layer
    xs = (
        jnp.arange(n_layer, dtype=jnp.int32),
        dec["blocks"],
        cross_kv["k"],
        cross_kv["v"],
    )
    (x, new_k, new_v), _ = jax.lax.scan(
        block, (x, cache["k"], cache["v"]), xs
    )
    x = layers.layer_norm(dec["ln"], x)
    logits = layers.unembed(dec["tok_emb"], x)
    return logits[:, 0, :], {"k": new_k, "v": new_v}


def init_lineage(b: int, beam: int, ctx: int, p_len: int) -> jnp.ndarray:
    """[B*K, ctx] int32 slot-ancestry table for the lineage decode step
    (:func:`decoder_step_lineage`).

    Entry [r, t] = index (0..K-1) of the cache slot *within r's utterance*
    whose row holds position t's K/V on r's ancestry path; -1 marks an
    unwritten position (it matches no slot, so the lineage mask removes it).
    Prefill positions point at the row's own slot — the prefill fan-out
    wrote identical copies into every slot."""
    own = (jnp.arange(b * beam, dtype=jnp.int32) % beam)[:, None]
    written = jnp.arange(ctx, dtype=jnp.int32)[None, :] < p_len
    return jnp.where(written, own, jnp.int32(-1))


def grow_lineage(lineage: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """Segment-growth pad for the lineage table: new positions are -1
    (unwritten)."""
    cur = lineage.shape[1]
    if new_len <= cur:
        return lineage
    return jnp.pad(
        lineage, [(0, 0), (0, new_len - cur)], constant_values=-1
    )


def decoder_step_lineage(
    params: Params,
    token: jnp.ndarray,  # [B*K] int32 — token at absolute position `pos`
    pos: jnp.ndarray,  # scalar int32
    cache: KVCache,  # {"k"/"v": [L, B*K, ctx, H, Dh]} — slot-stationary
    lineage: jnp.ndarray,  # [B*K, ctx] int32 (see init_lineage)
    cross_kv: KVCache,
    dims: ModelDims,
    compute_dtype=jnp.float32,
    beam_width: int = 1,
) -> Tuple[jnp.ndarray, KVCache, jnp.ndarray]:
    """One beam decode step with the beam permutation VIRTUALIZED into a
    mask — the cache never moves at all.

    The hybrid fused step (decoder_step_fused) still pays two physical
    window streams per step for the pending beam permutation (the DMA
    kernel's gather read + write-back) on top of the attention read. But a
    beam reorder is pure bookkeeping: which *slot* holds each position's
    K/V on a hypothesis' ancestry path. So keep every row slot-stationary —
    logical beam r always writes position pos into its own slot — and track
    ancestry in a tiny [B*K, ctx] int32 ``lineage`` table. The beam
    reshuffle becomes an 80 KB gather of lineage rows instead of a
    multi-GB cache permute.

    Attention then runs DENSE over all K slots' rows — queries [B, K, H,
    Dh] against keys [B, K*ctx, H, Dh] (a free reshape of the cache) —
    with an additive bias that is 0 where ``lineage[r, t] == s`` and -1e30
    elsewhere. Exactly the bytes of a single per-beam cache read (each
    physical row streams once, shared by the utterance's K queries inside
    one matmul), and the masked entries contribute exp(-1e30-m) == 0.0 in
    f32 — the surviving scores are the permuted path's scores. Per step
    the self-attention window moves 1x instead of the hybrid step's 3x,
    there is no ping-pong plane pair (half the cache memory), and the whole
    step is plain XLA — no Pallas, so it runs identically on CPU.

    The K-fold FLOP increase of dense-over-slots scores is noise: decode
    attention is HBM-bound (scores are [K, Dh] x [Dh, K*ctx] per (b, h) —
    ~17 GFLOP/step at large-v3 beam=5 batch=16 vs a ~200 TFLOP/s MXU).

    Reference match: replaces the decode hot loop the reference re-runs
    O(n^2) through its interpreter (whisper.cpp:363-399); the lineage table
    plays the role TFLite's tensor indices can't — beam search itself is
    net-new vs the reference (SURVEY.md §2b beam parallelism).

    Returns (logits [B*K, V] f32, cache, lineage) — cache updated in place
    (new rows only), lineage with position ``pos`` set to each row's own
    slot. The caller applies the step's beam reshuffle to ``lineage`` (a
    row gather), never to ``cache``.
    """
    dec = params["decoder"]
    n_head = dims.n_text_head
    bk = token.shape[0]
    kw = beam_width
    b = bk // kw
    pos = jnp.asarray(pos, jnp.int32)
    ctx = cache["k"].shape[2]
    dh = dims.n_text_state // n_head

    pos_emb = jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos, 1, axis=0)
    x = layers.embed(dec["tok_emb"], token[:, None]) + pos_emb
    x = x.astype(compute_dtype)

    # This step's K/V rows land in each logical row's own slot.
    own = jnp.arange(bk, dtype=jnp.int32) % kw
    lineage = jax.lax.dynamic_update_slice(lineage, own[:, None], (0, pos))

    # Lineage bias over the flattened (slot, position) key axis, computed
    # ONCE per step and shared by every layer: [B, 1, K, K*ctx], 0 where
    # row r's ancestry holds position t in slot s (incl. this step's own
    # row, just written), NEG_INF elsewhere (incl. unwritten rows: lineage
    # -1 matches no slot, which also subsumes the causal mask).
    slot = jnp.arange(kw, dtype=jnp.int32)
    lin3 = lineage.reshape(b, kw, ctx)
    bias = jnp.where(
        lin3[:, :, None, :] == slot[None, None, :, None], 0.0, NEG_INF
    ).astype(jnp.float32)  # [B, K, K_slot, ctx]
    bias = bias.reshape(b, kw, kw * ctx)[:, None]  # [B, 1, K, K*ctx]

    def block(carry, xs):
        h, cache_k, cache_v = carry
        layer, bp, xk_l, xv_l = xs

        # --- self-attention: slot-stationary write, dense masked read ---
        hn = layers.layer_norm(bp["ln1"], h)
        q = layers.split_heads(layers.linear(bp["attn"]["q"], hn), n_head)
        k_new = layers.split_heads(layers.linear(bp["attn"]["k"], hn), n_head)
        v_new = layers.split_heads(layers.linear(bp["attn"]["v"], hn), n_head)
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k_new.astype(cache_k.dtype)[None], (layer, 0, pos, 0, 0)
        )
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v_new.astype(cache_v.dtype)[None], (layer, 0, pos, 0, 0)
        )
        kf = jax.lax.dynamic_index_in_dim(
            cache_k, layer, 0, keepdims=False
        )  # [BK, ctx, H, Dh]
        vf = jax.lax.dynamic_index_in_dim(cache_v, layer, 0, keepdims=False)
        # [BK, ctx, ...] → [B, K*ctx, ...]: slots fold into the key axis —
        # a bitcast-free reshape (slot-major, position-minor, matching the
        # bias flatten above).
        k4 = kf.reshape(b, kw * ctx, n_head, dh)
        v4 = vf.reshape(b, kw * ctx, n_head, dh)
        q4 = q.reshape(b, kw, n_head, dh)
        attn = layers.qkv_attention(q4, k4, v4, bias)  # [B, K, H, Dh]
        attn = attn.reshape(bk, 1, n_head, dh)
        h = h + layers.linear(bp["attn"]["o"], layers.merge_heads(attn))

        # --- cross-attention: beams share one per-utterance cross-KV ---
        hn = layers.layer_norm(bp["ln2"], h)
        qx = layers.split_heads(layers.linear(bp["cross"]["q"], hn), n_head)
        if kw > 1:
            qx = qx.reshape(b, kw, n_head, dh)
            cross_out = layers.cross_attention_T(qx, xk_l, xv_l)
            cross_out = cross_out.reshape(bk, 1, n_head, dh)
        else:
            cross_out = layers.cross_attention_T(qx, xk_l, xv_l)
        h = h + layers.linear(bp["cross"]["o"], layers.merge_heads(cross_out))

        h = h + layers.mlp(bp["mlp"], layers.layer_norm(bp["ln3"], h))
        return (h, cache_k, cache_v), None

    n_layer = dims.n_text_layer
    xs = (
        jnp.arange(n_layer, dtype=jnp.int32),
        dec["blocks"],
        cross_kv["k"],
        cross_kv["v"],
    )
    (x, new_k, new_v), _ = jax.lax.scan(
        block, (x, cache["k"], cache["v"]), xs
    )
    x = layers.layer_norm(dec["ln"], x)
    logits = layers.unembed(dec["tok_emb"], x)
    return logits[:, 0, :], {"k": new_k, "v": new_v}, lineage


def decoder_window(
    params: Params,
    tokens: jnp.ndarray,  # [B, T] int32 — T consecutive tokens per row
    pos: jnp.ndarray,  # [B] int32 — absolute position of tokens[:, 0]
    cache: KVCache,
    cross_kv: KVCache,
    dims: ModelDims,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, KVCache]:
    """Multi-token forward at PER-ROW absolute positions — the speculative
    verify pass (decode/speculative.py): one target forward scores a whole
    window of draft proposals, writing their K/V rows in place. Returns
    (logits [B, T, V], cache). Row b's window covers positions
    pos[b]..pos[b]+T-1; the caller guarantees pos[b]+T <= cache length."""
    return _decoder_forward(
        params, tokens, pos, cache, cross_kv, dims, compute_dtype
    )


def decoder_prefill(
    params: Params,
    prompt: jnp.ndarray,  # [B, P]
    cache: KVCache,
    cross_kv: KVCache,
    dims: ModelDims,
    compute_dtype=jnp.float32,
    ctx_limit: int | None = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Run the static prompt through the decoder once, filling cache[0:P].
    Returns (logits [B, P, V], cache)."""
    return _decoder_forward(
        params, prompt, jnp.int32(0), cache, cross_kv, dims, compute_dtype,
        ctx_limit=ctx_limit,
    )


def decoder_step(
    params: Params,
    token: jnp.ndarray,  # [B] int32 — token at absolute position `pos`
    pos: jnp.ndarray,  # scalar int32, or [B] int32 for per-slot positions
    cache: KVCache,
    cross_kv: KVCache,
    dims: ModelDims,
    compute_dtype=jnp.float32,
    beam_width: int = 1,
    ctx_limit: int | None = None,
    merged_read: bool = False,
) -> Tuple[jnp.ndarray, KVCache]:
    """One autoregressive step. Returns (logits [B, V], updated cache).

    ``beam_width=K``: token/cache batch axis is [B*K] while cross_kv stays at
    B — beams share one cross-KV read (see _decoder_forward).
    ``ctx_limit`` (static): see _decoder_forward — requires pos < ctx_limit.
    ``merged_read``: blockdiag merged-layout cache read (see
    _decoder_forward; resolve via :func:`resolve_merged_read`)."""
    logits, cache = _decoder_forward(
        params, token[:, None], pos, cache, cross_kv, dims, compute_dtype,
        beam_width=beam_width, ctx_limit=ctx_limit, merged_read=merged_read,
    )
    return logits[:, 0, :], cache


def resolve_merged_read(merged, dims: ModelDims) -> bool:
    """"auto" → the EAGER per-head read everywhere — a measured negative
    result (r5, VERDICT r4 next-#5): the blockdiag merged-layout read that
    wins 1.28× inside the hybrid BEAM step LOSES 1.35× on greedy decode
    (large-v3 b16 greedy A/B on TPU v5e: 232.2 eager vs 156.6 merged
    audio-s/s end-to-end; serialized 2.50 vs 3.39 s/batch,
    benchmarks/greedy_merged_read_r05.json). The beam win rides the plane
    cache's pre-merged [BK, ctx, H*Dh] layout and the K-folded query rows;
    at greedy shapes (B instead of B*K rows) the H-fold FLOP pad and the
    kq materialization outweigh the batched-einsum cost they replace. The
    formulation stays in-tree, parity-pinned (tests/test_model.py
    TestMergedRead), selectable per call or via the env knob.

    ``WHISPER_TPU_MERGED_READ`` ∈ {on, off} overrides "auto" — the A/B knob
    behind the artifact."""
    if merged != "auto":
        return bool(merged)
    import os

    env = os.environ.get("WHISPER_TPU_MERGED_READ", "")
    if env in ("on", "off"):
        return env == "on"
    return False
