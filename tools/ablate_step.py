"""Micro-ablation of one decode step's components at exact large-v3 shapes:
times each HBM stream in isolation (cross-KV attention, self-cache
attention+update, weight matmuls, unembed, selection, beam cache reorder) so
the gap between the measured step and the analytic roofline can be
attributed.

Measurement method: every component runs ITERS times inside ONE jit program
via lax.fori_loop with a data dependence between iterations, and the program
returns a scalar reduction that is fetched to host. This is mandatory on the
tunneled TPU backend: per-dispatch RPC latency is ~25 ms and
block_until_ready under-blocks, so single-dispatch timings measure the
tunnel, not the chip.

Usage: python tools/ablate_step.py [model] [batch] [beam]
Env:   ABLATE_KV=bfloat16|float8_e4m3fn (cache dtypes, default bfloat16)
       ABLATE_ITERS=16
       ABLATE_QUANT=int8  (also time the weight/unembed streams against
       int8-quantized params — if the int8 timing is no better than bf16
       at decode shapes, the dequant is NOT fusing into the matmul operand
       load and is materializing bf16 copies)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import MODEL_DIMS
from whisper_tpu.models import layers
from whisper_tpu.models.params import init_params

MODEL = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
BEAM = int(sys.argv[3]) if len(sys.argv) > 3 else 1
KV = jnp.dtype(os.environ.get("ABLATE_KV", "bfloat16"))
ITERS = int(os.environ.get("ABLATE_ITERS", "16"))

dims = MODEL_DIMS[MODEL]
L, H = dims.n_text_layer, dims.n_text_head
D = dims.n_text_state
DH = D // H
TK = dims.n_audio_ctx
CTX = 228
BK = BATCH * BEAM
key = jax.random.PRNGKey(0)


def timed(name, init, step, consts=(), per_iter_gb=None, repeats=3):
    """step(carry, i, *consts) -> carry (same pytree); device-loops ITERS
    times. Big read-only operands (caches, weights) MUST go through
    ``consts`` — closure capture would embed them as HLO constants, and the
    tunneled backend ships the full serialized program to a remote compiler
    (a multi-GB body → HTTP 413)."""

    @jax.jit
    def run(c, cs):
        c = jax.lax.fori_loop(0, ITERS, lambda i, c: step(c, i, *cs), c)
        return sum(
            l.astype(jnp.float32).ravel()[0] for l in jax.tree.leaves(c)
        )

    float(run(init, consts))  # compile + sync via scalar host transfer
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(init, consts))
        ts.append(time.perf_counter() - t0)
    per_iter_ms = min(ts) / ITERS * 1e3
    bw = (
        f"  ({per_iter_gb / (min(ts) / ITERS):6.0f} GB/s)"
        if per_iter_gb
        else ""
    )
    print(f"{name:40s} {per_iter_ms:9.3f} ms/iter{bw}", flush=True)


print(f"model={MODEL} batch={BATCH} beam={BEAM} kv={KV} iters={ITERS}")

# --- cross-attention stream: q [BK,1,H,DH] vs kT/vT [L,B,H,DH,TK] -----------
xk = jax.random.normal(key, (L, BATCH, H, DH, TK), jnp.bfloat16).astype(KV)
xv = jax.random.normal(key, (L, BATCH, H, DH, TK), jnp.bfloat16).astype(KV)
q0 = jax.random.normal(key, (BK, 1, H, DH), jnp.bfloat16)
cross_gb = 2 * np.prod(xk.shape) * xk.dtype.itemsize / 1e9


def cross_step(qc, i, xk, xv):
    def one(h, xs):
        k_l, v_l = xs
        if BEAM > 1:
            qg = h.reshape(BATCH, BEAM, H, DH)
            o = layers.cross_attention_T(qg, k_l, v_l).reshape(BK, 1, H, DH)
        else:
            o = layers.cross_attention_T(h, k_l, v_l)
        return o.astype(h.dtype), None

    out, _ = jax.lax.scan(one, qc, (xk, xv))
    return out


timed(f"cross-attn x{L} (read {cross_gb:.2f} GB)", q0, cross_step,
      consts=(xk, xv), per_iter_gb=cross_gb)

# --- self-attention cache stream + update -----------------------------------
ck = jax.random.normal(key, (L, BK, CTX, H, DH), jnp.bfloat16).astype(KV)
cv = jax.random.normal(key, (L, BK, CTX, H, DH), jnp.bfloat16).astype(KV)
cache_gb = 2 * np.prod(ck.shape) * ck.dtype.itemsize / 1e9
mask = jnp.zeros((1, CTX), jnp.bfloat16)


def self_step(carry, i):
    """Models models/decoder.py's carry structure: the FULL cache rides the
    scan carry, each layer writes its new rows in place (DUS) and reads its
    own slice (DS) — XLA aliases carried buffers, so the step's cache
    traffic is one read + one row write, not a full rewrite."""
    qc, ck, cv = carry

    def one(inner, l):
        h, ck, cv = inner
        ck = jax.lax.dynamic_update_slice(
            ck, h[None].astype(ck.dtype), (l, 0, 100, 0, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv, h[None].astype(cv.dtype), (l, 0, 100, 0, 0)
        )
        k_l = jax.lax.dynamic_index_in_dim(ck, l, 0, keepdims=False)
        v_l = jax.lax.dynamic_index_in_dim(cv, l, 0, keepdims=False)
        o = layers.qkv_attention(h, k_l, v_l, mask)
        return (o.astype(h.dtype), ck, cv), None

    (out, ck, cv), _ = jax.lax.scan(
        one, (qc, ck, cv), jnp.arange(L, dtype=jnp.int32)
    )
    return (out, ck, cv)


timed(f"self-attn+update x{L} carried (read {cache_gb:.2f} GB)",
      (q0, ck, cv), self_step, per_iter_gb=cache_gb)

# --- weight matmul stream ----------------------------------------------------
params = init_params(dims, key, dtype=jnp.bfloat16)
dec_blocks = params["decoder"]["blocks"]
dec_gb = sum(
    np.prod(x.shape) * x.dtype.itemsize for x in jax.tree.leaves(dec_blocks)
) / 1e9
x0 = jax.random.normal(key, (BK, 1, D), jnp.bfloat16)


def weights_step(xc, i, dec_blocks):
    def one(h, bp):
        h = layers.linear(bp["attn"]["q"], h)
        h = layers.linear(bp["attn"]["k"], h)
        h = layers.linear(bp["attn"]["v"], h)
        h = layers.linear(bp["attn"]["o"], h)
        h = layers.linear(bp["cross"]["q"], h)
        h = layers.linear(bp["cross"]["o"], h)
        h = layers.mlp(bp["mlp"], h)
        return jnp.tanh(h).astype(xc.dtype), None

    out, _ = jax.lax.scan(one, xc, dec_blocks)
    return out


timed(f"weight matmuls x{L} ({dec_gb:.2f} GB)", x0, weights_step,
      consts=(dec_blocks,), per_iter_gb=dec_gb)

if os.environ.get("ABLATE_QUANT") == "int8":
    from whisper_tpu.models.quantize import quantize_params

    qparams = quantize_params(params)
    qdec_blocks = qparams["decoder"]["blocks"]
    qdec_gb = sum(
        np.prod(x.shape) * x.dtype.itemsize
        for x in jax.tree.leaves(qdec_blocks)
    ) / 1e9
    timed(f"weight matmuls x{L} int8 ({qdec_gb:.2f} GB)", x0, weights_step,
          consts=(qdec_blocks,), per_iter_gb=qdec_gb)

# --- unembed ------------------------------------------------------------------
emb = params["decoder"]["tok_emb"]
emb_gb = np.prod(emb.shape) * emb.dtype.itemsize / 1e9
u0 = jax.random.normal(key, (BK, D), jnp.bfloat16)


def unembed_step(xc, i, emb):
    lg = layers.unembed(emb, xc)
    return jnp.tanh(lg[:, :D]).astype(xc.dtype)


timed(f"unembed ({emb_gb:.2f} GB)", u0, unembed_step, consts=(emb,),
      per_iter_gb=emb_gb)

# --- selection over the vocab --------------------------------------------------
lg0 = jax.random.normal(key, (BK, dims.n_vocab), jnp.float32)
from whisper_tpu.decode.greedy import argmax_last  # noqa: E402


def argmax_step(lg, i):
    idx = argmax_last(lg)
    return lg.at[:, 0].add(1e-9 * jnp.sum(idx).astype(jnp.float32))


timed("argmax_last", lg0, argmax_step)


def softmax_step(lg, i):
    lp = jax.nn.log_softmax(lg, axis=-1)
    return lg.at[:, 0].add(1e-9 * lp[0, 0])


timed("log_softmax", lg0, softmax_step)

if BEAM > 1:
    from whisper_tpu.decode.beam import reorder_cache, topk_wide  # noqa: E402

    def topk_step(lg, i):
        vals, idx = topk_wide(lg, BEAM + 1)
        return lg.at[:, 0].add(1e-9 * jnp.sum(idx).astype(jnp.float32))

    timed(f"topk_wide(k={BEAM + 1})", lg0, topk_step)

    def laxtopk_step(lg, i):
        vals, idx = jax.lax.top_k(lg, BEAM + 1)
        return lg.at[:, 0].add(1e-9 * jnp.sum(idx).astype(jnp.float32))

    timed(f"lax.top_k(k={BEAM + 1})", lg0, laxtopk_step)

    cache0 = {"k": ck, "v": cv}
    rot = (jnp.arange(BK, dtype=jnp.int32) + 1) % BK

    def take_step(c, i):
        return {n: jnp.take(v, rot, axis=1) for n, v in c.items()}

    timed(f"cache reorder: jnp.take (r+w {2 * cache_gb:.2f} GB)", cache0,
          take_step, per_iter_gb=2 * cache_gb)

    def onehot_step(c, i):
        return reorder_cache(c, rot, BK)

    timed("cache reorder: one-hot matmul", cache0, onehot_step,
          per_iter_gb=2 * cache_gb)

    if KV.itemsize == 1:
        # Permutation as int8 one-hot matmul on the fp8 cache BITCAST to
        # int8: a one-hot row picks one stored byte per output and int32
        # accumulation is exact, so the permuted bytes round-trip — no
        # fp8->bf16 operand conversion, and int8 MXU throughput is 2x bf16.
        def onehot_i8_step(c, i):
            perm = jax.nn.one_hot(rot, BK, dtype=jnp.int8)

            def apply(x):
                xi = jax.lax.bitcast_convert_type(x, jnp.int8)
                y = jnp.einsum(
                    "nj,ljthd->lnthd", perm, xi,
                    preferred_element_type=jnp.int32,
                )
                return jax.lax.bitcast_convert_type(
                    y.astype(jnp.int8), x.dtype
                )

            return {n: apply(v) for n, v in c.items()}

        timed("cache reorder: int8-bitcast matmul", cache0, onehot_i8_step,
              per_iter_gb=2 * cache_gb)

    from whisper_tpu.ops import gather as _gather

    if _gather.supported(ck.shape):

        def pallas_step(c, i):
            return {n: _gather.permute_rows(v, rot) for n, v in c.items()}

        timed("cache reorder: pallas grouped DMA", cache0, pallas_step,
              per_iter_gb=2 * cache_gb)

# --- self-attention, T-layout cache [L, BK, H, DH, CTX] ----------------------
ckT = jax.random.normal(key, (L, BK, H, DH, CTX), jnp.bfloat16).astype(KV)
cvT = jax.random.normal(key, (L, BK, H, DH, CTX), jnp.bfloat16).astype(KV)
maskT = jnp.zeros((1, 1, 1, CTX), jnp.float32)


def self_T_step(carry, i):
    qc, ckT, cvT = carry

    def one(inner, l):
        h, ckT, cvT = inner
        new = h[:, 0].reshape(BK, H, DH)[None, :, :, :, None]  # [1,BK,H,DH,1]
        ckT = jax.lax.dynamic_update_slice(
            ckT, new.astype(ckT.dtype), (l, 0, 0, 0, 100)
        )
        cvT = jax.lax.dynamic_update_slice(
            cvT, new.astype(cvT.dtype), (l, 0, 0, 0, 100)
        )
        kT = jax.lax.dynamic_index_in_dim(ckT, l, 0, keepdims=False)
        vT = jax.lax.dynamic_index_in_dim(cvT, l, 0, keepdims=False)
        if kT.dtype.itemsize == 1:
            kT = kT.astype(h.dtype)
        uvT = vT.astype(h.dtype) if vT.dtype.itemsize == 1 else vT
        qt = jnp.swapaxes(h, 1, 2)  # [BK, H, 1, DH]
        scores = jnp.einsum(
            "bhqd,bhdk->bhqk", qt, kT, preferred_element_type=jnp.float32
        ) * (1.0 / float(DH) ** 0.5)
        w = jax.nn.softmax(scores + maskT, axis=-1)
        o = jnp.einsum(
            "bhqk,bhdk->bhqd", w.astype(uvT.dtype), uvT,
            preferred_element_type=jnp.float32,
        )
        o = jnp.swapaxes(o, 1, 2).astype(h.dtype)  # [BK, 1, H, DH]
        return (o, ckT, cvT), None

    (out, ckT, cvT), _ = jax.lax.scan(
        one, (qc, ckT, cvT), jnp.arange(L, dtype=jnp.int32)
    )
    return (out, ckT, cvT)


timed(f"self-attn+update x{L} T-layout (read {cache_gb:.2f} GB)",
      (q0, ckT, cvT), self_T_step, per_iter_gb=cache_gb)

# --- fused gather+append+attend kernel (ops/fused_step.py) -------------------
# Replaces BOTH the beam reorder stream and the self-attention read: per
# layer, rows gather through the pending permutation into VMEM, append, write
# to the opposite plane, and attend. Compare against the sum of
# "self-attn+update" and the best "cache reorder" rows above.
from whisper_tpu.ops import fused_step as _fused  # noqa: E402

_interp = jax.default_backend() != "tpu"
if BEAM > 1 and _fused.supported(D, _interp):
    CTXP = -(-CTX // 64) * 64  # tile-aligned physical window
    pk = jax.random.normal(
        key, (2, L, BK, CTXP, D), jnp.bfloat16
    ).astype(KV)
    pv = jax.random.normal(
        key, (2, L, BK, CTXP, D), jnp.bfloat16
    ).astype(KV)
    fq0 = jax.random.normal(key, (BK, D), jnp.bfloat16)
    fused_gb = 2 * 2 * L * BK * CTXP * D * pk.dtype.itemsize / 1e9  # r+w, k+v

    def fused_step(carry, i, rot):
        h, pk, pv = carry
        par = jax.lax.rem(i, 2)

        def one(inner, l):
            hh, pk, pv = inner
            attn, pk, pv = _fused.fused_gather_attend(
                pk, pv, rot, l, jnp.int32(CTXP - 1), par, hh, hh, hh,
                n_head=H, interpret=_interp,
            )
            return (jnp.tanh(attn).astype(hh.dtype), pk, pv), None

        (h, pk, pv), _ = jax.lax.scan(
            one, (h, pk, pv), jnp.arange(L, dtype=jnp.int32)
        )
        return (h, pk, pv)

    timed(
        f"fused permute+append+attend x{L} (r+w {fused_gb:.2f} GB)",
        (fq0, pk, pv), fused_step, consts=(rot,), per_iter_gb=fused_gb,
    )
