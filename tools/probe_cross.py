"""Cross-attention formulation probe (VERDICT r4 next-#1b).

Isolates the decode step's cross-attention stream at north-star shapes
(large-v3, B=16, K=5 folded queries, Tk=1500, fp8 storage) in a
hoist-proof device loop (serial dependence through q; the cache operand
feeds every layer of a lax.scan — nothing is loop-invariant).

Formulations (PROBE_X):
  prod      cross_attention_T on fp8 storage (production baseline)
  bf16      cross_attention_T on bf16 storage (2x bytes, no upcast)
  stage     bf16-upcast-once staging: materialize the layer's K/V as bf16
            (optimization-barriered so XLA cannot re-fuse it into the
            matmul operand load), then cross_attention_T on the staged
            copy — the r4 verdict's asked-for probe (b). Traffic: fp8
            read + bf16 write + bf16 read = 3x the production bytes.
  dmastage  Pallas grouped-DMA kernel streams the fp8 plane through VMEM,
            upcasts on the VPU, writes a bf16 HBM scratch; XLA matmuls
            read the scratch — the verdict's asked-for probe (a), the
            "hybrid split that won for self-attn". Same 3x traffic as
            `stage` but the fp8 read + upcast rides the DMA engines.
  chunk     flash-style two-chunk XLA: Tk split in halves with online
            max/sum merge — same bytes, tests whether smaller batched
            matmul operands stream faster.

Usage: PROBE_X=prod python tools/probe_cross.py [model] [batch] [beam]
Env:   PROBE_KV (float8_e4m3fn) PROBE_ITERS (16) PROBE_TK (1500)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import MODEL_DIMS
from whisper_tpu.models import layers

MODEL = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
BEAM = int(sys.argv[3]) if len(sys.argv) > 3 else 5
KV = jnp.dtype(os.environ.get("PROBE_KV", "float8_e4m3fn"))
ITERS = int(os.environ.get("PROBE_ITERS", "16"))
TK = int(os.environ.get("PROBE_TK", "1500"))
MODE = os.environ.get("PROBE_X", "prod")

dims = MODEL_DIMS[MODEL]
L, H, D = dims.n_text_layer, dims.n_text_head, dims.n_text_state
DH = D // H
key = jax.random.PRNGKey(0)

store = jnp.bfloat16 if MODE == "bf16" else KV
xk = jax.random.normal(key, (L, BATCH, H, DH, TK), jnp.bfloat16).astype(store)
xv = jax.random.normal(key, (L, BATCH, H, DH, TK), jnp.bfloat16).astype(store)
q0 = jax.random.normal(key, (BATCH, BEAM, H, DH), jnp.bfloat16)
gb = 2 * L * BATCH * H * DH * TK * jnp.dtype(store).itemsize / 1e9  # k+v read


def _dma_upcast_kernel(
    src_ref, dst_ref, buf, obuf, sems, osems, *, rows, chunk
):
    """Stream [rows, TK] fp8 → bf16 via VMEM, double-buffered in and out."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(
            src_ref.at[pl.ds(0, chunk)], buf.at[0], sems.at[0]
        ).start()

    @pl.when(i + 1 < n)
    def _():
        pltpu.make_async_copy(
            src_ref.at[pl.ds((i + 1) * chunk, chunk)],
            buf.at[1 - slot],
            sems.at[1 - slot],
        ).start()

    pltpu.make_async_copy(
        src_ref.at[pl.ds(i * chunk, chunk)], buf.at[slot], sems.at[slot]
    ).wait()

    @pl.when(i >= 2)
    def _():  # reclaim this slot's previous out-DMA
        pltpu.make_async_copy(
            obuf.at[slot], dst_ref.at[pl.ds((i - 2) * chunk, chunk)],
            osems.at[slot],
        ).wait()

    obuf[slot] = buf[slot].astype(jnp.bfloat16)
    out = pltpu.make_async_copy(
        obuf.at[slot], dst_ref.at[pl.ds(i * chunk, chunk)], osems.at[slot]
    )
    out.start()

    @pl.when(i == n - 1)
    def _():
        out.wait()

        @pl.when(n >= 2)
        def _():
            pltpu.make_async_copy(
                obuf.at[1 - slot],
                dst_ref.at[pl.ds((i - 1) * chunk, chunk)],
                osems.at[1 - slot],
            ).wait()


if MODE == "dmastage":
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def dma_upcast(x2d):  # [R, TK] fp8 → bf16 through VMEM
        rows = x2d.shape[0]
        chunk = 64
        while rows % chunk:
            chunk //= 2
        return pl.pallas_call(
            functools.partial(
                _dma_upcast_kernel, rows=rows, chunk=chunk
            ),
            grid=(rows // chunk,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((rows, TK), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((2, chunk, TK), x2d.dtype),
                pltpu.VMEM((2, chunk, TK), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(x2d)


def cross_chunked(q, kT, vT, n_chunks=2):
    """Flash-style split over Tk with online max/sum merge (f32 exact up
    to reassociation)."""
    dh = q.shape[-1]
    qt = jnp.swapaxes(q, 1, 2)  # [B, H, Tq, Dh]
    tk = kT.shape[-1]
    cs = tk // n_chunks
    outs, ms, ls = [], [], []
    for c in range(n_chunks):
        kc = jax.lax.dynamic_slice_in_dim(kT, c * cs, cs, axis=3)
        vc = jax.lax.dynamic_slice_in_dim(vT, c * cs, cs, axis=3)
        if kc.dtype.itemsize == 1:
            kc = kc.astype(q.dtype)
        if vc.dtype.itemsize == 1:
            vc = vc.astype(q.dtype)
        s = jnp.einsum(
            "bhqd,bhdk->bhqk", qt, kc, preferred_element_type=jnp.float32
        ) * (1.0 / float(dh) ** 0.5)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum(
            "bhqk,bhdk->bhqd",
            p.astype(vc.dtype),
            vc,
            preferred_element_type=jnp.float32,
        )
        outs.append(o)
        ms.append(m)
        ls.append(l)
    m_all = functools.reduce(jnp.maximum, ms)
    num = sum(o * jnp.exp(m - m_all) for o, m in zip(outs, ms))
    den = sum(l * jnp.exp(m - m_all) for l, m in zip(ls, ms))
    out = num / den
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


@jax.jit
def run(q0, xk, xv):
    def step(i, q):
        def one(q, xs):
            xk_l, xv_l = xs
            if MODE in ("prod", "bf16"):
                out = layers.cross_attention_T(q, xk_l, xv_l)
            elif MODE == "stage":
                k_st = jax.lax.optimization_barrier(
                    xk_l.astype(jnp.bfloat16)
                )
                v_st = jax.lax.optimization_barrier(
                    xv_l.astype(jnp.bfloat16)
                )
                out = layers.cross_attention_T(q, k_st, v_st)
            elif MODE == "dmastage":
                k_st = dma_upcast(
                    xk_l.reshape(BATCH * H * DH, TK)
                ).reshape(BATCH, H, DH, TK)
                v_st = dma_upcast(
                    xv_l.reshape(BATCH * H * DH, TK)
                ).reshape(BATCH, H, DH, TK)
                out = layers.cross_attention_T(q, k_st, v_st)
            elif MODE == "chunk":
                out = cross_chunked(q, xk_l, xv_l)
            else:
                raise ValueError(MODE)
            return jnp.tanh(out).astype(q.dtype), None

        q, _ = jax.lax.scan(one, q, (xk, xv))
        return q

    q = jax.lax.fori_loop(0, ITERS, step, q0)
    return q.astype(jnp.float32).ravel()[0]


print(
    f"mode={MODE} model={MODEL} b={BATCH} beam={BEAM} tk={TK} "
    f"store={store} iters={ITERS}",
    flush=True,
)
float(run(q0, xk, xv))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    float(run(q0, xk, xv))
    ts.append(time.perf_counter() - t0)
per = min(ts) / ITERS
print(
    f"cross x{L}: {per * 1e3:8.3f} ms/iter  ({gb / per:6.0f} GB/s of "
    f"{gb:.2f} GB window read)",
    flush=True,
)
