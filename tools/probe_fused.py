"""Standalone timing probe for the fused gather+append+attend kernel at
north-star shapes. One variant per invocation (the kernel's ablation and
ring-geometry knobs are compile-time env vars):

    WHISPER_TPU_FUSED_ABLATE=nocompute          # pure DMA permute+append
    WHISPER_TPU_FUSED_ABLATE=nocompute,noappend # pure DMA permute floor
    WHISPER_TPU_FUSED_GROUP=16 WHISPER_TPU_FUSED_NBUF=6 ...

Usage: python tools/probe_fused.py [model] [batch] [beam] [ctx]
Env:   PROBE_KV (float8_e4m3fn) PROBE_ITERS (16)
Method: tools/ablate_step.py's device-looped fori with a data dependence
(single-dispatch timings measure the tunnel, not the chip)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import MODEL_DIMS
from whisper_tpu.ops import fused_step as fused

MODEL = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
BEAM = int(sys.argv[3]) if len(sys.argv) > 3 else 5
CTXP = int(sys.argv[4]) if len(sys.argv) > 4 else 256
KV = jnp.dtype(os.environ.get("PROBE_KV", "float8_e4m3fn"))
ITERS = int(os.environ.get("PROBE_ITERS", "16"))

dims = MODEL_DIMS[MODEL]
L, H, D = dims.n_text_layer, dims.n_text_head, dims.n_text_state
BK = BATCH * BEAM
key = jax.random.PRNGKey(0)
interp = jax.default_backend() != "tpu"

pk = jax.random.normal(key, (2, L, BK, CTXP, D), jnp.bfloat16).astype(KV)
pv = jax.random.normal(key, (2, L, BK, CTXP, D), jnp.bfloat16).astype(KV)
q0 = jax.random.normal(key, (BK, D), jnp.bfloat16)
rot = (jnp.arange(BK, dtype=jnp.int32) + 1) % BK
gb = 2 * 2 * L * BK * CTXP * D * pk.dtype.itemsize / 1e9  # r+w of k+v


MODE = os.environ.get("PROBE_MODE", "attend")  # attend | dma | hybrid
DH = D // H


@jax.jit
def run(q0, pk, pv, rot):
    def step(i, carry):
        h, pk, pv = carry
        par = jax.lax.rem(i, 2)

        def one(inner, l):
            hh, pk, pv = inner
            if MODE == "attend":
                attn, pk, pv = fused.fused_gather_attend(
                    pk, pv, rot, l, jnp.int32(CTXP - 1), par, hh, hh, hh,
                    n_head=H, interpret=interp,
                )
            else:
                pk, pv = fused.permute_append(
                    pk, pv, rot, l, jnp.int32(CTXP - 1), par, hh, hh,
                    interpret=interp,
                )
                if MODE == "dma":
                    attn = hh
                elif MODE == "hybrid2":
                    # Blockdiag XLA attention on the MERGED layout: the
                    # elementwise k⊙q consumer should fuse into the plane
                    # slice read (no materialized copy), and both
                    # contractions are single big XLA matmuls.
                    plane = 1 - par
                    k2d = jax.lax.dynamic_index_in_dim(
                        jax.lax.dynamic_index_in_dim(pk, plane, 0, False),
                        l, 0, False,
                    ).astype(jnp.bfloat16)  # [BK, CTXP, D]
                    v2d = jax.lax.dynamic_index_in_dim(
                        jax.lax.dynamic_index_in_dim(pv, plane, 0, False),
                        l, 0, False,
                    ).astype(jnp.bfloat16)
                    bdx = (
                        jnp.arange(D)[:, None] // DH == jnp.arange(H)[None]
                    ).astype(jnp.bfloat16)
                    kq = k2d * hh[:, None, :]
                    scores = jnp.einsum(
                        "bcj,jh->bch", kq, bdx,
                        preferred_element_type=jnp.float32,
                    ) * (DH ** -0.5)
                    w = jax.nn.softmax(scores, axis=1)
                    w_exp = jnp.einsum(
                        "bch,hj->bcj", w.astype(jnp.bfloat16), bdx.T,
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16)
                    attn = jnp.sum(
                        (w_exp * v2d).astype(jnp.float32), axis=1
                    ).astype(jnp.bfloat16)
                else:  # hybrid: XLA attention over the permuted plane
                    from whisper_tpu.models import layers

                    plane = 1 - par
                    k_l = jax.lax.dynamic_index_in_dim(
                        jax.lax.dynamic_index_in_dim(pk, plane, 0, False),
                        l, 0, False,
                    ).reshape(BK, CTXP, H, DH)
                    v_l = jax.lax.dynamic_index_in_dim(
                        jax.lax.dynamic_index_in_dim(pv, plane, 0, False),
                        l, 0, False,
                    ).reshape(BK, CTXP, H, DH)
                    attn = layers.qkv_attention(
                        hh.reshape(BK, 1, H, DH), k_l, v_l, None
                    ).reshape(BK, D)
            return (jnp.tanh(attn).astype(hh.dtype), pk, pv), None

        (h, pk, pv), _ = jax.lax.scan(
            one, (h, pk, pv), jnp.arange(L, dtype=jnp.int32)
        )
        return (h, pk, pv)

    h, pk, pv = jax.lax.fori_loop(0, ITERS, step, (q0, pk, pv))
    return h.astype(jnp.float32).ravel()[0] + pk.astype(jnp.float32).ravel()[0]


print(
    f"model={MODEL} bk={BK} ctx={CTXP} kv={KV} iters={ITERS} "
    f"ablate={os.environ.get('WHISPER_TPU_FUSED_ABLATE','')!r} "
    f"group={os.environ.get('WHISPER_TPU_FUSED_GROUP','auto')} "
    f"nbuf={os.environ.get('WHISPER_TPU_FUSED_NBUF','auto')}",
    flush=True,
)
float(run(q0, pk, pv, rot))  # compile + sync
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    float(run(q0, pk, pv, rot))
    ts.append(time.perf_counter() - t0)
per = min(ts) / ITERS
print(
    f"fused x{L}: {per * 1e3:8.3f} ms/iter  ({gb / per:6.0f} GB/s of "
    f"{gb:.2f} GB r+w)",
    flush=True,
)
