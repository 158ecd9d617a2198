"""Probe: physical HBM stream rate of candidate KV-cache shapes.

XLA pads an array's two minor dims to the dtype tile (fp8: 32x128, bf16:
16x128). A [.., T, H=20, Dh=64] cache therefore occupies (32/20)*(128/64) =
3.2x its logical bytes in HBM, and every decode-step read streams the
padding. This measures jnp.sum (a pure one-pass stream) over the same
logical bytes in different shapes to expose the padding tax directly.

Usage: python tools/probe_layout.py [dtype]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.dtype(sys.argv[1] if len(sys.argv) > 1 else "float8_e4m3fn")
L, BK, T, H, DH = 32, 80, 229, 20, 64
ITERS = 32
key = jax.random.PRNGKey(0)
base = jax.random.normal(key, (L, BK, T, H, DH), jnp.bfloat16)
gb = np.prod(base.shape) * DT.itemsize / 1e9

SHAPES = {
    "[L,BK,T,H,Dh] (current)": (L, BK, T, H, DH),
    "[L,BK,T,D]    (merged heads)": (L, BK, T, H * DH),
    "[L,BK,H,Dh,T] (T-minor)": (L, BK, H, DH, T),
    "[L,BK,H,T,Dh] (head-major)": (L, BK, H, T, DH),
    "[L*BK*T*D]    (flat)": (L * BK * T * H * DH,),
}


def bench(name, shape):
    x = base.reshape(-1)[: int(np.prod(shape))].reshape(shape).astype(DT)

    @jax.jit
    def run(x, s0):
        def body(i, s):
            # s feeds the summand so the loop body cannot be hoisted as
            # loop-invariant; sum(x + s) still streams all of x each iter.
            y = x.astype(jnp.float32) + s
            return jnp.sum(y) * 1e-30 + jnp.float32(i) * 1e-6

        return jax.lax.fori_loop(0, ITERS, body, s0)

    float(run(x, jnp.float32(0)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, jnp.float32(0)))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / ITERS
    print(f"{name:32s} {per * 1e3:8.3f} ms  ({gb / per:6.0f} GB/s)",
          flush=True)


print(f"dtype={DT} logical {gb:.2f} GB x{ITERS} iters")
for name, shape in SHAPES.items():
    bench(name, shape)
