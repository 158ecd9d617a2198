"""XLA cost analysis of the decode step + encoder: compiled bytes-accessed
vs the analytic roofline, to find materialization bugs (extra copies,
transposes, upcasts) that inflate HBM traffic.

Usage: python tools/cost_analysis.py [model] [batch] [beam]
Env:   COST_KV=float8_e4m3fn|bfloat16|none   COST_QUANT=int8|none
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import MODEL_DIMS
from whisper_tpu.models.decoder import (
    decoder_step,
    init_kv_cache,
    precompute_cross_kv,
)
from whisper_tpu.models.encoder import encode
from whisper_tpu.models.params import init_params

MODEL = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
BEAM = int(sys.argv[3]) if len(sys.argv) > 3 else 1
_kv = os.environ.get("COST_KV", "none")
KV_DTYPE = None if _kv in ("", "none") else jnp.dtype(_kv)
QUANT = os.environ.get("COST_QUANT", "none")

dims = MODEL_DIMS[MODEL]
params = init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
if QUANT == "int8":
    from whisper_tpu.models.quantize import quantize_params

    params = quantize_params(params)

total_len = 228
bk = BATCH * BEAM
cache = init_kv_cache(dims, bk, total_len, dtype=KV_DTYPE or jnp.bfloat16)
h, dh = dims.n_text_head, dims.n_text_state // dims.n_text_head
cross_shape = (dims.n_text_layer, BATCH, h, dh, dims.n_audio_ctx)
cross = {
    "k": jnp.zeros(cross_shape, KV_DTYPE or jnp.bfloat16),
    "v": jnp.zeros(cross_shape, KV_DTYPE or jnp.bfloat16),
}
tok = jnp.full((bk,), 50259, jnp.int32)


def step(p, t, c, x):
    return decoder_step(
        p, t, jnp.int32(100), c, x, dims, jnp.bfloat16, beam_width=BEAM
    )


lowered = jax.jit(step).lower(params, tok, cache, cross)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]

param_bytes = sum(
    int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.tree.leaves(params)
)
dec_params = sum(
    int(np.prod(x.shape)) * x.dtype.itemsize
    for x in jax.tree.leaves(params["decoder"])
)
cross_bytes = sum(
    int(np.prod(v.shape)) * v.dtype.itemsize for v in cross.values()
)
cache_bytes = sum(
    int(np.prod(v.shape)) * v.dtype.itemsize for v in cache.values()
)
roofline = dec_params + cross_bytes + cache_bytes  # read each once
print(f"model={MODEL} batch={BATCH} beam={BEAM} kv={_kv} quant={QUANT}")
print(f"decoder params : {dec_params/1e9:8.3f} GB")
print(f"cross-KV       : {cross_bytes/1e9:8.3f} GB")
print(f"self-cache     : {cache_bytes/1e9:8.3f} GB")
print(f"roofline/step  : {roofline/1e9:8.3f} GB")
print(f"XLA bytes acc. : {ca.get('bytes accessed', float('nan'))/1e9:8.3f} GB")
print(f"  operand bytes: {ca.get('bytes accessed operand', float('nan'))/1e9:8.3f} GB")
print(f"  output bytes : {ca.get('bytes accessed output', float('nan'))/1e9:8.3f} GB")
print(f"flops          : {ca.get('flops', float('nan'))/1e9:8.2f} GF")

# Encoder too
mel = jnp.zeros((BATCH, dims.n_mels, 3000), jnp.bfloat16)
enc_c = jax.jit(lambda p, m: encode(p, m, dims)).lower(params, mel).compile()
eca = enc_c.cost_analysis()
if isinstance(eca, list):
    eca = eca[0]
print(f"\nencoder flops  : {eca.get('flops', float('nan'))/1e12:8.3f} TF "
      f"(batch {BATCH})")
print(f"encoder bytes  : {eca.get('bytes accessed', float('nan'))/1e9:8.3f} GB")
