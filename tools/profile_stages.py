"""Stage-level wall-clock breakdown of the large-v3 pipeline on one chip.

Times each stage as its own jit program (mel, encoder, cross-KV precompute,
prefill, N decode steps) so optimization effort lands where the time is.
Usage: python tools/profile_stages.py [model] [batch] [steps]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import MODEL_DIMS
from whisper_tpu.frontend.filters import mel_filterbank
from whisper_tpu.frontend.mel import log_mel_spectrogram
from whisper_tpu.models.decoder import (
    decoder_prefill,
    decoder_step,
    init_kv_cache,
    precompute_cross_kv,
)
from whisper_tpu.models.encoder import encode
from whisper_tpu.models.params import init_params

MODEL = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 31
_kv = __import__("os").environ.get("PROFILE_KV", "float8_e4m3fn")
KV_DTYPE = None if _kv in ("", "none") else jnp.dtype(_kv)

dims = MODEL_DIMS[MODEL]
params = init_params(dims, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
filters = jnp.asarray(mel_filterbank(n_mels=dims.n_mels))
samples = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 480_000)) * 0.1
prompt = jnp.tile(jnp.array([[50258, 50363]], jnp.int32), (BATCH, 1))
total_len = 2 + STEPS + 1


def timed(name, fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:24s} {min(ts)*1e3:9.2f} ms")
    return out


mel_fn = jax.jit(lambda s, f: log_mel_spectrogram(s, f, n_mels=dims.n_mels))
mel = timed("mel", mel_fn, samples, filters)

enc_fn = jax.jit(lambda p, m: encode(p, m.astype(jnp.bfloat16), dims))
enc_out = timed("encoder", enc_fn, params, mel)

xkv_fn = jax.jit(lambda p, e: precompute_cross_kv(p, e, dims, kv_dtype=KV_DTYPE))
cross_kv = timed("cross-KV precompute", xkv_fn, params, enc_out)

prefill_fn = jax.jit(
    lambda p, pr, c, x: decoder_prefill(p, pr, c, x, dims, jnp.bfloat16)
)
cache = init_kv_cache(dims, BATCH, total_len, dtype=jnp.bfloat16)
logits, cache = timed("prefill", prefill_fn, params, prompt, cache, cross_kv)

step_fn = jax.jit(
    lambda p, t, pos, c, x: decoder_step(p, t, pos, c, x, dims, jnp.bfloat16)
)
tok = jnp.full((BATCH,), 50259, jnp.int32)
lg, cache2 = timed("1 decode step", step_fn, params, tok, jnp.int32(2), cache, cross_kv)


def n_steps(p, t, c, x):
    def body(i, carry):
        t, c = carry
        lg, c = decoder_step(p, t, 2 + i, c, x, dims, jnp.bfloat16)
        return (jnp.argmax(lg, -1).astype(jnp.int32), c)

    return jax.lax.fori_loop(0, STEPS, body, (t, c))


steps_fn = jax.jit(n_steps)
out = timed(f"{STEPS} decode steps", steps_fn, params, tok, cache, cross_kv)

xkv_bytes = np.prod(cross_kv["k"].shape) * cross_kv["k"].dtype.itemsize * 2
print(f"cross-KV size: {xkv_bytes/1e9:.2f} GB  dtype={cross_kv['k'].dtype}")
