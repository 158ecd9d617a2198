"""Encoder micro-ablation at large-v3 shapes: whole encoder with Pallas
flash attention vs the einsum path, plus isolated conv-stem and
attention-only passes — attributes the gap to the measured encoder roofline
(large-v3 ≈ 2 TF/utterance ⇒ ~10 ms/utterance at v5e peak).

Usage: python tools/ablate_encoder.py [model] [batch]
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
from whisper_tpu.models import layers
from whisper_tpu.models.encoder import encode
from whisper_tpu.models.params import init_params
from whisper_tpu.ops.attention import fused_self_attention

MODEL = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16

dims = MODEL_DIMS[MODEL]
key = jax.random.PRNGKey(0)
params = init_params(dims, key, dtype=jnp.bfloat16)
mel = jax.random.normal(key, (BATCH, dims.n_mels, 3000), jnp.bfloat16)


def timed(name, fn, *args, repeats=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(ts)*1e3:9.2f} ms")
    return out


print(f"model={MODEL} batch={BATCH}")
timed("encoder (flash attention)", lambda p, m: encode(p, m, dims), params, mel)
timed("encoder (einsum attention)",
      lambda p, m: encode(p, m, dims, fused_attention=False), params, mel)

# conv stem alone
enc = params["encoder"]


def stem(p, m):
    x = jnp.swapaxes(m, -1, -2)
    x = layers.gelu(layers.conv1d(p["conv1"], x, stride=1))
    return layers.gelu(layers.conv1d(p["conv2"], x, stride=2))


timed("conv stem", stem, enc, mel)

# attention-only pass at encoder shapes (per full stack of L layers)
H = dims.n_audio_head
DH = dims.n_audio_state // H
q = jax.random.normal(key, (BATCH, dims.n_audio_ctx, H, DH), jnp.bfloat16)


def attn_stack_flash(q):
    def one(h, _):
        return fused_self_attention(h, h, h, use_flash=True), None

    out, _ = jax.lax.scan(one, q, None, length=dims.n_audio_layer)
    return out


def attn_stack_einsum(q):
    def one(h, _):
        return layers.qkv_attention(h, h, h), None

    out, _ = jax.lax.scan(one, q, None, length=dims.n_audio_layer)
    return out


if jax.default_backend() == "tpu":
    timed(f"attention x{dims.n_audio_layer} (flash)", attn_stack_flash, q)
timed(f"attention x{dims.n_audio_layer} (einsum)", attn_stack_einsum, q)

# MLP-only stack (the FLOPs majority)
x = jax.random.normal(key, (BATCH, dims.n_audio_ctx, dims.n_audio_state),
                      jnp.bfloat16)


def mlp_stack(x, blocks):
    def one(h, bp):
        return layers.mlp(bp["mlp"], h).astype(h.dtype), None

    out, _ = jax.lax.scan(one, x, blocks)
    return out


timed(f"mlp x{dims.n_audio_layer}", mlp_stack, x, enc["blocks"])
flops = (
    dims.n_audio_layer
    * (8 + 16)  # attn proj 8*d^2? coarse: proj 8d² + mlp 16d² per token
    * dims.n_audio_state ** 2
    * dims.n_audio_ctx
    * BATCH
    * 2
)
print(f"coarse matmul flops: {flops/1e12:.1f} TF (excl. attention scores)")
