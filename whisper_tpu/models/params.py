"""Parameter pytree construction, init, and dtype policy.

The reference has no parameter representation at all — weights live inside
opaque ``.tflite`` flatbuffers (whisper.cpp:261-271). Here parameters are an
explicit nested-dict pytree with transformer blocks *stacked along a leading
layer axis* so both encoder and decoder bodies run as ``lax.scan`` over
layers: one compiled block body regardless of depth (compile time O(1) in
layers, and the natural form for pipeline-parallel sharding later).

Random init is for tests/benchmarks only — real weights come from
whisper_tpu.models.convert (HF/openai checkpoints), replacing the
reference's entire export/ pipeline (generate.py, generate_onnx.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import ModelDims

Params = Dict[str, Any]


def sinusoid_position_embedding(
    length: int, channels: int, max_timescale: float = 10_000.0
) -> np.ndarray:
    """Fixed sinusoidal table for the encoder, [length, channels]."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


def _stack_layers(layer_trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_trees)


def init_params(dims: ModelDims, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random-init full parameter pytree (shape-identical to converted
    checkpoints).

    Runs as ONE jit program. Besides being faster than eager init, this is
    load-bearing on the tunneled TPU backend: eagerly iterating the split
    key array materializes ~1024 tiny device buffers, which permanently
    degrades the process's subsequent large host→device transfers from
    ~1.5 GB/s to ~35 MB/s (measured 2026-08-20; a 122 MB batch upload went
    0.09 s → 3.5 s and stayed there). Under jit the keys are traced values
    — nothing materializes but the final pytree."""
    return _init_params_jit(dims, key, jnp.dtype(dtype))


def _init_params_impl(dims: ModelDims, key: jax.Array, dtype) -> Params:
    d_a, d_t = dims.n_audio_state, dims.n_text_state
    keys = iter(jax.random.split(key, 1024))

    def dense(d_in, d_out, bias=True, std=None):
        std = std if std is not None else d_in**-0.5
        p = {"w": (jax.random.normal(next(keys), (d_in, d_out)) * std).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((d_out,), dtype)
        return p

    def ln(d):
        return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    def attn(d, cross_dim=None):
        kv_in = cross_dim if cross_dim is not None else d
        return {
            "q": dense(d, d),
            "k": dense(kv_in, d, bias=False),  # whisper: no K bias
            "v": dense(kv_in, d),
            "o": dense(d, d),
        }

    def enc_block():
        return {
            "ln1": ln(d_a),
            "attn": attn(d_a),
            "ln2": ln(d_a),
            "mlp": {"fc1": dense(d_a, 4 * d_a), "fc2": dense(4 * d_a, d_a)},
        }

    def dec_block():
        return {
            "ln1": ln(d_t),
            "attn": attn(d_t),
            "ln2": ln(d_t),
            "cross": attn(d_t, cross_dim=d_a),
            "ln3": ln(d_t),
            "mlp": {"fc1": dense(d_t, 4 * d_t), "fc2": dense(4 * d_t, d_t)},
        }

    def conv(width, c_in, c_out):
        std = (width * c_in) ** -0.5
        return {
            "w": (jax.random.normal(next(keys), (width, c_in, c_out)) * std).astype(
                dtype
            ),
            "b": jnp.zeros((c_out,), dtype),
        }

    encoder = {
        "conv1": conv(3, dims.n_mels, d_a),
        "conv2": conv(3, d_a, d_a),
        "blocks": _stack_layers([enc_block() for _ in range(dims.n_audio_layer)]),
        "ln_post": ln(d_a),
    }
    decoder = {
        "tok_emb": (
            jax.random.normal(next(keys), (dims.n_vocab, d_t)) * d_t**-0.5
        ).astype(dtype),
        "pos_emb": (
            jax.random.normal(next(keys), (dims.n_text_ctx, d_t)) * 0.01
        ).astype(dtype),
        "blocks": _stack_layers([dec_block() for _ in range(dims.n_text_layer)]),
        "ln": ln(d_t),
    }
    return {"encoder": encoder, "decoder": decoder}


# dims (frozen dataclass) and dtype are static; the whole init is one
# compiled program per (dims, dtype) — see init_params docstring.
_init_params_jit = jax.jit(_init_params_impl, static_argnums=(0, 2))


def cast_params(params: Params, dtype) -> Params:
    """Apply a storage dtype policy (e.g. bf16 for serving). LayerNorm
    scales/biases stay f32 — they're tiny and precision-critical."""

    def cast(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("g",):
            return x.astype(jnp.float32)
        return x.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
