"""Audio encoder: conv stem → sinusoidal positions → N pre-LN attention blocks.

Replaces the reference's ``Encoder::forward`` (whisper.cpp:284-309), which
memcpys the mel into an interpreter tensor and Invoke()s an opaque graph. Here
the encoder is a jit-compiled pure function [B, n_mels, 3000] → [B, 1500, d]:
XLA fuses the stem, and the block stack is one ``lax.scan`` over stacked layer
params so the MXU work (qkv/mlp matmuls, 1500-long attention) dominates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from whisper_tpu.config import ModelDims
from whisper_tpu.models import layers
from whisper_tpu.models.params import Params, sinusoid_position_embedding


def encode(
    params: Params, mel: jnp.ndarray, dims: ModelDims, fused_attention: bool = True
) -> jnp.ndarray:
    """[B, n_mels, n_frames] → [B, n_frames // 2, n_audio_state].

    ``fused_attention`` enables the Pallas flash-attention path on TPU
    (auto-falls back to einsum off-TPU or for unsupported shapes)."""
    enc = params["encoder"]
    x = jnp.swapaxes(mel, -1, -2)  # [B, T, n_mels] — feature-last for conv
    x = layers.gelu(layers.conv1d(enc["conv1"], x, stride=1))
    x = layers.gelu(layers.conv1d(enc["conv2"], x, stride=2))  # T → T/2

    pos = sinusoid_position_embedding(x.shape[1], dims.n_audio_state)
    x = x + jnp.asarray(pos, dtype=x.dtype)

    n_head = dims.n_audio_head

    def block(carry, bp):
        h = carry
        h = h + layers.mha_self(
            bp["attn"], layers.layer_norm(bp["ln1"], h), n_head,
            fused=fused_attention,
        )
        h = h + layers.mlp(bp["mlp"], layers.layer_norm(bp["ln2"], h))
        return h, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return layers.layer_norm(enc["ln_post"], x)
