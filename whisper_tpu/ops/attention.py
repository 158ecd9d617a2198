"""Fused (flash) self-attention for the encoder's 1500-position sequence.

The reference's attention runs as whatever TFLite kernels the exported graph
contains — materializing [H, T, T] score tensors in memory. On TPU the same
math runs as a Pallas flash-attention kernel (online softmax over K/V tiles,
scores never leave VMEM), which converts the encoder's dominant memory
traffic into MXU-bound work.

We use the production TPU kernel shipped with JAX
(jax.experimental.pallas.ops.tpu.flash_attention) rather than re-deriving the
tiling: the integration work is whisper-specific — Whisper's 1500 positions
are not a lane-aligned multiple, so sequences pad to a 512 multiple and a
segment-id mask keeps padded keys out of every softmax (bitwise-equivalent to
unpadded attention for the content rows).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_PAD_BLOCK = 512


def _supported(t: int, dh: int) -> bool:
    # The shipped kernel wants lane-aligned head_dim and enough rows to tile.
    return dh % 64 == 0 and t >= 128


def fused_self_attention(
    q: jnp.ndarray,  # [B, T, H, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Unmasked self-attention with Whisper scaling (combined 1/sqrt(Dh)).

    ``use_flash=None`` auto-selects: the Pallas kernel on TPU backends for
    supported shapes, the einsum path elsewhere (CPU tests, odd shapes).
    """
    b, t, h, dh = q.shape
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu" and _supported(t, dh)
    if not use_flash:
        from whisper_tpu.models import layers

        return layers.qkv_attention(q, k, v, mask=None)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    sm_scale = dh**-0.5
    # [B, T, H, D] → [B, H, T, D]
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    t_pad = -(-t // _PAD_BLOCK) * _PAD_BLOCK
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        qt, kt, vt = (jnp.pad(x, pad) for x in (qt, kt, vt))
        # Content rows are segment 1, padding segment 0 → padded keys are
        # masked out of content queries' softmax.
        ids = (jnp.arange(t_pad) < t).astype(jnp.int32)[None, :]
        ids = jnp.broadcast_to(ids, (b, t_pad))
        segment_ids = SegmentIds(q=ids, kv=ids)
    else:
        segment_ids = None

    block = min(_PAD_BLOCK, t_pad)
    sizes = BlockSizes(
        block_q=block,
        block_k_major=block,
        block_k=block,
        block_b=1,
    )
    out = flash_attention(
        qt.astype(v.dtype),
        kt.astype(v.dtype),
        vt.astype(v.dtype),
        segment_ids=segment_ids,
        causal=False,
        sm_scale=sm_scale,
        block_sizes=sizes,
    )
    out = out[:, :, :t, :]
    return jnp.swapaxes(out, 1, 2)
