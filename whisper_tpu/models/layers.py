"""Neural net building blocks as pure functions over param pytrees.

This is the layer the reference outsources to the TFLite interpreter + Flex
delegate (SURVEY.md L1, whisper.h:128-138): here the "ops" are jnp/einsum
expressions the XLA TPU compiler fuses and tiles onto the MXU directly. All
matmuls take ``preferred_element_type=float32`` so bf16 params accumulate in
f32 (MXU native behavior).

Param pytree conventions
  linear:    {"w": [d_in, d_out], "b": [d_out]}     (b optional — whisper's
              attention K projection is bias-free)
  layernorm: {"g": [d], "b": [d]}
  conv1d:    {"w": [width, c_in, c_out], "b": [c_out]}
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

ACC_DTYPE = jnp.float32


def linear(p, x):
    if "w_q" in p:
        # Weight-only int8 (models/quantize.py): int8→compute-dtype convert
        # fuses into the matmul operand load; per-output-channel rescale
        # fuses into the f32 epilogue — exact vs dequantize-then-matmul.
        y = jnp.einsum(
            "...i,io->...o",
            x,
            p["w_q"].astype(x.dtype),
            preferred_element_type=ACC_DTYPE,
        )
        y = y * p["w_s"].astype(ACC_DTYPE)
    else:
        y = jnp.einsum("...i,io->...o", x, p["w"], preferred_element_type=ACC_DTYPE)
    if "b" in p:
        y = y + p["b"].astype(ACC_DTYPE)
    return y.astype(x.dtype)


def layer_norm(p, x, eps: float = 1e-5):
    # Always normalize in f32: bf16 mean/variance is a real WER hazard.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def gelu(x):
    # Exact (erf) GELU — what torch F.gelu defaults to in the weights'
    # native implementation; the tanh approximation shifts logits enough
    # to break token parity on near-ties.
    return jax.nn.gelu(x, approximate=False)


def conv1d(p, x, stride: int = 1):
    """[B, T, C_in] → [B, T', C_out], SAME-style padding of 1 each side for
    width-3 kernels (the encoder stem's geometry)."""
    w = p["w_q"] if "w_q" in p else p["w"]
    width = w.shape[0]
    pad = (width - 1) // 2
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=ACC_DTYPE,
    )
    if "w_q" in p:
        y = y * p["w_s"].astype(ACC_DTYPE)  # per-c_out int8 rescale
    return (y + p["b"].astype(ACC_DTYPE)).astype(x.dtype)


def embed(tok_emb, tokens):
    """Token-embedding lookup, float or int8 table ({"q","s"} per-row)."""
    if isinstance(tok_emb, dict):
        return tok_emb["q"][tokens].astype(jnp.float32) * tok_emb["s"][tokens][
            ..., None
        ]
    return tok_emb[tokens]


def unembed(tok_emb, x):
    """Logits projection against the (possibly int8) embedding table:
    [..., d] f32 → [..., V] f32."""
    table = tok_emb["q"] if isinstance(tok_emb, dict) else tok_emb
    logits = jnp.einsum(
        "...d,vd->...v",
        x.astype(jnp.float32),
        table.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if isinstance(tok_emb, dict):
        logits = logits * tok_emb["s"]
    return logits


def split_heads(x, n_head: int):
    """[B, T, d] → [B, T, H, Dh]."""
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def merge_heads(x):
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def qkv_attention(
    q: jnp.ndarray,  # [B, Tq, H, Dh]
    k: jnp.ndarray,  # [B, Tk, H, Dh]
    v: jnp.ndarray,  # [B, Tk, H, Dh]
    mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, Tq, Tk]
) -> jnp.ndarray:
    """Scaled dot-product attention with Whisper's split scaling: q and k each
    scaled by Dh^-0.25 (matches the weights' native numerics; combined scale
    is the usual 1/sqrt(Dh)). Softmax in f32 on the VPU; both matmuls hit the
    MXU. Returns [B, Tq, H, Dh]."""
    dh = q.shape[-1]
    # K (and V) stay in their stored dtype all the way into the matmul: bf16
    # operands hit the MXU natively with f32 accumulation, and fp8-stored
    # caches (EngineConfig.kv_cache_dtype) upcast inside the operand load.
    # Upcasting/scaling K *before* the einsum would materialize extra
    # full-size copies of the KV stream in HBM — measured at ~2.8x the ideal
    # cross-KV read traffic per decode step on large-v3 (TPU v5e).
    # Whisper's native numerics scale q and k each by Dh^-0.25; with exact
    # bf16 products and f32 accumulation, folding the combined 1/sqrt(Dh)
    # into the f32 scores epilogue is numerically equivalent at f32 rounding.
    if k.dtype.itemsize == 1:
        k = k.astype(q.dtype)
    if v.dtype.itemsize == 1:
        v = v.astype(q.dtype)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=ACC_DTYPE)
    scores = scores.astype(ACC_DTYPE) * (1.0 / float(dh) ** 0.5)
    if mask is not None:
        scores = scores + mask.astype(ACC_DTYPE)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v, preferred_element_type=ACC_DTYPE
    )
    return out.astype(v.dtype)


def cross_attention_T(
    q: jnp.ndarray,  # [B, Tq, H, Dh]
    kT: jnp.ndarray,  # [B, H, Dh, Tk]
    vT: jnp.ndarray,  # [B, H, Dh, Tk]
) -> jnp.ndarray:
    """Unmasked cross-attention against head-major, sequence-minor K/V.

    Decode steps read the full cross-KV stream every token, so its physical
    layout sets the step's HBM traffic. Stored as [B, Tk, H, Dh] the score
    dot needs K batch-majored to [B, H, ...] — XLA materializes a physically
    transposed (and, for fp8 caches, f32-upcast) copy of the whole stream
    per layer per step (measured ~2.7x ideal traffic on large-v3/TPU v5e).
    In this [B, H, Dh, Tk] layout both dots contract against the stored
    minor axes — scores contract Dh with Tk minor-resident, the value dot
    contracts Tk itself — so the operands stream from HBM untouched, and
    sub-byte caches upcast inside the operand load. Returns [B, Tq, H, Dh].
    """
    dh = q.shape[-1]
    if kT.dtype.itemsize == 1:
        kT = kT.astype(q.dtype)
    out_dtype = vT.dtype if vT.dtype.itemsize > 1 else q.dtype
    if vT.dtype.itemsize == 1:
        vT = vT.astype(q.dtype)
    qt = jnp.swapaxes(q, 1, 2)  # [B, H, Tq, Dh] — Tq is 1..P, a tiny copy
    scores = jnp.einsum("bhqd,bhdk->bhqk", qt, kT, preferred_element_type=ACC_DTYPE)
    scores = scores.astype(ACC_DTYPE) * (1.0 / float(dh) ** 0.5)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhdk->bhqd",
        weights.astype(vT.dtype),
        vT,
        preferred_element_type=ACC_DTYPE,
    )
    return jnp.swapaxes(out, 1, 2).astype(out_dtype)


def mha_self(p, x, n_head: int, mask=None, fused: bool = False):
    """Full (non-cached) multi-head self-attention block body.

    ``fused=True`` routes unmasked attention through the Pallas flash kernel
    (ops/attention.py) on TPU; other configurations use the einsum path."""
    q = split_heads(linear(p["q"], x), n_head)
    k = split_heads(linear(p["k"], x), n_head)
    v = split_heads(linear(p["v"], x), n_head)
    if fused and mask is None:
        from whisper_tpu.ops.attention import fused_self_attention

        o = fused_self_attention(q, k, v)
    else:
        o = qkv_attention(q, k, v, mask)
    return linear(p["o"], merge_heads(o))


def mlp(p, x):
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))
