"""Int8 weight-only quantization (symmetric, per-output-channel).

The reference ships dynamic-range-quantized models — every export path passes
``tf.lite.Optimize.DEFAULT`` (reference export/generate.py:69,
export/generate_onnx.py:151), which stores weights as int8 with per-channel
scales and dequantizes into float kernels at runtime. This module is the
TPU-native re-derivation of that contract (SURVEY.md §7 "Quantization
parity": scales are recomputed here, never imported from TFLite):

* every matmul/conv weight ``w`` becomes ``{"w_q": int8, "w_s": f32}`` with a
  symmetric absmax scale per **output channel** (the scale commutes with the
  contraction, so post-scaling the f32 accumulator is numerically identical
  to dequantize-then-matmul). Stacked block weights [L, d_in, d_out]
  (models/params.py scan layout) get per-layer scales [L, d_out] — ``lax.scan``
  slices weight and scale together;
* the token embedding — dual-use as lookup table and logits unembedding —
  becomes ``{"q": int8 [V, d], "s": f32 [V]}`` with per-row scales;
* biases, layernorm affines, and positional embeddings stay in float: they
  are O(d) bytes and precision-critical.

On TPU the win is HBM bandwidth: weight-only int8 halves (vs bf16) the bytes
streamed per decode step, which is what bounds small-batch autoregressive
decoding. The int8→bf16 convert fuses into the matmul's operand load; the
per-channel rescale fuses into its epilogue (both standard XLA fusions).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from whisper_tpu.models.params import Params

INT8_MAX = 127.0
_EPS = 1e-12


def _reduce_axes(w, stacked: bool) -> Tuple[int, ...]:
    """Axes the scale reduces over: everything but the output channel, but
    keeping the leading layer axis of scan-stacked block weights."""
    if np.ndim(w) == 2:  # [d_in, d_out]
        return (0,)
    if stacked:  # [L, d_in, d_out]
        return (1,)
    return (0, 1)  # conv [width, c_in, c_out]


def absmax_quantize(w, reduce_axes):
    """Symmetric per-channel absmax quantization.

    Returns (q int8, scale f32) with ``scale`` squeezed over ``reduce_axes``;
    ``q * scale`` reconstructs ``w`` to within scale/2 elementwise.
    """
    wf = np.asarray(w, dtype=np.float32)
    amax = np.max(np.abs(wf), axis=reduce_axes, keepdims=True)
    scale = np.maximum(amax / INT8_MAX, _EPS)
    q = np.clip(np.rint(wf / scale), -INT8_MAX, INT8_MAX).astype(np.int8)
    return q, np.squeeze(scale, axis=reduce_axes).astype(np.float32)


def _is_weight_leaf(node) -> bool:
    return (
        isinstance(node, dict)
        and "w" in node
        and not isinstance(node["w"], dict)
        and np.ndim(node["w"]) in (2, 3)
    )


def quantize_params(params: Params) -> Params:
    """Full-model weight-only int8 quantization.

    The layer functions (models/layers.py) dispatch on the ``w_q`` /
    embedding-dict structure, so quantized and float pytrees are
    interchangeable everywhere params flow.
    """

    def walk(node, stacked=False):
        if _is_weight_leaf(node):
            q, s = absmax_quantize(node["w"], _reduce_axes(node["w"], stacked))
            out: Dict[str, Any] = {"w_q": jnp.asarray(q), "w_s": jnp.asarray(s)}
            if "b" in node:
                out["b"] = node["b"]
            return out
        if isinstance(node, dict):
            return {
                k: walk(v, stacked=stacked or k == "blocks")
                for k, v in node.items()
            }
        return node

    out = walk(params)
    q, s = absmax_quantize(params["decoder"]["tok_emb"], (1,))
    out["decoder"]["tok_emb"] = {"q": jnp.asarray(q), "s": jnp.asarray(s)}
    return out


def dequantize_params(params: Params, dtype=jnp.float32) -> Params:
    """Inverse transform (testing/debugging): reconstruct a float pytree."""

    def expand(q, s, stacked):
        sf = np.asarray(s, np.float32)
        for ax in _reduce_axes(q, stacked):
            sf = np.expand_dims(sf, ax)
        return np.asarray(q, np.float32) * sf

    def walk(node, stacked=False):
        if isinstance(node, dict) and "w_q" in node:
            out = {"w": jnp.asarray(expand(node["w_q"], node["w_s"], stacked), dtype)}
            if "b" in node:
                out["b"] = node["b"]
            return out
        if isinstance(node, dict) and set(node) == {"q", "s"}:
            return jnp.asarray(
                np.asarray(node["q"], np.float32) * np.asarray(node["s"])[:, None],
                dtype,
            )
        if isinstance(node, dict):
            return {
                k: walk(v, stacked=stacked or k == "blocks")
                for k, v in node.items()
            }
        return node

    return walk(params)


def is_quantized(params: Params) -> bool:
    dec = params.get("decoder", {})
    return isinstance(dec.get("tok_emb"), dict)


def param_bytes(params: Params) -> int:
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def quantize_pspecs(pspecs, params_q: Params):
    """Derive PartitionSpecs for a quantized tree from the float tree's specs
    (parallel/sharding.py). ``w_q`` inherits ``w``'s spec; the per-output
    scale keeps only the output-channel axis entry (plus the layer axis for
    stacked weights); the embedding scale [V] is replicated — the feature
    axis tensor-parallelism shards is reduced away in the scale.
    """
    from jax.sharding import PartitionSpec as P

    def walk(spec_node, q_node, stacked=False):
        if isinstance(q_node, dict) and "w_q" in q_node:
            w_spec = spec_node["w"]
            ndim = len(np.shape(q_node["w_q"]))
            entries = tuple(w_spec) + (None,) * (ndim - len(tuple(w_spec)))
            if ndim == 3 and stacked:  # scale [L, d_out]
                s_spec = P(entries[0], entries[2])
            else:  # scale [d_out] / [c_out]
                s_spec = P(entries[-1])
            out = {"w_q": w_spec, "w_s": s_spec}
            if "b" in q_node:
                out["b"] = spec_node["b"]
            return out
        if isinstance(q_node, dict) and set(q_node) == {"q", "s"}:
            return {"q": spec_node, "s": P()}
        if isinstance(q_node, dict):
            return {
                k: walk(spec_node[k], v, stacked=stacked or k == "blocks")
                for k, v in q_node.items()
            }
        return spec_node

    return walk(pspecs, params_q)
