"""Partition specs: how params and activations lay out over the mesh.

Megatron-style tensor parallelism expressed purely as sharding annotations
(XLA inserts the collectives — SURVEY.md §2b "TPU-native component to
build"):

* attention q/k/v and MLP fc1 are column-parallel (output/head dim sharded on
  ``model``), o-projection and fc2 row-parallel (input dim sharded) — one
  psum per block, fused by SPMD;
* token embedding shards the feature dim, so the logits matmul contracts over
  the sharded axis and all-reduces a [B, T, V] tile;
* convs/layernorms are replicated (negligible bytes);
* batch shards on ``data`` everywhere.

Block params are stacked [L, ...] (models/params.py), hence the leading None
in every block spec.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from whisper_tpu.config import ModelDims
from whisper_tpu.models.params import Params

REPLICATED = P()


def _ln():
    return {"g": REPLICATED, "b": REPLICATED}


def _attn_specs(data: str, model: str):
    col_w = P(None, None, model)  # [L, d_in, d_out] shard d_out
    col_b = P(None, model)
    row_w = P(None, model, None)  # shard d_in (contracting)
    return {
        "q": {"w": col_w, "b": col_b},
        "k": {"w": col_w},  # no bias in whisper K
        "v": {"w": col_w, "b": col_b},
        "o": {"w": row_w, "b": REPLICATED},
    }


def param_pspecs(
    dims: ModelDims, data_axis: str = "data", model_axis: str = "model"
) -> Dict[str, Any]:
    """PartitionSpec pytree congruent with init_params' tree."""
    m = model_axis
    mlp = {
        "fc1": {"w": P(None, None, m), "b": P(None, m)},
        "fc2": {"w": P(None, m, None), "b": REPLICATED},
    }
    enc_block = {
        "ln1": _ln(),
        "attn": _attn_specs(data_axis, m),
        "ln2": _ln(),
        "mlp": mlp,
    }
    dec_block = {
        "ln1": _ln(),
        "attn": _attn_specs(data_axis, m),
        "ln2": _ln(),
        "cross": _attn_specs(data_axis, m),
        "ln3": _ln(),
        "mlp": mlp,
    }
    conv = {"w": REPLICATED, "b": REPLICATED}
    return {
        "encoder": {
            "conv1": conv,
            "conv2": conv,
            "blocks": enc_block,
            "ln_post": _ln(),
        },
        "decoder": {
            "tok_emb": P(None, m),  # feature-dim sharded: local gather,
            # logits contraction psums over `model`
            "pos_emb": REPLICATED,
            "blocks": dec_block,
            "ln": _ln(),
        },
    }


def input_pspec(data_axis: str = "data") -> P:
    """Audio/mel batches: batch dim over data, everything else local."""
    return P(data_axis)


def enc_out_pspec(data_axis: str = "data") -> P:
    return P(data_axis, None, None)


def shard_params(params: Params, mesh: Mesh, dims: ModelDims) -> Params:
    """Place a param pytree (float or int8-quantized) onto the mesh per
    param_pspecs. Heads must divide the model axis (checked here: a wrong
    mesh silently degrades to replication otherwise)."""
    mp = mesh.shape["model"]
    if dims.n_audio_head % mp or dims.n_text_head % mp:
        raise ValueError(
            f"model-parallel degree {mp} must divide heads "
            f"({dims.n_audio_head}/{dims.n_text_head})"
        )
    specs = param_pspecs(dims)
    from whisper_tpu.models.quantize import is_quantized, quantize_pspecs

    if is_quantized(params):
        specs = quantize_pspecs(specs, params)
    return jax.tree.map(
        lambda x, s: put_with_sharding(x, mesh, s),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def put_with_sharding(x, mesh: Mesh, spec: P):
    """Place one host-replicated array onto a (possibly multi-process) mesh.

    ``jax.device_put`` cannot target non-addressable devices; under
    jax.distributed each process holds the same full host copy (same seed /
    same checkpoint), so per-device shards are cut locally with
    ``make_array_from_callback`` — no cross-host transfer."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        import numpy as np  # noqa: F811 — local to keep module surface lean

        host = np.asarray(x)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )
    return jax.device_put(x, sharding)
