"""Converted-checkpoint persistence: flat-key npz with a dims header.

The reference's "checkpoint" is an immutable .tflite flatbuffer loaded per
engine (whisper.cpp:261-271); our equivalent is the param pytree, stored as a
plain npz (path separator "/") so it loads with zero framework dependencies.
Orbax-based sharded checkpointing can layer on top for multi-host runs; this
is the portable interchange format.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple

import numpy as np

from whisper_tpu.config import ModelDims
from whisper_tpu.models.params import Params

_SEP = "/"


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(path: str, params: Params, dims: ModelDims) -> None:
    flat = _flatten(params)
    flat["__dims__"] = np.frombuffer(
        json.dumps(dataclasses.asdict(dims)).encode(), dtype=np.uint8
    )
    np.savez(path, **flat)


def load_params(path: str) -> Tuple[Params, ModelDims]:
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    dims = ModelDims(**json.loads(bytes(flat.pop("__dims__")).decode()))
    return _unflatten(flat), dims


# --- Orbax: sharded multi-host checkpoints -----------------------------------
# The npz format above is the zero-dependency interchange file; for multi-host
# serving the weights should restore directly into their NamedShardings so no
# host ever materializes the full pytree (the capability the reference's
# whole-file mmap'd flatbuffer model cannot express — whisper.cpp:261-271).

def save_params_orbax(path: str, params: Params, dims: ModelDims) -> None:
    import os

    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params, force=True)
    with open(os.path.join(path, "dims.json"), "w") as f:
        json.dump(dataclasses.asdict(dims), f)


def load_params_orbax(path: str, mesh=None) -> Tuple[Params, ModelDims]:
    """Restore a checkpoint; with ``mesh`` set, every leaf lands directly in
    its partition spec's NamedSharding (parallel/sharding.py param_pspecs —
    quantized trees derive theirs via models/quantize.quantize_pspecs)."""
    import os

    import jax
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "dims.json")) as f:
        dims = ModelDims(**json.load(f))

    with ocp.StandardCheckpointer() as ckptr:
        if mesh is None:
            params = ckptr.restore(os.path.join(path, "params"))
        else:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from whisper_tpu.models.quantize import is_quantized, quantize_pspecs
            from whisper_tpu.parallel.sharding import param_pspecs

            meta = ckptr.metadata(os.path.join(path, "params"))
            tree = meta.item_metadata.tree  # plain nested dict of ArrayMetadata
            specs = param_pspecs(dims)
            if is_quantized(tree if isinstance(tree, dict) else {}):
                specs = quantize_pspecs(specs, tree)

            def abstract(m, spec):
                return jax.ShapeDtypeStruct(
                    m.shape, m.dtype, sharding=NamedSharding(mesh, spec)
                )

            target = jax.tree.map(
                abstract, tree, specs, is_leaf=lambda x: isinstance(x, P)
            )
            params = ckptr.restore(os.path.join(path, "params"), target)
    return params, dims
