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
