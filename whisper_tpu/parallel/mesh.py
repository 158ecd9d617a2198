"""Device mesh construction.

The communication layer the reference lacks entirely (single process, no
NCCL/MPI — SURVEY.md §2b): here scale-out is a ``jax.sharding.Mesh`` with a
``data`` axis (utterance batches, DCN-friendly) and a ``model`` axis
(attention heads / MLP hidden sharded over ICI). All collectives are XLA-
inserted from sharding annotations — no hand-written communication.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def local_mesh_shape(
    n_devices: Optional[int] = None, model_parallel: Optional[int] = None
) -> Tuple[int, int]:
    """Pick a (data, model) shape for ``n_devices``. Model-parallel degree
    defaults to 1 (whisper ≤ large-v3 fits one chip); callers doing TP for
    large models pass it explicitly."""
    n = n_devices or len(jax.devices())
    mp = model_parallel or 1
    if n % mp:
        raise ValueError(f"n_devices={n} not divisible by model_parallel={mp}")
    return (n // mp, mp)


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a 2-D (data, model) mesh.

    Device order matters on real slices: jax's default device list is
    ICI-contiguous, so putting ``model`` innermost keeps tensor-parallel
    collectives on the fastest links and ``data`` traffic on DCN across
    hosts (the scaling-book recipe).
    """
    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = local_mesh_shape(len(devs))
    n_needed = int(np.prod(shape))
    if n_needed > len(devs):
        raise ValueError(f"mesh {shape} needs {n_needed} devices, have {len(devs)}")
    grid = np.array(devs[:n_needed]).reshape(shape)
    return Mesh(grid, axis_names)
