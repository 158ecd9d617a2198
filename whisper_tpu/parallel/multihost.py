"""Multi-host runtime: distributed init, global batch assembly, per-host IO.

The reference is a single process by construction (SURVEY.md §2b
"Communication backend: none"); this module is the DCN-side half of the new
framework's scale-out story:

* :func:`initialize` — ``jax.distributed.initialize`` wrapper (idempotent,
  no-op for single-process runs) so the same entry script works from 1 to N
  hosts;
* :func:`global_batch` — builds a globally-sharded utterance batch from
  *per-host* numpy data via ``jax.make_array_from_process_local_data``:
  each host decodes only its shard of the input files (the native batch
  loader fills the local buffer), and the resulting global array is laid out
  along the mesh ``data`` axis without any host ever holding the full batch;
* :func:`host_shard` — which slice of a global work list this host owns
  (contiguous block partitioning, matching the data-axis order).

Collectives between the shards are XLA-inserted from the shardings
(parallel/sharding.py); nothing here issues communication explicitly.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the distributed runtime. Safe to call unconditionally:
    single-process (all args None and no cluster env) is a no-op, and a
    second call is ignored."""
    if num_processes in (None, 1) and coordinator_address is None:
        return  # single-process run
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already initialized" not in str(e):
            raise


def host_shard(n_items: int, process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> Tuple[int, int]:
    """[start, end) of the global work list owned by this host (contiguous
    blocks in process order — the same order the data mesh axis enumerates
    hosts, so local feeds land on local devices)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n_items // pc)  # ceil
    start = min(pi * per, n_items)
    return start, min(start + per, n_items)


def global_batch(
    local_batch: np.ndarray,  # [local_B, ...] this host's decoded utterances
    mesh: Mesh,
    data_axis: str = "data",
    pad_to: Optional[int] = None,
) -> jax.Array:
    """Per-host numpy → one global jax.Array sharded along ``data``.

    With one process this is equivalent to ``jax.device_put`` with a
    NamedSharding; with many, each process contributes its local rows and
    the global shape is ``[sum(local_B), ...]`` — no host materializes the
    whole batch (the capability that makes N-host utterance DP feed at
    N× host bandwidth).

    The batch dim is zero-padded up to ``pad_to`` rows when given (the
    UNIFORM per-host count callers use so uneven work lists — including
    hosts with zero items, e.g. a small fallback-retry set — still form an
    evenly divisible global array), else to a multiple of the data-axis
    size. Callers slice results back to their true utterance count."""
    axis = mesh.shape[data_axis]
    target = pad_to if pad_to is not None else (
        -(-local_batch.shape[0] // axis) * axis if local_batch.shape[0] else 0
    )
    if local_batch.shape[0] < target:
        pad = np.zeros(
            (target - local_batch.shape[0], *local_batch.shape[1:]),
            local_batch.dtype,
        )
        local_batch = np.concatenate([local_batch, pad], axis=0)
    sharding = NamedSharding(
        mesh, P(data_axis, *([None] * (local_batch.ndim - 1)))
    )
    return jax.make_array_from_process_local_data(sharding, local_batch)


def uniform_host_rows(n_items: int, mesh: Mesh, data_axis: str = "data") -> int:
    """The per-host padded row count for an n-item work list: every host
    contributes the same number of rows (ceil share, rounded up to a
    multiple of the host's LOCAL data-shard count) so the global array
    divides evenly no matter how unevenly host_shard splits the items.

    Rounding to the local shard count (axis // process_count) rather than
    the global axis size keeps multi-host padding minimal (ADVICE r3 #2:
    2 hosts on an 8-wide axis with 4 files decode 8 global rows, not 16);
    when the axis does not divide across processes the global axis size is
    the safe fallback."""
    pc = jax.process_count()
    per = -(-n_items // pc)
    axis = mesh.shape[data_axis]
    local = axis // pc if axis % pc == 0 else axis
    local = max(local, 1)
    return -(-per // local) * local


def load_files_sharded(
    paths: Sequence[str],
    mesh: Mesh,
    max_len: int = 480_000,
    data_axis: str = "data",
) -> Tuple[jax.Array, List[str]]:
    """This host decodes only its shard of ``paths`` (native loader when
    built) and contributes it to a globally sharded batch. Returns the
    global array and the local path slice (for result reassembly)."""
    start, end = host_shard(len(paths))
    local_paths = list(paths[start:end])
    from whisper_tpu.native import load_native

    host = load_native()
    if host is not None and local_paths:
        local = host.load_batch(local_paths, max_len=max_len)
    else:
        from whisper_tpu.audio.wav import read_wav

        local = np.zeros((len(local_paths), max_len), np.float32)
        for i, p in enumerate(local_paths):
            s = read_wav(p)
            n = min(len(s), max_len)
            local[i, :n] = s[:n]
    pad_to = uniform_host_rows(len(paths), mesh, data_axis)
    return global_batch(local, mesh, data_axis, pad_to=pad_to), local_paths
