"""Pallas row-permute (beam KV-cache reshuffle) as pure block DMA copies.

The beam-search cache reshuffle is a permutation along the [B*K] beam axis of
the self-attention cache (decode/beam.py reorder_cache). Expressed in XLA it
is either a gather (lowered to serialized per-index dynamic slices — measured
45 GB/s on TPU v5e) or a one-hot matmul (streams at MXU-operand width: the
fp8 cache upcasts to bf16 and the accumulator materializes, ~3× the logical
bytes — measured ~175 GB/s). But a permutation moves bytes; it computes
nothing. This kernel does exactly that: for each (layer, destination-row)
grid cell, DMA the source row — selected by a scalar-prefetched index — from
HBM into VMEM and write it back out. No conversion, no accumulator, no MXU:
the stream runs at copy bandwidth in the cache's storage dtype (fp8 caches
move half the bytes of bf16 — on a chip with no native fp8 this is the only
fp8 operation that is pure win, since nothing is converted).

Duplicated indices (beam branching) are plain repeated reads. Exactness is
trivially bitwise (tests/test_beam.py::TestReorderCache).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128


def _rows_cols(trailing: int) -> Optional[tuple]:
    """Factor the per-row byte count into a (rows, 128) VMEM block."""
    if trailing % _LANES:
        return None
    return trailing // _LANES, _LANES


def supported(shape) -> bool:
    return (
        len(shape) >= 3 and _rows_cols(int(np.prod(shape[2:]))) is not None
    )


def _kernel(idx_ref, in_ref, out_ref):
    out_ref[...] = in_ref[...]


_VMEM_BUDGET = 1024 * 1024  # per-block bytes target. Measured on v5e
# (large-v3 fp8 shapes): 291KB single-row blocks ~250 GB/s; 2.3MB blocks
# (4MB budget) REGRESSED to 133 GB/s — in+out double buffering needs 4
# blocks resident and ~9MB of VMEM starves the pipeline. ~1MB blocks keep
# 4-deep buffering inside VMEM. The one-hot matmul (decode/beam.py) still
# wins overall and stays the default reorder; this kernel is the
# experimental path (use_pallas=True).


def _layer_group(l: int, row_bytes: int) -> int:
    """Layers moved per grid cell: amortize the per-cell pipeline overhead
    (the (1,1,·,·) single-row grid measured ~250 GB/s on v5e — far under
    copy bandwidth — because 2,560 tiny cells pay fixed DMA/loop latency;
    grouping layers into ~1 MB blocks (per _VMEM_BUDGET) cuts the cell
    count by that factor without starving VMEM double-buffering."""
    g = max(1, _VMEM_BUDGET // max(row_bytes, 1))
    while l % g:
        g -= 1
    return g


@partial(jax.jit, static_argnames=("interpret",))
def permute_rows(
    x: jnp.ndarray,  # [L, N, ...] — any dtype, trailing size % 128 == 0
    idx: jnp.ndarray,  # [N] int32 destination→source map (dups allowed)
    interpret: bool = False,
) -> jnp.ndarray:
    """``out[l, n] = x[l, idx[n]]`` as a Pallas DMA-copy kernel.

    ``interpret=True`` runs the kernel in Pallas interpret mode (CPU tests).
    Callers should check :func:`supported` and fall back to an XLA path for
    odd trailing sizes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    l, n = x.shape[:2]
    rc = _rows_cols(int(np.prod(x.shape[2:])))
    if rc is None:
        raise ValueError(f"trailing dims of {x.shape} not lane-divisible")
    r, c = rc
    xv = x.reshape(l, n, r, c)  # minor-dim merge: layout-compatible view
    g = _layer_group(l, r * c * x.dtype.itemsize)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l // g, n),
        in_specs=[
            pl.BlockSpec(
                (g, 1, r, c), lambda i, j, idx_ref: (i, idx_ref[j], 0, 0)
            )
        ],
        out_specs=pl.BlockSpec(
            (g, 1, r, c), lambda i, j, idx_ref: (i, j, 0, 0)
        ),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(xv.shape, xv.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), xv)
    return out.reshape(x.shape)
