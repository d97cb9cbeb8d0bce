"""Device-mesh utilities: spatial data-parallelism over grid cells.

The reference's only parallelism axis is embarrassingly-parallel spatial
data-parallelism over cells, realized through dask ``map_blocks``
(``/root/reference/skdownscale/pointwise_models/core.py:262,336,368``) with a
client-side broadcast of all fitted models to every worker
(``core.py:331-335``).  The TPU-native equivalent: a 1-D
``jax.sharding.Mesh`` over the cell axis.  Packed ``(cells, time, ...)``
arrays carry ``NamedSharding(P('cells'))``; XLA partitions the vmapped
per-cell programs with zero collectives in the compute (the program is
cell-local), and fitted state comes out co-sharded with its cells — no
broadcast, no gather until the caller asks for host output.

Multi-host note: feed per-host shards with
``jax.make_array_from_process_local_data`` and the same NamedSharding; ICI
carries any layout reshards, DCN is only touched by input feeding.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["cell_mesh", "cell_sharding", "shard_cells", "pad_to_multiple"]

CELL_AXIS = "cells"


def cell_mesh(devices=None, axis_name: str = CELL_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices, named for the cell axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def cell_sharding(mesh: Mesh, ndim: int = 1, axis_name: str | None = None) -> NamedSharding:
    """NamedSharding splitting the leading (cell) axis of an ndim-array."""
    axis = axis_name or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def pad_to_multiple(arr, multiple: int, axis: int = 0, fill=np.nan):
    """Pad ``axis`` up to a multiple (sharding needs even divisibility)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, rem)
    return np.pad(arr, widths, constant_values=fill), n


def shard_cells(arr, mesh: Mesh):
    """Device-put an array with its leading axis sharded over the mesh.

    Pads the cell axis to a device-count multiple (padding cells are NaN and
    behave like the reference's masked ocean cells).
    """
    padded, n = pad_to_multiple(np.asarray(arr), mesh.devices.size, axis=0)
    return jax.device_put(padded, cell_sharding(mesh, padded.ndim)), n
