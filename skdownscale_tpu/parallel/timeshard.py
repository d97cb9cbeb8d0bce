"""Time-axis (sequence) sharding for very long per-cell records.

The reference requires the time dimension to be one contiguous in-memory
chunk per worker (``/root/reference/skdownscale/pointwise_models/core.py:435-437``;
the talk notebook rechunks with ``{'time': -1}``), so series length is
bounded by a single worker's memory.  SURVEY §2.2/§5 defers time sharding as
the optional long-context axis: quantile estimation over a sharded time axis
needs either an all-gather of each cell's time shards over ICI or a
distributed sort.

This module is that capability, the XLA-native way: build a 2-D
``(cells, time)`` device mesh and annotate inputs with
``P('cells', 'time')``.  Nothing in the batched estimator cores changes —
they are pure jitted array programs, so the SPMD partitioner keeps every
elementwise/rolling stage fully sharded on both axes and inserts the
minimal collectives (an ICI all-gather of the time shards within each cell
row) exactly where row sorts / grouped gathers need the full series.  Each
device holds ``C/n_cell_shards × T/n_time_shards`` of the input — the
per-device INPUT footprint that bounds how long a record can be loaded —
while compute-heavy full-row stages run on the cell-parallel submesh.

Fitted state layouts are GSPMD's choice: group-table-sized leaves (12
monthly climatologies) replicate cheaply, while time-length-sized leaves
(the stored CDF values, (C, T+2)) stay distributed over both axes — the
layout that bounds per-device *state* for very long records, not just
per-device input.

Equivalence is pinned by tests (8 virtual devices, 4x2 mesh, bitwise vs
single-device) and the driver dry run.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import CELL_AXIS

__all__ = ["time_cell_mesh", "time_sharding", "shard_cells_time"]

TIME_AXIS = "time"


def time_cell_mesh(
    devices=None,
    time_shards: int = 2,
    cell_axis: str = CELL_AXIS,
    time_axis: str = TIME_AXIS,
) -> Mesh:
    """2-D mesh: ``n_devices/time_shards`` cell shards × ``time_shards``.

    Lay the time axis on the mesh's minor (fastest, ring-neighbor) axis so
    the per-cell-row time all-gathers ride adjacent ICI links.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if devices.size % time_shards:
        raise ValueError(
            f"{devices.size} devices not divisible by time_shards={time_shards}"
        )
    grid = devices.reshape(devices.size // time_shards, time_shards)
    return Mesh(grid, (cell_axis, time_axis))


def time_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """NamedSharding splitting axis 0 over cells and axis 1 over time."""
    cell_axis, time_axis = mesh.axis_names[:2]
    return NamedSharding(mesh, P(cell_axis, time_axis, *([None] * (ndim - 2))))


def shard_cells_time(arr, mesh: Mesh):
    """Device-put ``(cells, time, ...)`` data sharded over both mesh axes.

    Pads the cell axis with NaN rows (masked-ocean semantics) to the cell
    submesh size; the time axis must already divide the time submesh (time
    padding would change quantile/rolling semantics — feed whole series).
    """
    from .mesh import pad_to_multiple

    n_cell, n_time = mesh.devices.shape
    if arr.shape[1] % n_time:
        raise ValueError(
            f"time length {arr.shape[1]} not divisible by the mesh's "
            f"{n_time} time shards"
        )
    padded, n = pad_to_multiple(np.asarray(arr), n_cell, axis=0)
    return jax.device_put(padded, time_sharding(mesh, padded.ndim)), n
