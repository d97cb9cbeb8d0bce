"""Multi-host input feeding for pod-scale grids.

On a multi-host TPU pod each process holds only its slice of the grid; the
global device array is assembled with
``jax.make_array_from_process_local_data`` under a cell-sharded
``NamedSharding`` — DCN carries only the input feed, ICI carries any layout
reshards, and the per-cell compute involves no collectives at all (SURVEY §5:
the reference's equivalent is dask scatter/gather plus a full fitted-model
broadcast, which this layout eliminates).

Single-host meshes work transparently (the local data is the global data).

The multi-process branch is executed for real by
``tests/test_multiprocess.py``: two OS processes form a localhost
``jax.distributed`` job, each feeds its ``host_cell_slice`` through
``feed_zarr_cells``, and the reassembled sharded BCSD output is bitwise
equal to the single-process run of the same 8-device SPMD program.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import pad_to_multiple

__all__ = ["host_cell_slice", "feed_cells"]


def host_cell_slice(n_cells: int, mesh: Mesh) -> slice:
    """The [start, stop) range of the (padded) global cell axis this process
    must provide, assuming cells are laid out contiguously per process."""
    n_padded = n_cells + ((-n_cells) % mesh.devices.size)
    per_proc = n_padded // jax.process_count()
    i = jax.process_index()
    return slice(i * per_proc, min((i + 1) * per_proc, n_padded))


def feed_cells(local_cells: np.ndarray, n_cells_global: int, mesh: Mesh):
    """Assemble a global cell-sharded device array from this process's
    contiguous slice of the cell axis.

    Parameters
    ----------
    local_cells : (local_cells, ...) — this process's rows (host numpy);
        on the last process this may include NaN padding rows.
    n_cells_global : true (unpadded) global cell count.
    mesh : 1-D cell mesh spanning all processes' devices.

    Returns
    -------
    (global_array, n_cells_global) — array has the padded global cell count;
    callers slice results back with ``n_cells_global``.
    """
    sharding = NamedSharding(mesh, P(mesh.axis_names[0], *([None] * (local_cells.ndim - 1))))
    if jax.process_count() == 1:
        padded, _ = pad_to_multiple(local_cells, mesh.devices.size, axis=0)
        return jax.device_put(padded, sharding), n_cells_global
    n_padded = n_cells_global + ((-n_cells_global) % mesh.devices.size)
    global_shape = (n_padded, *local_cells.shape[1:])
    arr = jax.make_array_from_process_local_data(sharding, local_cells, global_shape)
    return arr, n_cells_global
