from skdownscale_tpu.parallel.mesh import cell_mesh, cell_sharding, pad_to_multiple, shard_cells
from skdownscale_tpu.parallel.multihost import feed_cells, host_cell_slice
from skdownscale_tpu.parallel.timeshard import shard_cells_time, time_cell_mesh, time_sharding
from skdownscale_tpu.parallel.zarr_io import ZarrGridSource, feed_zarr_cells

__all__ = [
    "cell_mesh",
    "cell_sharding",
    "pad_to_multiple",
    "shard_cells",
    "feed_cells",
    "host_cell_slice",
    "time_cell_mesh",
    "time_sharding",
    "shard_cells_time",
    "ZarrGridSource",
    "feed_zarr_cells",
]
