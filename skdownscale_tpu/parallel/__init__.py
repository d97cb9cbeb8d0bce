from skdownscale_tpu.parallel.mesh import cell_mesh, cell_sharding, pad_to_multiple, shard_cells

__all__ = ["cell_mesh", "cell_sharding", "pad_to_multiple", "shard_cells"]
