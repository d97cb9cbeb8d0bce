"""Zarr -> per-host cell shards: the production input pipeline.

The reference's examples read zarr stores from object storage into xarray
(``/root/reference/examples/utils.py:12-77``) and rely on dask to move
chunks to workers.  Here each host process reads only **its own contiguous
slice of the flat cell axis** straight from the (chunked) zarr store —
``host_cell_slice`` says which rows, :class:`ZarrGridSource` maps them onto
the store's chunk grid, and :func:`feed_cells` assembles the global
cell-sharded device array (DCN carries only the input feed; SURVEY §7.6).

Stores are read with :mod:`skdownscale_tpu.utils.zarrlite` (dependency-free
zarr **v2 and v3**); a real ``zarr``-written store works as long as its
codec chain is null/zlib/gzip/blosc(lz4|zstd)/zstd (see the zarrlite module
docstring for the exact v2/v3 feature matrix).
"""

from __future__ import annotations

import numpy as np

from ..utils import zarrlite
from .multihost import feed_cells, host_cell_slice

__all__ = ["ZarrGridSource", "feed_zarr_cells"]


class ZarrGridSource:
    """Lazy (time, *spatial) zarr array exposed as a flat cell-range reader.

    Parameters
    ----------
    store : str or mapping
        Path to a zarr (v2 or v3) array, or a group containing ``var`` (and
        optionally a 1-D ``time`` member; ``int64`` time values with attr
        ``{"kind": "datetime64[ns]"}`` round-trip a pandas DatetimeIndex).
        Any dict-like key->bytes mapping also works (fsspec/S3 mapper, plain
        dict — see :mod:`skdownscale_tpu.utils.zarrlite`'s store abstraction),
        which is how production hosts read object-store zarr like the
        reference's ``s3://carbonplan/...`` examples.
    var : str, optional
        Group member name (required when ``store`` is a group).
    """

    def __init__(self, store, var: str | None = None):
        st = zarrlite._as_store(store)
        if ".zgroup" in st or zarrlite._v3_node_type(st) == "group":
            grp = zarrlite.open_group(st)
            if var is None:
                keys = [k for k in grp.array_keys() if k != "time"]
                if len(keys) != 1:
                    raise ValueError(f"store has members {keys}; pass var=")
                var = keys[0]
            self.array = grp[var]
            self._time = grp["time"] if "time" in grp else None
        else:
            self.array = zarrlite.open_array(st)
            self._time = None
        self.var = var
        self.n_time = self.array.shape[0]
        self.spatial_shape = tuple(self.array.shape[1:])
        self.n_cells = int(np.prod(self.spatial_shape)) if self.spatial_shape else 1

    @property
    def index(self):
        """Time index: decoded ``time`` member when present, else a range."""
        import pandas as pd

        if self._time is None:
            return pd.RangeIndex(self.n_time)
        vals = np.asarray(self._time)
        if self._time.attrs.get("kind", "").startswith("datetime64"):
            return pd.DatetimeIndex(vals.view("datetime64[ns]"))
        return pd.Index(vals)

    def read_cells(self, lo: int, hi: int, dtype=np.float64) -> np.ndarray:
        """Rows ``[lo, hi)`` of the flat (C-order) cell axis as ``(hi-lo,
        n_time)`` ``dtype``.  Reads only the covering leading-spatial-row
        block from the store (chunk-aligned IO on the store's own chunking).
        ``dtype=np.float32`` skips the float64 detour — at continental chunk
        sizes the upcast+transpose is a measured multi-second host cost in
        the pipeline's read stage."""
        dtype = np.dtype(dtype)
        hi = min(hi, self.n_cells)
        if hi <= lo:
            return np.empty((0, self.n_time), dtype)
        if not self.spatial_shape:
            blk = self.array.read_block([0], [self.n_time])[None, :]
            return np.ascontiguousarray(blk.astype(dtype, copy=False))
        rest = int(np.prod(self.spatial_shape[1:])) if len(self.spatial_shape) > 1 else 1
        r0 = lo // rest
        r1 = -(-hi // rest)
        starts = [0, r0] + [0] * (len(self.spatial_shape) - 1)
        stops = [self.n_time, r1] + list(self.spatial_shape[1:])
        blk = self.array.read_block(starts, stops)  # (T, r1-r0, ...)
        flat = blk.reshape(self.n_time, -1)
        off = r0 * rest
        sel = flat[:, lo - off : hi - off]
        # one pass: the transposed view materializes directly at dtype
        return np.ascontiguousarray(sel.T.astype(dtype, copy=False))


def feed_zarr_cells(store: str, mesh, var: str | None = None):
    """This process's cell slice of a zarr grid -> global cell-sharded array.

    Returns ``(global (C_padded, T) device array, n_cells, time_index)``;
    rows past the true cell count (shard padding) are NaN.
    """
    src = ZarrGridSource(store, var)
    sl = host_cell_slice(src.n_cells, mesh)
    local = src.read_cells(sl.start, sl.stop)
    want = sl.stop - sl.start
    if local.shape[0] < want:  # last process: pad rows past n_cells
        pad = np.full((want - local.shape[0], src.n_time), np.nan)
        local = np.concatenate([local, pad], axis=0)
    arr, n_cells = feed_cells(local, src.n_cells, mesh)
    return arr, n_cells, src.index
