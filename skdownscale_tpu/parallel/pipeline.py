"""The production loop: zarr store -> chip -> zarr store, double-buffered.

The reference's end-to-end workflow is "read zarr from object storage into
xarray, apply the estimator per cell via dask, write the result back"
(``/root/reference/examples/utils.py:12-77`` + the chunked apply at
``/root/reference/skdownscale/pointwise_models/core.py:256-336``).  This
module is that loop TPU-native and explicit:

* input chunks are read straight off the (v2 or v3) store with
  :class:`~skdownscale_tpu.parallel.zarr_io.ZarrGridSource` — row-band
  aligned so store IO is chunk-aligned;
* NaN (ocean) cells are compacted out per chunk, the batched registry
  fit+predict runs on device, and outputs scatter back under NaN;
* corrected chunks are encoded and written incrementally with
  :class:`~skdownscale_tpu.utils.zarrlite.ZarrChunkWriter` (v3 sharded /
  blosc / crc32c all available on the way out);
* the host side of chunk ``i+1`` (store read + decode + pack + device_put)
  runs on a worker thread while the device computes chunk ``i`` and the
  main thread writes chunk ``i-1``'s output — the double-buffered feed
  (``utils/prefetch.py``), which is what makes sustained throughput track
  ``max(host, device)`` instead of their sum.

Every stage is timed (cumulative seconds across chunks, measured inside
the thread that runs it) and returned in a :class:`PipelineReport`, so the
BASELINE "pipeline" row can state the read / pack / device / write split
rather than one opaque wall number.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from ..utils import zarrlite
from ..utils.prefetch import prefetched
from .zarr_io import ZarrGridSource

__all__ = ["PipelineReport", "run_pointwise_pipeline"]


@dataclass
class PipelineReport:
    """Stage-split accounting for one pipeline run.

    ``read_s``/``pack_s``/``put_s`` accumulate on the prefetch worker;
    ``device_s`` (dispatch + compute + D2H readback) and ``write_s``
    (encode + store put) on the main thread.  With the double buffer the
    wall tracks ``max(worker, main)`` per chunk, not the sum — ``overlap_s``
    is the host time the buffer hid (serial sum minus wall)."""

    n_cells: int = 0
    n_valid: int = 0
    n_chunks: int = 0
    wall_s: float = 0.0
    read_s: float = 0.0
    pack_s: float = 0.0
    put_s: float = 0.0
    device_s: float = 0.0
    write_s: float = 0.0
    checksum: float = 0.0  # sum of corrected output (host-read barrier)
    stages: dict = field(default_factory=dict)

    @property
    def cells_per_sec(self) -> float:
        return self.n_cells / self.wall_s if self.wall_s else float("nan")

    @property
    def overlap_s(self) -> float:
        serial = self.read_s + self.pack_s + self.put_s + self.device_s + self.write_s
        return serial - self.wall_s

    def summary(self) -> str:
        return (
            f"{self.n_cells:,} cells ({self.n_valid:,} valid) in {self.wall_s:.2f}s "
            f"= {self.cells_per_sec:,.0f} cells/s | read {self.read_s:.2f}s "
            f"pack {self.pack_s:.2f}s h2d {self.put_s:.2f}s device {self.device_s:.2f}s "
            f"write {self.write_s:.2f}s (overlap hid {self.overlap_s:.2f}s)"
        )


def _row_aligned_chunks(n_cells: int, rest: int, cell_chunk: int):
    """Flat-cell spans aligned to whole leading spatial rows, so store reads
    and output chunks are both row bands on the store's own grid."""
    rows_per = max(cell_chunk // rest, 1)
    step = rows_per * rest
    return [(lo, min(lo + step, n_cells)) for lo in range(0, n_cells, step)], rows_per


def run_pointwise_pipeline(
    store_in,
    store_out,
    model=None,
    *,
    gcm_var: str = "gcm",
    obs_var: str = "obs",
    out_var: str = "corrected",
    cell_chunk: int = 131072,
    zarr_format: int = 3,
    compressor: str = "blosc",
    inner_chunks=None,
    checksum: bool = False,
    out_dtype=np.float32,
    pad_to: int | None = None,
) -> PipelineReport:
    """Read a (time, \\*spatial) GCM + obs grid pair from ``store_in``, run
    the model's batched fit+predict cell-chunked on device, and write the
    corrected grid to ``store_out`` — the measured store->chip->store loop.

    ``store_in``/``store_out`` are paths or dict-like key->bytes mappings
    (S3 mappers included; :mod:`..utils.zarrlite`).  ``model`` defaults to
    ``BcsdTemperature(return_anoms=False)``; any estimator with a batched
    registry entry works.  The output store chunk is one pipeline row band
    (so each device pass writes exactly one store object); ``inner_chunks``
    (v3) makes each band a ``sharding_indexed`` shard of that inner chunk
    shape, and ``checksum`` adds verified crc32c to the chunk chain.

    ``pad_to`` pads each chunk's VALID (post-NaN-compaction) cell count up
    to a multiple by replicating the last valid cell (outputs sliced off),
    so chunks with a few ocean cells reuse the full chunk's compiled
    program — a fresh XLA compile costs minutes on the remote-compile rig
    (the ``cell_bucket`` idea from ``PointWiseDownscaler``, here as a
    plain multiple).
    """
    import jax
    import jax.numpy as jnp

    from ..models import batched as _b

    if model is None:
        from ..models.bcsd import BcsdTemperature

        model = BcsdTemperature(return_anoms=False)
    if not _b.supports_batched(model):
        raise ValueError(f"{type(model).__name__} has no batched registry entry")

    rep = PipelineReport()
    t_wall = time.perf_counter()

    gcm = ZarrGridSource(store_in, gcm_var)
    obs = ZarrGridSource(store_in, obs_var)
    if gcm.spatial_shape != obs.spatial_shape or gcm.n_time != obs.n_time:
        raise ValueError(
            f"gcm {gcm.spatial_shape}x{gcm.n_time} and obs "
            f"{obs.spatial_shape}x{obs.n_time} grids do not align"
        )
    index = gcm.index
    T, C = gcm.n_time, gcm.n_cells
    spatial = gcm.spatial_shape
    rest = int(np.prod(spatial[1:])) if len(spatial) > 1 else 1
    spans, rows_per = _row_aligned_chunks(C, rest, cell_chunk)
    rep.n_cells = C
    rep.n_chunks = len(spans)

    out_store = zarrlite._as_store(store_out)
    if zarr_format == 3:
        zarrlite._put_json(
            out_store, "zarr.json",
            {"zarr_format": 3, "node_type": "group", "attributes": {}},
        )
    else:
        zarrlite._put_json(out_store, ".zgroup", {"zarr_format": 2})
    band = (T, rows_per, *spatial[1:])
    writer = zarrlite.ZarrChunkWriter(
        out_store,
        shape=(T, *spatial),
        dtype=np.dtype(out_dtype),
        chunks=tuple(inner_chunks) if inner_chunks is not None else band,
        shards=band if inner_chunks is not None else None,
        compressor=compressor,
        zarr_format=zarr_format,
        prefix=out_var,
        checksum=checksum,
    )
    # time member so the output round-trips its DatetimeIndex
    import pandas as pd

    if isinstance(index, pd.DatetimeIndex):
        tvals = np.asarray(index, dtype="datetime64[ns]").view(np.int64)
        tattrs = {"kind": "datetime64[ns]"}
    else:
        tvals, tattrs = np.asarray(index), None
    zarrlite.save_array(
        out_store, tvals, prefix="time", zarr_format=zarr_format, attrs=tattrs
    )

    def prep(span):
        lo, hi = span
        t0 = time.perf_counter()
        xc = gcm.read_cells(lo, hi, dtype=np.float32)  # (n, T) contiguous
        yc = obs.read_cells(lo, hi, dtype=np.float32)
        t1 = time.perf_counter()
        rep.read_s += t1 - t0
        first = xc[:, 0]
        valid = np.isfinite(first)
        ids = np.nonzero(valid)[0]
        if len(ids) == xc.shape[0]:  # no ocean cells in this band: zero-copy
            xv, yv = xc, yc
        else:
            xv = np.ascontiguousarray(xc[ids])
            yv = np.ascontiguousarray(yc[ids])
        if pad_to and len(ids) % pad_to and len(ids):
            n_pad = pad_to - len(ids) % pad_to
            xv = np.concatenate([xv, np.repeat(xv[-1:], n_pad, axis=0)])
            yv = np.concatenate([yv, np.repeat(yv[-1:], n_pad, axis=0)])
        t2 = time.perf_counter()
        rep.pack_s += t2 - t1
        xd = jax.device_put(xv)[..., None]
        yd = jax.device_put(yv)
        rep.put_s += time.perf_counter() - t2
        return span, ids, xd, yd

    for span, ids, xd, yd in prefetched(spans, prep):
        lo, hi = span
        t0 = time.perf_counter()
        if len(ids):
            state = _b.batched_fit(model, index, xd, yd)
            out = np.asarray(_b.batched_predict(model, state, index, xd, index))
            del state
        else:
            out = np.empty((0, T), np.float32)
        rep.checksum += float(np.nansum(out, dtype=np.float64))
        t1 = time.perf_counter()
        rep.device_s += t1 - t0
        full = np.full((hi - lo, T), np.nan, out_dtype)
        full[ids] = out.reshape(-1, T)[: len(ids)]  # drop pad_to rows
        block = full.T.reshape(T, (hi - lo) // rest, *spatial[1:])
        writer.write_chunk((0, lo // (rows_per * rest)) + (0,) * (len(spatial) - 1), block)
        rep.write_s += time.perf_counter() - t1
        rep.n_valid += len(ids)

    rep.wall_s = time.perf_counter() - t_wall
    return rep
