#!/usr/bin/env python
"""Continental-scale BCSD in a single device pass.

Demonstrates the streaming formulation (models/streaming.py): above
``skdownscale_tpu.models.batched.STREAMING_CELL_THRESHOLD`` cells,
``PointWiseDownscaler`` fits BCSD lazily (raw series + climatology matmuls)
and predicts with a group-chunked ``lax.scan`` — 1M cells of 40-year monthly
data run unchunked on one 16 GB TPU chip at ~730k cells/s (BASELINE.md 2b).

Usage: python examples/continental_bcsd.py [n_side]   (grid is n_side^2 cells;
default 256 -> 65,536 cells so the example also runs quickly on CPU)

       python examples/continental_bcsd.py [n_side] --zarr [DIR]
           the full production loop: read GCM+obs from a zarr store (written
           on first run), run chunked BCSD on device with the double-buffered
           host feed, write the corrected grid back as zarr v3 — and print
           the read / pack / h2d / device / write stage split
           (parallel/pipeline.py; the reference's equivalent pulls zarr via
           s3fs+dask and writes with xarray, examples/utils.py:12-77)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import pandas as pd

import skdownscale_tpu as sdt
from skdownscale_tpu.xlite import DataArray


def _write_store(path, n_side, index):
    """Synthetic GCM + obs grids as one zarr group per variable (spatially
    chunked, like a real CONUS store)."""
    from skdownscale_tpu.utils import zarrlite

    T = len(index)
    rng = np.random.default_rng(0)
    seasonal = 8.0 * np.sin(2 * np.pi * (index.month.to_numpy() - 1) / 12)
    shape = (T, n_side, n_side)
    X = (283.0 + seasonal[:, None, None] + rng.normal(0, 2, shape) + 1.5).astype(np.float32)
    y = (282.0 + seasonal[:, None, None] + rng.normal(0, 1.8, shape)).astype(np.float32)
    X[:, 0, 0] = np.nan  # an ocean cell
    cy = max(n_side // 4, 1)
    zarrlite.save_group(
        path,
        {"gcm": X, "obs": y, "time": np.asarray(index, dtype="datetime64[ns]").view(np.int64)},
        chunks={"gcm": (T, cy, n_side), "obs": (T, cy, n_side), "time": (T,)},
    )
    # mark the time member so readers rebuild a DatetimeIndex
    zarrlite.save_array(f"{path}/time", np.asarray(index, dtype="datetime64[ns]").view(np.int64), attrs={"kind": "datetime64[ns]"})
    return path


def main():
    if "--cpu" in sys.argv:  # env-var platform forcing is unreliable (CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_side = int(args[0]) if args else 256
    index = pd.date_range("1970-01-01", periods=480, freq="MS")
    T = len(index)

    if "--zarr" in sys.argv:
        import os

        from skdownscale_tpu.parallel.pipeline import run_pointwise_pipeline
        from skdownscale_tpu.utils import zarrlite

        i = sys.argv.index("--zarr")
        store = (
            sys.argv[i + 1]
            if len(sys.argv) > i + 1 and not sys.argv[i + 1].isdigit()
            else "/tmp/sdt_example.zarr"
        )
        if not os.path.exists(store):
            print(f"writing synthetic store {store} ...")
            _write_store(store, n_side, index)
        out_store = store.rstrip("/") + ".corrected"
        rep = run_pointwise_pipeline(
            store,
            out_store,
            sdt.BcsdTemperature(return_anoms=False),
            cell_chunk=131072,
            zarr_format=3,
            compressor="blosc",
            checksum=True,
        )
        print(f"store -> chip -> store ({store} -> {out_store}):")
        print("  " + rep.summary())
        out = zarrlite.open_group(out_store)
        v = np.asarray(out["corrected"])
        obs = np.asarray(zarrlite.open_group(store)["obs"])
        print(f"  ocean cell NaN-preserved: {np.isnan(v[:, 0, 0]).all()}")
        print(f"  bias removed: corrected mean {np.nanmean(v):.3f} vs obs {np.nanmean(obs):.3f}")
        return
    else:
        rng = np.random.default_rng(0)
        seasonal = 8.0 * np.sin(2 * np.pi * (index.month.to_numpy() - 1) / 12)
        shape = (T, n_side, n_side)
        X = (283.0 + seasonal[:, None, None] + rng.normal(0, 2, shape) + 1.5).astype(np.float32)
        y = (282.0 + seasonal[:, None, None] + rng.normal(0, 1.8, shape)).astype(np.float32)
        X[:, 0, 0] = np.nan  # an ocean cell

    coords = {"time": index, "y": np.arange(n_side), "x": np.arange(n_side)}
    Xda = DataArray(X, ("time", "y", "x"), coords)
    yda = DataArray(y, ("time", "y", "x"), coords)

    d = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False))
    t0 = time.perf_counter()
    d.fit(Xda, yda)
    out = d.predict(Xda)
    dt = time.perf_counter() - t0
    v = np.asarray(out.values)
    n_cells = n_side * n_side
    print(f"{n_cells:,} cells fit+predict in {dt:.2f}s ({n_cells / dt:,.0f} cells/s, incl. host packing)")
    print(f"ocean cell NaN-preserved: {np.isnan(v[:, 0, 0]).all()}")
    print(f"bias removed: corrected mean {np.nanmean(v):.3f} vs obs {np.nanmean(y):.3f}")


if __name__ == "__main__":
    main()
