#!/usr/bin/env python
"""Continental-scale BCSD in a single device pass.

Demonstrates the streaming formulation (models/streaming.py): above
``skdownscale_tpu.models.batched.STREAMING_CELL_THRESHOLD`` cells,
``PointWiseDownscaler`` fits BCSD lazily (raw series + climatology matmuls)
and predicts with a group-chunked ``lax.scan`` — 1M cells of 40-year monthly
data run unchunked on one 16 GB TPU chip at ~730k cells/s (BASELINE.md 2b).

Usage: python examples/continental_bcsd.py [n_side]   (grid is n_side^2 cells;
default 256 -> 65,536 cells so the example also runs quickly on CPU)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import pandas as pd

import skdownscale_tpu as sdt
from skdownscale_tpu.xlite import DataArray


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    index = pd.date_range("1970-01-01", periods=480, freq="MS")
    T = len(index)
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
