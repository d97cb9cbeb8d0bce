#!/usr/bin/env python
"""End-to-end grid benchmark THROUGH the public PointWiseDownscaler API.

Unlike bench.py (functional-core steady state), this times the whole
user-facing path: host packing (native gridpack), device transfer, batched
compute, and unpacking back to the labeled grid — i.e. what a user actually
experiences, including ocean-cell compaction.

CAVEAT (this environment): the tunneled TPU's device->host readback runs at
~25 MB/s (vs ~GB/s co-located), so end-to-end numbers here are
transfer-bound artifacts; compute is the bench.py number.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _enable_compile_cache

_enable_compile_cache()  # persistent XLA cache: 175 s -> 1.4 s recompiles

import numpy as np
import pandas as pd


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    ny = int(np.sqrt(n_cells))
    nx = (n_cells + ny - 1) // ny

    import skdownscale_tpu as sdt
    from skdownscale_tpu.xlite import DataArray

    rng = np.random.default_rng(0)
    idx = pd.date_range("1970-01-01", periods=480, freq="MS")
    T = len(idx)
    seas = 8 * np.sin(2 * np.pi * (idx.month.to_numpy() - 1) / 12)
    X = (283 + seas[:, None, None] + rng.normal(0, 2, (T, ny, nx)) + 1.5).astype(np.float32)
    y = (282 + seas[:, None, None] + rng.normal(0, 1.8, (T, ny, nx))).astype(np.float32)
    X[:, :, : max(nx // 10, 1)] = np.nan  # 10% ocean strip
    coords = {"time": idx, "y": np.arange(ny), "x": np.arange(nx)}
    Xg = DataArray(X, ("time", "y", "x"), coords)
    yg = DataArray(y, ("time", "y", "x"), coords)

    d = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False))
    # warm (compile)
    d.fit(Xg, yg)
    d.predict(Xg)

    t0 = time.perf_counter()
    d.fit(Xg, yg)
    t_fit = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = d.predict(Xg)
    t_pred = time.perf_counter() - t0

    n_valid = int(np.isfinite(X[0, 0]).sum() * ny) if False else int(d._mask.sum())
    assert np.isfinite(out.values[:, :, nx // 10 :]).all()
    print(
        json.dumps(
            {
                "metric": "bcsd_grid_end_to_end",
                "value": round(n_valid / (t_fit + t_pred), 1),
                "unit": "cells/sec incl. pack/transfer/unpack (40y monthly BCSD)",
                "fit_s": round(t_fit, 2),
                "predict_s": round(t_pred, 2),
                "valid_cells": n_valid,
            }
        )
    )


if __name__ == "__main__":
    main()
