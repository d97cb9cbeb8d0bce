#!/usr/bin/env python
"""TPU float32 parity check against the float64 reference implementation.

The golden test suite proves algorithmic parity on CPU at float64; this
script runs the same comparisons on the REAL TPU at float32 and reports the
worst deviations, model by model.  Expected: ~1e-4 relative (float32
round-off through sorts/interps), not algorithmic drift.

Usage: python benchmarks/tpu_parity_check.py
"""

import sys
import types

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.modules.setdefault("xarray", types.ModuleType("xarray"))
sys.path.insert(0, "/root/reference")

import numpy as np
import pandas as pd


def rel_err(a, b):
    a, b = np.asarray(a, dtype=float).ravel(), np.asarray(b, dtype=float).ravel()
    m = np.isfinite(a) & np.isfinite(b)
    denom = np.maximum(np.abs(b[m]), 1e-6)
    return float(np.max(np.abs(a[m] - b[m]) / denom)) if m.any() else float("nan")


def main():
    import jax

    import skdownscale_tpu as sdt
    import skdownscale.pointwise_models as ref

    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0]})")
    rng = np.random.default_rng(7)
    idx = pd.date_range("1980-01-01", "2009-12-01", freq="MS")
    n = len(idx)
    seas = 10 * np.sin(2 * np.pi * (idx.month.values - 1) / 12)
    X = pd.DataFrame({"t": (283 + seas + rng.normal(0, 2, n) + 1.5).astype(np.float32)}, index=idx)
    y = pd.DataFrame({"t": (282 + seas + rng.normal(0, 1.8, n)).astype(np.float32)}, index=idx)

    results = {}

    r = ref.BcsdTemperature(return_anoms=False).fit(X.astype(float), y.astype(float)).predict(X.astype(float))
    o = sdt.BcsdTemperature(return_anoms=False).fit(X, y).predict(X)
    results["BcsdTemperature"] = rel_err(o, r)

    r = ref.QuantileMappingReressor(extrapolate="both").fit(X.astype(float), y["t"].astype(float)).predict(X.astype(float))
    o = sdt.QuantileMappingReressor(extrapolate="both").fit(X, y["t"]).predict(X)
    results["QuantileMappingReressor"] = rel_err(o, r)

    r = ref.EquidistantCdfMatcher(kind="difference").fit(X.astype(float), y["t"].astype(float)).predict(X.astype(float))
    o = sdt.EquidistantCdfMatcher(kind="difference").fit(X, y["t"]).predict(X)
    results["EquidistantCdfMatcher"] = rel_err(o, r)

    r = ref.QuantileMapper().fit(X.astype(float)).transform(X.astype(float))
    o = sdt.QuantileMapper().fit(X).transform(X)
    results["QuantileMapper"] = rel_err(o, r)

    Xg = pd.DataFrame(
        {"a": rng.normal(10, 3, n).astype(np.float32), "b": rng.normal(0, 1, n).astype(np.float32)},
        index=idx,
    )
    yg = (0.2 * Xg["a"] + rng.normal(0, 2, n) + 13).astype(np.float32)
    r = ref.PureAnalog(n_analogs=30, kind="mean_analogs").fit(Xg.astype(float), yg.astype(float)).predict(Xg.astype(float))
    o = sdt.PureAnalog(n_analogs=30, kind="mean_analogs").fit(Xg, yg).predict(Xg)
    results["PureAnalog"] = rel_err(o, r)

    r = ref.PureRegression(thresh=13.0).fit(Xg.astype(float), yg.astype(float)).predict(Xg.astype(float))
    o = sdt.PureRegression(thresh=13.0).fit(Xg, yg).predict(Xg)
    results["PureRegression"] = rel_err(np.asarray(o)[:, 0], np.asarray(r)[:, 0])

    worst = max(results.values())
    for k, v in results.items():
        print(f"{k:<26} max rel err {v:.2e}")
    print(f"WORST: {worst:.2e} ({'OK (f32 round-off)' if worst < 5e-3 else 'INVESTIGATE'})")
    return 0 if worst < 5e-3 else 1


if __name__ == "__main__":
    sys.exit(main())
