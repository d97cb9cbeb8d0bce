"""On-chip HBM-traffic capture via the JAX profiler (VERDICT r3 #3).

BASELINE.md's roofline quotes XLA's program-level ``bytes accessed`` cost
estimate, documented as "an upper bound that double-counts".  This harness
pins the over-count with a real profiler trace of one fit+predict pass of

* config 2 — monthly dense BCSD, 131,072 cells (the driver headline), and
* config 5 — daily_nasa-nex streaming BCSD, 32,768 cells,

and reports three byte accountings side by side:

1. ``est_bytes``  — jax ``compiled.cost_analysis()['bytes accessed']``
   (the current BASELINE number; includes every operand of every fusion
   in every memory space, so re-materialized and VMEM-resident operands
   double-count);
2. ``xprof_hbm_bytes`` — xprof's per-op op_metrics restricted to the HBM
   memory space (``rawBytesAccessedArray[0]`` of the op_profile tool =
   MEM_BW_TYPE_HBM_RW), summed over executed ops — same cost model, but
   per-op, per-space accounting;
3. ``bw_bound_bytes`` — measured device BUSY time x peak HBM bandwidth:
   a hard upper bound on bytes that physically moved (nothing can exceed
   peak), from the trace's measured per-op durations.

True utilization lies between ``xprof_hbm_bytes / (busy * bw)`` and 1.0 of
whatever the binding stage allows; ``est / bw_bound`` > 1 proves the
program-level estimate over-counts and by how much.

Run AFTER any other TPU job finishes (one chip):
    python benchmarks/hbm_profile_tpu.py [2] [5] [2b]
(default: 2 5; "2b" adds the 1M monthly streaming pass)
"""

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _bytes_accessed, _device_peak_bw, _enable_compile_cache, _example

_enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp


def _parse(tdir):
    fs = glob.glob(os.path.join(tdir, "plugins/profile/*/*.xplane.pb"))
    from xprof.convert import raw_to_tool_data as r

    out, _ = r.xspace_to_tool_data(fs, "op_profile", {})
    d = json.loads(out if isinstance(out, str) else out.decode())
    root = d["byProgram"]
    m = root["metrics"]
    idle_ps = 0
    tops = []
    for c in root.get("children", []):
        cm = c.get("metrics", {})
        if c.get("name") == "IDLE":
            idle_ps = cm.get("rawTime", 0)
        else:
            tops.append(c)

    def flatten(node):
        ch = node.get("children", [])
        if not ch:
            yield node
        for c in ch:
            yield from flatten(c)

    leaves = [l for t in tops for l in flatten(t)]
    leaves.sort(key=lambda n: -n["metrics"].get("rawTime", 0))
    top12 = [
        {
            "op": l.get("name", "?")[:60],
            "time_ms": round(l["metrics"].get("rawTime", 0) * 1e-9, 3),
            "hbm_gb": round(
                l["metrics"].get("rawBytesAccessedArray", [0])[0] / 1e9, 3
            ),
        }
        for l in leaves[:12]
    ]
    return {
        "busy_s": (m["rawTime"] - idle_ps) * 1e-12,
        "xprof_hbm_bytes": m.get("rawBytesAccessedArray", [0])[0],
        "top_ops": top12,
    }


def capture(tag, run, lowered):
    run()  # compile + warm
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    tdir = f"/tmp/hbmprof_{tag}"
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        run()
    est = sum(_bytes_accessed(l.compile()) for l in lowered)
    p = _parse(tdir)
    bw = _device_peak_bw() or float("nan")
    bw_bound = p["busy_s"] * bw
    print(
        json.dumps(
            {
                "config": tag,
                "wall_s": round(wall, 4),
                "busy_s": round(p["busy_s"], 4),
                "est_bytes_gb": round(est / 1e9, 2),
                "xprof_hbm_bytes_gb": round(p["xprof_hbm_bytes"] / 1e9, 2),
                "bw_bound_bytes_gb": round(bw_bound / 1e9, 2),
                "est_overcount_vs_bound": round(est / bw_bound, 3),
                "hbm_util_est": round(est / (wall * bw), 3),
                "hbm_util_xprof_busy": round(p["xprof_hbm_bytes"] / (p["busy_s"] * bw), 3),
                "top_ops": p["top_ops"],
            }
        )
    )


def config2(n_cells=131072, n_time=480):
    from skdownscale_tpu.models.bcsd import BcsdTemperature, _jit_fit, _jit_predict

    index, x, y = _example(n_cells, n_time)
    model = BcsdTemperature(return_anoms=False)
    fg = model._fit_groups(index)
    plan = model._predict_plan(fg, index)
    fitj = _jit_fit(fg, True, 0.4, 0.4, False)
    predj = _jit_predict(plan, "temperature", False, 0.4, 0.4, "both", 10, False)
    xd, yd = jax.device_put(x), jax.device_put(y)

    def run():
        state = fitj(xd, yd)
        return float(jnp.sum(predj(state, xd)))

    state = fitj(xd, yd)
    capture("monthly_dense_131k", run, [fitj.lower(xd, yd), predj.lower(state, xd)])


def config5(n_cells=32768, n_years=20):
    import pandas as pd

    from skdownscale_tpu.models.bcsd import BcsdTemperature, _jit_fit_lazy, _jit_predict_stream

    rng = np.random.default_rng(0)
    index = pd.date_range("1990-01-01", periods=n_years * 365 + 5, freq="D")
    n_time = len(index)
    seas = 10.0 * np.sin(2 * np.pi * (index.dayofyear.to_numpy() - 1) / 365.25)
    x = (283.0 + seas[None, :] + rng.normal(0, 2, (n_cells, n_time)) + 1.5).astype(np.float32)
    y = (282.0 + seas[None, :] + rng.normal(0, 1.8, (n_cells, n_time))).astype(np.float32)
    model = BcsdTemperature(time_grouper="daily_nasa-nex", return_anoms=False)
    fg = model._fit_groups(index)
    plan = model._predict_plan(fg, index)
    fitj = _jit_fit_lazy(fg, True)
    predj = _jit_predict_stream(plan, "temperature", False, 0.4, 0.4, "both", 10, False, 8)
    xd, yd = jax.device_put(x), jax.device_put(y)

    def run():
        state = fitj(xd, yd)
        return float(jnp.sum(predj(state, xd)))

    state = fitj(xd, yd)
    lowered = [fitj.lower(xd, yd)]
    if hasattr(predj, "lowered_parts"):
        lowered += predj.lowered_parts(state, xd)
    else:
        lowered.append(predj.lower(state, xd))
    capture("daily_stream_32k", run, lowered)


def config2b(n_cells=1048576, n_time=480):
    """The 1M monthly STREAMING single pass (BASELINE 2b, hbm_util 0.426 —
    the least-saturated BCSD config; this capture splits its gap between
    dispatch idle, Pallas kernel time, and XLA bandwidth)."""
    from skdownscale_tpu.models.bcsd import (
        BcsdTemperature,
        _jit_fit_lazy,
        _jit_predict_stream,
    )

    index, x, y = _example(n_cells, n_time)
    model = BcsdTemperature(return_anoms=False)
    fg = model._fit_groups(index)
    plan = model._predict_plan(fg, index)
    fitj = _jit_fit_lazy(fg, True)
    predj = _jit_predict_stream(plan, "temperature", False, 0.4, 0.4, "both", 10, False, 2)
    xd, yd = jax.device_put(x), jax.device_put(y)

    def run():
        state = fitj(xd, yd)
        return float(jnp.sum(predj(state, xd)))

    state = fitj(xd, yd)
    lowered = [fitj.lower(xd, yd)]
    if hasattr(predj, "lowered_parts"):
        lowered += predj.lowered_parts(state, xd)
    else:
        lowered.append(predj.lower(state, xd))
    capture("monthly_stream_1m", run, lowered)


def config7(n_cells=32768, n_years=20, window=31):
    """zscore 32k (BASELINE config 7): gathers + windowed sums, no sorts —
    the lowest headline hbm_util; this capture shows where the busy time
    actually goes."""
    import pandas as pd

    from skdownscale_tpu.models.zscore import (
        build_year_doy_table,
        expand_indices,
        zscore_fit,
        zscore_predict,
    )

    rng = np.random.default_rng(0)
    index = pd.date_range("1990-01-01", periods=n_years * 365 + 5, freq="D")
    n_time = len(index)
    seas = 10.0 * np.sin(2 * np.pi * (index.dayofyear.to_numpy() - 1) / 365.25).astype(np.float32)
    x = (283.0 + seas[None, :] + rng.normal(0, 2, (n_cells, n_time)) + 1.5).astype(np.float32)
    y = (282.0 + seas[None, :] + rng.normal(0, 1.8, (n_cells, n_time))).astype(np.float32)
    idx, mask = build_year_doy_table(index)
    inds = expand_indices(n_time)
    idxd, maskd, indsd = jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(inds)
    fitj = jax.jit(jax.vmap(lambda a, b: zscore_fit(a, b, idxd, maskd, window=window)))
    predj = jax.jit(jax.vmap(lambda s, xx: zscore_predict(s, xx, indsd, window=window)[0]))
    xd, yd = jax.device_put(x), jax.device_put(y)

    def run():
        state = fitj(xd, yd)
        return float(jnp.nansum(predj(state, xd)))

    state = fitj(xd, yd)
    capture("zscore_32k", run, [fitj.lower(xd, yd), predj.lower(state, xd)])


def config3(n_cells=16384, n_fit=7300, n_predict=3650):
    """QDM general path (BASELINE config 3): the sort-bound config."""
    from skdownscale_tpu.models.quantile import edcdfm_predict, qmr_fit

    _, x, y = _example(n_cells, n_fit)
    _, xq, _ = _example(n_cells, n_predict, seed=1)
    xd, yd, xqd = jax.device_put(x), jax.device_put(y), jax.device_put(xq)

    def run():
        st = qmr_fit(xd, yd, extrapolate="both")
        out = edcdfm_predict(st, xqd, kind="difference", extrapolate="both")
        return float(jnp.sum(out))

    capture("qdm_general_16k", run, [])


if __name__ == "__main__":
    configs = sys.argv[1:] or ["2", "5"]
    if "2" in configs:
        config2()
    if "5" in configs:
        config5()
    if "2b" in configs:
        config2b()
    if "7" in configs:
        config7()
    if "3" in configs:
        config3()
