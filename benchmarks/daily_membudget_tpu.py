"""Daily single-pass HBM budget: prove 65,536 cells fits or doesn't.

VERDICT r4 weak #4: after ``_StreamPredictor._strip_y`` the measured daily
(20 y, T=7305) single-pass ceiling is 49,152 cells; 65,536 still dies with
ResourceExhausted.  Rather than re-triggering the OOM (which wedges this
rig's tunnel), this harness AOT-compiles each stage of the daily pipeline at
both cell counts and prints XLA's own ``memory_analysis()`` — exact
argument / output / temp / alias allocation bytes per program — plus the
standing-buffer ledger the stages share.  The sum is the committed budget
table for BASELINE.md: if any stage's ``args + outputs + temps`` (minus
aliased) exceeds the chip's free HBM, 65k cannot fit without restructuring
that stage, and the table names the buffer to attack.

Stages (the production path, bench_daily single-pass):
  fit     — ``_jit_fit_lazy``: x,y in; lazy state out (holds y + climo)
  slide   — sliding sorted-window kernel: state.y in; flat svals out
  scan    — ``bcsd_predict_streaming`` with precomputed svals; y stripped

Run AFTER other TPU jobs finish:  python benchmarks/daily_membudget_tpu.py
[n_cells ...] (default 49152 65536)
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _enable_compile_cache

_enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp


def _mem(compiled):
    ma = compiled.memory_analysis()
    gb = 1 / 1e9
    out = {
        "args_gb": round(ma.argument_size_in_bytes * gb, 3),
        "out_gb": round(ma.output_size_in_bytes * gb, 3),
        "temp_gb": round(ma.temp_size_in_bytes * gb, 3),
        "alias_gb": round(ma.alias_size_in_bytes * gb, 3),
    }
    out["peak_gb"] = round(
        (ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes
         - ma.alias_size_in_bytes) * gb, 3,
    )
    return out


def budget(n_cells, n_years=20, group_chunk=8):
    import pandas as pd

    from skdownscale_tpu.models.bcsd import (
        BcsdTemperature,
        _jit_fit_lazy,
        _jit_predict_stream,
        _slide_n_rows,
    )

    index = pd.date_range("1990-01-01", periods=n_years * 365 + 5, freq="D")
    T = len(index)
    model = BcsdTemperature(time_grouper="daily_nasa-nex", return_anoms=False)
    fg = model._fit_groups(index)
    plan = model._predict_plan(fg, index)
    fitj = _jit_fit_lazy(fg, True)
    predj = _jit_predict_stream(
        plan, "temperature", False, 0.4, 0.4, "both", 10, False, group_chunk
    )

    x = jax.ShapeDtypeStruct((n_cells, T), jnp.float32)
    y = jax.ShapeDtypeStruct((n_cells, T), jnp.float32)
    report = {"n_cells": n_cells, "T": T}

    fit_l = fitj.lower(x, y)
    report["fit"] = _mem(fit_l.compile())
    state = jax.eval_shape(fitj, x, y)

    n_rows = _slide_n_rows(plan, group_chunk)
    Lto = plan.slide.Lto
    svals = jax.ShapeDtypeStruct((n_cells, n_rows * Lto), jnp.float32)
    slide_l = predj._slide.lower(
        state.y, plan=plan.slide, n_rows=n_rows, interpret=False
    )
    report["slide"] = _mem(slide_l.compile())

    stripped = state._replace(y=jax.ShapeDtypeStruct((n_cells, 0), jnp.float32))
    scan_l = predj._inner.lower(stripped, x, svals)
    report["scan"] = _mem(scan_l.compile())

    # standing buffers co-resident with each stage (float32 GB)
    gb = 4 * n_cells / 1e9
    standing = {
        "x_gb": round(gb * T, 3),
        "y_raw_gb": round(gb * T, 3),
        "svals_gb": round(gb * n_rows * Lto, 3),
        "out_gb": round(gb * T, 3),
    }
    report["standing"] = standing
    report["slide_peak_plus_x_gb"] = round(
        report["slide"]["peak_gb"] + standing["x_gb"], 3
    )
    # during the scan, x and svals are args (already counted); y is stripped
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    cells = [int(a) for a in sys.argv[1:]] or [49152, 65536]
    for c in cells:
        budget(c)
