"""Per-stage wall-clock profile of the streaming daily BCSD at 32k cells.

Separates lazy fit, the rolling/shift stage, and the scan itself (via the
precipitation variant, which skips rolling), and sweeps group_chunk — to
decide where the next optimization lever is (BASELINE.md roofline notes).

Run: python benchmarks/daily_profile_tpu.py [n_cells]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _enable_compile_cache

_enable_compile_cache()  # persistent XLA cache: 175 s -> 1.4 s recompiles

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from skdownscale_tpu.models.bcsd import BcsdTemperature, _jit_fit_lazy, _jit_predict_stream


def timed(fn, *args, n=2):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    rng = np.random.default_rng(0)
    index = pd.date_range("1990-01-01", periods=20 * 365 + 5, freq="D")
    T = len(index)
    seas = 10.0 * np.sin(2 * np.pi * (index.dayofyear.to_numpy() - 1) / 365.25)
    x = (283.0 + seas[None, :] + rng.normal(0, 2, (n_cells, T)) + 1.5).astype(np.float32)
    y = (282.0 + seas[None, :] + rng.normal(0, 1.8, (n_cells, T))).astype(np.float32)

    model = BcsdTemperature(time_grouper="daily_nasa-nex", return_anoms=False)
    fg = model._fit_groups(index)
    plan = model._predict_plan(fg, index)
    xd, yd = jax.device_put(x), jax.device_put(y)

    fitj = _jit_fit_lazy(fg, True)
    t_fit = timed(fitj, xd, yd)
    print(f"fit_lazy:                 {t_fit:.3f}s")
    state = fitj(xd, yd)

    for gc in (4, 8, 16):
        predj = _jit_predict_stream(plan, "temperature", False, 0.4, 0.4, "both", 10, False, gc)
        t = timed(predj, state, xd)
        print(f"predict temp  gc={gc:2d}:      {t:.3f}s")

    predp = _jit_predict_stream(plan, "precipitation", False, 0.4, 0.4, "both", 10, False, 8)
    t_p = timed(predp, state, xd)
    print(f"predict precip gc=8 (no rolling/shift): {t_p:.3f}s")


if __name__ == "__main__":
    main()
