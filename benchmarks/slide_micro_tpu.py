"""On-chip micro-benchmark of the sliding sorted-window kernel.

Isolates ``slide_sorted_windows`` (the daily-BCSD fit-window slide,
ref ``bcsd.py:36-44`` semantics) at the 32k-cell / 20-year daily shape the
streaming scan uses, so shift-pass changes in the kernel are measurable
apart from the rest of the predict pipeline.  Prints the slide wall-clock
and, for scale, the equivalent 31 from-scratch ``lax.sort`` windows.

Run: python benchmarks/slide_micro_tpu.py [n_cells]
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

from skdownscale_tpu.models.slide import build_slide_plan
from skdownscale_tpu.ops.pallas.slide_sort_kernel import slide_sorted_windows
from skdownscale_tpu.utils.timeindex import TimeIndex, padded_doy_groups


def timed(fn, *args, n=3):
    out = fn(*args)
    _ = float(jnp.sum(out))
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    rng = np.random.default_rng(0)
    index = pd.date_range("1990-01-01", periods=20 * 365 + 5, freq="D")
    ti = TimeIndex.from_pandas(index)
    fit = padded_doy_groups(ti, offset=15)
    plan = build_slide_plan(fit, np.arange(31))
    assert plan is not None
    T = len(index)
    y = jax.device_put(rng.normal(280.0, 5.0, (n_cells, T)).astype(np.float32))

    slide = jax.jit(lambda a: slide_sorted_windows(a, plan))
    t_slide = timed(slide, y)
    print(f"slide kernel ({len(plan.consulted)} windows, {n_cells} cells): {t_slide*1e3:.1f} ms")

    idx = jnp.asarray(np.maximum(fit.indices[plan.consulted], 0))
    padm = jnp.asarray(fit.indices[plan.consulted] < 0)

    @jax.jit
    def resort(a):
        w = a[:, idx.reshape(-1)].reshape(a.shape[0], *idx.shape)
        w = jnp.where(padm[None], jnp.inf, w)
        return jnp.sort(w, axis=-1)

    t_sort = timed(resort, y)
    print(f"31 from-scratch lax.sort windows:          {t_sort*1e3:.1f} ms")
    print(f"speedup: {t_sort/t_slide:.2f}x")


if __name__ == "__main__":
    main()
