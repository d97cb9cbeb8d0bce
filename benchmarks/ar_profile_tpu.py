"""Where does the fused AnalogRegression kernel spend its time?

Compares the full kernel (selection + weighted-OLS stats + in-VMEM Newton
logistic) against thresh=None (no logistic loop) and against the PureAnalog
selection kernel at the same sizes, to attribute the 4b config's wall-clock
between selection and the Newton exceedance fit (BASELINE.md bound table).

Run: python benchmarks/ar_profile_tpu.py [n_cells]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _enable_compile_cache

_enable_compile_cache()  # persistent XLA cache: 175 s -> 1.4 s recompiles

import numpy as np
import jax
import jax.numpy as jnp

from skdownscale_tpu.ops.pallas.knn_kernel import (
    analog_regression_stats,
    pure_analog_stats,
)


def timed(fn, n=3):
    out = fn()
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn()
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n, m, f, k = 3650, 365, 2, 200
    rng = np.random.default_rng(0)
    Xt = jnp.asarray(rng.normal(size=(C, n, f)).astype(np.float32))
    yt = jnp.asarray(rng.normal(size=(C, n)).astype(np.float32))
    Xq = jnp.asarray(rng.normal(size=(C, m, f)).astype(np.float32))
    rnd = jnp.zeros((C, m), jnp.int32)

    t_full = timed(lambda: analog_regression_stats(Xt, yt, Xq, k=k, thresh=0.0))
    print(f"AR full (thresh=0, 12 Newton iters): {t_full*1e3:8.1f} ms")
    t_nolog = timed(lambda: analog_regression_stats(Xt, yt, Xq, k=k, thresh=None))
    print(f"AR thresh=None (no logistic):        {t_nolog*1e3:8.1f} ms")
    t_pa = timed(
        lambda: pure_analog_stats(Xt, yt, Xq, rnd, k=k, kind="mean_analogs")
    )
    print(f"PureAnalog mean_analogs:             {t_pa*1e3:8.1f} ms")
    print(f"=> Newton logistic share: {(t_full-t_nolog)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
