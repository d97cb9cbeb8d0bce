"""Stage-by-stage on-chip profile of the BCSD temperature rolling/shift block.

The daily profile (daily_profile_tpu.py) shows the temperature predict costs
~0.2 s more than the precipitation variant at 32k cells — all of it in the
9-point grouped rolling mean + shift block (``bcsd.py`` predict, ref
``bcsd.py:246-256``).  This breaks that block into its stages to find the
lever: gather into flat month-group layout, masked-convolution rolling,
scatter back (scatter-add vs inverse-permutation gather), and the elementwise
shift arithmetic.

Run: python benchmarks/rolling_profile_tpu.py [n_cells]
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

from skdownscale_tpu.models.bcsd import BcsdTemperature
from skdownscale_tpu.models.grouped import gather_groups, scatter_groups
from skdownscale_tpu.ops.rolling import rolling_mean_grouped_flat


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
    T = len(index)
    x = rng.normal(283.0, 5.0, (n_cells, T)).astype(np.float32)

    model = BcsdTemperature(time_grouper="daily_nasa-nex", return_anoms=False)
    fg = model._fit_groups(index)
    plan = model._predict_plan(fg, index)
    rolling = plan.rolling
    G, L = rolling.indices.shape
    print(f"rolling groups: G={G} L={L} (flat {G*L}), T={T}, cells={n_cells}")

    xd = jax.device_put(x)

    j_gather = jax.jit(lambda x: gather_groups(x, rolling, fill=0.0))
    xg = j_gather(xd)
    j_roll = jax.jit(
        lambda g: rolling_mean_grouped_flat(g, 9, rolling.mask, min_periods=1)
    )
    rf = j_roll(xg)
    # the historical scatter-add (scatter_groups now takes the inv-gather path)
    def _scatter_add(v):
        contrib = jnp.where(jnp.asarray(rolling.mask.reshape(-1)), v, 0.0)
        out = jnp.zeros((*v.shape[:-1], T), v.dtype)
        return out.at[..., rolling.indices.reshape(-1)].add(contrib)

    j_scatter = jax.jit(_scatter_add)

    # inverse-permutation alternative: partition groups -> scatter is a gather
    flat_idx = rolling.indices.reshape(-1)
    mask = rolling.mask.reshape(-1)
    inv = np.zeros(T, np.int32)
    inv[flat_idx[mask]] = np.nonzero(mask)[0].astype(np.int32)
    j_scatter_inv = jax.jit(lambda v: v[..., inv])

    a = j_scatter(rf)
    b = j_scatter_inv(rf)
    print(f"scatter == inv-perm gather: {bool(jnp.array_equal(a, b))}")

    def full(x):
        g = gather_groups(x, rolling, fill=0.0)
        r = rolling_mean_grouped_flat(g, 9, rolling.mask, min_periods=1)
        rolled = scatter_groups(r, rolling, T)
        x_shift = rolled - 0.5
        return x - x_shift

    def full_inv(x):
        g = gather_groups(x, rolling, fill=0.0)
        r = rolling_mean_grouped_flat(g, 9, rolling.mask, min_periods=1)
        rolled = r[..., inv]
        x_shift = rolled - 0.5
        return x - x_shift

    from skdownscale_tpu.ops import rolling as _rollmod

    saved = _rollmod._UNROLL_ELEMS
    _rollmod._UNROLL_ELEMS = 0
    j_roll_fori = jax.jit(
        lambda g: rolling_mean_grouped_flat(g, 9, rolling.mask, min_periods=1)
    )
    t_fori = timed(j_roll_fori, xg)
    _rollmod._UNROLL_ELEMS = saved

    print(f"gather:            {timed(j_gather, xd)*1e3:8.1f} ms")
    print(f"rolling (w=9):     {timed(j_roll, xg)*1e3:8.1f} ms")
    print(f"rolling fori:      {t_fori*1e3:8.1f} ms")
    print(f"scatter-add:       {timed(j_scatter, rf)*1e3:8.1f} ms")
    print(f"inv-perm gather:   {timed(j_scatter_inv, rf)*1e3:8.1f} ms")
    print(f"full block:        {timed(jax.jit(full), xd)*1e3:8.1f} ms")
    print(f"full block (inv):  {timed(jax.jit(full_inv), xd)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
