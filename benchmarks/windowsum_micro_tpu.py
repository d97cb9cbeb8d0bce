"""On-chip micro-benchmark: 31-wide centered windowed-sum lowerings.

The zscore profiler capture (BASELINE round-4 session 3) showed the
unrolled static-slice windowed sums do NOT fuse at (32768, 7305): the HLO
holds ~124 top-level add/slice ops, each a separate ~1 GB HBM pass — busy
327 ms for 34 GB moved (~13% of peak).  Candidates for a true one-pass
form:

* ``unroll`` — current production (``ops.rolling._window_sum``);
* ``loop``   — the fori_loop fallback;
* ``conv``   — ``lax.conv_general_dilated`` with a ones(1,1,w) kernel:
               exactly the same w-term sums, one XLA op;
* ``pallas`` — lane-axis roll kernel: (rows, Tpad) blocks in VMEM, w
               static lane rolls + adds, one HBM read + write.

Run alone (one chip): python benchmarks/windowsum_micro_tpu.py [n_cells]
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _enable_compile_cache

_enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skdownscale_tpu.ops import rolling as R

W = 31


@functools.partial(jax.jit, static_argnames=("window", "center"))
def conv_window_sum(x, window: int, center: bool = True):
    n = x.shape[-1]
    if center:
        lo, hi = -(window // 2), (window - 1) // 2
    else:
        lo, hi = -(window - 1), 0
    w = hi - lo + 1
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(-lo, hi)])
    lhs = xp.reshape(-1, 1, xp.shape[-1])
    rhs = jnp.ones((1, 1, w), x.dtype)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1,), "VALID", dimension_numbers=("NCH", "OIH", "NCH")
    )
    return out.reshape(x.shape)


def _make_lane_kernel(w: int, n: int):
    def kernel(xp_ref, out_ref):
        # slice the REF per term (a fresh VMEM load feeding the add), not a
        # materialized block value: 31 shifted copies of the (TR, n) value
        # spilled 180 MB of registers and OOM'd scoped VMEM
        acc = xp_ref[:, 0:n]
        for j in range(1, w):
            acc = acc + xp_ref[:, j : j + n]
        out_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("window", "center", "interpret"))
def pallas_window_sum(x, window: int, center: bool = True, interpret: bool = False):
    n = x.shape[-1]
    if center:
        lo, hi = -(window // 2), (window - 1) // 2
    else:
        lo, hi = -(window - 1), 0
    w = hi - lo + 1
    lead = x.shape[:-1]
    x2 = x.reshape(-1, n)
    B = x2.shape[0]
    # input block must cover n128 + w - 1 lanes (the kernel slices static
    # windows of the OUTPUT width), rounded up to a 128 multiple
    n128 = -(-n // 128) * 128
    npad128 = -(-(n128 + w - 1) // 128) * 128
    tr = 256
    Bp = -(-B // tr) * tr
    xp = jnp.pad(x2, ((0, Bp - B), (-lo, hi + (npad128 - (n + w - 1)))))
    spec_in = pl.BlockSpec((tr, npad128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((tr, n128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_lane_kernel(w, n128),
        out_shape=jax.ShapeDtypeStruct((Bp, n128), x.dtype),
        grid=(Bp // tr,),
        in_specs=[spec_in],
        out_specs=spec_out,
        interpret=interpret,
    )(xp)
    return out[:B, :n].reshape(*lead, n)


def timeit(fn, *args, reps=5):
    fn(*args)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def main(n_cells=32768, n_time=7305):
    interp = jax.devices()[0].platform.lower() in ("cpu", "gpu")
    rng = np.random.default_rng(0)
    x = rng.normal(283, 5, (n_cells, n_time)).astype(np.float32)
    xd = jax.device_put(jnp.asarray(x))

    unroll = jax.jit(lambda a: R._window_sum(a, W, True))

    def run_unroll(a):
        return float(jnp.sum(unroll(a)[:, ::97]))

    def run_conv(a):
        return float(jnp.sum(conv_window_sum(a, W)[:, ::97]))

    def run_pallas(a):
        return float(jnp.sum(pallas_window_sum(a, W, interpret=interp)[:, ::97]))

    t_unroll = timeit(run_unroll, xd)
    t_conv = timeit(run_conv, xd)
    t_pallas = timeit(run_pallas, xd)

    a = np.asarray(unroll(xd[:128]))
    c = np.asarray(conv_window_sum(xd[:128], W))
    p = np.asarray(pallas_window_sum(xd[:128], W, interpret=interp))
    gb = x.nbytes * 2 / 1e9
    print(
        {
            "n_cells": n_cells,
            "unroll_ms": round(t_unroll * 1e3, 2),
            "conv_ms": round(t_conv * 1e3, 2),
            "pallas_ms": round(t_pallas * 1e3, 2),
            "conv_max_err": float(np.max(np.abs(c - a))),
            "pallas_bitwise": bool(np.array_equal(p, a)),
            "pallas_gbps": round(gb / t_pallas, 1),
            "conv_gbps": round(gb / t_conv, 1),
        }
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32768)
