"""On-chip micro-benchmark: short-row (L=40) sort flavors at 1M-cell scale.

The monthly-BCSD fit-window sort is ``(cells*12, 40)`` rows, profiled at
73 ms / 4.03 GB accessed at 1M cells under ``lax.sort`` (minor-dim-40 rows
pad to 128 lanes and the generic lowering multi-passes HBM).  Candidates:

* ``lax``      — jnp.sort baseline (what production runs today);
* ``rolled``   — the existing in-VMEM bitonic kernel (dynamic ±j
                 ``pltpu.roll`` partner exchange; measured parity at L=40);
* ``static``   — the same bitonic network fully unrolled with *static*
                 reshape/concat partner exchange (``_make_sort_kernel``);
                 21 stages at Lp=64, so the compile-time blowup that
                 motivated the rolled form does not apply.

The plane-major XLA Batcher network (``ops.planesort``) already measured
NEGATIVE at this shape (146.6 ms vs 106.9, even with data pre-transposed —
XLA materializes the comparator intermediates instead of fusing;
``planesort_micro_tpu.py``).

Run alone (one chip):  python benchmarks/shortsort_micro_tpu.py [n_cells]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _enable_compile_cache

_enable_compile_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skdownscale_tpu.ops.pallas import sort_kernel as sk

G, L = 12, 40


@functools.partial(jax.jit, static_argnames=("flavor", "interpret"))
def sort_static(x, flavor="static", interpret=False):
    B, Lq = x.shape
    Lp = sk._pow2(Lq)
    keys = sk._to_ordered_int(x)
    if Lp != Lq:
        keys = jnp.pad(keys, ((0, 0), (0, Lp - Lq)), constant_values=sk._I32_MAX)
    keysT = keys.T
    tb = sk._pick_tb(B, Lp, 2)
    pad_b = (-B) % tb
    if pad_b:
        keysT = jnp.pad(keysT, ((0, 0), (0, pad_b)), constant_values=sk._I32_MAX)
    Bp = keysT.shape[1]
    maker = sk._make_sort_kernel if flavor == "static" else sk._make_sort_kernel_rolled
    kern = maker(Lp, False, True)
    spec = pl.BlockSpec((Lp, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Lp, Bp), jnp.float32),
        grid=(Bp // tb,),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )(keysT)
    return out[:, :B].T[:, :Lq]


@functools.partial(jax.jit, static_argnames=("flavor", "interpret"))
def sort_pretransposed(keysT, flavor="static", interpret=False):
    """Kernel-only cost: input already (Lp, B) ordered-int, output same."""
    Lp, B = keysT.shape
    tb = sk._pick_tb(B, Lp, 2)
    pad_b = (-B) % tb
    if pad_b:
        keysT = jnp.pad(keysT, ((0, 0), (0, pad_b)), constant_values=sk._I32_MAX)
    Bp = keysT.shape[1]
    maker = sk._make_sort_kernel if flavor == "static" else sk._make_sort_kernel_rolled
    kern = maker(Lp, False, True)
    spec = pl.BlockSpec((Lp, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Lp, Bp), jnp.float32),
        grid=(Bp // tb,),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )(keysT)
    return out[:, :B]


def timeit(fn, *args, reps=5):
    fn(*args)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def main(n_cells=1_048_576):
    interp = jax.devices()[0].platform.lower() in ("cpu", "gpu")
    rng = np.random.default_rng(0)
    rows = rng.normal(0, 5, (n_cells * G, L)).astype(np.float32)
    rows[:, 37:] = np.inf  # pad tail like masked fit windows
    rows_d = jax.device_put(jnp.asarray(rows))

    laxsort = jax.jit(lambda a: jnp.sort(a, axis=-1))

    def run_lax(a):
        return float(jnp.sum(laxsort(a)[:, 0]))

    def run_static(a):
        return float(jnp.sum(sort_static(a, "static", interp)[:, 0]))

    def run_rolled(a):
        return float(jnp.sum(sort_static(a, "rolled", interp)[:, 0]))

    # decomposition: the HBM transpose alone, and the kernel alone on
    # pre-transposed ordered-int input
    Lp = sk._pow2(L)
    # build the pre-transposed keys ON DEVICE (a host transfer of 3 GB would
    # take minutes over this rig's 0.02 GB/s tunnel)
    keysT_d = jax.jit(
        lambda a: jnp.pad(
            sk._to_ordered_int(a), ((0, 0), (0, Lp - L)), constant_values=sk._I32_MAX
        ).T
        + 0
    )(rows_d)
    transpose_j = jax.jit(lambda a: a.T + 0)  # materialized relayout

    def run_transpose(a):
        return float(jnp.sum(transpose_j(a)[0, :]))

    def run_kernel_only(a):
        return float(jnp.sum(sort_pretransposed(a, "static", interp)[0, :]))

    t_lax = timeit(run_lax, rows_d)
    t_static = timeit(run_static, rows_d)
    t_rolled = timeit(run_rolled, rows_d)
    t_tr = timeit(run_transpose, rows_d)
    t_ko = timeit(run_kernel_only, keysT_d)

    nc = min(4096, n_cells)
    sl = np.asarray(laxsort(rows_d[: nc * G]))
    ss = np.asarray(sort_static(rows_d[: nc * G], "static", interp))
    ok = np.array_equal(sl, ss)

    gb = rows.nbytes * 2 / 1e9
    print(
        {
            "n_cells": n_cells,
            "lax_ms": round(t_lax * 1e3, 2),
            "static_ms": round(t_static * 1e3, 2),
            "rolled_ms": round(t_rolled * 1e3, 2),
            "transpose_ms": round(t_tr * 1e3, 2),
            "kernel_only_ms": round(t_ko * 1e3, 2),
            "speedup_static": round(t_lax / t_static, 2),
            "static_gbps": round(gb / t_static, 1),
            "bitwise_equal_4k": bool(ok),
        }
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576)
