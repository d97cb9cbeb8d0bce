"""On-chip micro-benchmark: plane-major Batcher network sort vs lax.sort.

The monthly-BCSD fit-window sort is ``(cells*12, 40)`` rows; profiled at
73 ms / 4.03 GB accessed at 1M cells (55 GB/s effective — minor-dim-40
sorts pad to 128 lanes and make multiple passes).  The plane-major network
(``ops.planesort``) sorts the same data laid out ``(12, 40, cells)`` in
~one fused HBM pass.  This harness measures both on chip, plus the
transposed-equality check.

Run alone (one chip):  python benchmarks/planesort_micro_tpu.py [n_cells]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _enable_compile_cache

_enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from skdownscale_tpu.ops.planesort import sort_planes

G, L = 12, 40


def timeit(fn, *args, reps=5):
    fn(*args)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def main(n_cells=1_048_576):
    rng = np.random.default_rng(0)
    rows = rng.normal(0, 5, (n_cells * G, L)).astype(np.float32)
    rows[:, 37:] = np.inf  # pad tail like masked fit windows
    planes = np.ascontiguousarray(rows.reshape(n_cells, G, L).transpose(1, 2, 0))

    rows_d = jax.device_put(jnp.asarray(rows))
    planes_d = jax.device_put(jnp.asarray(planes))

    laxsort = jax.jit(lambda a: jnp.sort(a, axis=-1))
    netsort = jax.jit(lambda a: sort_planes(a, axis=-2))
    # drop-in flavor: same (rows, L) layout as the model paths, transposes
    # inside the jit — measures whether the relayout copies eat the win
    netsort_t = jax.jit(lambda a: sort_planes(a.T, axis=0).T)

    # checksum read forces completion over the tunnel (block_until_ready
    # does not wait on the axon platform — CLAUDE.md)
    def run_lax(a):
        return float(jnp.sum(laxsort(a)[:, 0]))

    def run_net(a):
        return float(jnp.sum(netsort(a)[:, 0, :]))

    def run_net_t(a):
        return float(jnp.sum(netsort_t(a)[:, 0]))

    t_lax = timeit(run_lax, rows_d)
    t_net = timeit(run_net, planes_d)
    t_net_t = timeit(run_net_t, rows_d)

    # exactness on a slice (full compare over tunnel too slow)
    nc = min(4096, n_cells)
    sl = np.asarray(laxsort(rows_d[: nc * G]))
    sn = np.asarray(netsort(planes_d[:, :, :nc]))
    st = np.asarray(netsort_t(rows_d[: nc * G]))
    ok = np.array_equal(sl.reshape(nc, G, L).transpose(1, 2, 0), sn)
    ok_t = np.array_equal(sl, st)

    gb = rows.nbytes * 2 / 1e9
    print(
        {
            "n_cells": n_cells,
            "lax_ms": round(t_lax * 1e3, 2),
            "net_ms": round(t_net * 1e3, 2),
            "net_t_ms": round(t_net_t * 1e3, 2),
            "speedup": round(t_lax / t_net, 2),
            "speedup_t": round(t_lax / t_net_t, 2),
            "net_gbps": round(gb / t_net, 1),
            "bitwise_equal_4k": bool(ok),
            "bitwise_equal_4k_t": bool(ok_t),
        }
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576)
