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

    # checksum read forces completion over the tunnel (block_until_ready
    # does not wait on the axon platform — CLAUDE.md)
    def run_lax(a):
        return float(jnp.sum(jnp.where(jnp.isfinite(a), a, 0.0).sum(-1)[::4096].astype(jnp.float64))) if False else float(jnp.sum(laxsort(a)[:, 0]))

    def run_net(a):
        return float(jnp.sum(netsort(a)[:, 0, :]))

    t_lax = timeit(run_lax, rows_d)
    t_net = timeit(run_net, planes_d)

    # exactness on a slice (full compare over tunnel too slow)
    sl = np.asarray(laxsort(rows_d[: 4096 * G]))
    sn = np.asarray(netsort(planes_d[:, :, :4096]))
    ok = np.array_equal(sl.reshape(4096, G, L).transpose(1, 2, 0), sn)

    gb = rows.nbytes * 2 / 1e9
    print(
        {
            "n_cells": n_cells,
            "lax_ms": round(t_lax * 1e3, 2),
            "net_ms": round(t_net * 1e3, 2),
            "speedup": round(t_lax / t_net, 2),
            "net_gbps": round(gb / t_net, 1),
            "bitwise_equal_4k": bool(ok),
        }
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576)
