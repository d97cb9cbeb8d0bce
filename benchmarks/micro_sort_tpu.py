"""On-chip micro-benchmark: Pallas bitonic row sort vs XLA lax.sort.

Shapes are the daily-BCSD streaming scan's hot sorts at 32k cells
(BASELINE.md config 5 / ROUND_NOTES r2 gap #1): fit windows (C*31, 620),
query rank sort + unsort (C*31, 236).  Round-2 measured XLA numbers:
97.7 ms for the (262144, 620) f32 value sort, 88.2 ms for its int32-key
variant.  Run: python benchmarks/micro_sort_tpu.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _enable_compile_cache

_enable_compile_cache()  # persistent XLA cache: 175 s -> 1.4 s recompiles

import numpy as np
import jax
import jax.numpy as jnp

from skdownscale_tpu.ops.pallas.sort_kernel import (
    sort_rows,
    sort_rows_with_positions,
    unsort_rows,
)


def timed(fn, *args, n=3):
    out = fn(*args)
    _ = float(jnp.sum(jnp.nan_to_num(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))))
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jnp.nan_to_num(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    B = 262144

    for L in (620, 236, 40):
        x = jnp.asarray(rng.normal(0, 50, (B, L)).astype(np.float32))

        xla_sort = jax.jit(lambda a: jnp.sort(a, axis=-1))
        t_xla = timed(xla_sort, x)
        t_pal = timed(jax.jit(lambda a: sort_rows(a)), x)
        s_p = np.asarray(sort_rows(x)[:64])
        s_x = np.sort(np.asarray(x[:64]), axis=1)
        ok = np.array_equal(s_p, s_x)
        print(f"value sort ({B}, {L}):  xla {t_xla*1e3:7.1f} ms   pallas {t_pal*1e3:7.1f} ms   "
              f"x{t_xla/t_pal:4.1f}  parity={ok}")

        def xla_pay(a):
            pos = jnp.broadcast_to(jnp.arange(a.shape[-1], dtype=jnp.int32), a.shape)
            return jax.lax.sort((a, pos), num_keys=1, is_stable=True, dimension=1)

        t_xla2 = timed(jax.jit(xla_pay), x)
        t_pal2 = timed(jax.jit(lambda a: sort_rows_with_positions(a)), x)
        print(f"rank  sort ({B}, {L}):  xla {t_xla2*1e3:7.1f} ms   pallas {t_pal2*1e3:7.1f} ms   "
              f"x{t_xla2/t_pal2:4.1f}")

        sv, sp = sort_rows_with_positions(x)

        def xla_unsort(vals, pos):
            _, out = jax.lax.sort((pos, vals), num_keys=1, is_stable=True, dimension=1)
            return out

        t_xla3 = timed(jax.jit(xla_unsort), sv, sp)
        t_pal3 = timed(jax.jit(lambda v, p: unsort_rows(v, p)), sv, sp)
        back = np.asarray(unsort_rows(sv, sp)[:64])
        ok3 = np.array_equal(back, np.asarray(x[:64]))
        print(f"unsort     ({B}, {L}):  xla {t_xla3*1e3:7.1f} ms   pallas {t_pal3*1e3:7.1f} ms   "
              f"x{t_xla3/t_pal3:4.1f}  roundtrip={ok3}")


if __name__ == "__main__":
    main()
