"""On-chip micro-benchmark: rank-counting kernel strip widths vs XLA.

The sort-free rank-counting kernel (``ops/pallas/rank_map_kernel.py``) is
the daily-BCSD scan's largest remaining stage (~0.21 s of 0.41 s at 32k
cells, ROUND_NOTES r3 gap #1).  Its two ``fori_loop`` passes are O(Lq^2)
VPU compares per row; the strip width trades roll count (strip-mined
``pltpu.roll`` by -strip) against register pressure.  Round-3 measured
strip-8 -> 56.2 ms and strip-16 -> 52.2 ms on (262144, 240); this micro
sweeps {8, 16, 32} plus the XLA payload-sort path on the same shape.

Run: python benchmarks/rank_map_micro_tpu.py [rows] [Lq]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _enable_compile_cache

_enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from skdownscale_tpu.models.grouped import apply_ranked_rows
from skdownscale_tpu.ops.pallas.rank_map_kernel import rank_map_rows


def timed(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    _ = float(jnp.sum(jnp.nan_to_num(out)))
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _ = float(jnp.sum(jnp.nan_to_num(out)))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    Lq = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    rng = np.random.default_rng(0)
    xq = rng.normal(280.0, 10.0, (rows, Lq)).astype(np.float32)
    # ties + mask pads, as the real grouped queries carry
    xq[:, ::7] = np.round(xq[:, ::7])
    xq[:, -8:] = np.inf
    res = np.sort(rng.normal(280.0, 10.0, (rows, Lq)).astype(np.float32), axis=-1)
    xqd, resd = jax.device_put(xq), jax.device_put(res)

    region = jnp.zeros((rows, Lq), jnp.int32) + 1
    from skdownscale_tpu.ops import rowsort

    with rowsort.override(force=False, interpret=False):  # XLA sort path
        t_xla, out_xla = timed(
            jax.jit(lambda a, b: apply_ranked_rows(b, a, region)), xqd, resd
        )
    print(f"XLA rank sort+fill+unsort: {t_xla*1e3:8.1f} ms")

    for strip in (8, 16, 32):
        t, out = timed(
            jax.jit(lambda a, b, s=strip: rank_map_rows(a, b, strip=s)), xqd, resd
        )
        ok = np.allclose(
            np.nan_to_num(np.asarray(out)), np.nan_to_num(np.asarray(out_xla)), atol=0
        )
        print(f"counting kernel strip={strip:2d}: {t*1e3:8.1f} ms   bitwise={ok}")


if __name__ == "__main__":
    main()
