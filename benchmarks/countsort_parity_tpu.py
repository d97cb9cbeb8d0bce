"""On-chip parity check for the counting-sort / segment rank-map kernels.

Interpret-mode tests (tests/test_sort_kernel.py) validate semantics; this
script validates the real Mosaic lowering on the actual chip — the round-2
weight_analogs NaN bug only reproduced on hardware, so on-chip parity runs
are load-bearing for every new kernel.

Checks (all bitwise):
* ``count_sort_rows``     vs jnp.sort on (B, L) rows with ties/±inf/+NaN
* ``count_sort_segments`` vs jnp.sort of the (B*G, L) reshape
* ``rank_map_segments``   vs ``rank_map_rows`` of the (B*G, L) reshape

Run alone (one chip): python benchmarks/countsort_parity_tpu.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _enable_compile_cache

_enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from skdownscale_tpu.ops.pallas.rank_map_kernel import (
    count_sort_rows,
    count_sort_segments,
    rank_map_rows,
    rank_map_segments,
)


def _specials(rng, B, L):
    x = rng.normal(0, 50, (B, L)).astype(np.float32)
    x[0, -5:] = np.inf
    x[1, : min(3, L)] = -np.inf
    x[2 % B, L // 2] = np.nan
    x[3 % B] = np.round(x[3 % B] / 50) * 50  # heavy ties
    x[4 % B, :] = 7.0  # all-equal row
    return x


def main():
    print("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(7)
    ok = True

    for B, L in [(300, 40), (70, 236)]:
        x = _specials(rng, B, L)
        got = np.asarray(count_sort_rows(jnp.asarray(x)))
        want = np.asarray(jax.jit(lambda a: jnp.sort(a, axis=1))(jnp.asarray(x)))
        eq = np.array_equal(
            np.where(np.isnan(got), np.inf, got), np.where(np.isnan(want), np.inf, want)
        )
        print(f"count_sort_rows ({B},{L}): bitwise_equal={eq}")
        ok &= eq

    for B, G, L, strip in [(130, 12, 40, 8), (40, 5, 48, 8), (40, 5, 48, 16)]:
        x = _specials(rng, B * G, L).reshape(B, G * L)
        got = np.asarray(count_sort_segments(jnp.asarray(x), L=L, strip=strip))
        want = np.sort(x.reshape(B * G, L), axis=1).reshape(B, G * L)
        eq = np.array_equal(
            np.where(np.isnan(got), np.inf, got), np.where(np.isnan(want), np.inf, want)
        )
        print(f"count_sort_segments ({B},{G},{L},strip={strip}): bitwise_equal={eq}")
        ok &= eq

    # strip=16 at L=240 is the production daily rank-map configuration
    for B, G, L, strip in [(90, 12, 40, 8), (30, 2, 240, 16)]:
        x = _specials(rng, B * G, L).reshape(B, G * L)
        res = np.sort(rng.normal(0, 1, (B * G, L)).astype(np.float32), axis=1)
        got = np.asarray(
            rank_map_segments(
                jnp.asarray(x), jnp.asarray(res.reshape(B, G * L)), L=L, strip=strip
            )
        )
        want = np.asarray(
            rank_map_rows(jnp.asarray(x.reshape(B * G, L)), jnp.asarray(res), strip=8)
        ).reshape(B, G * L)
        eq = np.array_equal(
            np.where(np.isnan(got), np.inf, got), np.where(np.isnan(want), np.inf, want)
        )
        print(f"rank_map_segments ({B},{G},{L},strip={strip}): bitwise_equal={eq}")
        ok &= eq

    print("ALL OK" if ok else "PARITY FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
