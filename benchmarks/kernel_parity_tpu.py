"""On-chip parity check for the fused GARD Pallas kernels.

Interpret-mode tests (tests/test_knn_kernel.py) validate semantics; this
script validates the real Mosaic lowering: it runs the fused kernels and the
XLA gather paths on the actual TPU and compares outputs.  Float32 near-tie
neighbour selection may legitimately differ between the centered-expanded
(kernel) and diff-form (XLA) distances, so the data uses well-separated
points; exact duplicate ties are exercised explicitly.

Run: python benchmarks/kernel_parity_tpu.py
"""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _enable_compile_cache

_enable_compile_cache()  # persistent XLA cache: 175 s -> 1.4 s recompiles

import numpy as np
import jax
import jax.numpy as jnp

from skdownscale_tpu.models.gard import (
    analog_regression_predict,
    analog_regression_predict_batched,
    pure_analog_predict,
)
from skdownscale_tpu.ops.pallas.knn_kernel import pure_analog_stats


def main():
    print("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(7)
    C, n, m, f, k = 4, 400, 37, 2, 30
    Xt = jnp.asarray(rng.normal(10, 3, (C, n, f)).astype(np.float32))
    yt = jnp.asarray((0.2 * rng.normal(10, 3, (C, n)) + 13).astype(np.float32))
    Xq = jnp.asarray(rng.normal(10, 3, (C, m, f)).astype(np.float32))
    rand = jnp.asarray(rng.integers(0, k, (C, m)).astype(np.int32))

    worst = 0.0
    for kind in ("mean_analogs", "weight_analogs", "sample_analogs"):
        for thresh in (None, 13.0):
            got = np.asarray(
                pure_analog_stats(Xt, yt, Xq, rand, k=k, kind=kind, thresh=thresh)
            )
            want = np.asarray(
                jax.vmap(
                    lambda a, b, c, r: pure_analog_predict(
                        a, b, c, r, k=k, kind=kind, thresh=thresh
                    )
                )(Xt, yt, Xq, rand)
            )
            d = np.nanmax(np.abs(np.nan_to_num(got, nan=-1) - np.nan_to_num(want, nan=-1)))
            worst = max(worst, float(d))
            print(f"pure_analog {kind:15s} thresh={thresh}: max|diff| = {d:.2e}")

    for fa in (2, 3, 5):  # 3/5 exercise the Cholesky Newton solve
        Xtf = jnp.asarray(rng.normal(10, 3, (C, n, fa)).astype(np.float32))
        Xqf = jnp.asarray(rng.normal(10, 3, (C, m, fa)).astype(np.float32))
        for thresh in (None, 13.0):
            got = np.asarray(
                analog_regression_predict_batched(
                    Xtf, yt, Xqf, k=k, thresh=thresh, force_kernel=True
                )
            )
            want = np.asarray(
                jax.vmap(
                    lambda a, b, c: analog_regression_predict(a, b, c, k=k, thresh=thresh)
                )(Xtf, yt, Xqf)
            )
            d = np.nanmax(np.abs(np.nan_to_num(got, nan=-1) - np.nan_to_num(want, nan=-1)))
            worst = max(worst, float(d))
            print(f"analog_regression f={fa} thresh={thresh}: max|diff| = {d:.2e}")

    assert worst < 5e-3, f"on-chip kernel divergence {worst}"
    print("ON-CHIP KERNEL PARITY OK, worst", worst)


if __name__ == "__main__":
    main()
