"""Fused PureAnalog kernel (interpret mode) vs the XLA gather path.

The Pallas kernel (ops/pallas/knn_kernel.py) replaces distance matmul +
lax.top_k + one-hot gathers with in-VMEM bit-bisection selection and mask
matmuls.  Interpret mode checks the selection and every PureAnalog kind
against models.gard.pure_analog_predict on float32 data, including exact
distance ties (duplicate training rows -> tie-break by training index).
"""

import numpy as np
import numpy.testing as npt
import pytest

import jax
import jax.numpy as jnp

from skdownscale_tpu.models.gard import pure_analog_predict
from skdownscale_tpu.ops.pallas.knn_kernel import pure_analog_stats


def _data(rng, C=3, n=70, m=23, f=2):
    Xt = rng.normal(10, 3, (C, n, f)).astype(np.float32)
    yt = (0.2 * rng.normal(10, 3, (C, n)) + 13).astype(np.float32)
    Xq = rng.normal(10, 3, (C, m, f)).astype(np.float32)
    return jnp.asarray(Xt), jnp.asarray(yt), jnp.asarray(Xq)


def _reference(Xt, yt, Xq, rand, k, kind, thresh):
    fn = lambda xt, yy, xq, r: pure_analog_predict(
        xt, yy, xq, r, k=k, kind=kind, thresh=thresh
    )
    return jax.vmap(fn)(Xt, yt, Xq, rand)


@pytest.mark.parametrize("kind", ["mean_analogs", "weight_analogs", "best_analog", "sample_analogs"])
@pytest.mark.parametrize("thresh", [None, 13.0])
def test_kernel_matches_gather_path(rng, kind, thresh):
    Xt, yt, Xq = _data(rng)
    k = 1 if kind == "best_analog" else 20
    C, m = Xq.shape[0], Xq.shape[1]
    rand = jnp.asarray(rng.integers(0, k, (C, m)).astype(np.int32))
    want = np.asarray(_reference(Xt, yt, Xq, rand, k, kind, thresh))
    got = np.asarray(
        pure_analog_stats(Xt, yt, Xq, rand, k=k, kind=kind, thresh=thresh, interpret=True)
    )
    npt.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_kernel_tie_break_matches_topk(rng):
    # duplicate training rows produce exact distance ties in both the
    # centered-expanded and direct forms; selection must match lax.top_k's
    # stable tie order (lower training index wins)
    C, n, m, f, k = 2, 48, 9, 2, 8
    base = rng.normal(0, 1, (C, n // 2, f)).astype(np.float32)
    Xt = jnp.asarray(np.concatenate([base, base], axis=1))  # every point duplicated
    yt = jnp.asarray(rng.normal(5, 2, (C, n)).astype(np.float32))
    Xq = jnp.asarray(base[:, :m, :] + 0.0)  # queries exactly on train points
    rand = jnp.zeros((C, m), jnp.int32)
    want = np.asarray(_reference(Xt, yt, Xq, rand, k, "mean_analogs", None))
    got = np.asarray(
        pure_analog_stats(Xt, yt, Xq, rand, k=k, kind="mean_analogs", thresh=None, interpret=True)
    )
    npt.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_kernel_all_below_threshold(rng):
    # every analog below threshold: pred -> 0, prob -> 0, error -> NaN
    Xt, yt, Xq = _data(rng, C=1, n=40, m=5)
    rand = jnp.zeros((1, 5), jnp.int32)
    got = np.asarray(
        pure_analog_stats(Xt, yt, Xq, rand, k=10, kind="mean_analogs", thresh=1e9, interpret=True)
    )
    npt.assert_allclose(got[..., 0], 0.0)
    npt.assert_allclose(got[..., 1], 0.0)
    assert np.isnan(got[..., 2]).all()


@pytest.mark.parametrize("thresh", [None, 13.0])
@pytest.mark.parametrize("f", [1, 2, 3, 5])
def test_analog_regression_kernel_matches_gather_path(rng, thresh, f):
    from skdownscale_tpu.models.gard import (
        analog_regression_predict,
        analog_regression_predict_batched,
    )

    C, n, m, k = 2, 90, 17, 25
    Xt = jnp.asarray(rng.normal(10, 3, (C, n, f)).astype(np.float32))
    yt = jnp.asarray((0.2 * rng.normal(10, 3, (C, n)) + 13).astype(np.float32))
    Xq = jnp.asarray(rng.normal(10, 3, (C, m, f)).astype(np.float32))
    want = np.asarray(
        jax.vmap(lambda a, b, c: analog_regression_predict(a, b, c, k=k, thresh=thresh))(
            Xt, yt, Xq
        )
    )
    got = np.asarray(
        analog_regression_predict_batched(
            Xt, yt, Xq, k=k, thresh=thresh, force_kernel=True, interpret=True
        )
    )
    npt.assert_allclose(got[..., 0], want[..., 0], rtol=2e-4, atol=2e-4)  # pred
    npt.assert_allclose(got[..., 1], want[..., 1], rtol=5e-4, atol=5e-4)  # prob
    npt.assert_allclose(got[..., 2], want[..., 2], rtol=2e-3, atol=2e-3)  # rmse


def test_analog_regression_kernel_none_exceed(rng):
    from skdownscale_tpu.models.gard import analog_regression_predict_batched

    C, n, m, f, k = 1, 60, 5, 2, 10
    Xt = jnp.asarray(rng.normal(10, 3, (C, n, f)).astype(np.float32))
    yt = jnp.asarray(rng.normal(5, 1, (C, n)).astype(np.float32))
    Xq = jnp.asarray(rng.normal(10, 3, (C, m, f)).astype(np.float32))
    got = np.asarray(
        analog_regression_predict_batched(
            Xt, yt, Xq, k=k, thresh=1e9, force_kernel=True, interpret=True
        )
    )
    # no exceeding analogs: prob 0, pred/error NaN (the reference crashes)
    npt.assert_allclose(got[..., 1], 0.0)
    assert np.isnan(got[..., 0]).all() and np.isnan(got[..., 2]).all()
