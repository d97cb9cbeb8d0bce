"""Golden tests: GARD family vs the reference implementation."""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

from skdownscale_tpu.models.gard import AnalogRegression, PureAnalog, PureRegression


@pytest.fixture
def gard_data(rng):
    n, m, f = 250, 80, 2
    X = rng.normal(10, 3, (n, f))
    y = 2.0 * X[:, 0] - 0.5 * X[:, 1] + rng.normal(0, 1, n) + 5
    Xq = rng.normal(10, 3.2, (m, f))
    return X, y, Xq


@pytest.mark.parametrize("kind", ["best_analog", "mean_analogs", "weight_analogs"])
@pytest.mark.parametrize("thresh", [None, 18.0])
def test_pure_analog_golden(skref, gard_data, kind, thresh):
    X, y, Xq = gard_data
    ref = skref.PureAnalog(n_analogs=30, kind=kind, thresh=thresh).fit(X, y)
    ours = PureAnalog(n_analogs=30, kind=kind, thresh=thresh).fit(X, y)
    r = ref.predict(Xq)
    o = ours.predict(Xq)
    npt.assert_allclose(o, r, rtol=1e-7, atol=1e-9, equal_nan=True)


def test_pure_analog_sample_kind(gard_data):
    X, y, Xq = gard_data
    ours = PureAnalog(n_analogs=30, kind="sample_analogs", random_state=0).fit(X, y)
    out = ours.predict(Xq)
    assert out.shape == (len(Xq), 3)
    # every sampled prediction must be one of the y values
    assert np.isin(np.round(out[:, 0], 10), np.round(y, 10)).all()


def test_pure_analog_k_clamp_warning(rng):
    X = rng.normal(size=(20, 1))
    y = rng.normal(size=20)
    with pytest.warns(UserWarning, match="n_analogs"):
        m = PureAnalog(n_analogs=200, kind="mean_analogs").fit(X, y)
    assert m.k_ == 20


def test_pure_analog_prob_range(gard_data):
    X, y, Xq = gard_data
    out = PureAnalog(n_analogs=30, kind="mean_analogs", thresh=12.0).fit(X, y).predict(Xq)
    assert ((out[:, 1] >= 0) & (out[:, 1] <= 1)).all()


@pytest.mark.parametrize("thresh", [None, 15.0])
def test_analog_regression_golden(skref, gard_data, rng, thresh):
    X, _, Xq = gard_data
    # weak signal so every 60-analog neighborhood straddles the threshold
    # (the reference crashes on single-class neighborhoods, gard.py:209)
    y = 0.2 * X[:, 0] + rng.normal(0, 2, len(X)) + 13
    ref = skref.AnalogRegression(n_analogs=60, thresh=thresh).fit(X, y)
    ours = AnalogRegression(n_analogs=60, thresh=thresh).fit(X, y)
    r = np.asarray(ref.predict(Xq))
    o = np.asarray(ours.predict(Xq))
    # pred and prediction_error come from exact least squares
    npt.assert_allclose(o[:, 0], r[:, 0], rtol=1e-6, atol=1e-8)
    npt.assert_allclose(o[:, 2], r[:, 2], rtol=1e-6, atol=1e-8)
    # exceedance_prob: sklearn lbfgs (tol=1e-4) vs our exact Newton optimum
    npt.assert_allclose(o[:, 1], r[:, 1], rtol=5e-3, atol=5e-4)


def test_analog_regression_dataframe_roundtrip(gard_data):
    X, y, Xq = gard_data
    Xdf = pd.DataFrame(X, columns=["a", "b"])
    out = AnalogRegression(n_analogs=40).fit(Xdf, pd.Series(y)).predict(pd.DataFrame(Xq, columns=["a", "b"]))
    assert isinstance(out, pd.DataFrame)
    assert list(out.columns) == ["pred", "exceedance_prob", "prediction_error"]


@pytest.mark.parametrize("thresh", [None, 18.0])
def test_pure_regression_golden(skref, gard_data, thresh):
    X, y, Xq = gard_data
    ref = skref.PureRegression(thresh=thresh).fit(X, y)
    ours = PureRegression(thresh=thresh).fit(X, y)
    r = np.asarray(ref.predict(Xq))
    o = np.asarray(ours.predict(Xq))
    npt.assert_allclose(o[:, 0], r[:, 0], rtol=1e-7, atol=1e-9)
    npt.assert_allclose(o[:, 2], r[:, 2], rtol=1e-7, atol=1e-9)
    npt.assert_allclose(o[:, 1], r[:, 1], rtol=5e-3, atol=5e-4)
    npt.assert_allclose(ours.fit_error_, ref.fit_error_, rtol=1e-7)


def test_pure_regression_one_class_fallback(rng):
    X = rng.normal(10, 1, (60, 1))
    y = np.abs(rng.normal(10, 1, 60)) + 5  # all above thresh
    with pytest.warns(UserWarning, match="one class"):
        m = PureRegression(thresh=1.0).fit(X, y)
    assert m.thresh_ is None
    assert m.thresh == 1.0  # constructor param not mutated (unlike gard.py:436)
    out = m.predict(X)
    npt.assert_allclose(out[:, 1], 1.0)


def test_ar_kernel_logistic_converged_at_default_iters(rng):
    """The fused kernel's ridge-damped Newton must be converged at the
    default iteration count: probs at n_iter=8 within 1e-5 of n_iter=24 on
    correlated, near-separable, and extreme-imbalance analog sets (the
    hardest logistic geometries).  Pins the 12 -> 8 default cut."""
    import jax.numpy as jnp

    from skdownscale_tpu.ops.pallas.knn_kernel import analog_regression_stats

    C, n, m, f, k = 2, 512, 96, 2, 64
    for case in ("correlated", "separable", "imbalanced"):
        Xt = rng.normal(10, 3, (C, n, f)).astype(np.float32)
        if case == "correlated":
            yt = (0.8 * Xt[..., 0] + rng.normal(0, 1.0, (C, n)) + 5).astype(np.float32)
            thresh = float(np.median(yt))
        elif case == "separable":
            yt = (2.0 * Xt[..., 0] + 0.01 * rng.normal(0, 1, (C, n)) + 5).astype(np.float32)
            thresh = float(np.median(yt))
        else:
            yt = (0.2 * rng.normal(10, 3, (C, n)) + 13).astype(np.float32)
            thresh = float(np.quantile(yt, 0.97))
        Xq = rng.normal(10, 3, (C, m, f)).astype(np.float32)

        probs = {}
        for n_iter in (8, 24):
            _, prob, _, _ = analog_regression_stats(
                jnp.asarray(Xt), jnp.asarray(yt), jnp.asarray(Xq),
                k=k, thresh=thresh, n_iter=n_iter, interpret=True,
            )
            probs[n_iter] = np.asarray(prob)
        err = float(np.nanmax(np.abs(probs[8] - probs[24])))
        assert err < 1e-5, (case, err)
