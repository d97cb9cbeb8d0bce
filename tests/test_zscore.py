"""ZScoreRegressor tests.

xarray is absent from this environment, so the reference's zscore cannot be
imported; instead the fit statistics are checked against an independent
numpy/pandas re-derivation of the xarray semantics (year x day reshape with
bookends, 31-day windowed NaN-skipping mean/std over (year, win_day),
``zscore.py:123-193``), plus ports of the reference's analytic tests
(``test_pointwise_models.py:236-299``).
"""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

from skdownscale_tpu.models.zscore import ZScoreRegressor


def numpy_ref_stats(series: pd.Series, window: int):
    """Independent re-derivation of ``_calc_stats`` (zscore.py:162-193)."""
    df = pd.DataFrame(
        {"v": series.to_numpy(), "year": series.index.year, "doy": series.index.dayofyear}
    )
    M = df.pivot_table(index="year", columns="doy", values="v", aggfunc="first")
    arr = M.to_numpy()  # (Y, D) with NaN holes
    nlo = (window + 1) // 2
    nhi = window // 2
    pad = np.concatenate([arr[:, -nlo:], arr, arr[:, :nhi]], axis=1)
    P = pad.shape[1]
    means, stds = np.empty(P), np.empty(P)
    for p in range(P):
        # centered window [p - w//2, p + (w-1)//2] (pandas convention; odd
        # windows — the reference default — are identical in all conventions)
        w = pad[:, max(0, p - window // 2) : p + (window - 1) // 2 + 1]
        v = w[~np.isnan(w)]
        means[p] = v.mean() if v.size else np.nan
        stds[p] = v.std(ddof=0) if v.size else np.nan
    trim = window // 2 + 1
    return means[trim:-trim], stds[trim:-trim]


@pytest.fixture
def daily(rng):
    idx = pd.date_range("1996-01-01", "2005-12-31", freq="D")  # includes leap years
    n = len(idx)
    seasonal = 8 * np.sin(2 * np.pi * idx.dayofyear.values / 365.25)
    X = pd.DataFrame({"t": 283 + seasonal + rng.normal(0, 2, n)}, index=idx)
    y = pd.DataFrame({"t": 282 + seasonal + rng.normal(0, 1.5, n)}, index=idx)
    return X, y


def test_fit_stats_vs_numpy_reference(daily):
    X, y = daily
    m = ZScoreRegressor().fit(X, y)
    x_mean, x_std = numpy_ref_stats(X["t"], 31)
    y_mean, y_std = numpy_ref_stats(y["t"], 31)
    npt.assert_allclose(m.fit_stats_dict_["X_mean"], x_mean, rtol=1e-9)
    npt.assert_allclose(m.fit_stats_dict_["X_std"], x_std, rtol=1e-9)
    npt.assert_allclose(m.shift_, y_mean - x_mean, rtol=1e-9, atol=1e-12)
    npt.assert_allclose(m.scale_, y_std / x_std, rtol=1e-9)
    assert len(m.shift_) == 365  # leap years present -> D=366 -> D-1


def test_scale_two_when_doubled(daily):
    # port of reference test: y = 2X -> scale == 2 (test_pointwise_models.py:236)
    X, _ = daily
    y = X * 2
    m = ZScoreRegressor().fit(X, y)
    npt.assert_allclose(m.scale_, 2.0, rtol=1e-9)


def test_shift_one_when_offset(daily):
    # y = X + 1 -> shift == 1 (test_pointwise_models.py:255)
    X, _ = daily
    y = X + 1
    m = ZScoreRegressor().fit(X, y)
    npt.assert_allclose(m.shift_, 1.0, rtol=1e-9, atol=1e-9)
    npt.assert_allclose(m.scale_, 1.0, rtol=1e-9)


def test_identity_predict(daily):
    # shift=0/scale=1 -> predict returns the input away from NaN edges
    X, _ = daily
    m = ZScoreRegressor().fit(X, X.copy())
    out = m.predict(X)
    assert isinstance(out, pd.DataFrame)
    w = 31 // 2
    core_o = out["t"].to_numpy()[w:-w]
    core_x = X["t"].to_numpy()[w:-w]
    npt.assert_allclose(core_o, core_x, rtol=1e-7)
    # pandas rolling edges (min_periods=window) are NaN
    assert np.isnan(out["t"].to_numpy()[:w]).all()
    assert np.isnan(out["t"].to_numpy()[-w:]).all()


def test_predict_rolling_matches_pandas(daily):
    X, y = daily
    m = ZScoreRegressor().fit(X, y)
    m.predict(X)
    s = X["t"]
    npt.assert_allclose(
        m.predict_stats_dict_["meani"], s.rolling(31, center=True).mean(), rtol=1e-9, equal_nan=True
    )
    npt.assert_allclose(
        m.predict_stats_dict_["stdi"], s.rolling(31, center=True).std(), rtol=1e-9, equal_nan=True
    )


def test_window_width_validation(daily):
    # param validation happens at fit time (sklearn convention), not __init__
    X, y = daily
    with pytest.raises(ValueError, match="positive"):
        ZScoreRegressor(window_width=0).fit(X, y)


def test_multifeature_raises(daily, rng):
    X, y = daily
    X2 = X.assign(u=rng.normal(size=len(X)))
    with pytest.raises(ValueError, match="1 feature"):
        ZScoreRegressor().fit(X2, y)


@pytest.mark.parametrize("window", [30, 31, 15])
def test_fit_stats_any_window(daily, window):
    X, y = daily
    m = ZScoreRegressor(window_width=window).fit(X, y)
    x_mean, x_std = numpy_ref_stats(X["t"], window)
    npt.assert_allclose(m.fit_stats_dict_["X_mean"], x_mean, rtol=1e-9)
    npt.assert_allclose(m.fit_stats_dict_["X_std"], x_std, rtol=1e-9)


def test_predict_stats_matmul_dispatch_parity(daily):
    """The blocked-banded MXU form of the predict rolling mean/std
    (ops/rolling.py:rolling_mean_std matmul branch) must reproduce the
    shared-unrolled-sums form through the model, NaN pattern included."""
    from skdownscale_tpu.ops import rolling as R

    X, y = daily
    m = ZScoreRegressor().fit(X, y)
    saved = R._STATS_MATMUL_OVERRIDE
    try:
        R._STATS_MATMUL_OVERRIDE = False
        base = m.predict(X).to_numpy()
        R._STATS_MATMUL_OVERRIDE = True
        forced = m.predict(X).to_numpy()
    finally:
        R._STATS_MATMUL_OVERRIDE = saved
    npt.assert_array_equal(np.isnan(forced), np.isnan(base))
    npt.assert_allclose(forced, base, rtol=0, atol=1e-10, equal_nan=True)
