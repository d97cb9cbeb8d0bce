"""Edge-case sweep across the model zoo.

Padded-table and fixed-shape code tends to break on degenerate inputs:
short series, constant values, heavy ties (precipitation zeros), single
samples per group.  The reference mostly inherits numpy/sklearn behavior
here; we require: no crashes, right shapes, and finite outputs wherever the
reference would produce finite outputs.
"""

import numpy as np
import pandas as pd
import pytest

import skdownscale_tpu as sdt


@pytest.fixture
def short_daily(rng):
    idx = pd.date_range("2001-01-01", periods=60, freq="D")
    X = pd.DataFrame({"v": rng.normal(10, 2, 60)}, index=idx)
    y = pd.DataFrame({"v": rng.normal(11, 2, 60)}, index=idx)
    return X, y


def test_qmr_heavy_ties(rng):
    # precipitation-like: ~60% exact zeros (tied knots everywhere)
    idx = pd.date_range("2001-01-01", periods=400, freq="D")
    x = rng.gamma(1.5, 10, 400) * (rng.uniform(size=400) > 0.6)
    y = rng.gamma(1.5, 9, 400) * (rng.uniform(size=400) > 0.55)
    m = sdt.QuantileMappingReressor(extrapolate="both").fit(
        pd.DataFrame({"v": x}, index=idx), pd.Series(y, index=idx)
    )
    out = m.predict(pd.DataFrame({"v": x}, index=idx))
    assert np.isfinite(out).all()


def test_constant_series(rng):
    idx = pd.date_range("2001-01-01", periods=120, freq="D")
    X = pd.DataFrame({"v": np.full(120, 5.0)}, index=idx)
    y = pd.DataFrame({"v": np.full(120, 7.0)}, index=idx)
    out = sdt.QuantileMappingReressor().fit(X, y["v"]).predict(X)
    np.testing.assert_allclose(out, 7.0, rtol=1e-6)

    qm = sdt.QuantileMapper().fit(X)
    out2 = qm.transform(X + 1.0)
    assert np.isfinite(out2).all()


def test_bcsd_single_year_monthly(rng):
    # one sample per month group — minimum viable BCSD
    idx = pd.date_range("2001-01-01", periods=12, freq="MS")
    X = pd.DataFrame({"v": rng.normal(283, 5, 12)}, index=idx)
    y = pd.DataFrame({"v": rng.normal(282, 5, 12)}, index=idx)
    m = sdt.BcsdTemperature(return_anoms=False).fit(X, y)
    out = m.predict(X)
    assert np.isfinite(out.to_numpy()).all()


def test_gard_k_larger_than_train(rng):
    idx = pd.date_range("2001-01-01", periods=30, freq="D")
    X = pd.DataFrame({"v": rng.normal(size=30)}, index=idx)
    y = pd.Series(rng.normal(size=30), index=idx)
    with pytest.warns(UserWarning):
        m = sdt.AnalogRegression(n_analogs=100).fit(X, y)
    out = m.predict(X)
    assert np.isfinite(np.asarray(out)[:, 0]).all()


def test_trend_two_points(rng):
    X = np.array([[1.0], [3.0]])
    lt = sdt.LinearTrendTransformer().fit(X)
    np.testing.assert_allclose(np.asarray(lt.transform(X)), 0.0, atol=1e-12)


def test_zscore_single_year(rng):
    idx = pd.date_range("2001-01-01", "2001-12-31", freq="D")
    n = len(idx)
    X = pd.DataFrame({"v": rng.normal(283, 2, n)}, index=idx)
    y = pd.DataFrame({"v": rng.normal(282, 2, n)}, index=idx)
    m = sdt.ZScoreRegressor().fit(X, y)
    out = m.predict(X)
    core = out["v"].to_numpy()[16:-16]
    assert np.isfinite(core).all()


def test_pure_analog_all_below_thresh(rng, short_daily):
    X, y = short_daily
    # threshold above everything: masked means are all-NaN -> pred 0,
    # prediction_error NaN (gard.py:329-343 semantics)
    m = sdt.PureAnalog(n_analogs=5, kind="mean_analogs", thresh=1e6).fit(X, y["v"])
    out = np.asarray(m.predict(X))
    np.testing.assert_allclose(out[:, 0], 0.0)
    np.testing.assert_allclose(out[:, 1], 0.0)
    assert np.isnan(out[:, 2]).all()


def test_grid_single_cell(rng):
    from skdownscale_tpu.xlite import DataArray

    idx = pd.date_range("1990-01-01", periods=120, freq="MS")
    X = DataArray(283 + rng.normal(0, 2, (120, 1)), ("time", "point"), {"time": idx, "point": [0]})
    y = DataArray(282 + rng.normal(0, 2, (120, 1)), ("time", "point"), {"time": idx, "point": [0]})
    d = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False))
    d.fit(X, y)
    out = d.predict(X)
    assert out.shape == (120, 1)
    assert np.isfinite(out.values).all()


def test_edcdfm_short_series(rng):
    idx = pd.date_range("2001-01-01", periods=25, freq="D")
    X = pd.DataFrame({"v": rng.normal(size=25)}, index=idx)
    y = pd.Series(rng.normal(size=25), index=idx)
    m = sdt.EquidistantCdfMatcher(n_endpoints=2).fit(X, y)
    assert np.isfinite(m.predict(X)).all()
