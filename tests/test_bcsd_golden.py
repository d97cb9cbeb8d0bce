"""Golden tests: BCSD family vs the reference implementation."""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

from skdownscale_tpu.models.bcsd import BcsdPrecipitation, BcsdTemperature


@pytest.fixture
def monthly_data(rng):
    idx_hist = pd.date_range("1970-01-01", "1999-12-01", freq="MS")
    n = len(idx_hist)
    seasonal = 10 * np.sin(2 * np.pi * (idx_hist.month.values - 1) / 12)
    X = pd.DataFrame({"t": 283 + seasonal + rng.normal(0, 2, n) + 1.5}, index=idx_hist)
    y = pd.DataFrame({"t": 282 + seasonal + rng.normal(0, 1.8, n)}, index=idx_hist)
    idx_fut = pd.date_range("2050-01-01", "2059-12-01", freq="MS")
    nf = len(idx_fut)
    seasonal_f = 10 * np.sin(2 * np.pi * (idx_fut.month.values - 1) / 12)
    Xf = pd.DataFrame({"t": 283 + 2.0 + seasonal_f + rng.normal(0, 2.2, nf) + 1.5}, index=idx_fut)
    return X, y, Xf


@pytest.mark.parametrize("return_anoms", [True, False])
def test_bcsd_temperature_golden(skref, monthly_data, return_anoms):
    X, y, Xf = monthly_data
    ref = skref.BcsdTemperature(return_anoms=return_anoms).fit(X, y)
    ours = BcsdTemperature(return_anoms=return_anoms).fit(X, y)
    npt.assert_allclose(np.sort(ours.y_climo_), np.sort(ref.y_climo_.to_numpy().ravel()), rtol=1e-9)
    for Xq in (X, Xf):
        r = ref.predict(Xq)
        o = ours.predict(Xq)
        assert isinstance(o, pd.DataFrame)
        npt.assert_allclose(o.to_numpy(), np.asarray(r).reshape(o.shape), rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("return_anoms", [True, False])
def test_bcsd_precipitation_golden(skref, rng, return_anoms):
    idx = pd.date_range("1980-01-01", "2009-12-01", freq="MS")
    n = len(idx)
    X = pd.DataFrame({"p": rng.gamma(2.0, 30.0, n) + 1}, index=idx)
    y = pd.DataFrame({"p": rng.gamma(2.2, 25.0, n) + 1}, index=idx)
    idx_f = pd.date_range("2040-01-01", "2049-12-01", freq="MS")
    Xf = pd.DataFrame({"p": rng.gamma(2.1, 33.0, len(idx_f)) + 1}, index=idx_f)

    ref = skref.BcsdPrecipitation(return_anoms=return_anoms).fit(X, y)
    ours = BcsdPrecipitation(return_anoms=return_anoms).fit(X, y)
    for Xq in (X, Xf):
        r = ref.predict(Xq)
        o = ours.predict(Xq)
        npt.assert_allclose(o.to_numpy(), np.asarray(r).reshape(o.shape), rtol=1e-6, atol=1e-8)


def test_bcsd_precip_negative_climatology(rng):
    idx = pd.date_range("1980-01-01", "2009-12-01", freq="MS")
    n = len(idx)
    X = pd.DataFrame({"p": rng.normal(0, 1, n)}, index=idx)
    y = pd.DataFrame({"p": rng.normal(0, 1, n)}, index=idx)
    with pytest.raises(ValueError, match="Invalid value in target climatology"):
        BcsdPrecipitation(return_anoms=True).fit(X, y)


def test_bcsd_daily_nasa_nex_golden(skref, rng):
    idx = pd.date_range("2000-01-01", "2003-12-31", freq="D")
    n = len(idx)
    doy = idx.dayofyear.values
    seasonal = 10 * np.sin(2 * np.pi * doy / 365.25)
    X = pd.DataFrame({"t": 283 + seasonal + rng.normal(0, 2, n)}, index=idx)
    y = pd.DataFrame({"t": 282 + seasonal + rng.normal(0, 1.8, n)}, index=idx)

    ref = skref.BcsdTemperature(time_grouper="daily_nasa-nex", return_anoms=False).fit(X, y)
    ours = BcsdTemperature(time_grouper="daily_nasa-nex", return_anoms=False).fit(X, y)
    r = ref.predict(X)
    o = ours.predict(X)
    npt.assert_allclose(o.to_numpy(), np.asarray(r).reshape(o.shape), rtol=1e-6, atol=1e-8)


def test_bcsd_daily_return_anoms_raises(rng):
    idx = pd.date_range("2000-01-01", "2001-12-31", freq="D")
    n = len(idx)
    X = pd.DataFrame({"t": 283 + rng.normal(0, 2, n)}, index=idx)
    y = pd.DataFrame({"t": 282 + rng.normal(0, 2, n)}, index=idx)
    m = BcsdTemperature(time_grouper="daily_nasa-nex", return_anoms=True).fit(X, y)
    with pytest.raises(ValueError):
        m.predict(X)


def test_bcsd_multifeature_raises(rng):
    idx = pd.date_range("1980-01-01", "1989-12-01", freq="MS")
    X = pd.DataFrame({"a": rng.normal(size=len(idx)), "b": rng.normal(size=len(idx))}, index=idx)
    y = pd.DataFrame({"a": rng.normal(size=len(idx))}, index=idx)
    with pytest.raises(ValueError, match="1 feature"):
        BcsdTemperature().fit(X, y)


def test_quantile_mappers_dict_functional(skref, monthly_data):
    # the per-group mapper dict must hold usable fitted mappers whose
    # stored CDFs equal the reference's (bcsd.py:59-67)
    X, y, _ = monthly_data
    ref = skref.BcsdTemperature().fit(X, y)
    ours = BcsdTemperature().fit(X, y)
    assert set(ours.quantile_mappers_) == set(ref.quantile_mappers_)
    for key in ref.quantile_mappers_:
        r = ref.quantile_mappers_[key].x_cdf_fit_.cdf_
        o = ours.quantile_mappers_[key].x_cdf_fit_.cdf_
        npt.assert_allclose(o.pp, r.pp, rtol=1e-12)
        npt.assert_allclose(o.vals, r.vals, rtol=1e-9)


def test_bcsd_temperature_tied_values_golden(skref, rng):
    """Quantized (heavily tied) series: the rank-bracket interp's tie fill
    must reproduce the reference's np.interp semantics (all tied queries map
    through the last tied slot's plotting position) exactly, including tie
    runs that straddle the interior/tail-extrapolation boundary."""
    idx = pd.date_range("1985-01-01", "2004-12-01", freq="MS")
    n = len(idx)
    seasonal = 10 * np.sin(2 * np.pi * (idx.month.values - 1) / 12)
    # round to whole degrees: ~30 distinct values per month group of 20
    X = pd.DataFrame(
        {"t": np.round(283 + seasonal + rng.normal(0, 2, n) + 1.5)}, index=idx
    )
    y = pd.DataFrame({"t": np.round(282 + seasonal + rng.normal(0, 1.8, n))}, index=idx)
    idx_f = pd.date_range("2050-01-01", "2059-12-01", freq="MS")
    sf = 10 * np.sin(2 * np.pi * (idx_f.month.values - 1) / 12)
    # +3 shift pushes many queries past the fitted CDF's last knot (hi tail)
    Xf = pd.DataFrame(
        {"t": np.round(286 + sf + rng.normal(0, 2.5, len(idx_f)) + 1.5)}, index=idx_f
    )
    ref = skref.BcsdTemperature(return_anoms=False).fit(X, y)
    ours = BcsdTemperature(return_anoms=False).fit(X, y)
    for Xq in (X, Xf):
        r = ref.predict(Xq)
        o = ours.predict(Xq)
        npt.assert_allclose(o.to_numpy(), np.asarray(r).reshape(o.shape), rtol=1e-6, atol=1e-8)
