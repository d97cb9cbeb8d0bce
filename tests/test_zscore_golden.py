"""Golden parity for ZScoreRegressor against the reference.

The reference's fit path needs xarray only inside ``_calc_stats``
(``zscore.py:162-193``); its predict helpers (``_get_fut_stats``,
``_expand_params``, ``_correct_fut_stats``) are pure pandas and are imported
directly from the reference here.  ``_calc_stats`` is re-derived below as a
vendored numpy implementation whose semantics follow the reference line by
line (documented per step); fit parity compares shift_/scale_/fit stats
against it, predict parity composes the reference's own helper chain
(``zscore.py:96-112``).
"""

from __future__ import annotations

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import skdownscale_tpu as sdt


def vendored_ref_calc_stats(series: pd.Series, w: int):
    """Numpy port of the reference's ``_calc_stats`` (``zscore.py:123-193``).

    Steps (file:line refer to /root/reference/skdownscale/pointwise_models/zscore.py):
    * groupby('time.year').map(split) -> a (year, day) matrix whose day axis
      is the sorted union of observed day-of-year values, NaN where a year
      lacks that day (xarray outer alignment; zscore.py:150-153)
    * bookends: concat([late_decs, full, early_jans], 'day') where late_decs
      is the last ``-(-w//2)`` day-columns and early_jans the first ``w//2``
      (zscore.py:155-158; note ``slice(-w//2, None)`` floor division)
    * rolling(day=w, center=True).construct('win_day') then mean/std over
      (year, win_day), NaN-skipping, std ddof=0 (xarray defaults;
      zscore.py:185-189)
    * trim ``n = w//2 + 1`` positions from both ends (zscore.py:188-189)
    """
    assert w % 2 == 1, "vendored port implements xarray's odd-window centering"
    years = np.asarray(series.index.year)
    doys = np.asarray(series.index.dayofyear)
    uyears = np.unique(years)
    udays = np.unique(doys)
    L = len(udays)
    mat = np.full((len(uyears), L), np.nan)
    mat[np.searchsorted(uyears, years), np.searchsorted(udays, doys)] = series.to_numpy()

    n_late = (w + 1) // 2  # len of slice(-w//2, None) for odd w
    n_early = w // 2
    rsh = np.concatenate([mat[:, L - n_late :], mat, mat[:, :n_early]], axis=1)
    day_coords = np.concatenate([udays[L - n_late :], udays, udays[:n_early]])

    half = w // 2
    Lc = rsh.shape[1]
    means = np.empty(Lc)
    stds = np.empty(Lc)
    for d in range(Lc):
        win = rsh[:, max(d - half, 0) : min(d + half + 1, Lc)]
        v = win[np.isfinite(win)]
        means[d] = v.mean() if v.size else np.nan
        stds[d] = v.std(ddof=0) if v.size else np.nan

    n = half + 1
    sel = slice(n, Lc - n)
    return (
        pd.Series(means[sel], index=day_coords[sel]),
        pd.Series(stds[sel], index=day_coords[sel]),
    )


def make_problem(rng, start="1990-01-01", n_years=4, w=31):
    idx = pd.date_range(start, periods=365 * n_years + 1, freq="D")
    base = 280 + 10 * np.sin(2 * np.pi * idx.dayofyear.values / 365.25)
    x = base + rng.normal(0, 3, len(idx)) + 1.2
    y = base + rng.normal(0, 2.4, len(idx))
    X = pd.DataFrame({"t": x}, index=idx)
    ys = pd.Series(y, index=idx, name="t")
    return X, ys


@pytest.mark.parametrize("w", [31, 15])
@pytest.mark.parametrize("start,n_years", [("1990-01-01", 4), ("1991-03-01", 2)])
def test_zscore_fit_golden(skref, rng, w, start, n_years):
    from skdownscale.pointwise_models import zscore as ref_zs

    X, ys = make_problem(rng, start=start, n_years=n_years, w=w)

    ref_xm, ref_xs = vendored_ref_calc_stats(X["t"], w)
    ref_ym, ref_ys_ = vendored_ref_calc_stats(ys, w)
    ref_shift, ref_scale = ref_zs._get_params(ref_xm, ref_xs, ref_ym, ref_ys_)

    ours = sdt.ZScoreRegressor(window_width=w).fit(X, ys)

    npt.assert_allclose(ours.fit_stats_dict_["X_mean"], ref_xm.to_numpy(), rtol=1e-9, atol=1e-9)
    npt.assert_allclose(ours.fit_stats_dict_["X_std"], ref_xs.to_numpy(), rtol=1e-9, atol=1e-9)
    npt.assert_allclose(ours.fit_stats_dict_["y_mean"], ref_ym.to_numpy(), rtol=1e-9, atol=1e-9)
    npt.assert_allclose(ours.fit_stats_dict_["y_std"], ref_ys_.to_numpy(), rtol=1e-9, atol=1e-9)
    npt.assert_allclose(ours.shift_, ref_shift.to_numpy(), rtol=1e-9, atol=1e-9)
    npt.assert_allclose(ours.scale_, ref_scale.to_numpy(), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("w", [31, 15])
def test_zscore_predict_golden(skref, rng, w):
    """Predict composed from the reference's own pandas helpers
    (``zscore.py:96-112``) on vendored fit params, vs our predict."""
    from skdownscale.pointwise_models import zscore as ref_zs

    X, ys = make_problem(rng, n_years=4, w=w)
    Xq, _ = make_problem(np.random.default_rng(7), start="2000-01-01", n_years=3, w=w)

    ref_xm, ref_xs = vendored_ref_calc_stats(X["t"], w)
    ref_ym, ref_ys_ = vendored_ref_calc_stats(ys, w)
    ref_shift, ref_scale = ref_zs._get_params(ref_xm, ref_xs, ref_ym, ref_ys_)

    fut_mean, fut_std, fut_z = ref_zs._get_fut_stats(Xq["t"], w)
    shift_exp, scale_exp = ref_zs._expand_params(Xq["t"], ref_shift, ref_scale)
    mean_c, std_c = ref_zs._correct_fut_stats(fut_mean, fut_std, shift_exp, scale_exp)
    expected = (fut_z * std_c) + mean_c  # zscore.py:110

    ours = sdt.ZScoreRegressor(window_width=w).fit(X, ys)
    got = np.asarray(ours.predict(Xq)).reshape(-1)

    npt.assert_allclose(got, expected.to_numpy(), rtol=1e-9, atol=1e-9, equal_nan=True)
