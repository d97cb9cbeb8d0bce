"""Golden tests: quantile family vs the reference implementation.

Each test runs the reference estimator (imported read-only from
/root/reference) and the TPU-native implementation on identical data and
compares outputs in float64.  Tolerances are tight (1e-9 relative) because
the algorithms are ports of the same math, not refits.
"""

import numpy as np
import numpy.testing as npt
import pytest

import skdownscale_tpu as sdt
from skdownscale_tpu.ops.cdf import plotting_positions


def make_series(rng, n, loc=10.0, scale=3.0, trend=0.01):
    return loc + scale * rng.standard_normal(n) + trend * np.arange(n)


def test_plotting_positions(skref):
    from skdownscale.pointwise_models.quantile import plotting_positions as ref_pp

    for n in [5, 100, 365]:
        npt.assert_allclose(np.asarray(plotting_positions(n)), ref_pp(n), rtol=1e-12)


def test_linear_trend_golden(skref, rng):
    X = make_series(rng, 500).reshape(-1, 1)
    ref = skref.LinearTrendTransformer().fit(X)
    ours = sdt.LinearTrendTransformer().fit(X)
    npt.assert_allclose(ours.trendline(X), ref.trendline(X), rtol=1e-9)
    npt.assert_allclose(np.asarray(ours.transform(X)), np.asarray(ref.transform(X)), rtol=1e-8, atol=1e-10)
    npt.assert_allclose(
        np.asarray(ours.inverse_transform(X)), np.asarray(ref.inverse_transform(X)), rtol=1e-9
    )
    npt.assert_allclose(ours.lr_model_.coef_, ref.lr_model_.coef_, rtol=1e-9)
    npt.assert_allclose(ours.lr_model_.intercept_, ref.lr_model_.intercept_, rtol=1e-9)


def test_linear_trend_roundtrip(rng):
    # port of reference test_pointwise_models.py:56-79
    X = make_series(rng, 400).reshape(-1, 1)
    lt = sdt.LinearTrendTransformer()
    npt.assert_allclose(lt.fit_transform(X) + lt.trendline(X), X, rtol=1e-9)


@pytest.mark.parametrize("extrapolate", [None, "both", "min", "max"])
def test_cunnane_transform_golden(skref, rng, extrapolate):
    X = make_series(rng, 300, trend=0).reshape(-1, 1)
    if extrapolate is None:
        # out-of-range queries exercise the clamp path (no tail OLS)
        Xq = make_series(rng, 200, loc=11, scale=4, trend=0).reshape(-1, 1)
    else:
        # the reference's transform tail-OLS crashes on ndarray input
        # (quantile.py:497 `.values`); golden-compare in-range only
        lo, hi = X.min(), X.max()
        Xq = rng.uniform(lo, hi, size=(200, 1))
    ref = skref.CunnaneTransformer(extrapolate=extrapolate).fit(X)
    ours = sdt.CunnaneTransformer(extrapolate=extrapolate).fit(X)
    npt.assert_allclose(ours.cdf_.pp, ref.cdf_.pp, rtol=1e-12)
    npt.assert_allclose(ours.cdf_.vals, ref.cdf_.vals, rtol=1e-12)
    npt.assert_allclose(ours.transform(Xq), ref.transform(Xq), rtol=1e-9)


@pytest.mark.parametrize("extrapolate", [None, "both"])
def test_cunnane_inverse_golden(skref, rng, extrapolate):
    X = make_series(rng, 300, trend=0).reshape(-1, 1)
    # plotting positions slightly outside [pp_min, pp_max] exercise tails
    q = np.linspace(-0.1, 1.1, 150).reshape(-1, 1)
    ref = skref.CunnaneTransformer(extrapolate=extrapolate).fit(X)
    ours = sdt.CunnaneTransformer(extrapolate=extrapolate).fit(X)
    npt.assert_allclose(ours.inverse_transform(q), ref.inverse_transform(q), rtol=1e-9)


@pytest.mark.parametrize("detrend", [False, True])
def test_quantile_mapper_golden(skref, rng, detrend):
    X = make_series(rng, 400).reshape(-1, 1)
    ref = skref.QuantileMapper(detrend=detrend).fit(X)
    ours = sdt.QuantileMapper(detrend=detrend).fit(X)
    npt.assert_allclose(ours.transform(X), ref.transform(X), rtol=1e-7, atol=1e-9)


def test_quantile_mapper_known_bias(rng):
    # port of reference test_quantile_mapper (test_pointwise_models.py:81-90)
    n = 365
    base = np.sin(np.linspace(0, 2 * np.pi, n)) * 10 + 15 + rng.normal(0, 1, n)
    biased = base + 2.0
    mapper = sdt.QuantileMapper().fit(base.reshape(-1, 1))
    corrected = mapper.transform(biased.reshape(-1, 1))
    npt.assert_allclose(np.sort(corrected.ravel()), np.sort(base), rtol=1e-6)


@pytest.mark.parametrize("extrapolate", [None, "min", "max", "both", "1to1"])
def test_qmr_golden(skref, rng, extrapolate):
    X = make_series(rng, 400, loc=10, scale=3).reshape(-1, 1)
    y = make_series(rng, 400, loc=12, scale=2.5)
    # wider test distribution so min/max/both/1to1 tails trigger
    Xq = make_series(rng, 300, loc=10, scale=5).reshape(-1, 1)
    ref = skref.QuantileMappingReressor(extrapolate=extrapolate).fit(X, y)
    ours = sdt.QuantileMappingReressor(extrapolate=extrapolate).fit(X, y)
    npt.assert_allclose(ours._X_cdf.pp, ref._X_cdf.pp, rtol=1e-12)
    npt.assert_allclose(ours._X_cdf.vals, ref._X_cdf.vals, rtol=1e-12)
    r, o = ref.predict(Xq), ours.predict(Xq)
    if extrapolate in ("min", "both"):
        # queries below the fit minimum interpolate across the ±1e20
        # synthetic-endpoint interval, where np.interp returns catastrophic-
        # cancellation noise; our near-anchor interp returns the exact linear
        # value there (documented divergence) — compare in-range only
        in_range = Xq[:, 0] >= X.min()
        npt.assert_allclose(o[in_range], r[in_range], rtol=1e-7, atol=1e-9)
        assert np.isfinite(o).all()
    else:
        npt.assert_allclose(o, r, rtol=1e-7, atol=1e-9)


def test_qmr_1to1_length_mismatch(skref, rng):
    # exercises the X_fit_len != y_fit_len branches (quantile.py:289-308)
    X = make_series(rng, 400, loc=10, scale=3).reshape(-1, 1)
    y_short = make_series(rng, 300, loc=12, scale=2.5)
    y_long = make_series(rng, 500, loc=12, scale=2.5)
    Xq = make_series(rng, 300, loc=10, scale=6).reshape(-1, 1)
    for y in (y_short, y_long):
        ref = skref.QuantileMappingReressor(extrapolate="1to1").fit(X, y)
        ours = sdt.QuantileMappingReressor(extrapolate="1to1").fit(X, y)
        npt.assert_allclose(ours.predict(Xq), ref.predict(Xq), rtol=1e-7, atol=1e-9)


def test_qmr_min_samples(rng):
    X = make_series(rng, 10).reshape(-1, 1)
    y = make_series(rng, 10)
    with pytest.raises(ValueError):
        sdt.QuantileMappingReressor(n_endpoints=10).fit(X, y)
    # param validation happens at fit time (sklearn convention), not __init__
    with pytest.raises(ValueError, match="n_endpoints"):
        sdt.QuantileMappingReressor(n_endpoints=1).fit(X, y)


@pytest.mark.parametrize("kind", ["difference", "ratio"])
@pytest.mark.parametrize("extrapolate", [None, "both", "1to1"])
def test_edcdfm_golden(skref, rng, kind, extrapolate):
    if kind == "ratio":
        X = np.abs(make_series(rng, 400, loc=5, scale=2, trend=0)).reshape(-1, 1) + 0.5
        y = np.abs(make_series(rng, 400, loc=6, scale=2, trend=0)) + 0.5
        Xq = np.abs(make_series(rng, 300, loc=5, scale=3, trend=0)).reshape(-1, 1) + 0.5
    else:
        X = make_series(rng, 400, loc=10, scale=3).reshape(-1, 1)
        y = make_series(rng, 400, loc=12, scale=2.5)
        Xq = make_series(rng, 300, loc=10, scale=5).reshape(-1, 1)
    ref = skref.EquidistantCdfMatcher(kind=kind, extrapolate=extrapolate).fit(X, y)
    ours = sdt.EquidistantCdfMatcher(kind=kind, extrapolate=extrapolate).fit(X, y)
    npt.assert_allclose(ours.predict(Xq), ref.predict(Xq), rtol=1e-7, atol=1e-9)


def test_edcdfm_analytic(rng):
    # port of reference QDM analytic test (test_pointwise_models.py:323-344):
    # with X_test = X_train + delta, prediction == y_train + delta exactly
    n = 200
    X = np.sort(rng.standard_normal(n)).reshape(-1, 1) * 3 + 10
    y = np.sort(rng.standard_normal(n)) * 2 + 12
    delta = 1.5
    m = sdt.EquidistantCdfMatcher(kind="difference").fit(X, y)
    pred = m.predict(X + delta)
    npt.assert_allclose(np.sort(pred), np.sort(y) + delta, rtol=1e-8)

    Xr = np.abs(X) + 1
    yr = np.abs(y) + 1
    r = 1.3
    mr = sdt.EquidistantCdfMatcher(kind="ratio").fit(Xr, yr)
    predr = mr.predict(Xr * r)
    npt.assert_allclose(np.sort(predr), np.sort(yr) * r, rtol=1e-8)


def test_edcdfm_max_ratio(rng):
    # reference's np.min(ratio, max_ratio) crashes (quantile.py:624); we
    # implement the evident intent: elementwise clip of the quantile ratio.
    Xr = np.abs(rng.standard_normal(300)).reshape(-1, 1) + 0.1
    yr = np.abs(rng.standard_normal(300)) + 0.1
    clipped = sdt.EquidistantCdfMatcher(kind="ratio", max_ratio=1.0).fit(Xr, yr)
    unclipped = sdt.EquidistantCdfMatcher(kind="ratio").fit(Xr, yr)
    Xq = Xr * 3.0
    assert (clipped.predict(Xq) <= unclipped.predict(Xq) + 1e-12).all()


def test_trend_aware_golden(skref, rng):
    import pandas as pd

    idx = pd.date_range("1980-01-01", periods=400, freq="D")
    X = pd.DataFrame({"v": make_series(rng, 400, trend=0.02)}, index=idx)
    y = pd.DataFrame({"v": make_series(rng, 400, loc=12, trend=0.015)}, index=idx)
    Xq = pd.DataFrame({"v": make_series(rng, 300, loc=10.5, trend=0.03)}, index=idx[:300])

    # '1to1' keeps the comparison exact everywhere (no ±1e20 sentinel knots,
    # which np.interp crosses with cancellation noise — see test_qmr_golden)
    ref = skref.TrendAwareQuantileMappingRegressor(
        qm_estimator=skref.QuantileMappingReressor(extrapolate="1to1")
    ).fit(X, y)
    ours = sdt.TrendAwareQuantileMappingRegressor(
        qm_estimator=sdt.QuantileMappingReressor(extrapolate="1to1")
    ).fit(X, y)
    npt.assert_allclose(
        np.asarray(ours.predict(Xq)), np.asarray(ref.predict(Xq)), rtol=1e-7, atol=1e-8
    )


@pytest.mark.parametrize(
    "lr_kwargs", [{"fit_intercept": False}, {"positive": True}, {"fit_intercept": False, "positive": True}]
)
def test_trend_aware_custom_transformer_golden(skref, rng, lr_kwargs):
    """A user-supplied, non-default ``trend_transformer`` must be honored
    (deep-copied per series, ref quantile.py:676-680, 698-699).

    The reference's ``__init__`` has no else-branch, so a passed transformer
    is silently dropped and fit crashes with AttributeError; we assign the
    attribute post-construction to exercise the reference's intended
    fit/predict semantics as the golden target.
    """
    import pandas as pd

    idx = pd.date_range("1980-01-01", periods=400, freq="D")
    X = pd.DataFrame({"v": make_series(rng, 400, trend=0.02)}, index=idx)
    y = pd.DataFrame({"v": make_series(rng, 400, loc=12, trend=0.015)}, index=idx)
    Xq = pd.DataFrame({"v": make_series(rng, 300, loc=10.5, trend=0.03)}, index=idx[:300])

    ref = skref.TrendAwareQuantileMappingRegressor(
        qm_estimator=skref.QuantileMappingReressor(extrapolate="1to1")
    )
    from skdownscale.pointwise_models.trend import LinearTrendTransformer as RefLTT

    ref.trend_transformer = RefLTT(lr_kwargs=dict(lr_kwargs))
    ref.fit(X, y)

    ours = sdt.TrendAwareQuantileMappingRegressor(
        qm_estimator=sdt.QuantileMappingReressor(extrapolate="1to1"),
        trend_transformer=sdt.LinearTrendTransformer(lr_kwargs=dict(lr_kwargs)),
    ).fit(X, y)
    npt.assert_allclose(
        np.asarray(ours.predict(Xq)), np.asarray(ref.predict(Xq)), rtol=1e-7, atol=1e-8
    )


def test_linear_trend_lr_kwargs_golden(skref, rng):
    """LinearTrendTransformer honors fit_intercept/positive (sklearn parity)."""
    from skdownscale.pointwise_models.trend import LinearTrendTransformer as RefLTT

    # include a decreasing series so positive=True actually clamps
    for trend in (0.05, -0.05):
        vals = make_series(rng, 200, trend=trend).reshape(-1, 1)
        for kw in ({"fit_intercept": False}, {"positive": True}, {"fit_intercept": False, "positive": True}):
            ref = RefLTT(lr_kwargs=dict(kw)).fit(vals)
            ours = sdt.LinearTrendTransformer(lr_kwargs=dict(kw)).fit(vals)
            npt.assert_allclose(ours.lr_model_.coef_, ref.lr_model_.coef_, rtol=1e-6, atol=1e-9)
            npt.assert_allclose(
                ours.lr_model_.intercept_, ref.lr_model_.intercept_, rtol=1e-6, atol=1e-8
            )
            npt.assert_allclose(
                np.asarray(ours.transform(vals)), np.asarray(ref.transform(vals)), rtol=1e-6, atol=1e-7
            )


def test_trend_aware_unsupported_transformer_falls_back():
    """A transformer the batched path can't express must route the grid
    runtime through the per-cell fallback, not silently use the default."""
    from skdownscale_tpu.models import batched as b

    ta_default = sdt.TrendAwareQuantileMappingRegressor(
        qm_estimator=sdt.QuantileMappingReressor()
    )
    assert b.supports_batched(ta_default)
    ta_kw = sdt.TrendAwareQuantileMappingRegressor(
        qm_estimator=sdt.QuantileMappingReressor(),
        trend_transformer=sdt.LinearTrendTransformer(lr_kwargs={"fit_intercept": False}),
    )
    assert b.supports_batched(ta_kw)  # supported kwargs stay batched

    class WeirdTrend(sdt.LinearTrendTransformer):
        pass

    ta_weird = sdt.TrendAwareQuantileMappingRegressor(
        qm_estimator=sdt.QuantileMappingReressor(), trend_transformer=WeirdTrend()
    )
    assert not b.supports_batched(ta_weird)


def test_sklearn_clone_compat():
    from sklearn.base import clone

    for est in [
        sdt.QuantileMapper(detrend=True),
        sdt.QuantileMappingReressor(extrapolate="both", n_endpoints=5),
        sdt.EquidistantCdfMatcher(kind="ratio", max_ratio=2.0),
        sdt.CunnaneTransformer(alpha=0.5),
        sdt.LinearTrendTransformer(),
    ]:
        cloned = clone(est)
        assert cloned.get_params() == est.get_params()


def test_edcdfm_equal_length_fast_path_matches_interp(rng):
    """Equal fit/predict lengths collapse EDCDFm's two merge interps to the
    identity (bitwise-equal Cunnane grids); the shortcut must equal the
    generic interp path exactly."""
    import jax.numpy as jnp

    from skdownscale_tpu.models.quantile import QmrState, edcdfm_predict, qmr_fit
    from skdownscale_tpu.ops.interp import interp_rows_multi
    from skdownscale_tpu.ops.cdf import calc_extrapolated_cdf
    from skdownscale_tpu.models.quantile import _sort_with_positions, _unsort

    n = 137
    x_fit = jnp.asarray(rng.normal(10, 2, (4, n)))
    y_fit = jnp.asarray(rng.normal(9, 1.5, (4, n)))
    x_new = jnp.asarray(rng.normal(10.5, 2, (4, n)))
    for extrapolate in (None, "both", "min", "max", "1to1"):
        st = qmr_fit(x_fit, y_fit, extrapolate=extrapolate)
        got = edcdfm_predict(st, x_new, kind="difference", extrapolate=extrapolate)
        # generic interp formulation, computed by hand
        xs, sort_inds = _sort_with_positions(x_new)
        tc = calc_extrapolated_cdf(xs, sort=False, extrapolate=extrapolate)
        Xtv, ytv = interp_rows_multi(st.x_pp, (st.x_vals, st.y_vals), tc.pp)
        want = _unsort((ytv + (tc.vals - Xtv))[..., 1:-1], sort_inds)
        if extrapolate == "1to1":
            from skdownscale_tpu.models.quantile import _extrapolate_1to1

            want = _extrapolate_1to1(st, x_new, want)
        npt.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-12)


def test_edcdfm_rank_bracket_matches_interp(rng):
    """The unequal-length rank-bracket path (host bracket tables) must equal
    the generic merge-interp formulation exactly (VERDICT r2 #2)."""
    import jax.numpy as jnp

    from skdownscale_tpu.models.quantile import (
        _extrapolate_1to1,
        _sort_with_positions,
        _unsort,
        edcdfm_predict,
        qmr_fit,
    )
    from skdownscale_tpu.ops.cdf import calc_extrapolated_cdf
    from skdownscale_tpu.ops.interp import interp_rows

    nx, ny, nq = 211, 173, 149  # all different
    x_fit = jnp.asarray(rng.normal(10, 2, (4, nx)))
    y_fit = jnp.asarray(rng.normal(9, 1.5, (4, ny)))
    x_new = jnp.asarray(rng.normal(10.5, 3, (4, nq)))
    for extrapolate in (None, "both", "min", "max", "1to1"):
        st = qmr_fit(x_fit, y_fit, extrapolate=extrapolate)
        got = edcdfm_predict(st, x_new, kind="difference", extrapolate=extrapolate)
        xs, sort_inds = _sort_with_positions(x_new)
        tc = calc_extrapolated_cdf(xs, sort=False, extrapolate=extrapolate)
        Xtv = interp_rows(st.x_pp, st.x_vals, tc.pp)
        ytv = interp_rows(st.y_pp, st.y_vals, tc.pp)
        want = _unsort((ytv + (tc.vals - Xtv))[..., 1:-1], sort_inds)
        if extrapolate == "1to1":
            want = _extrapolate_1to1(st, x_new, want)
        npt.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("extrapolate", [None, "both"])
def test_edcdfm_xy_length_mismatch_golden(skref, rng, extrapolate):
    """EDCDFm with len(X_fit) != len(y_fit) != len(X_predict) vs the imported
    reference (exercises both distinct bracket tables)."""
    X = make_series(rng, 420, loc=10, scale=3).reshape(-1, 1)
    y = make_series(rng, 366, loc=12, scale=2.5)
    Xq = make_series(rng, 250, loc=10, scale=5).reshape(-1, 1)
    ref = skref.EquidistantCdfMatcher(kind="difference", extrapolate=extrapolate).fit(X, y)
    ours = sdt.EquidistantCdfMatcher(kind="difference", extrapolate=extrapolate).fit(X, y)
    npt.assert_allclose(ours.predict(Xq), ref.predict(Xq), rtol=1e-7, atol=1e-9)
