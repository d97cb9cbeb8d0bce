"""Non-pandas climate calendars (noleap / all_leap / 360_day) in TimeIndex.

GCM output commonly uses cftime calendars pandas cannot represent; the
reference (pandas-only) simply cannot ingest them.  ``TimeIndex.from_components``
/ ``range_daily`` build the host calendar features directly, and the group
machinery (`padded_doy_groups`, `_pandas_partition` with callable groupers)
consumes a TimeIndex transparently — pinned here by exact equivalence
against the pandas path on dates both can represent.
"""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import jax.numpy as jnp

from skdownscale_tpu.utils.timeindex import TimeIndex


class TestFromComponents:
    def test_standard_matches_pandas(self):
        idx = pd.date_range("1999-01-01", "2004-12-31", freq="D")  # spans 2000 leap
        ti = TimeIndex.from_components(idx.year, idx.month, idx.day, calendar="standard")
        ref = TimeIndex.from_pandas(idx)
        for f in ("month", "day", "dayofyear", "year", "is_leap_year"):
            npt.assert_array_equal(getattr(ti, f), getattr(ref, f), err_msg=f)

    def test_noleap_doy(self):
        ti = TimeIndex.from_components([2000, 2000], [2, 3], [28, 1], calendar="noleap")
        npt.assert_array_equal(ti.dayofyear, [59, 60])  # contiguous: no Feb 29
        assert not ti.is_leap_year.any()
        assert ti.max_dayofyear == 60

    def test_360_day_doy(self):
        ti = TimeIndex.from_components([1, 1, 1], [1, 2, 12], [30, 1, 30], calendar="360_day")
        npt.assert_array_equal(ti.dayofyear, [30, 31, 360])

    def test_alias_and_unknown(self):
        a = TimeIndex.from_components([1], [6], [15], calendar="365_day")
        b = TimeIndex.from_components([1], [6], [15], calendar="noleap")
        assert a == b
        with pytest.raises(ValueError, match="unknown calendar"):
            TimeIndex.from_components([1], [1], [1], calendar="julian")


class TestRangeDaily:
    @pytest.mark.parametrize(
        "calendar,year_len", [("noleap", 365), ("all_leap", 366), ("360_day", 360)]
    )
    def test_year_lengths_and_rollover(self, calendar, year_len):
        n = 2 * year_len + 40
        ti = TimeIndex.range_daily(n, start_year=1990, calendar=calendar)
        assert len(ti) == n
        assert (ti.year[:year_len] == 1990).all()
        assert ti.year[year_len] == 1991
        assert ti.month[0] == 1 and ti.day[0] == 1
        assert int(ti.dayofyear[year_len - 1]) == year_len
        # strictly sequential within a year
        assert (np.diff(ti.dayofyear[:year_len]) == 1).all()

    def test_standard_matches_pandas(self):
        ti = TimeIndex.range_daily(800, start_year=1999, calendar="standard")
        idx = pd.date_range("1999-01-01", periods=800, freq="D")
        ref = TimeIndex.from_pandas(idx)
        assert ti == ref


def _daily_bcsd_run(index_like, x, y):
    """Batch-native daily BCSD fit+predict (the bench/graft path)."""
    from skdownscale_tpu.models.bcsd import BcsdTemperature, bcsd_fit_lazy, bcsd_predict_streaming

    model = BcsdTemperature(time_grouper="daily_nasa-nex", return_anoms=False)
    fg = model._fit_groups(index_like)
    plan = model._predict_plan(fg, index_like)
    state = bcsd_fit_lazy(jnp.asarray(x), jnp.asarray(y), fg, with_x_climo=True)
    out = bcsd_predict_streaming(
        state, jnp.asarray(x), plan, variable="temperature", return_anoms=False, group_chunk=8
    )
    return np.asarray(out)


class TestCalendarBcsd:
    def test_noleap_timeindex_equals_pandas_on_leap_free_years(self, rng):
        """1981-1983 contain no leap day, so the pandas path and the noleap
        TimeIndex path describe identical calendars — outputs must match
        exactly (pins every grouping branch TimeIndex touches)."""
        idx = pd.date_range("1981-01-01", "1983-12-31", freq="D")
        ti = TimeIndex.from_components(idx.year, idx.month, idx.day, calendar="noleap")
        C = 4
        seas = 10 * np.sin(2 * np.pi * (np.asarray(idx.dayofyear) - 1) / 365.0)
        x = (283 + seas[None, :] + rng.normal(0, 2, (C, len(idx))) + 1.2).astype(np.float32)
        y = (282 + seas[None, :] + rng.normal(0, 1.7, (C, len(idx)))).astype(np.float32)
        out_pd = _daily_bcsd_run(idx, x, y)
        out_ti = _daily_bcsd_run(ti, x, y)
        npt.assert_array_equal(out_ti, out_pd)

    def test_360_day_daily_bcsd_runs(self, rng):
        ti = TimeIndex.range_daily(3 * 360, start_year=2000, calendar="360_day")
        C = 3
        seas = 8 * np.sin(2 * np.pi * (np.asarray(ti.dayofyear) - 1) / 360.0)
        x = (283 + seas[None, :] + rng.normal(0, 2, (C, len(ti))) + 1.0).astype(np.float32)
        y = (282 + seas[None, :] + rng.normal(0, 1.5, (C, len(ti)))).astype(np.float32)
        out = _daily_bcsd_run(ti, x, y)
        assert out.shape == x.shape and np.isfinite(out).all()
        # correction moved the series toward the obs climatology
        assert abs(out.mean() - y.mean()) < abs(x.mean() - y.mean())

    def test_monthly_bcsd_timeindex_equals_pandas(self, rng):
        from skdownscale_tpu.models.bcsd import BcsdTemperature, bcsd_fit_lazy, bcsd_predict_streaming

        idx = pd.date_range("1990-01-01", periods=120, freq="MS")
        ti = TimeIndex.from_components(idx.year, idx.month, idx.day, calendar="standard")
        C = 4
        seas = 8 * np.sin(2 * np.pi * (np.asarray(idx.month) - 1) / 12)
        x = (283 + seas[None, :] + rng.normal(0, 2, (C, 120)) + 1.5).astype(np.float32)
        y = (282 + seas[None, :] + rng.normal(0, 1.8, (C, 120))).astype(np.float32)

        def run(index_like):
            model = BcsdTemperature(return_anoms=False)
            fg = model._fit_groups(index_like)
            plan = model._predict_plan(fg, index_like)
            state = bcsd_fit_lazy(jnp.asarray(x), jnp.asarray(y), fg, with_x_climo=True)
            return np.asarray(
                bcsd_predict_streaming(
                    state, jnp.asarray(x), plan,
                    variable="temperature", return_anoms=False, group_chunk=4,
                )
            )

        npt.assert_array_equal(run(ti), run(idx))

    def test_pointwise_runner_accepts_timeindex_coord(self, rng):
        """PointWiseDownscaler on a grid whose time coord is a 360-day
        TimeIndex — the full batched runner path, no pandas anywhere."""
        import skdownscale_tpu as sdt
        from skdownscale_tpu.xlite import DataArray

        ti = TimeIndex.range_daily(2 * 360, start_year=2000, calendar="360_day")
        ny, nx = 2, 3
        seas = 8 * np.sin(2 * np.pi * (np.asarray(ti.dayofyear) - 1) / 360.0)
        gcm = 283 + seas[:, None, None] + rng.normal(0, 2, (len(ti), ny, nx)) + 1.0
        obs = 282 + seas[:, None, None] + rng.normal(0, 1.5, (len(ti), ny, nx))
        gcm[:, 0, 0] = np.nan
        obs[:, 0, 0] = np.nan
        coords = {"time": ti, "y": np.arange(ny), "x": np.arange(nx)}
        Xg = DataArray(gcm, ("time", "y", "x"), coords)
        Yg = DataArray(obs, ("time", "y", "x"), coords)
        d = sdt.PointWiseDownscaler(
            sdt.BcsdTemperature(time_grouper="daily_nasa-nex", return_anoms=False)
        )
        d.fit(Xg, Yg)
        out = np.asarray(d.predict(Xg).values)
        assert out.shape == gcm.shape
        assert np.isnan(out[:, 0, 0]).all()
        assert np.isfinite(out[:, 1:, :]).all() or np.isfinite(out[:, :, 1:]).all()

    def test_temporal_disaggregate_on_360_day(self, rng):
        """Monthly->daily disaggregation under a 360-day calendar (TimeIndex
        everywhere; explicit out_index since pandas can't span it)."""
        from skdownscale_tpu.utils.disagg import temporal_disaggregate

        obs_ti = TimeIndex.range_daily(2 * 360, start_year=1980, calendar="360_day")
        out_ti = TimeIndex.range_daily(360, start_year=1990, calendar="360_day")
        m_ti = TimeIndex.from_components(
            np.full(12, 1990), np.arange(1, 13), np.ones(12, np.int32), calendar="360_day"
        )
        obs = rng.gamma(2.0, 3.0, len(obs_ti))
        monthly = rng.gamma(2.0, 3.0, 12) + 0.5
        out = np.asarray(
            temporal_disaggregate(monthly, m_ti, obs, obs_ti, out_ti, kind="precipitation")
        )
        assert out.shape == (360,) and np.isfinite(out).all()
        for m in range(12):
            npt.assert_allclose(out[m * 30 : (m + 1) * 30].mean(), monthly[m], rtol=1e-9)

    def test_unsupported_grouper_with_timeindex_raises(self):
        from skdownscale_tpu.models.bcsd import _pandas_partition

        ti = TimeIndex.range_daily(30, calendar="noleap")
        with pytest.raises(TypeError, match="requires a pandas"):
            _pandas_partition(ti, pd.Grouper(freq="YE"))
