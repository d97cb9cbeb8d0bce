"""Tests for aux subsystems: metrics, checkpointing, sharding, native packer."""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

import skdownscale_tpu as sdt
from skdownscale_tpu.utils import checkpoint, metrics, native
from skdownscale_tpu.xlite import DataArray


class TestMetrics:
    def test_match_sklearn(self, rng):
        from sklearn.metrics import mean_absolute_error, r2_score, root_mean_squared_error

        t = rng.normal(size=200)
        p = t + rng.normal(0, 0.3, 200)
        npt.assert_allclose(float(metrics.rmse(t, p)), root_mean_squared_error(t, p), rtol=1e-9)
        npt.assert_allclose(float(metrics.mae(t, p)), mean_absolute_error(t, p), rtol=1e-9)
        npt.assert_allclose(float(metrics.r2(t, p)), r2_score(t, p), rtol=1e-9)
        npt.assert_allclose(float(metrics.pearsonr(t, p)), np.corrcoef(t, p)[0, 1], rtol=1e-9)

    def test_nan_aware_and_batched(self, rng):
        t = rng.normal(size=(5, 100))
        p = t + 1.0
        t[:, :10] = np.nan
        out = metrics.score_all(t, p)
        assert out["rmse"].shape == (5,)
        npt.assert_allclose(np.asarray(out["bias"]), 1.0, rtol=1e-9)

    def test_ks_stat_matches_scipy(self, rng):
        from scipy.stats import ks_2samp

        for trial in range(6):
            t = rng.normal(0, 1, 180)
            p = rng.normal(0.2, 1.3, 160 if trial % 2 else 180)
            if trial >= 2:  # heavy ties, the run-end evaluation case
                t = np.round(t * 2) / 2
                p = np.round(p * 2) / 2
            if trial >= 4:
                t[:13] = np.nan
            # pad to equal lengths with NaN (the batched API is rectangular)
            L = max(len(t), len(p))
            tt = np.full(L, np.nan)
            pp_ = np.full(L, np.nan)
            tt[: len(t)] = t
            pp_[: len(p)] = p
            want = ks_2samp(t[np.isfinite(t)], p[np.isfinite(p)]).statistic
            got = float(metrics.ks_stat(jnp.asarray(tt), jnp.asarray(pp_)))
            npt.assert_allclose(got, want, rtol=1e-6)

    def test_ks_identical_and_disjoint(self):
        x = jnp.asarray(np.linspace(0.0, 1.0, 50))
        npt.assert_allclose(float(metrics.ks_stat(x, x)), 0.0)
        npt.assert_allclose(float(metrics.ks_stat(x, x + 10.0)), 1.0)
        assert np.isnan(float(metrics.ks_stat(jnp.full(4, np.nan), x[:4])))

    def test_quantile_bias(self, rng):
        t = rng.normal(0, 1, (3, 300))
        p = t + 0.7
        t[0, :30] = np.nan
        got = np.asarray(metrics.quantile_bias(t, p, 0.95))
        want = np.nanquantile(p, 0.95, axis=-1) - np.nanquantile(t, 0.95, axis=-1)
        npt.assert_allclose(got, want, rtol=1e-6)
        multi = np.asarray(metrics.quantile_bias(t, p, jnp.asarray([0.5, 0.99])))
        assert multi.shape == (2, 3)

    def test_wet_day_freq_bias(self, rng):
        t = rng.gamma(0.5, 2.0, (2, 400))
        p = np.where(t > 0.4, t, 0.0)  # dried-out version
        got = np.asarray(metrics.wet_day_freq_bias(t, p, thresh=0.1))
        want = (p > 0.1).mean(axis=-1) - (t > 0.1).mean(axis=-1)
        npt.assert_allclose(got, want, rtol=1e-6)

    def test_annual_cycle_rmse(self, rng):
        idx = pd.date_range("2000-01-01", periods=4 * 365, freq="D")
        labels = idx.month.to_numpy() - 1
        seas = 10 * np.sin(2 * np.pi * labels / 12)
        t = seas[None, :] + rng.normal(0, 0.5, (2, len(idx)))
        p = t + 2.0  # constant offset shifts every monthly mean by 2
        got = np.asarray(metrics.annual_cycle_rmse(t, p, labels))
        npt.assert_allclose(got, 2.0, rtol=1e-5)
        npt.assert_allclose(
            np.asarray(metrics.annual_cycle_rmse(t, t, labels)), 0.0, atol=1e-7
        )

    def test_trend_bias(self, rng):
        T = 500
        tt = np.arange(T)
        t = 0.01 * tt + rng.normal(0, 0.1, (3, T))
        p = 0.013 * tt + rng.normal(0, 0.1, (3, T))
        got = np.asarray(metrics.trend_bias(t, p))
        slopes_t = np.polyfit(tt, t.T, 1)[0]
        slopes_p = np.polyfit(tt, p.T, 1)[0]
        npt.assert_allclose(got, slopes_p - slopes_t, rtol=1e-4)


class TestCheckpoint:
    def test_roundtrip_grid(self, rng, tmp_path):
        idx = pd.date_range("1990-01-01", "1999-12-01", freq="MS")
        T = len(idx)
        X = DataArray(
            284 + rng.normal(0, 2, (T, 2, 3)), ("time", "y", "x"),
            {"time": idx, "y": np.arange(2), "x": np.arange(3)},
        )
        y = DataArray(X.values - 1.0, X.dims, X.coords)
        d = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False))
        d.fit(X, y)
        expected = d.predict(X)

        path = str(tmp_path / "ckpt.pkl")
        checkpoint.save(path, d)
        d2 = checkpoint.load(path)
        got = d2.predict(X)
        npt.assert_allclose(got.values, expected.values, rtol=1e-12, equal_nan=True)

    def test_state_roundtrip(self, rng, tmp_path):
        from skdownscale_tpu.models.quantile import qmr_fit

        state = qmr_fit(jnp.asarray(rng.normal(size=100)), jnp.asarray(rng.normal(size=100)))
        path = str(tmp_path / "state.pkl")
        checkpoint.save_state(path, state)
        loaded = checkpoint.load_state(path)
        for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(loaded)):
            npt.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fallback_not_checkpointable(self, rng, tmp_path):
        from sklearn.linear_model import LinearRegression

        idx = pd.date_range("1990-01-01", periods=24, freq="MS")
        X = DataArray(rng.normal(size=(24, 2)), ("time", "p"), {"time": idx, "p": np.arange(2)})
        y = DataArray(rng.normal(size=(24, 2)), ("time", "p"), {"time": idx, "p": np.arange(2)})
        d = sdt.PointWiseDownscaler(LinearRegression()).fit(X, y)
        with pytest.raises(ValueError, match="checkpointable"):
            checkpoint.save(str(tmp_path / "x.pkl"), d)


class TestSharding:
    def test_mesh_matches_single_device(self, rng):
        """8-virtual-device cell-sharded run == single-device run (the
        reference's dask-vs-eager parametrization, test_pointwise_runner)."""
        from skdownscale_tpu.models.bcsd import BcsdTemperature, bcsd_fit, bcsd_predict
        from skdownscale_tpu.parallel import cell_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        idx = pd.date_range("1990-01-01", "1999-12-01", freq="MS")
        C, T = 16, len(idx)
        x = jnp.asarray(284 + rng.normal(0, 2, (C, T)))
        y = jnp.asarray(283 + rng.normal(0, 1.8, (C, T)))
        model = BcsdTemperature(return_anoms=False)
        fg = model._fit_groups(idx)
        plan = model._predict_plan(fg, idx)

        def step(xx, yy):
            st = bcsd_fit(xx, yy, fg, with_x_climo=True)
            return bcsd_predict(st, xx, plan, variable="temperature", return_anoms=False)

        single = jax.jit(step)(x, y)

        mesh = cell_mesh(jax.devices()[:8])
        sh = NamedSharding(mesh, P("cells", None))
        xs, ys = jax.device_put(x, sh), jax.device_put(y, sh)
        sharded = jax.jit(step, in_shardings=(sh, sh), out_shardings=sh)(xs, ys)
        npt.assert_allclose(np.asarray(sharded), np.asarray(single), rtol=1e-12)

    def test_shard_cells_pads(self, rng):
        from skdownscale_tpu.parallel import cell_mesh, shard_cells

        mesh = cell_mesh(jax.devices()[:8])
        arr = rng.normal(size=(13, 5))
        sharded, n = shard_cells(arr, mesh)
        assert n == 13 and sharded.shape[0] == 16
        assert np.isnan(np.asarray(sharded)[13:]).all()


class TestProfiling:
    def test_stage_timer_and_report(self):
        from skdownscale_tpu.utils.profiling import StageTimer, annotate

        st = StageTimer()
        x = jnp.arange(16.0)
        with st.stage("square", sync=None):
            y = x * x
        with st.stage("square", sync=y):  # device-sync barrier form
            y = x * x
        with st.stage("sum"):
            float(jnp.sum(y))
        assert st.counts["square"] == 2 and st.counts["sum"] == 1
        rep = st.report()
        assert "square" in rep and "mean_ms" in rep
        with annotate("noop"):  # TraceAnnotation works outside a trace
            pass


class TestNative:
    def test_pack_unpack_roundtrip(self, rng):
        T, F, C = 37, 2, 101
        src = rng.normal(size=(T, F, C)).astype(np.float32)
        src[0, 0, ::3] = np.nan
        mask = native.valid_mask(src[0, 0])
        npt.assert_array_equal(mask, np.isfinite(src[0, 0]))
        ids = np.nonzero(mask)[0].astype(np.int32)
        packed = native.pack_compact(src, ids)
        npt.assert_array_equal(packed, np.moveaxis(src, 2, 0)[ids])
        un = native.unpack_scatter(packed, ids, C)
        npt.assert_array_equal(un[:, :, ids], np.moveaxis(packed, 0, 2))
        assert np.isnan(un[:, :, ~mask]).all()


class TestDisagg:
    def test_spatial_disaggregate_temperature(self, rng):
        from skdownscale_tpu.utils.disagg import spatial_disaggregate

        T, ny, nx, NY, NX = 24, 4, 5, 16, 20
        anoms = rng.normal(0, 1, (T, ny, nx))
        climo = 280 + rng.normal(0, 3, (12, NY, NX))
        months = np.arange(T) % 12
        out = np.asarray(spatial_disaggregate(anoms, climo, months, kind="temperature"))
        assert out.shape == (T, NY, NX)
        # constant anomaly field must reproduce climo + constant exactly
        const = np.full((T, ny, nx), 1.5)
        out2 = np.asarray(spatial_disaggregate(const, climo, months, kind="temperature"))
        npt.assert_allclose(out2, climo[months] + 1.5, rtol=1e-6)

    def test_spatial_disaggregate_precip_ratio(self, rng):
        from skdownscale_tpu.utils.disagg import spatial_disaggregate

        T, ny, nx, NY, NX = 12, 3, 3, 9, 9
        ratios = np.full((T, ny, nx), 2.0)
        climo = rng.gamma(2.0, 30.0, (12, NY, NX))
        months = np.arange(T) % 12
        out = np.asarray(spatial_disaggregate(ratios, climo, months, kind="precipitation"))
        npt.assert_allclose(out, climo[months] * 2.0, rtol=1e-6)


class TestScore:
    def test_regressor_score(self, rng):
        idx = pd.date_range("1990-01-01", periods=200, freq="D")
        X = pd.DataFrame({"v": rng.normal(10, 3, 200)}, index=idx)
        y = X["v"] * 1.1 + 0.5
        m = sdt.QuantileMappingReressor(extrapolate="both").fit(X, y)
        s = m.score(X, y)
        assert 0.9 < s <= 1.0
        g = sdt.PureRegression().fit(X, y)
        assert 0.9 < g.score(X, y) <= 1.0


class TestMultihost:
    def test_feed_cells_single_host(self, rng):
        from skdownscale_tpu.parallel import cell_mesh, feed_cells, host_cell_slice

        mesh = cell_mesh(jax.devices()[:8])
        n = 13
        local = rng.normal(size=(n, 4))
        sl = host_cell_slice(n, mesh)
        assert sl.start == 0 and sl.stop >= n  # single process owns everything
        arr, n_out = feed_cells(local, n, mesh)
        assert n_out == n
        assert arr.shape[0] % 8 == 0
        npt.assert_allclose(np.asarray(arr)[:n], local)
