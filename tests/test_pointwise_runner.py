"""Grid-runner integration tests (model of the reference's
``test_pointwise_runner.py``): fixtures with point and 2-D grids, NaN cells,
multi-output GARD templates, transform paths, get_attr, fallback estimators,
and batched-vs-single-cell consistency."""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import skdownscale_tpu as sdt
from skdownscale_tpu.xlite import DataArray, Dataset


@pytest.fixture
def grid_data(rng):
    idx = pd.date_range("1990-01-01", "1999-12-01", freq="MS")
    T, ny, nx = len(idx), 3, 4
    X = 283 + 8 * np.sin(2 * np.pi * (np.arange(T) % 12) / 12)[:, None, None] + rng.normal(
        0, 2, (T, ny, nx)
    )
    y = X - 1.2 + rng.normal(0, 0.5, (T, ny, nx))
    X[:, 0, 0] = np.nan  # an ocean cell
    coords = {"time": idx, "y": np.arange(ny), "x": np.arange(nx)}
    return (
        DataArray(X, ("time", "y", "x"), coords),
        DataArray(y, ("time", "y", "x"), coords),
        idx,
    )


def test_fit_predict_quantile_mapping(grid_data):
    X, y, idx = grid_data
    d = sdt.PointWiseDownscaler(sdt.QuantileMappingReressor(extrapolate="both"))
    d.fit(X, y)
    out = d.predict(X)
    assert out.dims == ("time", "y", "x")
    assert out.shape == X.shape
    assert np.isnan(out.values[:, 0, 0]).all()  # masked cell stays NaN
    assert np.isfinite(out.values[:, 1:, :]).all()


def test_batched_matches_single_cell(grid_data):
    X, y, idx = grid_data
    d = sdt.PointWiseDownscaler(sdt.QuantileMappingReressor(extrapolate="both"))
    d.fit(X, y)
    out = d.predict(X)
    # single-cell estimator on one specific cell must agree exactly
    cy, cx = 2, 3
    single = sdt.QuantileMappingReressor(extrapolate="both").fit(
        X.values[:, cy, cx].reshape(-1, 1), y.values[:, cy, cx]
    )
    expected = single.predict(X.values[:, cy, cx].reshape(-1, 1))
    npt.assert_allclose(out.values[:, cy, cx], expected, rtol=1e-10)


def test_transform_path(grid_data):
    X, _, idx = grid_data
    d = sdt.PointWiseDownscaler(sdt.QuantileMapper())
    d.fit(X)
    out = d.transform(X)
    assert out.dims == X.dims or out.dims == ("time", "variable", "y", "x")
    assert out.values.shape[-2:] == (3, 4)


def test_trend_transform_roundtrip(grid_data):
    X, _, idx = grid_data
    d = sdt.PointWiseDownscaler(sdt.LinearTrendTransformer())
    d.fit(X)
    t = d.transform(X)
    back = d.inverse_transform(t)
    back_vals = back.values.reshape(X.shape)  # transform keeps the packed variable dim
    valid = ~np.isnan(X.values)
    npt.assert_allclose(back_vals[valid], X.values[valid], rtol=1e-8)


def test_gard_multi_output(grid_data):
    X, y, idx = grid_data
    d = sdt.PointWiseDownscaler(sdt.PureAnalog(n_analogs=10, kind="mean_analogs"))
    d.fit(X, y)
    out = d.predict(X)
    assert out.dims == ("time", "variable", "y", "x")
    assert out.sizes["variable"] == 3
    assert list(out.coords["variable"]) == ["pred", "exceedance_prob", "prediction_error"]
    assert np.isnan(out.values[:, :, 0, 0]).all()


def test_bcsd_grid(grid_data):
    X, y, idx = grid_data
    d = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False))
    d.fit(X, y)
    out = d.predict(X)
    assert out.shape == X.shape
    # agreement with the single-cell wrapper
    cy, cx = 1, 2
    single = sdt.BcsdTemperature(return_anoms=False).fit(
        pd.DataFrame({"v": X.values[:, cy, cx]}, index=idx),
        pd.DataFrame({"v": y.values[:, cy, cx]}, index=idx),
    )
    expected = single.predict(pd.DataFrame({"v": X.values[:, cy, cx]}, index=idx))
    npt.assert_allclose(out.values[:, cy, cx], expected.to_numpy().ravel(), rtol=1e-8)


def test_get_attr(grid_data):
    X, y, idx = grid_data
    d = sdt.PointWiseDownscaler(sdt.BcsdTemperature())
    d.fit(X, y)
    climo = d.get_attr("y_climo_", dtype=float)
    assert climo.shape[-2:] == (3, 4)
    assert np.isnan(np.asarray(climo.values)[..., 0, 0]).all()


def test_dataset_input(grid_data, rng):
    X, y, idx = grid_data
    ds = Dataset({"tmax": X})
    d = sdt.PointWiseDownscaler(sdt.QuantileMapper())
    d.fit(ds)
    out = d.transform(ds)
    assert out.values.shape[0] == X.shape[0]


def test_fallback_sklearn_estimator(grid_data):
    from sklearn.linear_model import LinearRegression

    X, y, idx = grid_data
    d = sdt.PointWiseDownscaler(LinearRegression())
    d.fit(X, y)
    out = d.predict(X)
    assert out.shape == X.shape
    assert np.isnan(out.values[:, 0, 0]).all()
    # spot-check one cell
    lr = LinearRegression().fit(X.values[:, 1, 1].reshape(-1, 1), y.values[:, 1, 1])
    npt.assert_allclose(
        out.values[:, 1, 1], lr.predict(X.values[:, 1, 1].reshape(-1, 1)), rtol=1e-8
    )


def test_point_dim_input(rng):
    # 1-D "point" spatial layout (reference random_point_data)
    idx = pd.date_range("1990-01-01", "1996-12-01", freq="MS")
    T, P = len(idx), 5
    X = DataArray(
        280 + rng.normal(0, 2, (T, P)), ("time", "point"), {"time": idx, "point": np.arange(P)}
    )
    y = DataArray(X.values - 1.0, ("time", "point"), {"time": idx, "point": np.arange(P)})
    d = sdt.PointWiseDownscaler(sdt.ZScoreRegressor())
    d.fit(X, y)
    out = d.predict(X)
    assert out.dims == ("time", "point")
    assert out.shape == (T, P)


def test_repr(grid_data):
    X, y, _ = grid_data
    d = sdt.PointWiseDownscaler(sdt.QuantileMapper())
    assert "Fit Status: False" in repr(d)
    d.fit(X)
    assert "Fit Status: True" in repr(d)


def test_model_without_fit_raises():
    with pytest.raises(TypeError, match="fit"):
        sdt.PointWiseDownscaler(object())


def test_cell_chunked_matches_unchunked(grid_data):
    X, y, idx = grid_data
    base = sdt.PointWiseDownscaler(sdt.QuantileMappingReressor(extrapolate="both")).fit(X, y)
    chunked = sdt.PointWiseDownscaler(
        sdt.QuantileMappingReressor(extrapolate="both"), cell_chunk_size=3
    ).fit(X, y)
    npt.assert_allclose(
        chunked.predict(X).values, base.predict(X).values, rtol=1e-12, equal_nan=True
    )
    # multi-output model through chunks
    g1 = sdt.PointWiseDownscaler(sdt.PureAnalog(n_analogs=8, kind="mean_analogs")).fit(X, y)
    g2 = sdt.PointWiseDownscaler(
        sdt.PureAnalog(n_analogs=8, kind="mean_analogs"), cell_chunk_size=4
    ).fit(X, y)
    npt.assert_allclose(g2.predict(X).values, g1.predict(X).values, rtol=1e-12, equal_nan=True)


def test_multivariable_dataset_gard(rng):
    # multi-feature GARD through the grid (reference test_pointwise_runner:54-63)
    idx = pd.date_range("1990-01-01", "1995-12-01", freq="MS")
    T, P = len(idx), 4
    coords = {"time": idx, "point": np.arange(P)}
    a = DataArray(280 + rng.normal(0, 2, (T, P)), ("time", "point"), coords)
    b = DataArray(rng.normal(0, 1, (T, P)), ("time", "point"), coords)
    ds = Dataset({"ta": a, "u": b})
    y = DataArray(281 + rng.normal(0, 2, (T, P)), ("time", "point"), coords)
    d = sdt.PointWiseDownscaler(sdt.AnalogRegression(n_analogs=12))
    d.fit(ds, y)
    out = d.predict(ds)
    assert out.dims == ("time", "variable", "point")
    assert out.sizes["variable"] == 3
    assert np.isfinite(out.values).all()


def test_non_datetime_time_index(rng):
    # non-pandas time coordinate (reference test_pointwise_runner:148-171)
    T, P = 48, 3
    X = DataArray(
        rng.normal(10, 2, (T, P)), ("time", "point"),
        {"time": np.arange(T), "point": np.arange(P)},
    )
    d = sdt.PointWiseDownscaler(sdt.LinearTrendTransformer())
    d.fit(X)
    out = d.transform(X)
    assert out.values.shape[0] == T


def test_get_attr_with_template(rng):
    idx = pd.date_range("1998-01-01", "2001-12-31", freq="D")  # no leap-day-free years
    T, ny, nx = len(idx), 2, 3
    X = DataArray(
        283 + rng.normal(0, 2, (T, ny, nx)), ("time", "y", "x"),
        {"time": idx, "y": np.arange(ny), "x": np.arange(nx)},
    )
    y = DataArray(X.values - 1, X.dims, X.coords)
    X.data[:, 0, 0] = np.nan
    d = sdt.PointWiseDownscaler(sdt.ZScoreRegressor())
    d.fit(X, y)
    n_day = d._state[0].shift.shape[-1]  # D-1 day-of-year parameters
    template = DataArray(
        np.zeros((n_day, ny, nx)), ("day", "y", "x"),
        {"day": np.arange(n_day), "y": np.arange(ny), "x": np.arange(nx)},
    )
    shift = d.get_attr("shift_", float, template_output=template)
    assert shift.dims == ("day", "y", "x")
    assert shift.values.shape == (n_day, ny, nx)
    assert np.isnan(shift.values[:, 0, 0]).all()


def test_sklearn_pipeline_fallback(grid_data):
    # the reference's docstring use case: wrap an sklearn Pipeline (core.py:204)
    from sklearn.linear_model import LinearRegression
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler

    X, y, idx = grid_data
    pipe = Pipeline([("scale", StandardScaler()), ("lm", LinearRegression())])
    d = sdt.PointWiseDownscaler(pipe)
    d.fit(X, y)
    out = d.predict(X)
    assert out.shape == X.shape
    assert np.isnan(out.values[:, 0, 0]).all()
    assert np.isfinite(out.values[:, 1:, :]).all()


# ----------------------------------------------------------------------
# cell_bucket shape bucketing (compile-cache reuse across nearby grid sizes)
# ----------------------------------------------------------------------


class _ToyMean:
    """Minimal estimator with a registered batched impl whose jitted fit
    records trace events (one per distinct input shape)."""

    def fit(self, X, y=None):
        return self

    def predict(self, X):  # pragma: no cover - fallback path never used here
        return np.zeros(len(X))


def _toy_registered(traced):
    import jax
    import jax.numpy as jnp

    from skdownscale_tpu.models import batched

    @jax.jit
    def _fit(x, y):
        traced.append(x.shape)  # appended at TRACE time only
        return {"mean": jnp.mean(y, axis=1)}

    impl = batched._Impl(
        lambda m, i, X, y: _fit(X[..., 0], y),
        lambda m, st, i, X, idx: jnp.broadcast_to(st["mean"][:, None], X.shape[:2]),
        None,
        lambda m, st: {"mean_": np.asarray(st["mean"])},
    )
    batched.register(_ToyMean, impl)


def _point_grid(rng, n_cells, T=24):
    idx = pd.date_range("2000-01-01", periods=T, freq="MS")
    X = rng.normal(280, 3, (T, n_cells))
    y = X - 1.0
    coords = {"time": idx, "point": np.arange(n_cells)}
    return DataArray(X, ("time", "point"), coords), DataArray(y, ("time", "point"), coords)


def test_cell_bucket_pow2_reuses_compile(rng):
    """Two grids whose valid-cell counts land in the same pow2 bucket must
    trace (compile) the jitted kernel exactly once (VERDICT r2 #8)."""
    traced = []
    _toy_registered(traced)

    for n in (5, 7):  # both bucket to 8
        X, y = _point_grid(rng, n)
        d = sdt.PointWiseDownscaler(_ToyMean(), cell_bucket="pow2")
        d.fit(X, y)
        out = d.predict(X)
        assert out.shape == X.shape
        # pad cells sliced off and values correct per cell
        npt.assert_allclose(out.values[0], y.values.mean(axis=0), rtol=1e-12)
        attr = d.get_attr("mean_")
        assert attr.shape == (n,)
        npt.assert_allclose(np.asarray(attr.values), y.values.mean(axis=0), rtol=1e-12)

    assert len(traced) == 1, f"expected one trace, got shapes {traced}"
    assert traced[0][0] == 8  # padded to the bucket


def test_cell_bucket_int_granularity(rng):
    d = sdt.PointWiseDownscaler(_ToyMean(), cell_bucket=64)
    assert d._bucket_size(5) == 64
    assert d._bucket_size(64) == 64
    assert d._bucket_size(65) == 128
    d2 = sdt.PointWiseDownscaler(_ToyMean(), cell_bucket="pow2")
    assert d2._bucket_size(1) == 1
    assert d2._bucket_size(600) == 1024
    d3 = sdt.PointWiseDownscaler(_ToyMean())
    assert d3._bucket_size(600) == 600
