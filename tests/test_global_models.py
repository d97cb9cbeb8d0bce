"""global_models: pooled fits, distributed quantile sketch, grid wrapper.

The reference never built its roadmap's ``global_models`` component
(``docs/roadmap.rst:59-65``), so there is no golden to compare against;
these tests pin the math to numpy closed forms and check that the sharded
(8-virtual-device mesh) paths agree with the exact local ones.
"""

import numpy as np
import numpy.testing as npt
import pytest

import jax
import jax.numpy as jnp

from skdownscale_tpu.global_models import (
    GlobalDownscaler,
    GlobalLinearRegressor,
    GlobalQuantileMapper,
    pooled_quantile_table,
)
from skdownscale_tpu.global_models.quantile import ladder_positions
from skdownscale_tpu.parallel.mesh import cell_mesh, shard_cells


def _lin_data(rng, C=24, T=200, f=3, nan_frac=0.1):
    X = rng.normal(0, 1, (C, T, f))
    coef = np.array([1.5, -0.7, 0.3][:f])
    cell_off = rng.normal(0, 2, (C, 1))
    y = X @ coef + cell_off + 5.0 + rng.normal(0, 0.05, (C, T))
    if nan_frac > 0:
        y[rng.random((C, T)) < nan_frac] = np.nan
        X[rng.random((C, T, f)) < 0.02] = np.nan
    return X, y, coef


def test_global_linear_pooled_matches_numpy(rng):
    X, y, _ = _lin_data(rng, nan_frac=0.15)
    m = GlobalLinearRegressor().fit(X, y)
    st = m.state_

    # numpy reference: pooled lstsq with intercept over valid samples
    valid = np.isfinite(y) & np.all(np.isfinite(X), axis=-1)
    Xv = X[valid]
    yv = y[valid]
    A = np.concatenate([Xv, np.ones((len(Xv), 1))], axis=1)
    sol = np.linalg.lstsq(A, yv, rcond=None)[0]
    npt.assert_allclose(np.asarray(st.coef), sol[:-1], rtol=1e-8)
    npt.assert_allclose(float(st.intercept), sol[-1], rtol=1e-8)
    assert int(st.n_samples) == valid.sum()

    pred = np.asarray(m.predict(X))
    npt.assert_allclose(pred[valid], A @ sol, rtol=1e-6, atol=1e-6)


def test_global_linear_cell_intercepts_fixed_effects(rng):
    X, y, coef = _lin_data(rng, C=16, T=300, nan_frac=0.0)
    m = GlobalLinearRegressor(cell_intercepts=True).fit(X, y)
    st = m.state_
    # the within estimator recovers the true shared slopes despite the large
    # per-cell offsets (a pooled global intercept cannot)
    npt.assert_allclose(np.asarray(st.coef), coef, atol=5e-3)
    # per-cell intercepts absorb the offsets: near-perfect reconstruction
    pred = np.asarray(m.predict(X))
    npt.assert_allclose(pred, y, atol=0.3)

    # numpy reference: demeaned-within lstsq
    Xc = X - X.mean(axis=1, keepdims=True)
    yc = y - y.mean(axis=1, keepdims=True)
    sol = np.linalg.lstsq(Xc.reshape(-1, X.shape[-1]), yc.reshape(-1), rcond=None)[0]
    npt.assert_allclose(np.asarray(st.coef), sol, rtol=1e-8)


def test_global_linear_all_nan_cell(rng):
    X, y, _ = _lin_data(rng, C=6, T=50, nan_frac=0.0)
    y[2] = np.nan  # ocean cell
    m = GlobalLinearRegressor(cell_intercepts=True).fit(X, y)
    assert np.isnan(float(m.state_.cell_intercept[2]))
    pred = np.asarray(m.predict(X))
    assert np.isnan(pred[2]).all()
    assert np.isfinite(pred[[0, 1, 3, 4, 5]]).all()


def test_global_linear_sharded_matches_local(rng):
    X, y, _ = _lin_data(rng, C=32, T=64, nan_frac=0.1)
    local = GlobalLinearRegressor().fit(X, y).state_
    mesh = cell_mesh()
    Xs, _ = shard_cells(X, mesh)
    ys, _ = shard_cells(y, mesh)
    sharded = GlobalLinearRegressor().fit(Xs, ys).state_
    npt.assert_allclose(np.asarray(sharded.coef), np.asarray(local.coef), rtol=1e-9)
    npt.assert_allclose(float(sharded.intercept), float(local.intercept), rtol=1e-9)
    assert int(sharded.n_samples) == int(local.n_samples)


def test_pooled_quantile_exact_matches_numpy(rng):
    C, T = 10, 400
    vals = rng.normal(3, 2, (C, T))
    vals[rng.random((C, T)) < 0.1] = np.nan
    Q = 257
    pp = ladder_positions(Q, jnp.float64)
    ladder, n = pooled_quantile_table(jnp.asarray(vals), pp)
    v = np.sort(vals[np.isfinite(vals)])
    assert int(n) == len(v)
    # Cunnane-position quantiles: interp pp over order-stat positions
    sp = (np.arange(len(v)) + 1 - 0.4) / (len(v) + 0.2)
    want = np.interp(np.asarray(pp), sp, v)
    npt.assert_allclose(np.asarray(ladder), want, rtol=1e-9, atol=1e-9)


def test_pooled_quantile_sketch_close_to_exact(rng):
    C, T = 64, 512
    vals = rng.normal(0, 1, (C, T))
    vals[rng.random((C, T)) < 0.05] = np.nan
    Q = 129
    pp = ladder_positions(Q, jnp.float64)
    exact, n_e = pooled_quantile_table(jnp.asarray(vals), pp)
    mesh = cell_mesh()
    vs, _ = shard_cells(vals, mesh)
    sk, n_s = pooled_quantile_table(vs, pp, mesh, sample_per_shard=2048)
    assert int(n_s) == int(n_e)
    # rank error <= n_local/(2m) per device -> tiny value error on a smooth CDF
    npt.assert_allclose(np.asarray(sk), np.asarray(exact), atol=5e-3)


def test_pooled_quantile_sketch_empty_shard(rng):
    # one device's whole shard NaN: zero weight, no pollution of the ladder
    mesh = cell_mesh()
    D = mesh.devices.size
    C, T = 2 * D, 64
    vals = rng.normal(0, 1, (C, T))
    vals[:2] = np.nan  # first shard (cells 0..1 on device 0) all-NaN
    pp = ladder_positions(65, jnp.float64)
    vs, _ = shard_cells(vals, mesh)
    sk, n_s = pooled_quantile_table(vs, pp, mesh, sample_per_shard=512)
    exact, n_e = pooled_quantile_table(jnp.asarray(vals), pp)
    assert int(n_s) == int(n_e)
    npt.assert_allclose(np.asarray(sk), np.asarray(exact), atol=2e-2)
    assert np.isfinite(np.asarray(sk)).all()


def test_global_quantile_mapper_removes_pooled_bias(rng):
    C, T = 12, 500
    obs = rng.gamma(2.0, 1.5, (C, T))
    model = obs * 1.3 + 0.8  # systematic wet bias
    qm = GlobalQuantileMapper(n_quantiles=512).fit(model, obs)
    corrected = np.asarray(qm.transform(model))
    # pooled distribution restored
    assert abs(corrected.mean() - obs.mean()) < 0.02
    npt.assert_allclose(
        np.quantile(corrected, [0.1, 0.5, 0.9]),
        np.quantile(obs, [0.1, 0.5, 0.9]),
        rtol=0.03,
    )
    # monotone map
    flat_in = model[0]
    flat_out = corrected[0]
    order = np.argsort(flat_in)
    assert (np.diff(flat_out[order]) >= -1e-12).all()
    # round trip (interior values only: tails clamp to the ladder ends,
    # which is intentionally non-invertible)
    back = np.asarray(qm.inverse_transform(corrected))
    lo, hi = np.quantile(model, [0.02, 0.98])
    interior = (model > lo) & (model < hi)
    npt.assert_allclose(back[interior], model[interior], atol=1e-6)


def test_global_quantile_mapper_nan_passthrough(rng):
    C, T = 4, 100
    obs = rng.normal(0, 1, (C, T))
    model = obs + 1.0
    model[1, :10] = np.nan
    qm = GlobalQuantileMapper(n_quantiles=64).fit(model, obs)
    out = np.asarray(qm.transform(model))
    assert np.isnan(out[1, :10]).all()
    assert np.isfinite(out[0]).all()


def test_global_downscaler_grid_roundtrip(rng):
    from skdownscale_tpu import xlite

    ny, nx, T = 4, 6, 120
    data = rng.normal(10, 3, (T, ny, nx))
    data[:, 0, 0] = np.nan  # ocean cell
    obs = data * 0.9 - 1.0
    X = xlite.DataArray(data, dims=("time", "y", "x"))
    Y = xlite.DataArray(obs, dims=("time", "y", "x"))
    gd = GlobalDownscaler(GlobalQuantileMapper(n_quantiles=128))
    gd.fit(X, Y)
    out = gd.transform(X)
    assert out.dims == ("y", "x", "time")
    arr = np.asarray(out.data)
    assert arr.shape == (ny, nx, T)
    assert np.isnan(arr[0, 0]).all()
    v = np.isfinite(obs).all(axis=0)
    npt.assert_allclose(
        np.moveaxis(arr, -1, 0)[:, v].mean(), obs[:, v].mean(), atol=0.05
    )


def test_global_downscaler_sharded_linear(rng):
    mesh = cell_mesh()
    C, T = 20, 80  # deliberately NOT a multiple of 8: pad path
    X = rng.normal(0, 1, (C, T))
    y = 2.0 * X + 1.0 + rng.normal(0, 0.01, (C, T))
    gd = GlobalDownscaler(GlobalLinearRegressor(), sharding=mesh)
    gd.fit(X, y)
    pred = gd.predict(X)
    assert pred.shape == (C, T)
    npt.assert_allclose(pred, y, atol=0.1)
