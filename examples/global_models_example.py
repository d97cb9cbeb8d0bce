#!/usr/bin/env python
"""Global (pooled) models example: one correction fit across the whole grid.

The reference roadmap names a ``global_models`` component and never built it
(``docs/roadmap.rst:59-65``); this framework does.  Unlike the pointwise zoo
(embarrassingly parallel over cells), pooled fits genuinely reduce across
the device mesh: the linear model all-reduces its sufficient statistics, and
the quantile fit merges per-device order-statistic sketches with one
``all_gather``.

Runs on whatever devices are available — a TPU pod slice in production, or
8 virtual CPU devices via
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax

    import skdownscale_tpu as sdt
    from skdownscale_tpu.parallel import cell_mesh
    from skdownscale_tpu.xlite import DataArray

    mesh = cell_mesh(jax.devices())
    print(f"mesh: {mesh.devices.size} x {jax.devices()[0].platform} devices")

    rng = np.random.default_rng(3)
    T, ny, nx = 3650, 24, 32
    doy = np.arange(T) % 365
    seas = 9 * np.sin(2 * np.pi * doy / 365.25)
    obs = 284 + seas[:, None, None] + rng.normal(0, 3, (T, ny, nx))
    gcm = obs * 1.15 - 42.0  # systematic multiplicative + additive bias
    obs[:, 0, :4] = np.nan  # ocean strip
    gcm[:, 0, :4] = np.nan

    X = DataArray(gcm, dims=("time", "y", "x"))
    Y = DataArray(obs, dims=("time", "y", "x"))

    # pooled quantile mapping: the distributed sketch fit over the mesh
    gd = sdt.GlobalDownscaler(sdt.GlobalQuantileMapper(n_quantiles=1024), sharding=mesh)
    gd.fit(X, Y)
    out = np.asarray(gd.transform(X).data)  # (y, x, time)
    bias_before = np.nanmean(gcm - obs)
    bias_after = np.nanmean(np.moveaxis(out, -1, 0) - obs)
    print(f"pooled QM   bias: {bias_before:+7.3f} -> {bias_after:+7.3f}")

    # pooled fixed-effects linear model: shared slope, per-cell intercepts
    C = ny * nx
    Xf = np.moveaxis(gcm, 0, -1).reshape(C, T)[..., None]
    yf = np.moveaxis(obs, 0, -1).reshape(C, T)
    glr = sdt.GlobalDownscaler(sdt.GlobalLinearRegressor(cell_intercepts=True), sharding=mesh)
    glr.fit(Xf, yf)
    pred = np.asarray(glr.predict(Xf))
    vv = np.isfinite(yf)
    rmse = float(np.sqrt(np.mean((pred[vv] - yf[vv]) ** 2)))
    print(f"pooled FE linear rmse: {rmse:.4f} (shared slope {float(glr._model.state_.coef[0]):.4f}, true {1/1.15:.4f})")


if __name__ == "__main__":
    main()
