#!/usr/bin/env python
"""Sharded-grid example: BCSD over a device mesh.

Runs on whatever devices are available — a TPU pod slice in production, or
(as in CI) 8 virtual CPU devices via
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``.
The cell axis is the only parallel axis (SPMD data parallelism; no
collectives in compute) and fitted state comes out co-sharded with the
cells.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import pandas as pd


def main():
    import jax

    import skdownscale_tpu as sdt
    from skdownscale_tpu.parallel import cell_mesh
    from skdownscale_tpu.xlite import DataArray

    mesh = cell_mesh(jax.devices())
    print(f"mesh: {mesh.devices.size} x {jax.devices()[0].platform} devices")

    rng = np.random.default_rng(0)
    idx = pd.date_range("1980-01-01", "2009-12-01", freq="MS")
    T, ny, nx = len(idx), 16, 16
    seas = 10 * np.sin(2 * np.pi * (idx.month.to_numpy() - 1) / 12)[:, None, None]
    gcm = 284 + seas + rng.normal(0, 2, (T, ny, nx)) + 1.5
    obs = 283 + seas + rng.normal(0, 1.8, (T, ny, nx))
    coords = {"time": idx, "y": np.arange(ny), "x": np.arange(nx)}
    X = DataArray(gcm, ("time", "y", "x"), coords)
    y = DataArray(obs, ("time", "y", "x"), coords)

    d = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False), sharding=mesh)
    d.fit(X, y)
    # fitted state is sharded over the mesh
    leaf = jax.tree_util.tree_leaves(d._state)[1]
    print(f"state leaf sharding: {getattr(leaf, 'sharding', None)}")
    out = d.predict(X)
    print(f"corrected mean {np.nanmean(out.values):.2f} (obs {obs.mean():.2f}, raw {gcm.mean():.2f})")

    # ------------------------------------------------------------------
    # time-axis (sequence) sharding: for records too long for one device,
    # a 2-D (cells, time) mesh bounds per-device input AND the
    # time-length-sized fitted state; SPMD all-gathers a cell row's time
    # shards over ICI only where full-row sorts need the whole series
    # ------------------------------------------------------------------
    if mesh.devices.size % 2 == 0:
        import jax.numpy as jnp

        from skdownscale_tpu.models.quantile import edcdfm_predict, qmr_fit
        from skdownscale_tpu.parallel import time_cell_mesh, time_sharding

        tmesh = time_cell_mesh(jax.devices(), time_shards=2)
        sh = time_sharding(tmesh)
        C = 2 * tmesh.devices.shape[0]
        xf = jnp.asarray(284 + rng.normal(0, 2, (C, T)))
        yf = jnp.asarray(283 + rng.normal(0, 1.8, (C, T)))

        def qdm(a, b):
            return edcdfm_predict(
                qmr_fit(a, b, extrapolate="both"), a,
                kind="difference", extrapolate="both",
            )

        got = jax.jit(qdm, in_shardings=(sh, sh), out_shardings=sh)(
            jax.device_put(xf, sh), jax.device_put(yf, sh)
        )
        same = np.array_equal(np.asarray(got), np.asarray(jax.jit(qdm)(xf, yf)))
        print(
            f"time-sharded QDM on a {tmesh.devices.shape[0]}x2 (cells, time) "
            f"mesh: bitwise == single-device: {same}"
        )


if __name__ == "__main__":
    main()
