"""Time-axis (sequence) sharding equivalence tests.

SURVEY §2.2's optional long-context axis: very long per-cell records sharded
over a 2-D (cells, time) mesh.  The batched cores are pure jitted programs,
so SPMD keeps elementwise/rolling stages sharded on both axes and inserts
the ICI all-gathers the full-row sorts need; results must be IDENTICAL to
the single-device run (float64 on the 8-virtual-device CPU mesh).
"""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from skdownscale_tpu.parallel import shard_cells_time, time_cell_mesh, time_sharding


@pytest.fixture(scope="module")
def mesh42():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    return time_cell_mesh(devs[:8], time_shards=2)


class TestTimeShard:
    def test_mesh_shape_and_axes(self, mesh42):
        assert mesh42.devices.shape == (4, 2)
        assert mesh42.axis_names == ("cells", "time")

    def test_qdm_matches_single_device(self, rng, mesh42):
        from skdownscale_tpu.models.quantile import edcdfm_predict, qmr_fit

        C, Tf, Tq = 8, 730, 366
        x = jnp.asarray(284 + rng.normal(0, 2, (C, Tf)))
        y = jnp.asarray(283 + rng.normal(0, 1.8, (C, Tf)))
        xq = jnp.asarray(284.5 + rng.normal(0, 2, (C, Tq)))

        def step(a, b, q):
            st = qmr_fit(a, b, extrapolate="both")
            return edcdfm_predict(st, q, kind="difference", extrapolate="both")

        single = jax.jit(step)(x, y, xq)

        sh = time_sharding(mesh42)
        xs, ys, qs = (jax.device_put(v, sh) for v in (x, y, xq))
        sharded = jax.jit(step, in_shardings=(sh, sh, sh), out_shardings=sh)(
            xs, ys, qs
        )
        npt.assert_array_equal(np.asarray(sharded), np.asarray(single))

    def test_bcsd_matches_single_device(self, rng, mesh42):
        from skdownscale_tpu.models.bcsd import BcsdTemperature, bcsd_fit, bcsd_predict

        idx = pd.date_range("1990-01-01", "1999-12-01", freq="MS")
        C, T = 8, len(idx)
        assert T % 2 == 0  # divides the time submesh
        x = jnp.asarray(284 + rng.normal(0, 2, (C, T)))
        y = jnp.asarray(283 + rng.normal(0, 1.8, (C, T)))
        model = BcsdTemperature(return_anoms=False)
        fg = model._fit_groups(idx)
        plan = model._predict_plan(fg, idx)

        def step(xx, yy):
            st = bcsd_fit(xx, yy, fg, with_x_climo=True)
            return bcsd_predict(st, xx, plan, variable="temperature", return_anoms=False)

        single = jax.jit(step)(x, y)
        sh = time_sharding(mesh42)
        xs, ys = jax.device_put(x, sh), jax.device_put(y, sh)
        sharded = jax.jit(step, in_shardings=(sh, sh), out_shardings=sh)(xs, ys)
        npt.assert_allclose(np.asarray(sharded), np.asarray(single), rtol=1e-12)

    def test_fitted_state_stays_distributed(self, rng, mesh42):
        """Fitted CDF state is time-length-sized, so GSPMD keeps it
        distributed over the mesh (here: ('cells', 'time') on the vals
        leaves) rather than gathering it to one device — the layout that
        bounds per-device state for very long records."""
        from skdownscale_tpu.models.quantile import qmr_fit

        C, Tf = 8, 730
        x = jnp.asarray(284 + rng.normal(0, 2, (C, Tf)))
        y = jnp.asarray(283 + rng.normal(0, 1.8, (C, Tf)))
        sh = time_sharding(mesh42)
        st = jax.jit(lambda a, b: qmr_fit(a, b, extrapolate="both"))(
            jax.device_put(x, sh), jax.device_put(y, sh)
        )
        specs = [tuple(l.sharding.spec) for l in jax.tree_util.tree_leaves(st)]
        assert any(("cells" in s) or ("time" in s) for s in specs)

    def test_shard_cells_time_pads_and_validates(self, rng, mesh42):
        arr = rng.normal(size=(7, 10))
        sharded, n = shard_cells_time(arr, mesh42)
        assert n == 7 and sharded.shape == (8, 10)
        assert np.isnan(np.asarray(sharded)[7:]).all()
        with pytest.raises(ValueError, match="time shards"):
            shard_cells_time(rng.normal(size=(8, 11)), mesh42)

    def test_time_cell_mesh_divisibility(self):
        with pytest.raises(ValueError, match="divisible"):
            time_cell_mesh(jax.devices()[:8], time_shards=3)
