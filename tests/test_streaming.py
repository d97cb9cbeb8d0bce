"""Streaming (group-chunked) BCSD must match the dense formulation.

The streaming path (models/streaming.py) reorganizes the grouped QM
transform as a lax.scan over transform-group chunks and can defer fit-time
CDF construction (BcsdLazyState).  Same math, different schedule — outputs
must agree with the dense path to float round-off, which transitively ties
them to the reference via the dense golden tests (test_bcsd_golden.py).
"""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import jax.numpy as jnp

from skdownscale_tpu.models import bcsd as B


def _monthly(rng, n_cells=5, years=12):
    idx = pd.date_range("1980-01-01", periods=years * 12, freq="MS")
    seas = 8 * np.sin(2 * np.pi * (idx.month.to_numpy() - 1) / 12)
    x = 283 + seas[None, :] + rng.normal(0, 2, (n_cells, len(idx))) + 1.5
    y = 282 + seas[None, :] + rng.normal(0, 1.8, (n_cells, len(idx)))
    return idx, x, y


def _daily(rng, n_cells=3, years=4):
    idx = pd.date_range("2000-01-01", periods=years * 365 + 1, freq="D")
    seas = 10 * np.sin(2 * np.pi * (idx.dayofyear.to_numpy() - 1) / 365.25)
    x = 283 + seas[None, :] + rng.normal(0, 2, (n_cells, len(idx))) + 1.2
    y = 282 + seas[None, :] + rng.normal(0, 1.7, (n_cells, len(idx)))
    return idx, x, y


@pytest.mark.parametrize("detrend", [False, True])
@pytest.mark.parametrize("variable,return_anoms", [("temperature", False), ("temperature", True), ("precipitation", False)])
def test_monthly_streaming_matches_dense(rng, detrend, variable, return_anoms):
    idx, x, y = _monthly(rng)
    model = B.BcsdTemperature() if variable == "temperature" else B.BcsdPrecipitation()
    fg = model._fit_groups(idx)
    plan = model._predict_plan(fg, idx)
    with_x = variable == "temperature"
    state = B.bcsd_fit(jnp.asarray(x), jnp.asarray(y), fg, with_x_climo=with_x, detrend=detrend)
    dense = B.bcsd_predict(
        state, jnp.asarray(x), plan, variable=variable, return_anoms=return_anoms, detrend=detrend
    )
    for gc in (3, 8, 12):
        stream = B.bcsd_predict_streaming(
            state,
            jnp.asarray(x),
            plan,
            variable=variable,
            return_anoms=return_anoms,
            detrend=detrend,
            group_chunk=gc,
        )
        npt.assert_allclose(np.asarray(stream), np.asarray(dense), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("detrend", [False, True])
@pytest.mark.parametrize("variable", ["temperature", "precipitation"])
def test_daily_lazy_streaming_matches_dense(rng, detrend, variable):
    idx, x, y = _daily(rng)
    model = (
        B.BcsdTemperature(time_grouper="daily_nasa-nex", return_anoms=False)
        if variable == "temperature"
        else B.BcsdPrecipitation(time_grouper="daily_nasa-nex", return_anoms=False)
    )
    fg = model._fit_groups(idx)
    plan = model._predict_plan(fg, idx)
    with_x = variable == "temperature"
    dense_state = B.bcsd_fit(
        jnp.asarray(x), jnp.asarray(y), fg, with_x_climo=with_x, detrend=detrend
    )
    dense = B.bcsd_predict(
        dense_state, jnp.asarray(x), plan, variable=variable, return_anoms=False, detrend=detrend
    )
    lazy_state = B.bcsd_fit_lazy(jnp.asarray(x), jnp.asarray(y), fg, with_x_climo=with_x)
    stream = B.bcsd_predict_streaming(
        lazy_state,
        jnp.asarray(x),
        plan,
        variable=variable,
        return_anoms=False,
        detrend=detrend,
        group_chunk=8,
    )
    npt.assert_allclose(np.asarray(stream), np.asarray(dense), rtol=1e-9, atol=1e-9)


def test_lazy_climatology_matches_dense(rng):
    idx, x, y = _daily(rng)
    model = B.BcsdTemperature(time_grouper="daily_nasa-nex")
    fg = model._fit_groups(idx)
    dense_state = B.bcsd_fit(jnp.asarray(x), jnp.asarray(y), fg, with_x_climo=True)
    G, L = fg.indices.shape
    _, y_climo_d, x_climo_d = dense_state.unpack(G, L)
    lazy = B.bcsd_fit_lazy(jnp.asarray(x), jnp.asarray(y), fg, with_x_climo=True)
    y_climo_l, x_climo_l = lazy.unpack(G)
    npt.assert_allclose(np.asarray(y_climo_l), np.asarray(y_climo_d), rtol=1e-9)
    npt.assert_allclose(np.asarray(x_climo_l), np.asarray(x_climo_d), rtol=1e-9)


def test_registry_daily_uses_streaming(rng):
    from skdownscale_tpu.models import batched as _b

    idx, x, y = _daily(rng, n_cells=2)
    model = B.BcsdTemperature(time_grouper="daily_nasa-nex", return_anoms=False)
    st = _b.batched_fit(model, idx, jnp.asarray(x)[..., None], jnp.asarray(y))
    assert isinstance(st, B.BcsdLazyState)
    out = _b.batched_predict(model, st, idx, jnp.asarray(x)[..., None], idx)
    # single-cell wrapper (dense path) as the cross-check
    ref = model.fit(
        pd.DataFrame({"v": x[0]}, index=idx), pd.DataFrame({"v": y[0]}, index=idx)
    ).predict(pd.DataFrame({"v": x[0]}, index=idx))
    npt.assert_allclose(np.asarray(out)[0], np.asarray(ref).ravel(), rtol=1e-8, atol=1e-8)
    attrs = _b.batched_attrs(model, st)
    assert attrs["y_climo_"].shape == (2, 366)


def test_registry_monthly_streams_above_threshold(rng, monkeypatch):
    """Monthly BCSD flips to the streaming formulation above the cell
    threshold and matches the dense path."""
    from skdownscale_tpu.models import batched as _b

    idx, x, y = _monthly(rng, n_cells=6)
    model = B.BcsdTemperature(return_anoms=False)
    xj = jnp.asarray(x)[..., None]
    st_dense = _b.batched_fit(model, idx, xj, jnp.asarray(y))
    assert isinstance(st_dense, B.BcsdState)
    out_dense = _b.batched_predict(model, st_dense, idx, xj, idx)

    monkeypatch.setattr(_b, "STREAMING_CELL_THRESHOLD", 4)
    st_lazy = _b.batched_fit(model, idx, xj, jnp.asarray(y))
    assert isinstance(st_lazy, B.BcsdLazyState)
    out_lazy = _b.batched_predict(model, st_lazy, idx, xj, idx)
    npt.assert_allclose(np.asarray(out_lazy), np.asarray(out_dense), rtol=1e-9, atol=1e-9)


def test_streaming_sharded_matches_single_device(rng):
    """Streaming predict under an 8-device cell mesh == unsharded (the
    scan's takes/scatters are purely cell-local, so SPMD needs no
    collectives beyond the final gather)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from skdownscale_tpu.parallel import cell_mesh

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    idx, x, y = _monthly(rng, n_cells=16)
    model = B.BcsdTemperature(return_anoms=False)
    fg = model._fit_groups(idx)
    plan = model._predict_plan(fg, idx)

    single = B.bcsd_predict_streaming(
        B.bcsd_fit_lazy(jnp.asarray(x), jnp.asarray(y), fg),
        jnp.asarray(x),
        plan,
        variable="temperature",
        return_anoms=False,
        group_chunk=3,
    )

    mesh = cell_mesh(devices[:8])
    sh = NamedSharding(mesh, P("cells", None))
    xs = jax.device_put(jnp.asarray(x), sh)
    ys = jax.device_put(jnp.asarray(y), sh)
    step = jax.jit(
        lambda x_, y_: B.bcsd_predict_streaming(
            B.bcsd_fit_lazy(x_, y_, fg),
            x_,
            plan,
            variable="temperature",
            return_anoms=False,
            group_chunk=3,
        ),
        in_shardings=(sh, sh),
        out_shardings=sh,
    )
    out = step(xs, ys)
    npt.assert_allclose(np.asarray(out), np.asarray(single), rtol=1e-12, atol=1e-12)


def test_nan_queries_propagate_and_stay_local(rng):
    """A NaN predict-time value must come out NaN without perturbing any
    other time step (rank-bracket path: NaN queries sort last, each its own
    tie run, excluded from every region fill)."""
    idx, x, y = _monthly(rng)
    model = B.BcsdTemperature(return_anoms=True)
    fg = model._fit_groups(idx)
    plan = model._predict_plan(fg, idx)
    state = B.bcsd_fit(jnp.asarray(x), jnp.asarray(y), fg, with_x_climo=True)
    clean = np.asarray(
        B.bcsd_predict(state, jnp.asarray(x), plan, variable="temperature", return_anoms=True)
    )
    x_nan = x.copy()
    x_nan[1, 37] = np.nan
    outs = []
    for fn in (
        lambda s, xx: B.bcsd_predict(s, xx, plan, variable="temperature", return_anoms=True),
        lambda s, xx: B.bcsd_predict_streaming(
            s, xx, plan, variable="temperature", return_anoms=True, group_chunk=5
        ),
    ):
        out = np.asarray(fn(state, jnp.asarray(x_nan)))
        assert np.isnan(out[1, 37])
        # cells != 1 bitwise identical to the clean run (NaN stays cell-local)
        npt.assert_array_equal(out[0], clean[0])
        npt.assert_array_equal(out[2:], clean[2:])
        # within cell 1 the NaN spreads through the same-month rolling
        # climate-trend windows (reference semantics), but never takes over
        # steps of other months far from the edge quirks
        assert np.isfinite(out[1]).sum() > 0.8 * out.shape[1]
        outs.append(out)
    # the real invariant: dense and streaming treat NaN queries identically
    npt.assert_allclose(outs[0], outs[1], rtol=1e-12, atol=1e-12)


def test_scatter_groups_partition_vs_scatter_add(rng):
    """scatter_groups takes the inverse-permutation gather path for
    partition groupings; it must equal the scatter-add it replaced, and
    non-partition (overlapping) groupings must still use the fallback."""
    from skdownscale_tpu.models.grouped import _inverse_perm, scatter_groups
    from skdownscale_tpu.utils.timeindex import PaddedGroups

    n = 23
    labels = rng.integers(0, 4, n)
    groups = PaddedGroups.from_labels(labels, np.arange(4))
    vals = rng.normal(size=(2, groups.n_groups * groups.max_len))
    out = np.asarray(scatter_groups(jnp.asarray(vals), groups, n))
    # manual scatter-add
    ref = np.zeros((2, n))
    flat_idx = groups.indices.reshape(-1)
    flat_m = groups.mask.reshape(-1)
    for j in np.nonzero(flat_m)[0]:
        ref[:, flat_idx[j]] += vals[:, j]
    npt.assert_array_equal(out, ref)

    # overlapping groups (same index in two groups) -> no inverse perm
    over = PaddedGroups(
        indices=np.array([[0, 1], [1, 2]], np.int32),
        mask=np.ones((2, 2), bool),
        counts=np.array([2, 2], np.int32),
        keys=np.arange(2),
    )
    assert _inverse_perm(over, 3) is None
    vals2 = rng.normal(size=(4,))
    out2 = np.asarray(scatter_groups(jnp.asarray(vals2), over, 3))
    npt.assert_array_equal(out2, [vals2[0], vals2[1] + vals2[2], vals2[3]])
