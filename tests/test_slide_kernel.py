"""Sliding sorted-window kernel (interpret mode) vs per-window sorts.

The slide path replaces the daily streaming scan's from-scratch window
sorts (ref delegated ``np.sort``, ``quantile.py:346,462``) with one sort +
bounded-displacement updates; these tests pin plan construction, exact
svals parity (ties, NaN cells, leap calendars), and bitwise end-to-end
equality of the forced path against the default XLA path.
"""

import numpy as np
import numpy.testing as npt
import pytest

import jax.numpy as jnp

from skdownscale_tpu.models.slide import build_slide_plan, consulted_groups
from skdownscale_tpu.ops.pallas.slide_sort_kernel import slide_sorted_windows
from skdownscale_tpu.utils.timeindex import (
    TimeIndex,
    month_groups,
    padded_doy_groups,
)


def _daily_index(years=5, start="2000-01-01"):
    import pandas as pd

    return pd.date_range(start, periods=years * 365 + 2, freq="D")


def test_build_slide_plan_daily():
    ti = TimeIndex.from_pandas(_daily_index())
    fit = padded_doy_groups(ti, offset=15)
    plan = build_slide_plan(fit, np.arange(31))
    assert plan is not None
    assert len(plan.consulted) == 31
    # step tables reconstruct every window exactly
    cur = set(plan.w0_idx[plan.w0_idx >= 0].tolist())
    for i, g in enumerate(plan.consulted):
        if i > 0:
            cur -= set(plan.rem_idx[i - 1][plan.rem_idx[i - 1] >= 0].tolist())
            cur |= set(plan.add_idx[i - 1][plan.add_idx[i - 1] >= 0].tolist())
        want = set(fit.indices[g, : int(fit.counts[g])].tolist())
        assert cur == want, f"window {i} membership mismatch"


def test_build_slide_plan_rejects_disjoint():
    ti = TimeIndex.from_pandas(_daily_index())
    fit = month_groups(ti)  # disjoint windows: diffs are whole groups
    assert build_slide_plan(fit, np.arange(12), max_bucket=48) is None


def test_build_slide_plan_single_window():
    ti = TimeIndex.from_pandas(_daily_index())
    fit = padded_doy_groups(ti, offset=15)
    assert build_slide_plan(fit, np.zeros(4, np.int64)) is None


def test_slide_windows_match_per_window_sort(rng):
    ti = TimeIndex.from_pandas(_daily_index())
    fit = padded_doy_groups(ti, offset=15)
    plan = build_slide_plan(fit, np.arange(31))
    C, T = 5, len(ti.dayofyear)
    y = rng.normal(280, 10, (C, T)).astype(np.float32)
    y[1] = np.round(y[1])  # heavy ties
    y[3] = np.nan  # all-NaN cell
    got = np.asarray(
        slide_sorted_windows(jnp.asarray(y), plan, interpret=True)
    ).reshape(C, len(plan.consulted), plan.Lto)
    for i, g in enumerate(plan.consulted):
        cnt = int(fit.counts[g])
        members = fit.indices[g, :cnt]
        want = np.sort(y[:, members], axis=-1)[:, :cnt]
        gg = got[:, i, :cnt]
        npt.assert_array_equal(
            np.where(np.isnan(gg), -9.0, gg), np.where(np.isnan(want), -9.0, want)
        )
    # pad positions are +inf (value convention of the masked sorts)
    cnt0 = int(fit.counts[plan.consulted[0]])
    if cnt0 < plan.Lt:
        assert np.all(np.isinf(got[:2, 0, cnt0:]))


def test_consulted_groups_rekey():
    ti = TimeIndex.from_pandas(_daily_index())
    fit = padded_doy_groups(ti, offset=15)
    plan = build_slide_plan(fit, np.arange(31))
    fc = consulted_groups(fit, plan)
    assert fc.indices.shape == (31, plan.Lto)
    assert not fc.mask[:, fit.indices.shape[1] :].any()
    npt.assert_array_equal(fc.counts, fit.counts[plan.consulted])


@pytest.mark.parametrize("variable", ["temperature", "precipitation"])
def test_daily_bcsd_slide_path_bitwise(rng, variable):
    """Full daily BCSD fit+predict with the slide (+rank-map) kernels forced
    in interpret mode == the default XLA-sort path, bitwise."""
    import pandas as pd

    from skdownscale_tpu.models import bcsd as B
    from skdownscale_tpu.ops import rowsort

    idx = _daily_index(years=4)
    seas = 10 * np.sin(2 * np.pi * (idx.dayofyear.to_numpy() - 1) / 365.25)
    x = (283 + seas[None, :] + rng.normal(0, 2, (4, len(idx))) + 1.2).astype(np.float32)
    y = (282 + seas[None, :] + rng.normal(0, 1.7, (4, len(idx)))).astype(np.float32)
    x[1] = np.round(x[1] * 4) / 4  # ties
    if variable == "precipitation":
        x, y = np.abs(x) * 0.1 + 1.0, np.abs(y) * 0.1 + 1.0
    model = B.BcsdTemperature(time_grouper="daily_nasa-nex")
    fg = model._fit_groups(idx)
    plan = model._predict_plan(fg, idx)
    assert plan.slide is not None
    xd, yd = jnp.asarray(x), jnp.asarray(y)
    state = B.bcsd_fit_lazy(xd, yd, fg, with_x_climo=variable == "temperature")
    run = lambda: B.bcsd_predict_streaming(
        state, xd, plan, variable=variable, return_anoms=False, group_chunk=8
    )
    want = np.asarray(run())
    with rowsort.override(force=True, interpret=True):
        got = np.asarray(run())
    npt.assert_allclose(got, want, rtol=0, atol=0)


def test_slide_windows_clustered_inserts(rng):
    """Adversarial case for the two-level shift decomposition: an entering
    bucket clustered inside a value gap makes the expand shift jump by more
    than the row gap (e.g. 7 -> 8 across adjacent rows), which collides if
    the remainder phase runs first.  Build windows whose entering day's
    values all fall between two tight value bands."""
    ti = TimeIndex.from_pandas(_daily_index(years=3))
    fit = padded_doy_groups(ti, offset=15)
    plan = build_slide_plan(fit, np.arange(31))
    C, T = 3, len(ti.dayofyear)
    doy = ti.dayofyear
    y = np.where(doy[None, :] % 2 == 0, -100.0, 100.0).astype(np.float32)
    y = y + rng.normal(0, 0.1, (C, T)).astype(np.float32)
    # entering buckets (one DOY at a time) land mid-gap
    y[:, doy >= 17] = rng.normal(0, 0.5, (C, int((doy >= 17).sum()))).astype(
        np.float32
    )
    got = np.asarray(
        slide_sorted_windows(jnp.asarray(y), plan, interpret=True)
    ).reshape(C, len(plan.consulted), plan.Lto)
    for i, g in enumerate(plan.consulted):
        cnt = int(fit.counts[g])
        members = fit.indices[g, :cnt]
        want = np.sort(y[:, members], axis=-1)[:, :cnt]
        npt.assert_array_equal(got[:, i, :cnt], want)
