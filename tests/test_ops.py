"""Unit tests for the L0 ops layer against numpy/pandas semantics."""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import jax.numpy as jnp

from skdownscale_tpu.ops.interp import interp_padded, interp_ramp, interp_sortmerge, pad_table
from skdownscale_tpu.ops.regression import linreg_fit, logistic_fit, logistic_predict_proba, ols_1d
from skdownscale_tpu.ops.rolling import rolling_mean, rolling_std


class TestInterpRamp:
    def test_matches_np_interp_basic(self, rng):
        xp = np.sort(rng.normal(0, 5, 200))
        fp = np.cumsum(rng.uniform(0, 1, 200))
        q = rng.normal(0, 7, 500)  # includes out-of-range
        npt.assert_allclose(
            np.asarray(interp_ramp(jnp.asarray(q), jnp.asarray(xp), jnp.asarray(fp))),
            np.interp(q, xp, fp),
            rtol=1e-12,
        )

    def test_ties(self):
        # precipitation-style ties (many zeros)
        xp = np.array([0.0, 0.0, 0.0, 1.0, 2.0, 2.0, 3.0])
        fp = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
        q = np.array([-1.0, 0.0, 0.5, 1.0, 2.0, 2.5, 3.0, 9.0])
        npt.assert_allclose(
            np.asarray(interp_ramp(jnp.asarray(q), jnp.asarray(xp), jnp.asarray(fp))),
            np.interp(q, xp, fp),
            rtol=1e-12,
        )

    def test_huge_sentinel_endpoints(self, rng):
        # extrapolate='both' CDF shape: +-1e20 pp endpoints, ~1e17 values
        pp = np.concatenate([[-1e20], (np.arange(1, 401) - 0.4) / 400.2, [1e20]])
        vals = np.concatenate([[-8.7e16], np.sort(rng.normal(10, 3, 400)), [9.1e16]])
        q = np.concatenate([[-1e20, 1e20], rng.uniform(0, 1, 100)])
        npt.assert_allclose(
            np.asarray(interp_ramp(jnp.asarray(q), jnp.asarray(vals * 0 + pp), jnp.asarray(vals))),
            np.interp(q, vals * 0 + pp, vals),
            rtol=1e-12,
        )

    def test_nan_queries(self):
        xp = np.array([0.0, 1.0, 2.0])
        fp = np.array([0.0, 10.0, 20.0])
        out = np.asarray(interp_ramp(jnp.asarray([np.nan, 0.5]), jnp.asarray(xp), jnp.asarray(fp)))
        assert np.isnan(out[0]) and out[1] == 5.0

    def test_padded_table(self):
        valid = np.array([True, True, True, False, False])
        xp, fp = pad_table(
            jnp.asarray([1.0, 2.0, 3.0, 9.0, 9.0]),
            jnp.asarray([10.0, 20.0, 30.0, 7.0, 7.0]),
            jnp.asarray(valid),
        )
        npt.assert_allclose(np.asarray(fp), [10.0, 20.0, 30.0, 30.0, 30.0])
        q = np.array([0.5, 1.5, 3.0, 4.0, 100.0])
        out = np.asarray(interp_padded(jnp.asarray(q), xp, fp, 3))
        npt.assert_allclose(out, [10.0, 15.0, 30.0, 30.0, 30.0])
        out2 = np.asarray(
            interp_padded(jnp.asarray(q), jnp.asarray(xp), jnp.asarray(fp), 3, right=np.inf)
        )
        assert np.isinf(out2[-1]) and np.isinf(out2[-2])


class TestInterpSortmerge:
    """The large-table strategy must agree with np.interp / the dense path."""

    def test_matches_np_interp(self, rng):
        B, L, Q = 20, 300, 150
        xp = np.sort(rng.normal(0, 3, (B, L)), axis=1)
        fp = np.cumsum(rng.uniform(0, 1, (B, L)), axis=1)
        q = rng.normal(0, 5, (B, Q))  # unsorted, includes out-of-range
        out = np.asarray(interp_sortmerge(jnp.asarray(xp), jnp.asarray(fp), jnp.asarray(q)))
        for i in range(B):
            npt.assert_allclose(out[i], np.interp(q[i], xp[i], fp[i]), rtol=1e-10, atol=1e-12)

    def test_ties_and_padding(self, rng):
        xp = np.sort(np.round(rng.normal(0, 2, (8, 50)), 0), axis=1)
        fp = np.cumsum(rng.uniform(0, 1, (8, 50)), axis=1)
        q = np.round(rng.normal(0, 2, (8, 30)), 0)
        out = np.asarray(interp_sortmerge(jnp.asarray(xp), jnp.asarray(fp), jnp.asarray(q)))
        for i in range(8):
            npt.assert_allclose(out[i], np.interp(q[i], xp[i], fp[i]), rtol=1e-10)

        counts = np.array([[30], [45], [60]])
        valid = np.arange(60)[None, :] < counts
        xpr = np.sort(np.where(valid, rng.normal(0, 3, (3, 60)), np.inf), axis=1)
        fpr = np.where(valid, np.cumsum(rng.uniform(0, 1, (3, 60)), axis=1), 0)
        xpj, fpj = pad_table(jnp.asarray(xpr), jnp.asarray(fpr), jnp.asarray(valid))
        qr = rng.normal(0, 5, (3, 20))
        out = np.asarray(interp_sortmerge(xpj, fpj, jnp.asarray(qr)))
        for i, n in enumerate(counts[:, 0]):
            npt.assert_allclose(
                out[i], np.interp(qr[i], xpr[i, :n], np.asarray(fpj)[i, :n]), rtol=1e-10
            )


class TestRegression:
    def test_ols_matches_sklearn(self, rng):
        from sklearn.linear_model import LinearRegression

        x = rng.normal(size=100)
        y = 2 * x + 1 + rng.normal(0, 0.1, 100)
        s, i = ols_1d(jnp.asarray(x), jnp.asarray(y))
        lr = LinearRegression().fit(x.reshape(-1, 1), y)
        npt.assert_allclose([float(s), float(i)], [lr.coef_[0], lr.intercept_], rtol=1e-10)

    def test_weighted_ols_equals_subset(self, rng):
        x = rng.normal(size=50)
        y = rng.normal(size=50)
        w = (rng.uniform(size=50) > 0.4).astype(float)
        s1, i1 = ols_1d(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))
        sel = w.astype(bool)
        s2, i2 = ols_1d(jnp.asarray(x[sel]), jnp.asarray(y[sel]))
        npt.assert_allclose([float(s1), float(i1)], [float(s2), float(i2)], rtol=1e-9)

    def test_linreg_multifeature_matches_sklearn(self, rng):
        from sklearn.linear_model import LinearRegression

        X = rng.normal(size=(80, 3))
        y = X @ np.array([1.0, -2.0, 0.5]) + 3 + rng.normal(0, 0.1, 80)
        coef, intercept = linreg_fit(jnp.asarray(X), jnp.asarray(y))
        lr = LinearRegression().fit(X, y)
        npt.assert_allclose(np.asarray(coef), lr.coef_, rtol=1e-8)
        npt.assert_allclose(float(intercept), lr.intercept_, rtol=1e-8)

    def test_logistic_matches_sklearn(self, rng):
        from sklearn.linear_model import LogisticRegression

        X = rng.normal(size=(150, 2))
        y = (X[:, 0] + 0.5 * X[:, 1] + rng.normal(0, 0.5, 150) > 0).astype(float)
        coef, intercept = logistic_fit(jnp.asarray(X), jnp.asarray(y))
        sk = LogisticRegression().fit(X, y.astype(int))
        npt.assert_allclose(np.asarray(coef), sk.coef_[0], rtol=2e-3, atol=1e-4)
        p_ours = np.asarray(logistic_predict_proba(coef, intercept, jnp.asarray(X)))
        p_sk = sk.predict_proba(X)[:, 1]
        npt.assert_allclose(p_ours, p_sk, rtol=5e-3, atol=5e-4)


class TestRolling:
    @pytest.mark.parametrize("window", [9, 31, 4])
    @pytest.mark.parametrize("min_periods", [None, 1])
    def test_mean_matches_pandas(self, rng, window, min_periods):
        s = pd.Series(rng.normal(size=100))
        expected = s.rolling(window, center=True, min_periods=min_periods).mean()
        got = np.asarray(
            rolling_mean(jnp.asarray(s.to_numpy()), window, min_periods=min_periods)
        )
        npt.assert_allclose(got, expected.to_numpy(), rtol=1e-10, equal_nan=True)

    @pytest.mark.parametrize("window", [9, 31])
    def test_std_matches_pandas(self, rng, window):
        s = pd.Series(rng.normal(size=100))
        expected = s.rolling(window, center=True).std()
        got = np.asarray(rolling_std(jnp.asarray(s.to_numpy()), window))
        npt.assert_allclose(got, expected.to_numpy(), rtol=1e-7, equal_nan=True)

    @pytest.mark.parametrize("matmul", [False, True])
    @pytest.mark.parametrize("window", [9, 30, 31])
    def test_mean_std_fused_matches_pandas(self, rng, matmul, window):
        """Both dispatch branches of ``rolling_mean_std`` (shared unrolled
        sums / blocked-banded MXU matmul) against pandas, incl. NaN inputs
        poisoning exactly the windows they touch (min_periods=window)."""
        from skdownscale_tpu.ops import rolling as R

        n = 700  # long enough for the matmul gate's n >= 4*B
        v = 283.0 + rng.normal(size=n)
        v[100] = np.nan
        v[:3] = np.nan
        s = pd.Series(v)
        exp_m = s.rolling(window, center=True).mean().to_numpy()
        exp_s = s.rolling(window, center=True).std().to_numpy()
        saved = R._STATS_MATMUL_OVERRIDE
        try:
            R._STATS_MATMUL_OVERRIDE = matmul
            m, sd = R.rolling_mean_std(jnp.asarray(v), window, ddof=1)
        finally:
            R._STATS_MATMUL_OVERRIDE = saved
        npt.assert_array_equal(np.isnan(np.asarray(m)), np.isnan(exp_m))
        npt.assert_array_equal(np.isnan(np.asarray(sd)), np.isnan(exp_s))
        npt.assert_allclose(np.asarray(m), exp_m, rtol=1e-10, equal_nan=True)
        npt.assert_allclose(np.asarray(sd), exp_s, rtol=1e-8, equal_nan=True)


def test_rolling_grouped_flat_unroll_matches_fori(rng):
    """The size-gated unrolled window sum (ops/rolling.py:_UNROLL_ELEMS)
    must be bit-identical to the fori_loop form (same addition order)."""
    from skdownscale_tpu.ops import rolling as R

    G, L = 5, 37
    valid = np.zeros((G, L), bool)
    for g in range(G):
        valid[g, : rng.integers(5, L + 1)] = True
    x = jnp.asarray(rng.normal(size=(3, G * L)))
    a = R.rolling_mean_grouped_flat(x, 9, valid)
    saved = R._UNROLL_ELEMS
    try:
        R._UNROLL_ELEMS = 0  # force the fori_loop path
        b = R.rolling_mean_grouped_flat(x, 9, valid)
    finally:
        R._UNROLL_ELEMS = saved
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grouped_rolling_matrix_matches_pipeline(rng):
    """``grouped_rolling_matrix`` (the TPU MXU form) must reproduce the full
    gather -> masked grouped rolling mean -> inverse-perm scatter pipeline
    on ragged partitions, and the matmul-dispatched BCSD climate trend must
    match the unrolled dispatch."""
    import pandas as pd

    from skdownscale_tpu.models.bcsd import BcsdTemperature, _climate_trend_rolled
    from skdownscale_tpu.models.grouped import gather_groups, scatter_groups
    from skdownscale_tpu.ops import rolling as R
    from skdownscale_tpu.utils.timeindex import PaddedGroups

    # ragged partition of [0, n): shuffled contiguous runs
    n, G = 97, 6
    cuts = np.sort(rng.choice(np.arange(1, n), G - 1, replace=False))
    pieces = np.split(rng.permutation(n), cuts)
    L = max(len(p) for p in pieces)
    idx = np.zeros((G, L), np.int32)
    msk = np.zeros((G, L), bool)
    for g, p in enumerate(pieces):
        idx[g, : len(p)] = np.sort(p)
        msk[g, : len(p)] = True
    groups = PaddedGroups(idx, msk, msk.sum(1).astype(np.int32), np.arange(G))

    Rm = R.grouped_rolling_matrix(groups, 9, n)
    assert Rm is not None
    x = jnp.asarray(rng.normal(size=(4, n)))
    want = scatter_groups(
        R.rolling_mean_grouped_flat(
            gather_groups(x, groups, fill=0.0), 9, msk, min_periods=1
        ),
        groups,
        n,
    )
    got = x @ jnp.asarray(Rm.T)
    npt.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-12)

    # model-level dispatch: monthly climate-trend plan, matmul vs unrolled
    index = pd.date_range("1990-01-01", periods=120, freq="MS")
    model = BcsdTemperature(return_anoms=False)
    plan = model._predict_plan(model._fit_groups(index), index)
    xs = jnp.asarray(rng.normal(size=(3, 120)))
    base = _climate_trend_rolled(xs, plan, 9, 120)
    saved = R._MATMUL_OVERRIDE
    try:
        R._MATMUL_OVERRIDE = True
        forced = _climate_trend_rolled(xs, plan, 9, 120)
    finally:
        R._MATMUL_OVERRIDE = saved
    npt.assert_allclose(np.asarray(forced), np.asarray(base), rtol=0, atol=1e-12)


def test_psolve_analytic_matches_eigh(rng):
    """The analytic 1x1/2x2 _psolve paths must reproduce the eigh-pinv
    (same spectral cutoff) including rank-deficient and isotropic cases."""
    from skdownscale_tpu.ops.regression import _psolve

    def eigh_psolve(G, b):
        evals, evecs = jnp.linalg.eigh(G)
        cutoff = jnp.finfo(G.dtype).eps * G.shape[0] * jnp.max(jnp.abs(evals))
        inv = jnp.where(
            evals > cutoff, 1.0 / jnp.where(evals > cutoff, evals, 1.0), 0.0
        )
        return evecs @ (inv * (evecs.T @ b))

    worst = 0.0
    for trial in range(300):
        k = int(rng.integers(1, 3))
        kind = int(rng.integers(0, 4))
        A = rng.normal(size=(5, k))
        if kind == 1 and k == 2:
            A[:, 1] = A[:, 0]  # rank deficient
        if kind == 2:
            A = np.eye(k) * rng.uniform(0.5, 2.0)  # isotropic
        if kind == 3:
            A = np.zeros((5, k))
        G = jnp.asarray(A.T @ A)
        b = jnp.asarray(rng.normal(size=k))
        got = np.asarray(_psolve(G, b))
        want = np.asarray(eigh_psolve(G, b))
        worst = max(
            worst, np.max(np.abs(got - want)) / max(1.0, np.max(np.abs(want)))
        )
    assert worst < 1e-9
