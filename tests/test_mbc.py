"""MBCn multivariate bias correction (models/mbc.py, beyond parity).

The reference has no multivariate estimator; correctness here is pinned by
algorithm invariants (exact margin multisets, dependence convergence on
Gaussian synthetic data), a np.interp golden for the in-loop rank map, and
batch==per-cell equivalence.
"""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import jax.numpy as jnp

from skdownscale_tpu.models.mbc import MBCn, mbcn_correct, mbcn_rotations
from skdownscale_tpu.models.quantile import edcdfm_predict, qmr_fit


def _correlated(rng, n, corr, scale=1.0, loc=0.0):
    L = np.linalg.cholesky(corr)
    return rng.standard_normal((n, corr.shape[0])) @ L.T * scale + loc


CY = np.array([[1.0, 0.7, 0.2], [0.7, 1.0, 0.4], [0.2, 0.4, 1.0]])
CX = np.array([[1.0, 0.1, 0.0], [0.1, 1.0, 0.1], [0.0, 0.1, 1.0]])


@pytest.fixture()
def problem(rng):
    y = _correlated(rng, 900, CY)
    xh = _correlated(rng, 800, CX, scale=1.5, loc=2.0)
    xf = _correlated(rng, 600, CX, scale=1.5, loc=2.5)
    return y, xh, xf


class TestRotations:
    def test_orthogonal_and_deterministic(self):
        R = mbcn_rotations(4, 7, random_state=3)
        assert R.shape == (7, 4, 4)
        for q in R:
            npt.assert_allclose(q @ q.T, np.eye(4), atol=1e-12)
        npt.assert_array_equal(R, mbcn_rotations(4, 7, random_state=3))
        assert not np.allclose(R, mbcn_rotations(4, 7, random_state=4))


class TestRankMap:
    def test_matches_np_interp(self, rng):
        """The static rank-bracket map equals np.interp of the hist Cunnane
        positions into the obs (pp, sorted-values) table."""
        from skdownscale_tpu.models.mbc import _qm_rows_by_rank, _rank_bracket

        n, m = 57, 83
        z = rng.normal(size=(4, n))
        y = rng.normal(size=(4, m))
        lo, hi, w = _rank_bracket(n, m, 0.4, 0.4)
        ys = jnp.sort(jnp.asarray(y), axis=-1)
        mapped, zs, ms = _qm_rows_by_rank(
            jnp.asarray(z), ys, jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(w)
        )
        pp_n = (np.arange(1, n + 1) - 0.4) / (n + 0.2)
        pp_m = (np.arange(1, m + 1) - 0.4) / (m + 0.2)
        for r in range(4):
            expect_sorted = np.interp(pp_n, pp_m, np.sort(y[r]))
            order = np.argsort(z[r], kind="stable")
            expect = np.empty(n)
            expect[order] = expect_sorted
            npt.assert_allclose(np.asarray(mapped)[r], expect, rtol=1e-12)
            npt.assert_allclose(np.asarray(ms)[r], expect_sorted, rtol=1e-12)
            npt.assert_array_equal(np.asarray(zs)[r], np.sort(z[r]))


class TestRankReorder:
    def test_permutation_with_template_ranks(self, rng):
        from skdownscale_tpu.models.mbc import rank_reorder

        v = rng.normal(size=(3, 40))
        t = rng.normal(size=(3, 40))
        out = np.asarray(rank_reorder(jnp.asarray(v), jnp.asarray(t)))
        for r in range(3):
            npt.assert_array_equal(np.sort(out[r]), np.sort(v[r]))  # permutation
            npt.assert_array_equal(
                np.argsort(np.argsort(out[r], kind="stable"), kind="stable"),
                np.argsort(np.argsort(t[r], kind="stable"), kind="stable"),
            )  # identical rank structure


class TestRankMapProperty:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(min_value=2, max_value=200),
        m=st.integers(min_value=2, max_value=200),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        quantize=st.booleans(),
    )
    def test_rank_map_matches_np_interp(self, n, m, seed, quantize):
        """Property: for any (n, m) and any data (incl. heavy ties), the
        static rank-bracket map equals np.interp on the Cunnane grids."""
        from skdownscale_tpu.models.mbc import _qm_rows_by_rank, _rank_bracket

        r = np.random.default_rng(seed)
        z = r.normal(0, 3, n)
        y = r.normal(1, 2, m)
        if quantize:
            z, y = np.round(z), np.round(y)
        lo, hi, w = _rank_bracket(n, m, 0.4, 0.4)
        ys = jnp.sort(jnp.asarray(y)[None, :], axis=-1)
        mapped, _, _ = _qm_rows_by_rank(
            jnp.asarray(z)[None, :], ys, jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(w)
        )
        pp_n = (np.arange(1, n + 1) - 0.4) / (n + 0.2)
        pp_m = (np.arange(1, m + 1) - 0.4) / (m + 0.2)
        expect_sorted = np.interp(pp_n, pp_m, np.sort(y))
        order = np.argsort(z, kind="stable")
        expect = np.empty(n)
        expect[order] = expect_sorted
        npt.assert_allclose(np.asarray(mapped)[0], expect, rtol=1e-10, atol=1e-12)


class TestMbcnCorrect:
    def test_margins_are_exact_qdm_multisets(self, problem):
        """The closing reorder step only permutes: each output column's
        multiset equals the QDM-corrected margin exactly."""
        y, xh, xf = problem
        R = mbcn_rotations(3, 10, 0)
        oh, of = mbcn_correct(
            jnp.asarray(y), jnp.asarray(xh), jnp.asarray(xf), R, kinds=("difference",) * 3
        )
        xh_rows = jnp.asarray(xh).T
        state = qmr_fit(xh_rows, jnp.asarray(y).T, extrapolate="both")
        mh = edcdfm_predict(state, xh_rows, kind="difference", extrapolate="both")
        mf = edcdfm_predict(state, jnp.asarray(xf).T, kind="difference", extrapolate="both")
        for j in range(3):
            npt.assert_allclose(
                np.sort(np.asarray(oh)[:, j]), np.sort(np.asarray(mh)[j]), rtol=1e-12
            )
            npt.assert_allclose(
                np.sort(np.asarray(of)[:, j]), np.sort(np.asarray(mf)[j]), rtol=1e-12
            )

    def test_dependence_converges_to_obs_correlation(self, problem):
        y, xh, xf = problem
        R = mbcn_rotations(3, 30, 0)
        oh, of = mbcn_correct(
            jnp.asarray(y), jnp.asarray(xh), jnp.asarray(xf), R, kinds=("difference",) * 3
        )
        oh = np.asarray(oh)
        cy, ch_raw, ch = np.corrcoef(y.T), np.corrcoef(xh.T), np.corrcoef(oh.T)
        # raw model dependence is far from obs; corrected is close
        assert np.abs(ch - cy).max() < 0.08
        assert np.abs(ch_raw - cy).max() > 0.3
        # the fut block inherits the corrected dependence structure
        cf = np.corrcoef(np.asarray(of).T)
        assert np.abs(cf - cy).max() < 0.15

    def test_batched_equals_per_cell(self, rng):
        C, n, m, p, d = 3, 200, 180, 150, 2
        y = rng.normal(size=(C, m, d))
        xh = rng.normal(size=(C, n, d)) + 1.0
        xf = rng.normal(size=(C, p, d)) + 1.2
        R = mbcn_rotations(d, 8, 1)
        oh, of = mbcn_correct(
            jnp.asarray(y), jnp.asarray(xh), jnp.asarray(xf), R, kinds=("difference",) * d
        )
        for c in range(C):
            oh1, of1 = mbcn_correct(
                jnp.asarray(y[c]), jnp.asarray(xh[c]), jnp.asarray(xf[c]), R,
                kinds=("difference",) * d,
            )
            npt.assert_allclose(np.asarray(oh)[c], np.asarray(oh1), rtol=1e-10, atol=1e-12)
            npt.assert_allclose(np.asarray(of)[c], np.asarray(of1), rtol=1e-10, atol=1e-12)

    def test_ratio_kind_keeps_positive_margins(self, rng):
        n, m, p, d = 400, 400, 300, 2
        y = rng.gamma(2.0, 2.0, (m, d)) + 0.1
        xh = rng.gamma(2.0, 3.0, (n, d)) + 0.1
        xf = rng.gamma(2.0, 3.5, (p, d)) + 0.1
        R = mbcn_rotations(d, 10, 0)
        oh, of = mbcn_correct(
            jnp.asarray(y), jnp.asarray(xh), jnp.asarray(xf), R,
            kinds=("ratio", "ratio"),
        )
        assert (np.asarray(oh) > 0).all()
        assert np.isfinite(np.asarray(of)).all()

    def test_mixed_kinds_and_validation(self, problem):
        y, xh, xf = problem
        R = mbcn_rotations(3, 5, 0)
        yp, xhp, xfp = np.abs(y) + 0.1, np.abs(xh) + 0.1, np.abs(xf) + 0.1
        oh, _ = mbcn_correct(
            jnp.asarray(yp), jnp.asarray(xhp), jnp.asarray(xfp), R,
            kinds=("difference", "ratio", "difference"),
        )
        assert np.isfinite(np.asarray(oh)).all()
        with pytest.raises(ValueError, match="kinds has"):
            mbcn_correct(
                jnp.asarray(yp), jnp.asarray(xhp), jnp.asarray(xfp), R,
                kinds=("difference",),
            )


def _mbcn_numpy(skref, y, xh, xf, rots, kinds, alpha=0.4, beta=0.4):
    """Fully independent MBCn pipeline: margins via the *reference*'s
    EquidistantCdfMatcher (ref quantile.py:556-636) and the Cannon 2018
    rotation loop in plain numpy (np.sort / stable np.argsort / np.interp).
    Mirrors the algorithm spec in models/mbc.py's module docstring with none
    of its code paths (no rank-bracket tables, no payload sorts)."""
    n, m, p, d = xh.shape[0], y.shape[0], xf.shape[0], y.shape[1]
    mh = np.empty_like(xh)
    mf = np.empty_like(xf)
    for j in range(d):
        est = skref.EquidistantCdfMatcher(kind=kinds[j], extrapolate="both").fit(
            xh[:, j : j + 1], y[:, j]
        )
        mh[:, j] = est.predict(xh[:, j : j + 1])
        mf[:, j] = est.predict(xf[:, j : j + 1])

    def pp(k):
        return (np.arange(1, k + 1) - alpha) / (k + 1.0 - alpha - beta)

    zh, zf = mh.copy(), mf.copy()
    for Q in rots:
        yr, zhr, zfr = y @ Q, zh @ Q, zf @ Q
        zh2, zf2 = np.empty_like(zhr), np.empty_like(zfr)
        for j in range(d):
            ys = np.sort(yr[:, j])
            mapped = np.interp(pp(n), pp(m), ys)
            order = np.argsort(zhr[:, j], kind="stable")
            zh2[order, j] = mapped
            zf2[:, j] = np.interp(zfr[:, j], zhr[order, j], mapped)
        zh, zf = zh2 @ Q.T, zf2 @ Q.T

    def reorder(margin, z):
        out = np.empty_like(margin)
        for j in range(margin.shape[1]):
            out[np.argsort(z[:, j], kind="stable"), j] = np.sort(margin[:, j])
        return out

    return reorder(mh, zh), reorder(mf, zf)


class TestMbcnFullPipelineGolden:
    def test_matches_independent_numpy_pipeline(self, skref, rng):
        """End-to-end golden: mbcn_correct == reference-margin + numpy-loop
        formulation at float64.  The only shared ingredient is the algorithm
        itself — margins, rank map, fut transfer, and closing reorder all
        come from different code (reference estimator / np.interp) here."""
        y = _correlated(rng, 260, CY)
        xh = _correlated(rng, 240, CX, scale=1.5, loc=2.0)
        xf = _correlated(rng, 200, CX, scale=1.4, loc=2.5)
        R = mbcn_rotations(3, 8, 0)
        kinds = ("difference",) * 3
        oh, of = mbcn_correct(
            jnp.asarray(y), jnp.asarray(xh), jnp.asarray(xf), R, kinds=kinds
        )
        eh, ef = _mbcn_numpy(skref, y, xh, xf, R, kinds)
        npt.assert_allclose(np.asarray(oh), eh, rtol=1e-7, atol=1e-9)
        npt.assert_allclose(np.asarray(of), ef, rtol=1e-7, atol=1e-9)


class TestMBCnClass:
    def test_fit_predict_dataframe(self, problem):
        y, xh, xf = problem
        cols = ["tmax", "tmin", "pr"]
        ih = pd.date_range("1980-01-01", periods=len(xh), freq="D")
        i_f = pd.date_range("2050-01-01", periods=len(xf), freq="D")
        iy = pd.date_range("1979-01-01", periods=len(y), freq="D")
        model = MBCn(n_iterations=10, random_state=0)
        model.fit(pd.DataFrame(xh, index=ih, columns=cols), pd.DataFrame(y, index=iy, columns=cols))
        out = model.predict(pd.DataFrame(xf, index=i_f, columns=cols))
        assert list(out.columns) == cols and out.shape == (len(xf), 3)
        assert out.index.equals(i_f)
        # functional-core equivalence
        _, of = mbcn_correct(
            jnp.asarray(y), jnp.asarray(xh), jnp.asarray(xf),
            model.rotations_, kinds=("difference",) * 3, extrapolate="both",
        )
        npt.assert_allclose(out.to_numpy(), np.asarray(of), rtol=1e-10)
        # transform corrects the calibration block itself
        th = model.transform()
        assert th.shape == xh.shape and np.isfinite(th).all()

    def test_clone_and_errors(self, problem):
        from sklearn.base import clone

        y, xh, _ = problem
        model = MBCn(n_iterations=3, kind="ratio", random_state=5)
        c = clone(model)
        assert c.get_params() == model.get_params()
        with pytest.raises(Exception):
            MBCn().predict(xh)  # not fitted
        with pytest.raises(ValueError, match="variables"):
            MBCn().fit(xh, y[:, :2])
        with pytest.raises(ValueError, match="kind"):
            MBCn(kind="bogus").fit(xh, y)
        with pytest.raises(ValueError, match="kind"):
            MBCn(kind=("difference",)).fit(xh, y)

    def test_numpy_input_roundtrip(self, problem):
        y, xh, xf = problem
        out = MBCn(n_iterations=5).fit(xh, y).predict(xf)
        assert isinstance(out, np.ndarray) and out.shape == xf.shape

    def test_nan_rows_rejected(self, problem):
        y, xh, xf = problem
        xbad = xh.copy()
        xbad[3, 1] = np.nan
        with pytest.raises(ValueError, match="non-finite"):
            MBCn(n_iterations=2).fit(xbad, y)
        m = MBCn(n_iterations=2).fit(xh, y)
        fbad = xf.copy()
        fbad[0, 0] = np.nan
        with pytest.raises(ValueError, match="non-finite"):
            m.predict(fbad)
        # inf is rejected upstream with sklearn's wording (asarray_2d)
        fbad[0, 0] = np.inf
        with pytest.raises(ValueError, match="infinity"):
            m.predict(fbad)


class TestMonthlyGrouping:
    def test_grouped_equals_per_month_loop(self, rng):
        import pandas as pd

        from skdownscale_tpu.models.mbc import mbcn_correct, mbcn_correct_monthly, mbcn_rotations

        oi = pd.date_range("1981-01-01", "1983-12-31", freq="D")
        hi = pd.date_range("1984-01-01", "1986-12-31", freq="D")
        fi = pd.date_range("2050-01-01", "2051-12-31", freq="D")
        d = 2
        y = rng.normal(0, 1, (len(oi), d))
        xh = rng.normal(1, 1.5, (len(hi), d))
        xf = rng.normal(1.2, 1.5, (len(fi), d))
        R = mbcn_rotations(d, 5, 0)
        mo, mh, mf = (np.asarray(i.month) for i in (oi, hi, fi))
        oh, of = mbcn_correct_monthly(
            jnp.asarray(y), jnp.asarray(xh), jnp.asarray(xf), mo, mh, mf, R,
            kinds=("difference",) * d,
        )
        for m in (1, 7, 12):
            want_h, want_f = mbcn_correct(
                jnp.asarray(y[mo == m]), jnp.asarray(xh[mh == m]), jnp.asarray(xf[mf == m]),
                R, kinds=("difference",) * d,
            )
            npt.assert_allclose(np.asarray(oh)[mh == m], np.asarray(want_h), rtol=1e-12)
            npt.assert_allclose(np.asarray(of)[mf == m], np.asarray(want_f), rtol=1e-12)

    def test_grouped_recovers_seasonal_dependence(self, rng):
        """Obs correlation flips sign between winter and summer; grouped MBCn
        recovers the per-season sign, whole-series MBCn cannot."""
        import pandas as pd

        from skdownscale_tpu.models.mbc import MBCn

        idx = pd.date_range("1980-01-01", "1995-12-31", freq="D")
        months = np.asarray(idx.month)
        rho = np.where(np.isin(months, (12, 1, 2)), 0.8, np.where(np.isin(months, (6, 7, 8)), -0.8, 0.0))
        z1 = rng.standard_normal(len(idx))
        z2 = rho * z1 + np.sqrt(1 - rho**2) * rng.standard_normal(len(idx))
        obs = pd.DataFrame({"a": z1, "b": z2}, index=idx)
        xh = pd.DataFrame(rng.standard_normal((len(idx), 2)) + 1.0, columns=["a", "b"], index=idx)
        m = MBCn(n_iterations=12, group="month", random_state=0).fit(xh, obs)
        out = m.predict(xh)
        djf = np.isin(months, (12, 1, 2))
        jja = np.isin(months, (6, 7, 8))
        c_djf = np.corrcoef(out["a"][djf], out["b"][djf])[0, 1]
        c_jja = np.corrcoef(out["a"][jja], out["b"][jja])[0, 1]
        assert c_djf > 0.6 and c_jja < -0.6

    def test_missing_month_raises(self, rng):
        import pandas as pd

        from skdownscale_tpu.models.mbc import mbcn_correct_monthly, mbcn_rotations

        oi = pd.date_range("1981-01-01", "1981-06-30", freq="D")  # Jan-Jun only
        fi = pd.date_range("2050-07-01", "2050-07-31", freq="D")  # July
        y = rng.normal(0, 1, (len(oi), 2))
        with pytest.raises(ValueError, match="absent"):
            mbcn_correct_monthly(
                jnp.asarray(y), jnp.asarray(y), jnp.asarray(rng.normal(0, 1, (len(fi), 2))),
                np.asarray(oi.month), np.asarray(oi.month), np.asarray(fi.month),
                mbcn_rotations(2, 3, 0), kinds=("difference", "difference"),
            )


class TestMbcnGrid:
    def _grids(self, rng, ny=3, nx=4, tm=180, to=200, tf=150):
        from skdownscale_tpu.xlite import DataArray, Dataset

        def ds(T, loc, start):
            idx = pd.date_range(start, periods=T, freq="D")
            coords = {"time": idx, "y": np.arange(ny), "x": np.arange(nx)}
            das = {}
            for j, v in enumerate(("tmax", "pr")):
                a = rng.normal(loc + j, 1.5, (T, ny, nx))
                a[:, 0, 0] = np.nan  # ocean cell
                das[v] = DataArray(a, ("time", "y", "x"), coords)
            return Dataset(das)

        return ds(to, 0.0, "1980-01-01"), ds(tm, 1.0, "1981-01-01"), ds(tf, 1.3, "2050-01-01")

    @pytest.mark.parametrize("chunk", [None, 5])
    def test_grid_matches_core_and_masks(self, rng, chunk):
        from skdownscale_tpu.models.mbc import mbcn_correct, mbcn_grid, mbcn_rotations

        y, xh, xf = self._grids(rng)
        oh, of = mbcn_grid(y, xh, xf, n_iterations=4, cell_chunk_size=chunk)
        assert set(oh.data_vars) == {"tmax", "pr"} and set(of.data_vars) == {"tmax", "pr"}
        vh = np.asarray(oh["tmax"].values)
        assert vh.shape == np.asarray(xh["tmax"].values).shape
        assert np.isnan(vh[:, 0, 0]).all()  # ocean propagated
        assert np.isfinite(vh[:, 1:, :]).all()
        # one valid cell equals the batch-native core directly
        def cell(ds, yy, xx):
            return np.stack(
                [np.asarray(ds[v].values)[:, yy, xx] for v in ("tmax", "pr")], axis=-1
            )
        want_h, want_f = mbcn_correct(
            jnp.asarray(cell(y, 1, 2)), jnp.asarray(cell(xh, 1, 2)), jnp.asarray(cell(xf, 1, 2)),
            mbcn_rotations(2, 4, 0), kinds=("difference", "difference"),
        )
        got_h = cell(oh, 1, 2)
        npt.assert_allclose(got_h, np.asarray(want_h), rtol=1e-9, atol=1e-10)
        npt.assert_allclose(cell(of, 1, 2), np.asarray(want_f), rtol=1e-9, atol=1e-10)
        # time coords follow each block's own axis
        assert len(oh["tmax"].coords["time"]) == 180
        assert len(of["tmax"].coords["time"]) == 150

    def test_grid_sharded_matches_unsharded(self, rng):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from skdownscale_tpu.models.mbc import mbcn_grid
        from skdownscale_tpu.parallel import cell_mesh

        y, xh, xf = self._grids(rng, ny=4, nx=4)
        mesh = cell_mesh(jax.devices())
        sh = NamedSharding(mesh, P("cells", None, None))
        oh0, of0 = mbcn_grid(y, xh, xf, n_iterations=3)
        oh1, of1 = mbcn_grid(y, xh, xf, n_iterations=3, sharding=sh)
        for v in ("tmax", "pr"):
            npt.assert_allclose(
                np.asarray(oh1[v].values), np.asarray(oh0[v].values), rtol=1e-9, atol=1e-12
            )
            npt.assert_allclose(
                np.asarray(of1[v].values), np.asarray(of0[v].values), rtol=1e-9, atol=1e-12
            )

    def test_grid_monthly_grouping(self, rng):
        from skdownscale_tpu.models.mbc import mbcn_correct_monthly, mbcn_grid, mbcn_rotations

        y, xh, xf = self._grids(rng, tm=360, to=365, tf=180)
        oh, of = mbcn_grid(y, xh, xf, n_iterations=3, group="month")
        # one valid cell equals the grouped core directly
        def cell(ds, yy, xx):
            return np.stack(
                [np.asarray(ds[v].values)[:, yy, xx] for v in ("tmax", "pr")], axis=-1
            )
        import pandas as pd

        mo = np.asarray(pd.DatetimeIndex(y["tmax"].coords["time"]).month)
        mh = np.asarray(pd.DatetimeIndex(xh["tmax"].coords["time"]).month)
        mf = np.asarray(pd.DatetimeIndex(xf["tmax"].coords["time"]).month)
        want_h, want_f = mbcn_correct_monthly(
            jnp.asarray(cell(y, 1, 2)), jnp.asarray(cell(xh, 1, 2)), jnp.asarray(cell(xf, 1, 2)),
            mo, mh, mf, mbcn_rotations(2, 3, 0), kinds=("difference", "difference"),
        )
        npt.assert_allclose(cell(oh, 1, 2), np.asarray(want_h), rtol=1e-9, atol=1e-10)
        npt.assert_allclose(cell(of, 1, 2), np.asarray(want_f), rtol=1e-9, atol=1e-10)

    def test_grid_shape_mismatch_raises(self, rng):
        from skdownscale_tpu.models.mbc import mbcn_grid

        y, xh, xf = self._grids(rng)
        y2, _, _ = self._grids(rng, ny=5)
        with pytest.raises(ValueError, match="spatial shapes"):
            mbcn_grid(y2, xh, xf, n_iterations=2)
