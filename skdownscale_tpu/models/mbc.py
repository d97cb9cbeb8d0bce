"""Multivariate bias correction: the MBCn N-pdf transform (beyond parity).

The reference corrects each variable independently (every estimator in
``/root/reference/skdownscale/pointwise_models`` is univariate in y); cross-
variable dependence (e.g. temperature/precipitation correlation) is left
uncorrected.  This module adds Cannon's MBCn algorithm (Cannon 2018,
"Multivariate quantile mapping bias correction: an N-dimensional probability
density function transform", Climate Dynamics 50) as a batch-native TPU
model family:

1. **Margins** — each variable is corrected with the existing QDM core
   (:func:`~skdownscale_tpu.models.quantile.edcdfm_predict`, difference or
   ratio kind per variable), preserving the model's per-quantile climate
   deltas.
2. **Dependence** — starting from the QDM-corrected data (per the paper's
   step order), ``n_iterations`` rounds of: rotate (obs, hist, fut) by a
   random orthogonal matrix,
   empirically quantile-map each rotated *hist* coordinate onto the rotated
   obs coordinate (the fut block is passed through the same transfer
   function by monotone value interpolation), rotate back.  This is the
   N-dimensional pdf transform: the rotated-margin maps converge on the
   joint distribution of the observations.
3. **Reorder** — the final output takes the QDM-corrected margins reordered
   to the ranks of the iterated data (separately for the hist and fut
   blocks), i.e. MBCn's closing Schaake-shuffle-like step.

TPU-first design notes:

* Rotations are host data — a ``(R, d, d)`` stack of seeded orthogonal
  matrices shared by every cell — applied as einsum matmuls batched over
  arbitrary leading cell dims.
* The in-loop empirical QM needs **no interpolation search**: both Cunnane
  plotting-position grids are pure functions of (rank, count), so the
  bracketing knot indices and lerp weights into the sorted obs row are a
  HOST table of the two static lengths (the rank-bracket trick from
  ``models/grouped.py``), and the map is one payload sort, a static gather
  pair, and an fma; un-sorting by the carried positions also lands the
  final reorder step without any gather.
* The fut block rides the same transfer monotonically via
  ``ops.interp.interp_rows`` (clamped at the calibration range, np.interp
  edge semantics).
* The whole iteration is a ``lax.scan`` over the rotation stack — one
  compiled program regardless of ``n_iterations``.

Ties take distinct ranks (stable sort), the standard rank-transform
convention for MBCn; the reference has no counterpart to match.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import interp_rows
from .base import SingleCellEstimator, asarray_2d
from .quantile import _sort_with_positions, _unsort, edcdfm_predict, qmr_fit

__all__ = [
    "mbcn_rotations",
    "mbcn_correct",
    "mbcn_correct_monthly",
    "mbcn_grid",
    "rank_reorder",
    "MBCn",
]


def rank_reorder(values, template):
    """Schaake-shuffle-style reordering: permute each row of ``values`` so
    its rank structure matches ``template``'s (both ``(..., n)``).

    The output is an exact permutation of ``values`` per row — marginals are
    untouched — with ``rank(out[i]) == rank(template[i])`` everywhere, the
    standard trick for restoring spatial/temporal/cross-variable coherence
    after independent univariate corrections (and MBCn's closing step).
    Scatter-free: one row sort of ``values`` plus one payload sort pair on
    ``template`` (a permutation's ascending sort is its inverse).
    """
    vs = jax.lax.sort(values, dimension=values.ndim - 1)
    _, pos = _sort_with_positions(template)
    return _unsort(vs, pos)


def mbcn_rotations(d: int, n_iterations: int, random_state: int = 0) -> np.ndarray:
    """Host ``(n_iterations, d, d)`` stack of uniformly random orthogonal
    matrices (QR of a standard normal, sign-fixed so the factor is Haar)."""
    rng = np.random.default_rng(random_state)
    out = np.empty((n_iterations, d, d), dtype=np.float64)
    for r in range(n_iterations):
        q, rr = np.linalg.qr(rng.standard_normal((d, d)))
        out[r] = q * np.sign(np.diag(rr))
    return out


@functools.lru_cache(maxsize=None)
def _rank_bracket(n: int, m: int, alpha: float, beta: float):
    """Host tables mapping hist rank r (of n) into the sorted obs row (m):
    bracket indices (lo, hi) and lerp weight w such that
    ``mapped[r] = obs_sorted[lo]*(1-w) + obs_sorted[hi]*w`` equals
    ``np.interp(pp_n[r], pp_m, obs_sorted)`` (tails clamp)."""
    # host-numpy Cunnane positions (ops.cdf.plotting_positions semantics,
    # ref quantile.py:23-43 — jnp would trace under the enclosing jit)
    pp_n = (np.arange(1, n + 1, dtype=np.float64) - alpha) / (n + 1.0 - alpha - beta)
    pp_m = (np.arange(1, m + 1, dtype=np.float64) - alpha) / (m + 1.0 - alpha - beta)
    hi = np.searchsorted(pp_m, pp_n, side="left").astype(np.int32)
    lo = np.clip(hi - 1, 0, m - 1)
    hi = np.clip(hi, 0, m - 1)
    denom = pp_m[hi] - pp_m[lo]
    with np.errstate(invalid="ignore", divide="ignore"):
        w = np.where(denom > 0, (pp_n - pp_m[lo]) / np.where(denom > 0, denom, 1.0), 0.0)
    w = np.clip(w, 0.0, 1.0)
    return lo, hi, w


def _qm_rows_by_rank(z, ys, lo, hi, w):
    """Empirical QM of each row of ``z`` (..., n) onto the sorted obs rows
    ``ys`` (..., m) via the static rank-bracket tables; returns the mapped
    rows in original order plus (sorted z, mapped-sorted) as the monotone
    transfer table for the fut block."""
    zs, pos = _sort_with_positions(z)
    mapped_sorted = ys[..., lo] * (1.0 - w) + ys[..., hi] * w
    return _unsort(mapped_sorted, pos), zs, mapped_sorted


@functools.partial(jax.jit, static_argnames=("kinds", "extrapolate", "n_endpoints"))
def mbcn_correct(
    y_obs,
    x_hist,
    x_fut,
    rotations,
    *,
    kinds,
    extrapolate="both",
    n_endpoints: int = 10,
    alpha: float = 0.4,
    beta: float = 0.4,
):
    """Batch-native MBCn.

    Parameters
    ----------
    y_obs : (..., m, d) observations.
    x_hist : (..., n, d) model over the calibration period.
    x_fut : (..., p, d) model over the projection period (may alias
        ``x_hist`` to correct the calibration period itself).
    rotations : (R, d, d) orthogonal stack (see :func:`mbcn_rotations`).
    kinds : length-d tuple of 'difference'/'ratio' — the QDM margin kind
        per variable (ratio for precipitation-like variables).

    Returns
    -------
    (out_hist, out_fut) with the shapes of ``x_hist`` / ``x_fut``.
    """
    d = x_hist.shape[-1]
    n = x_hist.shape[-2]
    m = y_obs.shape[-2]
    p = x_fut.shape[-2]
    if len(kinds) != d:
        raise ValueError(f"kinds has {len(kinds)} entries for {d} variables")
    dtype = jnp.result_type(x_hist.dtype, jnp.float32)
    y_obs = y_obs.astype(dtype)
    x_hist = x_hist.astype(dtype)
    x_fut = x_fut.astype(dtype)
    rotations = jnp.asarray(rotations, dtype)

    lo, hi, w = _rank_bracket(n, m, alpha, beta)
    lo_j, hi_j, w_j = jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(w).astype(dtype)

    # ---- step 1: QDM margins (existing univariate core, by kind) -------
    xh_rows = jnp.swapaxes(x_hist, -1, -2)  # (..., d, n)
    xf_rows = jnp.swapaxes(x_fut, -1, -2)
    yo_rows = jnp.swapaxes(y_obs, -1, -2)
    mh_cols: list = [None] * d
    mf_cols: list = [None] * d
    for kind in sorted(set(kinds)):
        idx = tuple(j for j, k in enumerate(kinds) if k == kind)
        sel = np.asarray(idx, dtype=np.int32)
        state = qmr_fit(
            xh_rows[..., sel, :], yo_rows[..., sel, :],
            extrapolate=extrapolate, n_endpoints=n_endpoints,
        )
        mh = edcdfm_predict(
            state, xh_rows[..., sel, :], kind=kind,
            extrapolate=extrapolate, n_endpoints=n_endpoints,
        )
        mf = edcdfm_predict(
            state, xf_rows[..., sel, :], kind=kind,
            extrapolate=extrapolate, n_endpoints=n_endpoints,
        )
        for pos, j in enumerate(idx):
            mh_cols[j] = mh[..., pos, :]
            mf_cols[j] = mf[..., pos, :]
    mh_rows = jnp.stack(mh_cols, axis=-2)
    mf_rows = jnp.stack(mf_cols, axis=-2)

    # ---- step 2: dependence iterations (rotate / rank-map / unrotate),
    # starting from the QDM-corrected data per Cannon 2018's algorithm ----
    def body(carry, Q):
        zh, zf = carry  # (..., n, d), (..., p, d)
        yr = jnp.swapaxes(y_obs @ Q, -1, -2)  # (..., d, m) axis-major rows
        zhr = jnp.swapaxes(zh @ Q, -1, -2)
        zfr = jnp.swapaxes(zf @ Q, -1, -2)
        ys = jax.lax.sort(yr, dimension=yr.ndim - 1)
        zh_m, zs, ms = _qm_rows_by_rank(zhr, ys, lo_j, hi_j, w_j)
        zf_m = interp_rows(zs, ms, zfr)
        zh2 = jnp.swapaxes(zh_m, -1, -2) @ Q.T
        zf2 = jnp.swapaxes(zf_m, -1, -2) @ Q.T
        return (zh2, zf2), None

    z_init = (jnp.swapaxes(mh_rows, -1, -2), jnp.swapaxes(mf_rows, -1, -2))
    (zh_fin, zf_fin), _ = jax.lax.scan(body, z_init, rotations)

    # ---- step 3: reorder margins to the iterated ranks (scatter-free) --
    def reorder(margin_rows, z_fin):
        return jnp.swapaxes(rank_reorder(margin_rows, jnp.swapaxes(z_fin, -1, -2)), -1, -2)

    return reorder(mh_rows, zh_fin), reorder(mf_rows, zf_fin)


def mbcn_correct_monthly(
    y_obs,
    x_hist,
    x_fut,
    months_obs,
    months_hist,
    months_fut,
    rotations,
    *,
    kinds,
    extrapolate="both",
    n_endpoints: int = 10,
):
    """Calendar-month-grouped MBCn (dependence structure often differs by
    season — e.g. winter vs summer temperature/precipitation coupling).

    ``months_*``: host int arrays (1..12) labelling each time step of the
    corresponding block.  Each month's subsets run through
    :func:`mbcn_correct` independently (the same rotation stack), and the
    outputs are reassembled in time order scatter-free: concatenate in
    group order, then one host inverse-permutation gather.  Months are
    ragged across the calendar, so each distinct (n_m, m_m, p_m) triple
    compiles its own program — at most 12.
    """
    months_obs = np.asarray(months_obs)
    months_hist = np.asarray(months_hist)
    months_fut = np.asarray(months_fut)
    mset = sorted(set(months_fut.tolist()) | set(months_hist.tolist()))
    missing = [m for m in mset if (m not in months_obs) or (m not in months_hist)]
    if missing:
        raise ValueError(f"months {missing} absent from the obs/hist records")

    parts_h, parts_f, idx_h, idx_f = [], [], [], []
    for m in mset:
        so = np.nonzero(months_obs == m)[0]
        sh = np.nonzero(months_hist == m)[0]
        sf = np.nonzero(months_fut == m)[0]
        # a month in hist but absent from fut still contributes hist output;
        # feed one dummy fut row (hist's first step) and discard it
        fut_empty = len(sf) == 0
        xf_m = jnp.take(
            x_fut if not fut_empty else x_hist,
            sf if not fut_empty else sh[: min(len(sh), 8)],
            axis=-2,
        )
        oh, of = mbcn_correct(
            jnp.take(y_obs, so, axis=-2),
            jnp.take(x_hist, sh, axis=-2),
            xf_m,
            rotations,
            kinds=kinds,
            extrapolate=extrapolate,
            n_endpoints=n_endpoints,
        )
        parts_h.append(oh)
        idx_h.append(sh)
        if not fut_empty:
            parts_f.append(of)
            idx_f.append(sf)

    def assemble(parts, idx):
        cat = jnp.concatenate(parts, axis=-2)
        inv = np.argsort(np.concatenate(idx), kind="stable").astype(np.int32)
        return jnp.take(cat, jnp.asarray(inv), axis=-2)

    return assemble(parts_h, idx_h), assemble(parts_f, idx_f)


def mbcn_grid(
    y_obs,
    x_hist,
    x_fut,
    *,
    variables=None,
    n_iterations: int = 20,
    kind="difference",
    extrapolate="both",
    n_endpoints: int = 10,
    random_state: int = 0,
    group=None,
    cell_chunk_size: int | None = None,
    sharding=None,
):
    """Grid-level MBCn: joint correction over every valid cell of a grid.

    Parameters
    ----------
    y_obs, x_hist, x_fut : ``xlite.Dataset`` (or real xarray Dataset) of the
        SAME d variables on ``(time, *spatial)`` grids; the three time axes
        may differ, the spatial shapes must match.
    variables : explicit variable order (default: ``y_obs``'s order).
    cell_chunk_size : cap on cells per device pass (HBM budget at
        continental scale; each pass is one XLA program).
    sharding : optional ``NamedSharding`` with a leading cells axis — the
        packed ``(cells, time, d)`` blocks are placed with it so the
        rotation scan runs SPMD over the mesh.

    Returns ``(hist_out, fut_out)`` Datasets on the input grids; cells with
    any non-finite sample in any variable of any input stay NaN (the
    multivariate transform has no per-component masking).
    """
    variables = list(variables or y_obs.data_vars)
    d = len(variables)

    def pack(ds):
        first = ds[variables[0]]
        # keep the input dtype: float32 grids transfer half the bytes of a
        # float64 upcast and mbcn_correct computes in float32 on TPU anyway
        arrs = []
        for v in variables:
            a = np.asarray(ds[v].values)
            arrs.append(a if np.issubdtype(a.dtype, np.floating) else a.astype(np.float64))
        T = arrs[0].shape[0]
        spatial = arrs[0].shape[1:]
        flat = np.stack([a.reshape(T, -1) for a in arrs], axis=-1)  # (T, C, d)
        return np.moveaxis(flat, 0, 1), first, spatial  # (C, T, d)

    yo, _, sp_y = pack(y_obs)
    xh, da_h, sp_h = pack(x_hist)
    xf, da_f, sp_f = pack(x_fut)
    if not (sp_y == sp_h == sp_f):
        raise ValueError(f"spatial shapes differ: {sp_y} vs {sp_h} vs {sp_f}")
    valid = (
        np.isfinite(yo).all(axis=(1, 2))
        & np.isfinite(xh).all(axis=(1, 2))
        & np.isfinite(xf).all(axis=(1, 2))
    )
    ids = np.nonzero(valid)[0]
    rots = mbcn_rotations(d, int(n_iterations), int(random_state))
    kinds = (kind,) * d if isinstance(kind, str) else tuple(kind)

    out_h = np.full_like(xh, np.nan)
    out_f = np.full_like(xf, np.nan)
    step = len(ids) if not cell_chunk_size else int(cell_chunk_size)
    if group not in (None, "month"):
        raise ValueError(f"group must be None or 'month', got {group!r}")
    if group == "month":
        from ..utils.timeindex import TimeIndex

        def _months(ds):
            return np.asarray(TimeIndex.from_any(ds[variables[0]].coords["time"]).month)

        months_y, months_h, months_f = _months(y_obs), _months(x_hist), _months(x_fut)
    if sharding is not None:
        axis0 = sharding.spec[0]
        mult = int(sharding.mesh.shape[axis0]) if axis0 is not None else 1
    else:
        mult = 1
    for s in range(0, len(ids), max(step, 1)):
        sel = ids[s : s + step]
        pad = (-len(sel)) % mult
        # replicate cells (cycling) so every shard is populated
        fill = np.resize(np.arange(len(sel)), len(sel) + pad)
        blocks = []
        for a in (yo, xh, xf):
            b = jnp.asarray(a[sel][fill] if pad else a[sel])
            if sharding is not None:
                b = jax.device_put(b, sharding)
            blocks.append(b)
        if group == "month":
            oh, of = mbcn_correct_monthly(
                *blocks, months_y, months_h, months_f, rots,
                kinds=kinds, extrapolate=extrapolate, n_endpoints=n_endpoints,
            )
        else:
            oh, of = mbcn_correct(
                *blocks, rots, kinds=kinds, extrapolate=extrapolate, n_endpoints=n_endpoints
            )
        out_h[sel] = np.asarray(oh)[: len(sel)]
        out_f[sel] = np.asarray(of)[: len(sel)]

    def unpack(out, template, spatial):
        T = out.shape[1]
        real_xr = type(template).__module__.startswith("xarray")
        das = {}
        for j, v in enumerate(variables):
            field = np.moveaxis(out[:, :, j], 0, 1).reshape(T, *spatial)
            if real_xr:  # pragma: no cover - real-xarray images
                import xarray as xr

                das[v] = xr.DataArray(field, dims=template.dims, coords=template.coords)
            else:
                from skdownscale_tpu.xlite import DataArray as _DA

                das[v] = _DA(field, template.dims, dict(template.coords))
        if real_xr:  # pragma: no cover - real-xarray images
            import xarray as xr

            return xr.Dataset(das)
        from skdownscale_tpu.xlite import Dataset as _DS

        return _DS(das)

    return unpack(out_h, da_h, sp_h), unpack(out_f, da_f, sp_f)


class MBCn(SingleCellEstimator):
    """Multivariate (MBCn) bias correction, sklearn-style wrapper.

    ``fit(X, y)`` takes the model calibration block and the observations —
    both ``(n_samples, d)`` with the SAME d variables, lengths may differ —
    and ``predict(X)`` corrects a projection block jointly with the stored
    calibration data.  Column order defines variable identity.

    Parameters
    ----------
    n_iterations : rotation rounds (fixed count; static shapes under jit).
    kind : 'difference' / 'ratio' (all variables) or a sequence per column.
    extrapolate, n_endpoints : QDM margin CDF options (see
        ``QuantileMappingReressor``).
    group : None (whole-series) or 'month' — run the transform per calendar
        month (seasonal dependence structure); requires datetime-indexed
        inputs (a monthly-from-1950 index is fabricated for raw arrays,
        matching the zoo's convention).
    random_state : seed for the rotation stack.
    """

    _fit_attributes = ["x_hist_", "y_obs_", "rotations_", "n_features_in_"]
    # the obs record and the model calibration block may differ in length
    _allow_length_mismatch = True

    def __init__(
        self,
        n_iterations: int = 20,
        kind="difference",
        extrapolate="both",
        n_endpoints: int = 10,
        group=None,
        random_state: int = 0,
    ):
        self.n_iterations = n_iterations
        self.kind = kind
        self.extrapolate = extrapolate
        self.n_endpoints = n_endpoints
        self.group = group
        self.random_state = random_state

    def _kinds(self, d: int):
        if isinstance(self.kind, str):
            kinds = (self.kind,) * d
        else:
            kinds = tuple(self.kind)
        if len(kinds) != d or any(k not in ("difference", "ratio") for k in kinds):
            raise ValueError(
                f"kind must be 'difference'/'ratio' (or one per {d} columns), got {self.kind!r}"
            )
        return kinds

    def fit(self, X, y):
        X, y = self._validate_data(X, y=y)
        xa = asarray_2d(X)
        ya = asarray_2d(y)
        if not np.isfinite(xa).all():
            raise ValueError(
                "MBCn input X contains non-finite values; the multivariate "
                "transform has no per-component masking — drop those rows "
                "(grids: mbcn_grid masks whole cells)"
            )
        if ya.shape[1] != xa.shape[1]:
            raise ValueError(
                f"y has {ya.shape[1]} variables but X has {xa.shape[1]}; MBCn "
                "corrects the joint distribution of the same variable set"
            )
        self._kinds(xa.shape[1])  # validate early
        if self.group not in (None, "month"):
            raise ValueError(f"group must be None or 'month', got {self.group!r}")
        self.x_hist_ = np.asarray(xa, dtype=np.float64)
        self.y_obs_ = np.asarray(ya, dtype=np.float64)
        self.rotations_ = mbcn_rotations(xa.shape[1], int(self.n_iterations), int(self.random_state))
        self._columns = list(getattr(X, "columns", range(xa.shape[1])))
        if self.group == "month":
            self._months_hist = np.asarray(self._time_index(X).month)
            self._months_obs = np.asarray(self._time_index(y).month)
        return self

    def predict(self, X):
        self._check_is_fitted()
        X = self._validate_data(X, reset=False)
        xa = asarray_2d(X)
        if not np.isfinite(xa).all():
            raise ValueError(
                "MBCn input X contains non-finite values; the multivariate "
                "transform has no per-component masking — drop those rows "
                "(grids: mbcn_grid masks whole cells)"
            )
        common = dict(
            kinds=self._kinds(xa.shape[1]),
            extrapolate=self.extrapolate,
            n_endpoints=self.n_endpoints,
        )
        if self.group == "month":
            _, out = mbcn_correct_monthly(
                jnp.asarray(self.y_obs_),
                jnp.asarray(self.x_hist_),
                jnp.asarray(xa),
                self._months_obs,
                self._months_hist,
                np.asarray(self._time_index(X).month),
                self.rotations_,
                **common,
            )
        else:
            _, out = mbcn_correct(
                jnp.asarray(self.y_obs_),
                jnp.asarray(self.x_hist_),
                jnp.asarray(xa),
                self.rotations_,
                **common,
            )
        out = np.asarray(out)
        index = getattr(X, "index", None)
        if index is not None and hasattr(X, "columns"):
            import pandas as pd

            return pd.DataFrame(out, index=index, columns=self._columns)
        return out

    def transform(self, X=None):
        """Correct the calibration block itself (X ignored if given)."""
        self._check_is_fitted()
        out, _ = mbcn_correct(
            jnp.asarray(self.y_obs_),
            jnp.asarray(self.x_hist_),
            jnp.asarray(self.x_hist_),
            self.rotations_,
            kinds=self._kinds(self.x_hist_.shape[1]),
            extrapolate=self.extrapolate,
            n_endpoints=self.n_endpoints,
        )
        return np.asarray(out)
