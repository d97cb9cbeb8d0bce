"""BCSD bias correction, TPU-native.

Re-design of ``/root/reference/skdownscale/pointwise_models/bcsd.py``: the
reference keeps a Python dict of per-group ``QuantileMapper`` objects and
loops pandas groupbys; here a BCSD fit/predict is one fixed-shape batched
program over padded group tables (see :mod:`.grouped`) with an explicit
leading cell axis — group membership, counts, tail windows and label
lookups are host constants baked into the compiled program.

Grouping semantics preserved:

* monthly timestep (default ``MONTH_GROUPER``): fit/transform/climatology all
  partition by calendar month (``bcsd.py:46-57``);
* ``'daily_nasa-nex'``: fit groups are the +/-15-day padded day-of-year
  windows (``groupers.py:19-82``), while *predict-time* transform and
  climate-trend climatology removal group by day of month
  (``bcsd.py:51-53`` routing through ``climate_trend_grouper=DAY_GROUPER``)
  and look those keys up in the day-of-year-keyed tables — faithfully
  replicating the reference's key-space mixing;
* daily + ``return_anoms=True`` raises: the reference's climatology removal
  concatenates *overlapping* day groups and fails its own shape check
  (``bcsd.py:90-92`` / ``181-183``).

The 9-point centered climate-trend rolling mean (``bcsd.py:246-250``) runs as
a masked windowed convolution within month groups.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rolling import (
    grouped_rolling_matrix,
    rolling_mean_grouped_flat,
    use_rolling_matmul,
)
from ..utils.timeindex import PaddedGroups, TimeIndex, padded_doy_groups
from .base import SingleCellEstimator, asarray_2d
from .grouped import (
    GroupedCdf,
    gather_groups,
    grouped_qm_fit,
    grouped_qm_transform,
    scatter_groups,
)
from .streaming import build_stream_tables, streaming_qm_transform

__all__ = [
    "BcsdTemperature",
    "BcsdPrecipitation",
    "bcsd_fit",
    "bcsd_predict",
    "BcsdLazyState",
    "bcsd_fit_lazy",
    "bcsd_predict_streaming",
]


# ----------------------------------------------------------------------
# host-side grouping resolution
# ----------------------------------------------------------------------


def _pandas_partition(index, grouper) -> PaddedGroups:
    """Partition a time axis with any pandas-compatible grouper (callable,
    ``pd.Grouper``, ...) by running the groupby on host, mirroring
    ``df.groupby(self.time_grouper)`` (``bcsd.py:49``).

    A ``TimeIndex`` (non-pandas climate calendars: noleap/360_day/...) is
    partitioned directly: callable groupers are applied to the TimeIndex
    itself (``MONTH_GROUPER``/``DAY_GROUPER`` read the vectorized ``.month``
    / ``.day``), and month-resample strings ('M'/'MS'/'ME') group by
    calendar month.  Fit and predict must then both use TimeIndex (keys are
    plain ints, not pandas Periods).
    """
    if isinstance(index, TimeIndex):
        if callable(grouper):
            vals = np.asarray(grouper(index))
        elif isinstance(grouper, str) and grouper in ("M", "MS", "ME"):
            vals = np.asarray(index.month)
        else:
            raise TypeError(
                f"grouper {grouper!r} requires a pandas DatetimeIndex; with a "
                "TimeIndex use a callable (e.g. MONTH_GROUPER) or 'M'"
            )
        keys, labels = np.unique(vals, return_inverse=True)
        return PaddedGroups.from_labels(labels.astype(np.int32), keys)
    import pandas as pd

    s = pd.Series(np.arange(len(index)), index=index)
    labels = np.empty(len(index), dtype=np.int32)
    keys = []
    for i, (key, grp) in enumerate(s.groupby(grouper)):
        labels[grp.to_numpy()] = i
        keys.append(key)
    return PaddedGroups.from_labels(labels, np.asarray(keys))


class _PredictPlan(NamedTuple):
    """Host-side group structure for one (fit index, predict index) pair."""

    fit: PaddedGroups  # possibly overlapping (daily flavor)
    transform: PaddedGroups  # partition of the predict axis
    rolling: PaddedGroups  # partition of the predict axis (climate_trend)
    transform_to_fit: np.ndarray  # (Gt,) fit-row for each transform group
    shift_labels: np.ndarray  # (Tp,) fit-row per predict step (x-climo lookup)
    anom_labels: np.ndarray | None  # (Tp,) fit-row per predict step, None -> raise
    slide: Any = None  # models.slide.SlidePlan | None (daily sliding-sort path)

    def __hash__(self):
        return hash(
            (
                self.fit,
                self.transform,
                self.rolling,
                self.transform_to_fit.tobytes(),
                self.shift_labels.tobytes(),
                None if self.anom_labels is None else self.anom_labels.tobytes(),
                self.slide,
            )
        )

    def __eq__(self, other):
        if not isinstance(other, _PredictPlan):
            return NotImplemented
        return hash(self) == hash(other)


def _match_keys(src_keys, dst_keys, what: str) -> np.ndarray:
    lookup = {k: i for i, k in enumerate(np.asarray(dst_keys).tolist())}
    try:
        return np.array([lookup[k] for k in np.asarray(src_keys).tolist()], dtype=np.int32)
    except KeyError as e:  # a predict group with no fitted mapper
        raise KeyError(f"no fitted quantile mapper for {what} group {e}") from None


# ----------------------------------------------------------------------
# functional core (batch-native: arrays are (..., T))
# ----------------------------------------------------------------------


class BcsdState(NamedTuple):
    """Fitted BCSD state, stored in padding-friendly flat 2-D layout
    (see :mod:`.grouped` for the layout discipline).

    All per-cell tensors are 2-D: XLA tiles the two minor dims of an array
    to (8, 128), so a materialized (cells, G=12, L) tensor pads ~10x in HBM
    (the observed 1M-cell OOM).
    """

    pp: jnp.ndarray  # (G*L,) plotting positions (shared across cells)
    vals: jnp.ndarray  # (..., G*L) sorted per-group CDF values, flat
    aux: jnp.ndarray  # (..., 4*G): [trend_slope, trend_intercept, y_climo, x_climo]

    def unpack(self, G: int, L: int):
        a = self.aux.reshape(*self.aux.shape[:-1], 4, G)
        qm = GroupedCdf(self.pp, self.vals, a[..., 0, :], a[..., 1, :])
        return qm, a[..., 2, :], a[..., 3, :]  # qm, y_climo, x_climo


def _masked_group_mean(v, groups: PaddedGroups):
    G, L = groups.indices.shape
    g = gather_groups(v, groups, fill=0.0)  # (..., G*L)
    denom = jnp.asarray(np.maximum(groups.counts, 1), v.dtype)
    return jnp.sum(g.reshape(*g.shape[:-1], G, L), axis=-1) / denom


def bcsd_fit(
    x,
    y,
    fit_groups: PaddedGroups,
    *,
    with_x_climo: bool = True,
    alpha: float = 0.4,
    beta: float = 0.4,
    detrend: bool = False,
) -> BcsdState:
    """``BcsdTemperature.fit`` / ``BcsdPrecipitation.fit`` core
    (``bcsd.py:115-147``, ``197-228``): per-group climatologies + per-group
    quantile-mapper CDFs of the target.  ``x``/``y``: (..., T)."""
    y_climo = _masked_group_mean(y, fit_groups)
    if with_x_climo:
        x_climo = _masked_group_mean(x, fit_groups)
    else:
        x_climo = jnp.zeros_like(y_climo)
    qm = grouped_qm_fit(y, fit_groups, alpha=alpha, beta=beta, detrend=detrend)
    lead = y_climo.shape[:-1]
    G = fit_groups.n_groups
    aux = jnp.stack([qm.trend_slope, qm.trend_intercept, y_climo, x_climo], axis=-2)
    return BcsdState(qm.pp, qm.vals, aux.reshape(*lead, 4 * G))


def _climate_trend_rolled(x, plan: _PredictPlan, rolling_window: int, n: int):
    """The 9-point centered climate-trend rolling mean (``bcsd.py:246-250``),
    group-bounded by ``plan.rolling``.  On TPU/f32 at monthly scale the whole
    gather -> masked rolling mean -> inverse-perm scatter pipeline is one
    host-built ``(n, n)`` matrix applied on the MXU (the unrolled sublane-
    shifted form measured ~17% of peak HBM bandwidth — see
    :func:`..ops.rolling.grouped_rolling_matrix`); elsewhere the flat
    unrolled windowed sum runs as before."""
    if use_rolling_matmul(x.dtype, n):
        R = grouped_rolling_matrix(plan.rolling, rolling_window, n)
        if R is not None:
            return jax.lax.dot_general(
                x,
                jnp.asarray(R.T, x.dtype),
                (((x.ndim - 1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
    xg = gather_groups(x, plan.rolling, fill=0.0)  # (..., M*Lr)
    rolled_flat = rolling_mean_grouped_flat(
        xg, rolling_window, plan.rolling.mask, min_periods=1
    )
    return scatter_groups(rolled_flat, plan.rolling, n)


def bcsd_predict(
    state: BcsdState,
    x,
    plan: _PredictPlan,
    *,
    variable: str = "temperature",
    return_anoms: bool = True,
    alpha: float = 0.4,
    beta: float = 0.4,
    extrapolate="both",
    n_endpoints: int = 10,
    detrend: bool = False,
    rolling_window: int = 9,
):
    """``BcsdTemperature.predict`` (``bcsd.py:230-269``) /
    ``BcsdPrecipitation.predict`` (``bcsd.py:149-170``) core.  ``x``: (..., T).
    """
    n = x.shape[-1]
    t2f = plan.transform_to_fit
    G, L = plan.fit.indices.shape
    qm, y_climo, x_climo = state.unpack(G, L)
    # align fit-group CDFs/metadata to the transform partition's rows —
    # a flat static column gather (host-computed indices, stays 2-D)
    aligned_cols = (t2f[:, None] * L + np.arange(L)).reshape(-1)
    qm_aligned = GroupedCdf(
        qm.pp[aligned_cols],
        qm.vals[..., aligned_cols],
        qm.trend_slope[..., t2f],
        qm.trend_intercept[..., t2f],
    )
    fit_counts_aligned = plan.fit.counts[t2f]
    fit_valid_aligned = plan.fit.mask[t2f].reshape(-1)

    if variable == "temperature":
        # 9-point centered rolling mean within each climate-trend group
        rolled = _climate_trend_rolled(x, plan, rolling_window, n)
        # remove climatology from the climate trend (bcsd.py:253)
        x_shift = rolled - x_climo[..., plan.shift_labels]
        x_no_shift = x - x_shift
    else:
        x_shift = jnp.zeros_like(x)
        x_no_shift = x

    xqm = grouped_qm_transform(
        qm_aligned,
        fit_counts_aligned,
        fit_valid_aligned,
        x_no_shift,
        plan.transform,
        alpha=alpha,
        beta=beta,
        extrapolate=extrapolate,
        n_endpoints=n_endpoints,
        detrend=detrend,
    )

    anom = plan.anom_labels if plan.anom_labels is not None else plan.shift_labels
    if variable == "temperature":
        out = x_shift + xqm  # restore the climate trend (bcsd.py:263)
        if return_anoms:
            out = out - y_climo[..., anom]
    else:
        out = xqm
        if return_anoms:
            out = out / y_climo[..., anom]  # ratio anomalies (bcsd.py:172-185)
    return out


# ----------------------------------------------------------------------
# streaming (group-chunked) variant — raises the daily-flavor cells/pass
# ceiling ~20x and removes the monthly 262k-cell predict chunking
# ----------------------------------------------------------------------


class BcsdLazyState(NamedTuple):
    """Deferred BCSD fit state: raw target series + per-group climatologies.

    The daily flavor's 366 overlapping ±15-day windows expand the training
    series 27x, so materializing every per-group CDF at fit time (as
    :class:`BcsdState` does) caps a single pass near ~3k cells.  Instead the
    fit stores the raw series; predict computes only the fit rows its
    transform partition actually consults (31 of 366 in the daily flavor —
    the reference's day-of-month/day-of-year key mixing, ``bcsd.py:51-53``),
    chunk by chunk.
    """

    y: jnp.ndarray  # (..., T_fit) raw target series
    aux: jnp.ndarray  # (..., 2*G): [y_climo, x_climo]

    def unpack(self, G: int):
        a = self.aux.reshape(*self.aux.shape[:-1], 2, G)
        return a[..., 0, :], a[..., 1, :]  # y_climo, x_climo


def _membership_matrix(groups: PaddedGroups, n: int, dtype=np.float64) -> np.ndarray:
    """Host (n, G) mean-pooling matrix: column g averages group g's members
    (column sums to 1; overlapping groups allowed)."""
    G, L = groups.indices.shape
    M = np.zeros((n, G), dtype)
    inv = 1.0 / np.maximum(groups.counts, 1)
    for g in range(G):
        np.add.at(M[:, g], groups.indices[g][groups.mask[g]], inv[g])
    return M


def bcsd_fit_lazy(
    x, y, fit_groups: PaddedGroups, *, with_x_climo: bool = True
) -> BcsdLazyState:
    """Deferred-CDF BCSD fit: only the per-group climatologies
    (``bcsd.py:219-223``) are computed — as one mean-pooling matmul instead
    of the 27x window gather — and the raw target is carried as state."""
    M = jnp.asarray(_membership_matrix(fit_groups, y.shape[-1]), y.dtype)
    y_climo = jnp.matmul(y, M, precision=jax.lax.Precision.HIGHEST)
    if with_x_climo:
        x_climo = jnp.matmul(x, M, precision=jax.lax.Precision.HIGHEST)
    else:
        x_climo = jnp.zeros_like(y_climo)
    aux = jnp.stack([y_climo, x_climo], axis=-2)
    return BcsdLazyState(y, aux.reshape(*y_climo.shape[:-1], -1))


def bcsd_predict_streaming(
    state,
    x,
    plan: _PredictPlan,
    *,
    variable: str = "temperature",
    return_anoms: bool = True,
    alpha: float = 0.4,
    beta: float = 0.4,
    extrapolate="both",
    n_endpoints: int = 10,
    detrend: bool = False,
    rolling_window: int = 9,
    group_chunk: int = 8,
    precomputed_svals=None,
):
    """``bcsd_predict`` with the grouped QM transform run as a ``lax.scan``
    over transform-group chunks (see :mod:`.streaming`).  Accepts either a
    dense :class:`BcsdState` (pre-sorted group CDFs) or a
    :class:`BcsdLazyState` (windows gathered+sorted in-chunk).

    ``precomputed_svals``: consulted-window sorted values from
    :func:`..ops.pallas.slide_sort_kernel.slide_sorted_windows`, computed in
    a SEPARATE jit — jitting the slide kernel together with the scan
    triggers an XLA mega-fusion pathology (measured 9.5 s vs 0.6 s split at
    32k cells; same failure mode as the fused fit+predict note in
    CLAUDE.md).  Use :func:`_jit_predict_stream`, which splits the two."""
    n = x.shape[-1]
    G, L = plan.fit.indices.shape
    lazy = isinstance(state, BcsdLazyState)
    fit_tab, t2f_tab = plan.fit, plan.transform_to_fit
    if lazy:
        y_climo, x_climo = state.unpack(G)
        source, presorted, state_trend = state.y, False, None
        # sliding-sorted-window fast path: adjacent consulted DOY windows
        # share ~30/31 members, so sort window 0 once and slide it with the
        # Pallas kernel instead of re-sorting every window in the scan
        # (same svals bit-for-bit; see ops/pallas/slide_sort_kernel.py)
        if plan.slide is not None and not detrend:
            svals = precomputed_svals
            if svals is None and _slide_gate(x.dtype)[0]:
                # direct callers (tests force via rowsort.override); prefer
                # _jit_predict_stream on TPU — see precomputed_svals above
                from ..ops.pallas.slide_sort_kernel import slide_sorted_windows

                svals = slide_sorted_windows(
                    state.y,
                    plan.slide,
                    n_rows=_slide_n_rows(plan, group_chunk),
                    interpret=_slide_gate(x.dtype)[1],
                )
            if svals is not None:
                from .slide import consulted_groups

                # svals is already FLAT (..., n_rows*Lto) — the kernel pads
                # each window row to the sublane tile and the trailing rows
                # to a chunkable width, so the scan slices windows
                # contiguously (no reshape copy, no gather; the 3-D
                # round-trip was a ~5 GB copy at 65k cells)
                source = svals.astype(x.dtype)
                presorted = True
                fit_tab = consulted_groups(plan.fit, plan.slide)
                t2f_tab = np.searchsorted(
                    plan.slide.consulted, plan.transform_to_fit
                ).astype(np.int32)
    else:
        qm, y_climo, x_climo = state.unpack(G, L)
        source, presorted = qm.vals, True
        state_trend = (qm.trend_slope, qm.trend_intercept)

    if variable == "temperature":
        rolled = _climate_trend_rolled(x, plan, rolling_window, n)
        x_shift = rolled - x_climo[..., plan.shift_labels]
        x_no_shift = x - x_shift
    else:
        x_shift = jnp.zeros_like(x)
        x_no_shift = x

    tables = build_stream_tables(
        fit_tab,
        plan.transform,
        t2f_tab,
        alpha=alpha,
        beta=beta,
        n_endpoints=n_endpoints,
        group_chunk=group_chunk,
        source="state" if presorted else "raw",
    )
    # fold the additive terms (restore climate trend, remove target
    # climatology) into the scan's output carry — saves live (C, T) buffers
    anom = plan.anom_labels if plan.anom_labels is not None else plan.shift_labels
    if variable == "temperature":
        out_init = x_shift
        if return_anoms:
            out_init = out_init - y_climo[..., anom]
    else:
        out_init = None
    out = streaming_qm_transform(
        source,
        x_no_shift,
        tables,
        n,
        presorted=presorted,
        extrapolate=extrapolate,
        detrend=detrend,
        state_trend=state_trend,
        out_init=out_init,
    )
    if variable != "temperature" and return_anoms:
        out = out / y_climo[..., anom]  # ratio anomalies (bcsd.py:172-185)
    return out


@functools.lru_cache(maxsize=128)
def _jit_fit_lazy(fit_groups: PaddedGroups, with_x_climo: bool):
    return jax.jit(lambda x, y: bcsd_fit_lazy(x, y, fit_groups, with_x_climo=with_x_climo))


def _slide_gate(dtype):
    """(use, interpret) for the sliding-window kernel — the rowsort
    override (tests) or the TPU/f32 platform gate."""
    from ..ops import rowsort as _rs
    from ..ops.pallas.slide_sort_kernel import use_slide_kernel

    if _rs._OVERRIDE is not None:
        return _rs._OVERRIDE
    return use_slide_kernel(dtype), False


def _slide_n_rows(plan: _PredictPlan, group_chunk: int) -> int:
    """Slide output rows padded to the scan's chunk grid (NC*Gc transform
    groups), so chunk ``c`` can slice windows ``[c*Gc, (c+1)*Gc)`` straight
    out of the flat svals (see ``streaming_qm_transform`` contiguity)."""
    Gt = plan.transform.indices.shape[0]
    Gc = min(group_chunk, Gt)
    return -(-Gt // Gc) * Gc


class _StreamPredictor:
    """Callable wrapper running the daily predict as TWO jits: the sliding
    sorted-window kernel first, then the scan consuming its output.  One
    fused jit containing both Pallas kernels hits an XLA scheduling
    pathology (9.5 s vs 0.6 s split at 32k cells on-chip); splitting is the
    same cure as the fit/predict jit split documented in CLAUDE.md."""

    def __init__(self, plan: _PredictPlan, kw: dict):
        self._plan = plan
        self._kw = kw
        self._inner = jax.jit(
            lambda state, x, svals: bcsd_predict_streaming(
                state, x, plan, precomputed_svals=svals, **kw
            )
        )
        from ..ops.pallas.slide_sort_kernel import slide_sorted_windows

        self._slide = jax.jit(
            slide_sorted_windows, static_argnames=("plan", "n_rows", "interpret")
        )

    def _svals(self, state, x):
        if (
            self._plan.slide is None
            or self._kw["detrend"]
            or not isinstance(state, BcsdLazyState)
        ):
            return None
        use, interp = _slide_gate(x.dtype)
        if not use:
            return None
        return self._slide(
            state.y,
            plan=self._plan.slide,
            n_rows=_slide_n_rows(self._plan, self._kw["group_chunk"]),
            interpret=interp,
        )

    @staticmethod
    def _strip_y(state, svals):
        """Once the slide kernel has produced svals, the scan never reads the
        raw fit series again — replace ``state.y`` with a zero-width slice so
        its HBM (0.9 GB per 32k cells at 20 y daily) can be freed while the
        scan runs.  The caller must also drop its own reference to the fat
        state for the free to happen (see bench.py / ROUND_NOTES r3 gap #6);
        this raises the measured single-pass daily ceiling from 32k cells."""
        if svals is None:
            return state
        return state._replace(y=state.y[..., :0])

    def __call__(self, state, x):
        svals = self._svals(state, x)
        return self._inner(self._strip_y(state, svals), x, svals)

    def lowered_parts(self, state, x):
        """Lowered stages (for bytes-accessed roofline accounting)."""
        svals = self._svals(state, x)
        parts = [self._inner.lower(self._strip_y(state, svals), x, svals)]
        if svals is not None:
            parts.append(
                self._slide.lower(
                    state.y,
                    plan=self._plan.slide,
                    n_rows=_slide_n_rows(self._plan, self._kw["group_chunk"]),
                    interpret=False,
                )
            )
        return parts

    def lower(self, state, x):  # bench/back-compat: the scan stage
        svals = self._svals(state, x)
        return self._inner.lower(self._strip_y(state, svals), x, svals)


@functools.lru_cache(maxsize=128)
def _jit_predict_stream(
    plan: _PredictPlan, variable, return_anoms, alpha, beta, extrapolate, n_endpoints, detrend, group_chunk
):
    return _StreamPredictor(
        plan,
        dict(
            variable=variable,
            return_anoms=return_anoms,
            alpha=alpha,
            beta=beta,
            extrapolate=extrapolate,
            n_endpoints=n_endpoints,
            detrend=detrend,
            group_chunk=group_chunk,
        ),
    )


@functools.lru_cache(maxsize=128)
def _jit_fit(fit_groups: PaddedGroups, with_x_climo: bool, alpha, beta, detrend):
    return jax.jit(
        lambda x, y: bcsd_fit(
            x, y, fit_groups, with_x_climo=with_x_climo, alpha=alpha, beta=beta, detrend=detrend
        )
    )


@functools.lru_cache(maxsize=128)
def _jit_predict(plan: _PredictPlan, variable, return_anoms, alpha, beta, extrapolate, n_endpoints, detrend):
    return jax.jit(
        lambda state, x: bcsd_predict(
            state,
            x,
            plan,
            variable=variable,
            return_anoms=return_anoms,
            alpha=alpha,
            beta=beta,
            extrapolate=extrapolate,
            n_endpoints=n_endpoints,
            detrend=detrend,
        )
    )


# ----------------------------------------------------------------------
# sklearn-compatible wrappers
# ----------------------------------------------------------------------


def MONTH_GROUPER(x):
    """``groupers.py:11-12``."""
    return x.month


def DAY_GROUPER(x):
    """``groupers.py:15-16``."""
    return x.day


class BcsdBase(SingleCellEstimator):
    """Shared plumbing for the BCSD wrappers (API of ``bcsd.py:14-93``)."""

    _fit_attributes = ["y_climo_", "quantile_mappers_"]
    _timestep = "MS"
    _with_x_climo = True

    def __init__(
        self,
        time_grouper=MONTH_GROUPER,
        climate_trend_grouper=DAY_GROUPER,
        climate_trend=MONTH_GROUPER,
        return_anoms: bool = True,
        qm_kwargs: dict[str, Any] | None = None,
    ):
        self.time_grouper = time_grouper
        self.climate_trend_grouper = climate_trend_grouper
        self.climate_trend = climate_trend
        self.return_anoms = return_anoms
        self.qm_kwargs = qm_kwargs

    # -- config ---------------------------------------------------------
    @property
    def _timestep_kind(self) -> str:
        if isinstance(self.time_grouper, str):
            if self.time_grouper == "daily_nasa-nex":
                return "daily"
            raise ValueError(
                "string frequency time_groupers are not supported (the reference "
                "passes them uninterpreted to pandas.groupby, bcsd.py:49); use a "
                "callable, a pd.Grouper, or 'daily_nasa-nex'"
            )
        return "monthly"

    def _qm_params(self):
        kw = dict(self.qm_kwargs or {})
        qt = dict(kw.get("qt_kwargs") or {})
        return {
            "detrend": bool(kw.get("detrend", False)),
            "alpha": qt.get("alpha", 0.4),
            "beta": qt.get("beta", 0.4),
            "extrapolate": qt.get("extrapolate", "both"),
            "n_endpoints": qt.get("n_endpoints", 10),
        }

    # -- host-side group resolution ------------------------------------
    def _fit_groups(self, index) -> PaddedGroups:
        if self._timestep_kind == "daily":
            return padded_doy_groups(TimeIndex.from_any(index), offset=15)
        return _pandas_partition(index, self.time_grouper)

    def _predict_plan(self, fit_groups: PaddedGroups, index) -> _PredictPlan:
        if self._timestep_kind == "daily":
            transform = _pandas_partition(index, self.climate_trend_grouper)
            anom_labels = None  # reference raises on overlapping-group climatology
        else:
            transform = _pandas_partition(index, self.time_grouper)
            anom_labels = None  # filled below from transform labels
        rolling = _pandas_partition(index, self.climate_trend)
        t_to_fit = _match_keys(transform.keys, fit_groups.keys, "transform")
        shift_labels = t_to_fit[transform.labels]
        slide = None
        if self._timestep_kind == "monthly":
            anom_labels = shift_labels
        else:
            from .slide import build_slide_plan

            slide = build_slide_plan(fit_groups, t_to_fit)
        return _PredictPlan(
            fit_groups, transform, rolling, t_to_fit, shift_labels, anom_labels, slide
        )

    # -- API ------------------------------------------------------------
    def fit(self, X, y):
        X, y = self._validate_data(X, y)
        Xa, ya = asarray_2d(X), asarray_2d(y)
        if Xa.shape[1] != 1:
            raise ValueError(f"BCSD only supports 1 feature, found {Xa.shape[1]}")
        index = self._pandas_index(X, len(Xa))
        fg = self._fit_groups(index)
        p = self._qm_params()
        fit = _jit_fit(fg, self._with_x_climo, p["alpha"], p["beta"], p["detrend"])
        state = fit(jnp.asarray(Xa[:, 0]), jnp.asarray(ya[:, 0]))
        G, L = fg.indices.shape
        _, y_climo, _ = state.unpack(G, L)
        if self._with_x_climo is False and self.return_anoms:
            if float(np.min(np.asarray(y_climo))) <= 0:
                raise ValueError("Invalid value in target climatology")  # bcsd.py:140-141
        self._state = jax.tree_util.tree_map(np.asarray, state)
        self._fit_groups_ = fg
        self._fit_index_ = index
        self.y_climo_ = np.asarray(y_climo)
        # functional per-group mappers (reference: dict of fitted
        # QuantileMapper objects, bcsd.py:59-67), viewing slices of ._state
        from .quantile import CunnaneTransformer, QuantileMapper
        from ..ops.cdf import Cdf

        self.quantile_mappers_ = {}
        vals2 = np.asarray(state.vals).reshape(G, L)
        pp2 = np.asarray(state.pp).reshape(G, L)
        for g, key in enumerate(np.asarray(fg.keys).tolist()):
            c = int(fg.counts[g])
            mapper = QuantileMapper(**dict(self.qm_kwargs or {}))
            qt = CunnaneTransformer(
                alpha=p["alpha"], beta=p["beta"],
                extrapolate=p["extrapolate"], n_endpoints=p["n_endpoints"],
            )
            qt.cdf_ = Cdf(pp2[g, :c].copy(), vals2[g, :c].copy())
            mapper.x_cdf_fit_ = qt
            mapper._state = None  # views only; fitted via the batched core
            self.quantile_mappers_[key] = mapper
        return self

    def predict(self, X):
        self._check_is_fitted()
        X = self._validate_data(X, reset=False)
        Xa = asarray_2d(X)
        index = self._pandas_index(X, len(Xa))
        plan = self._predict_plan(self._fit_groups_, index)
        if self.return_anoms and plan.anom_labels is None:
            raise ValueError(
                "Result shape does not match input shape (daily BCSD with "
                "return_anoms=True replicates the reference's overlapping-group "
                "climatology failure, bcsd.py:90-92)"
            )
        p = self._qm_params()
        state = BcsdState(*[jnp.asarray(a) for a in self._state])
        pred = _jit_predict(
            plan,
            "temperature" if self._with_x_climo else "precipitation",
            bool(self.return_anoms),
            p["alpha"],
            p["beta"],
            p["extrapolate"],
            p["n_endpoints"],
            p["detrend"],
        )
        out = np.asarray(pred(state, jnp.asarray(Xa[:, 0])))
        if hasattr(X, "iloc"):
            import pandas as pd

            cols = list(X.columns) if hasattr(X, "columns") else [0]
            return pd.DataFrame(out.reshape(-1, 1), index=X.index, columns=cols)
        return out.reshape(-1, 1)

    def _pandas_index(self, X, n):
        import pandas as pd

        if hasattr(X, "index") and isinstance(X.index, pd.DatetimeIndex):
            return X.index
        import warnings

        warnings.warn("X does not have a pandas DateTimeIndex, making one up...")
        return pd.date_range(start="1950", periods=n, freq=self._timestep)


class BcsdTemperature(BcsdBase):
    """Classic BCSD for temperature (``bcsd.py:196-289``): quantile-map the
    9-year climate-trend-removed series, restore the trend, and optionally
    return anomalies vs the target climatology."""

    _with_x_climo = True


class BcsdPrecipitation(BcsdBase):
    """Classic BCSD for precipitation (``bcsd.py:96-193``): per-group quantile
    mapping followed by ratio anomalies vs a strictly-positive target
    climatology."""

    _with_x_climo = False
