"""Ragged-group quantile mapping under fixed XLA shapes — batch-native.

BCSD fits one ``QuantileMapper`` per time group — months have 28–31 days and
training records have varying lengths, so group CDFs are *ragged*
(``/root/reference/skdownscale/pointwise_models/bcsd.py:59-79``).  The
reference loops a Python dict of mapper objects; here every group lives in a
padded ``(G, L)`` table and the Cunnane transform / inverse run on all groups
of all cells at once.

Group structure (:class:`~skdownscale_tpu.utils.timeindex.PaddedGroups`) is
*host* metadata: membership indices, masks and counts are numpy arrays baked
into the compiled program as constants, so every gather/slice is static —
no dynamic-slice lowering, and tail windows are precomputed index tables.
All functions take arrays with arbitrary leading batch (cell) dims; the
group axis is explicit (no outer vmap needed), which lets the hot interp run
through the fused Pallas kernel (:mod:`..ops.pallas.interp_kernel`).

Padding conventions (see ``ops.interp.pad_table``): sorted value tables pad
with ``+inf``; plotting-position tables repeat their last valid entry.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops.interp import interp_rows
from ..ops.regression import ols_1d
from ..utils.timeindex import PaddedGroups

__all__ = [
    "GroupedCdf",
    "gather_groups",
    "scatter_groups",
    "cunnane_fit_padded",
    "cunnane_transform_padded",
    "cunnane_inverse_padded",
    "grouped_qm_fit",
    "grouped_qm_transform",
]


class GroupedCdf(NamedTuple):
    """Per-group Cunnane CDFs.

    ``vals``: (..., G, L) sorted ascending, +inf padded; ``pp``: (G, L)
    plotting positions (shared across batch; pads repeat the last valid).
    Trend fields are zeros unless fit with ``detrend=True``.
    """

    pp: jnp.ndarray  # (G, L)
    vals: jnp.ndarray  # (..., G, L)
    trend_slope: jnp.ndarray  # (..., G)
    trend_intercept: jnp.ndarray  # (..., G)


def gather_groups(x, groups: PaddedGroups, fill=jnp.inf):
    """Gather ``x`` (..., T) into padded group rows (..., G, L)."""
    g = x[..., groups.indices]  # static gather: indices are host constants
    return jnp.where(jnp.asarray(groups.mask), g, fill)


def scatter_groups(vals, groups: PaddedGroups, n: int):
    """Scatter padded group rows (..., G, L) back to (..., n) (partition
    groups: each time index appears in exactly one (group, slot))."""
    contrib = jnp.where(jnp.asarray(groups.mask), vals, 0.0)
    flat_idx = groups.indices.reshape(-1)
    lead = vals.shape[:-2]
    out = jnp.zeros((*lead, n), vals.dtype)
    return out.at[..., flat_idx].add(contrib.reshape(*lead, -1))


def _padded_pp(groups: PaddedGroups, alpha: float, beta: float) -> np.ndarray:
    """Host-computed Cunnane plotting positions per group; padding repeats
    the last valid position (monotone table with zero pad slope)."""
    G, L = groups.indices.shape
    i = np.arange(1, L + 1, dtype=np.float64)[None, :]
    n = groups.counts.astype(np.float64)[:, None]
    return (np.minimum(i, np.maximum(n, 1)) - alpha) / (n + 1.0 - alpha - beta)


def _masked_trend(xg, groups: PaddedGroups):
    """Per-group linear trend vs within-group position (masked OLS against
    ``arange``), matching ``LinearTrendTransformer`` fit on each group's
    sub-frame (``quantile.py:97``)."""
    L = xg.shape[-1]
    t = jnp.arange(L, dtype=xg.dtype)
    w = jnp.asarray(groups.mask, xg.dtype)
    slope, intercept = ols_1d(t, jnp.where(jnp.asarray(groups.mask), xg, 0.0), w)
    return slope, intercept


def _trend_line(slope, intercept, L: int, dtype):
    t = jnp.arange(L, dtype=dtype)
    return slope[..., None] * t + intercept[..., None]


def cunnane_fit_padded(
    xg, groups: PaddedGroups, *, alpha: float = 0.4, beta: float = 0.4, detrend: bool = False
) -> GroupedCdf:
    """Fit per-group Cunnane CDFs from padded group rows (..., G, L)."""
    dtype = xg.dtype
    lead = xg.shape[:-2]
    if detrend:
        slope, intercept = _masked_trend(xg, groups)
        xg = xg - _trend_line(slope, intercept, xg.shape[-1], dtype)
    else:
        slope = jnp.zeros((*lead, groups.n_groups), dtype)
        intercept = jnp.zeros((*lead, groups.n_groups), dtype)
    vals = jnp.sort(jnp.where(jnp.asarray(groups.mask), xg, jnp.inf), axis=-1)
    pp = jnp.asarray(_padded_pp(groups, alpha, beta), dtype)
    return GroupedCdf(pp, vals, slope, intercept)


def _tail_windows(counts: np.ndarray, L: int, n_endpoints: int):
    """Host-precomputed tail-window column indices and 0/1 weights."""
    ne = min(n_endpoints, L)
    G = len(counts)
    j = np.arange(ne)[None, :]
    w_lo = (j < counts[:, None]).astype(np.float64)  # first ne valid knots
    start = np.maximum(counts - ne, 0)[:, None]
    hi_cols = (start + j).astype(np.int64)  # last ne valid knots
    w_hi = ((start + j) < counts[:, None]).astype(np.float64)
    return ne, w_lo, hi_cols, w_hi


def _cunnane_map_rows(q, table_x, table_y, counts: np.ndarray, extrapolate, n_endpoints: int):
    """Shared ragged kernel for transform (vals->pp) and inverse (pp->vals):
    semantics of ``quantile.py:485-503`` / ``523-545`` on padded tables.

    ``q``: (..., G, Q); ``table_x``/``table_y``: (..., G, L) (or (G, L));
    ``counts``: host (G,).
    """
    dtype = q.dtype
    lead = q.shape[:-2]
    G, L = table_x.shape[-2:]
    if table_x.ndim < q.ndim:
        table_x = jnp.broadcast_to(table_x, (*lead, G, L))
    if table_y.ndim < q.ndim:
        table_y = jnp.broadcast_to(table_y, (*lead, G, L))
    res = interp_rows(table_x, table_y, q)

    if extrapolate in ("min", "max", "both"):
        ne, w_lo, hi_cols, w_hi = _tail_windows(counts, L, n_endpoints)
        g_idx = np.arange(G)[:, None]
        lo_edge = table_x[..., :, 0:1]
        hi_edge = table_x[..., g_idx[:, 0], np.maximum(counts - 1, 0)][..., None]
        if extrapolate in ("min", "both"):
            lo_s, lo_i = ols_1d(
                table_x[..., :ne], table_y[..., :ne], jnp.asarray(w_lo, dtype)
            )
            res = jnp.where(q < lo_edge, lo_i[..., None] + lo_s[..., None] * q, res)
        if extrapolate in ("max", "both"):
            hx = table_x[..., g_idx, hi_cols]  # (..., G, ne) static gather
            hy = table_y[..., g_idx, hi_cols]
            hi_s, hi_i = ols_1d(hx, hy, jnp.asarray(w_hi, dtype))
            res = jnp.where(q > hi_edge, hi_i[..., None] + hi_s[..., None] * q, res)
    return res


def cunnane_transform_padded(
    cdf: GroupedCdf, xg, counts: np.ndarray, extrapolate="both", n_endpoints: int = 10
):
    """values -> plotting positions per group; ``xg``: (..., G, Q)."""
    return _cunnane_map_rows(xg, cdf.vals, cdf.pp, counts, extrapolate, n_endpoints)


def cunnane_inverse_padded(
    cdf: GroupedCdf, qg, counts: np.ndarray, mask_valid: np.ndarray, extrapolate="both", n_endpoints: int = 10
):
    """plotting positions -> values per group; ``qg``: (..., G, Q).

    Builds the (pp -> vals) direction tables: pp pads to +inf, vals pads to
    the last valid value (monotone + zero pad slope).
    """
    valid = jnp.asarray(mask_valid)
    pp_tab = jnp.where(valid, cdf.pp, jnp.inf)
    v_last = jnp.max(jnp.where(valid, cdf.vals, -jnp.inf), axis=-1, keepdims=True)
    vals_tab = jnp.where(valid, cdf.vals, v_last)
    return _cunnane_map_rows(qg, pp_tab, vals_tab, counts, extrapolate, n_endpoints)


def grouped_qm_fit(
    y,
    groups: PaddedGroups,
    *,
    alpha: float = 0.4,
    beta: float = 0.4,
    detrend: bool = False,
) -> GroupedCdf:
    """``BcsdBase._qm_fit_by_group`` (``bcsd.py:59-67``): one QuantileMapper
    CDF per padded group of ``y`` (..., T)."""
    yg = gather_groups(y, groups, fill=0.0)
    return cunnane_fit_padded(yg, groups, alpha=alpha, beta=beta, detrend=detrend)


def grouped_qm_transform(
    fit_cdf: GroupedCdf,
    fit_counts: np.ndarray,
    fit_valid: np.ndarray,
    x,
    groups: PaddedGroups,
    *,
    alpha: float = 0.4,
    beta: float = 0.4,
    extrapolate="both",
    n_endpoints: int = 10,
    detrend: bool = False,
):
    """``BcsdBase._qm_transform_by_group`` (``bcsd.py:69-79``) on padded
    partition groups: per group, build a fresh CDF of the new values,
    transform to plotting positions, then inverse through the stored fit CDF
    (rows pre-aligned to ``groups``); scatter back to (..., len(x)).

    ``fit_counts``/``fit_valid``: host count vector / (G, L) validity mask of
    the *fit* tables (aligned to this partition's rows).
    """
    dtype = x.dtype
    xg_raw = gather_groups(x, groups, fill=0.0)
    if detrend:
        slope, intercept = _masked_trend(xg_raw, groups)
        xg = xg_raw - _trend_line(slope, intercept, xg_raw.shape[-1], dtype)
    else:
        xg = xg_raw
    fresh = cunnane_fit_padded(xg, groups, alpha=alpha, beta=beta, detrend=False)
    pps = cunnane_transform_padded(fresh, xg, groups.counts, extrapolate, n_endpoints)
    mapped = cunnane_inverse_padded(fit_cdf, pps, fit_counts, fit_valid, extrapolate, n_endpoints)
    if detrend:
        mapped = mapped + _trend_line(slope, intercept, xg.shape[-1], dtype)
        # intercept-bias reset (quantile.py:145)
        mapped = mapped - (intercept[..., None] - fit_cdf.trend_intercept[..., None])
    return scatter_groups(mapped, groups, x.shape[-1])
