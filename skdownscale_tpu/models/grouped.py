"""Ragged-group quantile mapping under fixed XLA shapes — flat-2D layout.

BCSD fits one ``QuantileMapper`` per time group — months have 28–31 days and
training records have varying lengths, so group CDFs are *ragged*
(``/root/reference/skdownscale/pointwise_models/bcsd.py:59-79``).  The
reference loops a Python dict of mapper objects; here every group lives in a
padded table and the Cunnane transform / inverse run on all groups of all
cells at once.

Layout discipline: XLA tiles the two minor dims of an array to (8, 128), so
a materialized (cells, G, L) tensor pads up to ~10x in HBM (the 1M-cell OOM
of round 1).  All *materialized* group tensors here are therefore flat 2-D
``(cells, G*L)``; 3-D ``(cells, G, L)`` shapes exist only as reshape views
between fused elementwise ops.  Per-group sorting — the one op that must
materialize — reshapes to 2-D ``(cells*G, L)`` rows (short O(L log L)
sorts on a near-unpadded buffer), with +inf pads falling to each group's
tail.

Group structure (:class:`~skdownscale_tpu.utils.timeindex.PaddedGroups`) is
*host* metadata baked into the compiled program, so every gather/slice is
static.  All functions take arrays with arbitrary leading batch (cell) dims.

Padding conventions (see ``ops.interp.pad_table``): sorted value tables pad
with ``+inf``; plotting-position tables repeat their last valid entry.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import interp_rows
from ..ops.ranks import self_quantiles
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
    """Per-group Cunnane CDFs in flat layout.

    ``vals``: (..., G*L) sorted ascending within each group, +inf padded;
    ``pp``: (G*L,) plotting positions (shared across batch; pads repeat the
    last valid).  Trend fields are zeros unless fit with ``detrend=True``.
    """

    pp: jnp.ndarray  # (G*L,)
    vals: jnp.ndarray  # (..., G*L)
    trend_slope: jnp.ndarray  # (..., G)
    trend_intercept: jnp.ndarray  # (..., G)


def gather_groups(x, groups: PaddedGroups, fill=jnp.inf):
    """Gather ``x`` (..., T) into flat padded group rows (..., G*L)."""
    flat_idx = groups.indices.reshape(-1)  # host constant
    g = x[..., flat_idx]  # static gather, 2-D output
    return jnp.where(jnp.asarray(groups.mask.reshape(-1)), g, fill)


def scatter_groups(vals_flat, groups: PaddedGroups, n: int):
    """Scatter flat padded group rows (..., G*L) back to (..., n) (partition
    groups: each time index appears in exactly one (group, slot))."""
    contrib = jnp.where(jnp.asarray(groups.mask.reshape(-1)), vals_flat, 0.0)
    flat_idx = groups.indices.reshape(-1)
    lead = vals_flat.shape[:-1]
    out = jnp.zeros((*lead, n), vals_flat.dtype)
    return out.at[..., flat_idx].add(contrib)


def _padded_pp(groups: PaddedGroups, alpha: float, beta: float) -> np.ndarray:
    """Host-computed Cunnane plotting positions per group, flat (G*L,);
    padding repeats the last valid position (monotone table with zero pad
    slope)."""
    G, L = groups.indices.shape
    i = np.arange(1, L + 1, dtype=np.float64)[None, :]
    n = groups.counts.astype(np.float64)[:, None]
    pp = (np.minimum(i, np.maximum(n, 1)) - alpha) / (n + 1.0 - alpha - beta)
    return pp.reshape(-1)


def _sort_within_groups(vflat, groups: PaddedGroups):
    """Sort each group's slots by value.

    Runs as a 2-D (rows*groups, L) sort — short per-group sorts (O(L log L)
    work) on a near-unpadded 2-D buffer; the (rows, G*L) <-> (rows*G, L)
    reshapes stay 2-D.  (A flat two-key (group_id, value) sort avoids the
    relayout copies but costs O(GL log GL) — ~5x slower for the 366-group
    daily tables.)"""
    G, L = groups.indices.shape
    shape = vflat.shape
    return jnp.sort(vflat.reshape(-1, L), axis=-1).reshape(shape)


def _masked_trend(xg_flat, groups: PaddedGroups):
    """Per-group linear trend vs within-group position (masked OLS against
    ``arange``), matching ``LinearTrendTransformer`` fit on each group's
    sub-frame (``quantile.py:97``)."""
    G, L = groups.indices.shape
    lead = xg_flat.shape[:-1]
    xg = xg_flat.reshape(*lead, G, L)
    t = jnp.arange(L, dtype=xg_flat.dtype)
    w = jnp.asarray(groups.mask, xg_flat.dtype)
    slope, intercept = ols_1d(t, jnp.where(jnp.asarray(groups.mask), xg, 0.0), w)
    return slope, intercept  # (..., G)


def _trend_line_flat(slope, intercept, groups: PaddedGroups, dtype):
    G, L = groups.indices.shape
    t = jnp.arange(L, dtype=dtype)
    line = slope[..., None] * t + intercept[..., None]  # (..., G, L)
    return line.reshape(*slope.shape[:-1], G * L)


def cunnane_fit_padded(
    xg_flat, groups: PaddedGroups, *, alpha: float = 0.4, beta: float = 0.4, detrend: bool = False
) -> GroupedCdf:
    """Fit per-group Cunnane CDFs from flat padded group rows (..., G*L)."""
    dtype = xg_flat.dtype
    lead = xg_flat.shape[:-1]
    if detrend:
        slope, intercept = _masked_trend(xg_flat, groups)
        xg_flat = xg_flat - _trend_line_flat(slope, intercept, groups, dtype)
    else:
        slope = jnp.zeros((*lead, groups.n_groups), dtype)
        intercept = jnp.zeros((*lead, groups.n_groups), dtype)
    masked = jnp.where(jnp.asarray(groups.mask.reshape(-1)), xg_flat, jnp.inf)
    vals = _sort_within_groups(masked, groups)
    pp = jnp.asarray(_padded_pp(groups, alpha, beta), dtype)
    return GroupedCdf(pp, vals, slope, intercept)


def _tail_windows(counts: np.ndarray, L: int, n_endpoints: int):
    """Host-precomputed tail-window column indices and 0/1 weights."""
    ne = min(n_endpoints, L)
    j = np.arange(ne)[None, :]
    w_lo = (j < counts[:, None]).astype(np.float64)  # first ne valid knots
    start = np.maximum(counts - ne, 0)[:, None]
    hi_cols = (start + j).astype(np.int64)  # last ne valid knots
    w_hi = ((start + j) < counts[:, None]).astype(np.float64)
    return ne, w_lo, hi_cols, w_hi


def _cunnane_map_flat(
    q_flat, table_x_flat, table_y_flat, groups_q: PaddedGroups, counts: np.ndarray,
    L_table: int, extrapolate, n_endpoints: int,
):
    """Shared ragged kernel for transform (vals->pp) and inverse (pp->vals):
    semantics of ``quantile.py:485-503`` / ``523-545``.

    ``q_flat``: (..., G*Lq) queries grouped per ``groups_q``;
    ``table_*_flat``: (..., G*L_table) or (G*L_table,) monotone-per-group
    tables; ``counts``: host (G,) valid knots per table group.
    """
    dtype = q_flat.dtype
    lead = q_flat.shape[:-1]
    G, Lq = groups_q.indices.shape
    Lt = L_table

    tx = jnp.broadcast_to(table_x_flat, (*lead, G * Lt)).reshape(*lead, G, Lt)
    ty = jnp.broadcast_to(table_y_flat, (*lead, G * Lt)).reshape(*lead, G, Lt)
    q3 = q_flat.reshape(*lead, G, Lq)
    res = interp_rows(tx, ty, q3)  # (..., G, Lq); 2-D reshapes compose inside

    if extrapolate in ("min", "max", "both"):
        ne, w_lo, hi_cols, w_hi = _tail_windows(counts, Lt, n_endpoints)
        g_idx = np.arange(G)[:, None]
        lo_edge = tx[..., :, 0:1]
        hi_edge = tx[..., g_idx[:, 0], np.maximum(counts - 1, 0)][..., None]
        if extrapolate in ("min", "both"):
            lo_s, lo_i = ols_1d(tx[..., :ne], ty[..., :ne], jnp.asarray(w_lo, dtype))
            res = jnp.where(q3 < lo_edge, lo_i[..., None] + lo_s[..., None] * q3, res)
        if extrapolate in ("max", "both"):
            hx = tx[..., g_idx, hi_cols]  # (..., G, ne) static gather
            hy = ty[..., g_idx, hi_cols]
            hi_s, hi_i = ols_1d(hx, hy, jnp.asarray(w_hi, dtype))
            res = jnp.where(q3 > hi_edge, hi_i[..., None] + hi_s[..., None] * q3, res)
    return res.reshape(*lead, G * Lq)


def cunnane_transform_padded(
    cdf: GroupedCdf, xg_flat, groups_q: PaddedGroups, counts: np.ndarray,
    extrapolate="both", n_endpoints: int = 10,
):
    """values -> plotting positions per group; ``xg_flat``: (..., G*Lq)
    grouped per ``groups_q`` against the cdf's G groups (row-aligned)."""
    Lt = cdf.vals.shape[-1] // groups_q.n_groups
    return _cunnane_map_flat(
        xg_flat, cdf.vals, cdf.pp, groups_q, counts, Lt, extrapolate, n_endpoints
    )


def cunnane_inverse_padded(
    cdf: GroupedCdf, qg_flat, groups_q: PaddedGroups, counts: np.ndarray,
    valid_flat: np.ndarray, extrapolate="both", n_endpoints: int = 10,
):
    """plotting positions -> values per group; ``qg_flat``: (..., G*Lq).

    Builds the (pp -> vals) direction tables: pp pads to +inf, vals pads to
    each group's last valid value (monotone + zero pad slope).
    """
    G = groups_q.n_groups
    Lt = cdf.vals.shape[-1] // G
    lead = cdf.vals.shape[:-1]
    valid = jnp.asarray(valid_flat)
    pp_tab = jnp.where(valid, cdf.pp, jnp.inf)
    vals3 = cdf.vals.reshape(*lead, G, Lt)
    v_last = jnp.max(
        jnp.where(valid.reshape(G, Lt), vals3, -jnp.inf), axis=-1, keepdims=True
    )
    vals_tab = jnp.where(valid.reshape(G, Lt), vals3, v_last).reshape(*lead, G * Lt)
    return _cunnane_map_flat(
        qg_flat, pp_tab, vals_tab, groups_q, counts, Lt, extrapolate, n_endpoints
    )


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
    fit_valid_flat: np.ndarray,
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

    ``fit_counts``/``fit_valid_flat``: host count vector / flat (G*Lt,)
    validity mask of the *fit* tables (aligned to this partition's rows).
    """
    dtype = x.dtype
    xg_raw = gather_groups(x, groups, fill=0.0)
    if detrend:
        slope, intercept = _masked_trend(xg_raw, groups)
        xg = xg_raw - _trend_line_flat(slope, intercept, groups, dtype)
    else:
        xg = xg_raw
    # fit_transform-on-self == rank plotting positions (no interp; see
    # ops.ranks) — self-queries are never out of the fresh CDF's range, so
    # the reference's tail extrapolation can't trigger here
    G, L = groups.indices.shape
    masked = jnp.where(jnp.asarray(groups.mask.reshape(-1)), xg, jnp.inf)
    pp_flat = jnp.asarray(_padded_pp(groups, alpha, beta), x.dtype)
    lead = xg.shape[:-1]
    pps = self_quantiles(
        masked.reshape(*lead, G, L), pp_flat.reshape(G, L)
    ).reshape(*lead, G * L)
    mapped = cunnane_inverse_padded(
        fit_cdf, pps, groups, fit_counts, fit_valid_flat, extrapolate, n_endpoints
    )
    if detrend:
        mapped = mapped + _trend_line_flat(slope, intercept, groups, dtype)
        # intercept-bias reset (quantile.py:145)
        G, L = groups.indices.shape
        delta = (intercept - fit_cdf.trend_intercept)[..., None]
        mapped = mapped - jnp.broadcast_to(delta, (*delta.shape[:-1], L)).reshape(
            *mapped.shape[:-1], G * L
        )
    return scatter_groups(mapped, groups, x.shape[-1])