"""Ragged-group quantile mapping under fixed XLA shapes.

BCSD fits one ``QuantileMapper`` per time group — months have 28–31 days and
training records have varying lengths, so group CDFs are *ragged*
(``/root/reference/skdownscale/pointwise_models/bcsd.py:59-79``).  The
reference loops a Python dict of mapper objects; here every group lives in a
padded ``(G, L)`` table with a validity mask, and the Cunnane transform /
inverse run on all groups at once (vmap over the group axis), with
count-aware plotting positions and tail extrapolation.

Padding conventions:
* sorted value tables pad with ``+inf`` (keeps tables sorted; finite queries
  never land in the pad region — see ``ops.interp``),
* plotting-position tables are computed from true counts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.interp import interp_padded
from ..ops.regression import ols_1d

__all__ = [
    "GroupedCdf",
    "cunnane_fit_padded",
    "cunnane_transform_padded",
    "cunnane_inverse_padded",
    "grouped_qm_fit",
    "grouped_qm_transform",
    "gather_groups",
    "scatter_groups",
]


class GroupedCdf(NamedTuple):
    """Per-group Cunnane CDFs: ``vals`` sorted ascending with +inf padding."""

    pp: jnp.ndarray  # (G, L)
    vals: jnp.ndarray  # (G, L)
    counts: jnp.ndarray  # (G,) int32
    # per-group linear-trend parameters (zeros unless detrend)
    trend_slope: jnp.ndarray  # (G,)
    trend_intercept: jnp.ndarray  # (G,)


def gather_groups(x, idx, mask, fill=jnp.inf):
    """Gather ``x[(T,)]`` into padded group rows ``(G, L)``."""
    g = x[idx]
    return jnp.where(mask, g, fill)


def scatter_groups(vals, idx, mask, n: int):
    """Scatter padded group rows back to a ``(n,)`` series (partition groups:
    each time index appears in exactly one (group, slot))."""
    contrib = jnp.where(mask, vals, 0.0)
    return jnp.zeros(n, vals.dtype).at[idx.reshape(-1)].add(contrib.reshape(-1))


def _padded_pp(counts, L: int, alpha: float, beta: float, dtype):
    """Cunnane plotting positions per group for ragged counts; padding -> 0."""
    i = jnp.arange(1, L + 1, dtype=dtype)[None, :]
    n = counts.astype(dtype)[:, None]
    pp = (i - alpha) / (n + 1.0 - alpha - beta)
    return jnp.where(i <= n, pp, 0.0)


def _masked_trend_fit(xg, mask, dtype):
    """Per-group linear trend vs within-group position (masked OLS against
    ``arange``), matching ``LinearTrendTransformer`` fit on each group's
    sub-frame (``quantile.py:97``)."""
    L = xg.shape[-1]
    t = jnp.arange(L, dtype=dtype)
    w = mask.astype(dtype)
    slope, intercept = jax.vmap(lambda xi, wi: ols_1d(t, xi, wi))(jnp.where(mask, xg, 0.0), w)
    return slope, intercept


def _trend_line(slope, intercept, L: int, dtype):
    t = jnp.arange(L, dtype=dtype)
    return slope[:, None] * t[None, :] + intercept[:, None]


def cunnane_fit_padded(
    xg, mask, counts, *, alpha: float = 0.4, beta: float = 0.4, detrend: bool = False
) -> GroupedCdf:
    """Fit per-group Cunnane CDFs from padded group rows ``(G, L)``."""
    dtype = xg.dtype
    if detrend:
        slope, intercept = _masked_trend_fit(xg, mask, dtype)
        xg = xg - _trend_line(slope, intercept, xg.shape[-1], dtype)
    else:
        slope = jnp.zeros(xg.shape[0], dtype)
        intercept = jnp.zeros(xg.shape[0], dtype)
    vals = jnp.sort(jnp.where(mask, xg, jnp.inf), axis=-1)
    pp = _padded_pp(counts, xg.shape[-1], alpha, beta, dtype)
    return GroupedCdf(pp, vals, counts.astype(jnp.int32), slope, intercept)


def _tail_ols_padded(table_x, table_y, count, n_endpoints: int):
    """OLS over the first / last ``n_endpoints`` *valid* knots of a padded
    (table_x -> table_y) table.  Returns (lo_slope, lo_int, hi_slope, hi_int).
    """
    lo_s, lo_i = ols_1d(table_x[:n_endpoints], table_y[:n_endpoints])
    start = jnp.maximum(count - n_endpoints, 0)
    hx = jax.lax.dynamic_slice(table_x, (start,), (n_endpoints,))
    hy = jax.lax.dynamic_slice(table_y, (start,), (n_endpoints,))
    hi_s, hi_i = ols_1d(hx, hy)
    return lo_s, lo_i, hi_s, hi_i


def _cunnane_map_padded(q, table_x, table_y, count, extrapolate, n_endpoints):
    """Shared ragged kernel for transform (vals->pp) and inverse (pp->vals):
    semantics of ``quantile.py:485-503`` / ``523-545`` on one padded table."""
    res = interp_padded(q, table_x, table_y, count)
    lo_edge = table_x[0]
    hi_edge = table_x[count - 1]
    if extrapolate in ("min", "max", "both"):
        lo_s, lo_i, hi_s, hi_i = _tail_ols_padded(table_x, table_y, count, n_endpoints)
        if extrapolate in ("min", "both"):
            res = jnp.where(q < lo_edge, lo_i + lo_s * q, res)
        if extrapolate in ("max", "both"):
            res = jnp.where(q > hi_edge, hi_i + hi_s * q, res)
    return res


def cunnane_transform_padded(cdf: GroupedCdf, xg, extrapolate="both", n_endpoints: int = 10):
    """values -> plotting positions per group; ``xg``: (G, Lq)."""
    return jax.vmap(
        lambda x, v, p, c: _cunnane_map_padded(x, v, p, c, extrapolate, n_endpoints)
    )(xg, cdf.vals, cdf.pp, cdf.counts)


def cunnane_inverse_padded(cdf: GroupedCdf, qg, extrapolate="both", n_endpoints: int = 10):
    """plotting positions -> values per group; ``qg``: (G, Lq).

    The pp table is padded with zeros, which would break the sorted-table
    assumption — so the inverse gathers a (pp -> vals) table padded to +inf
    explicitly.
    """
    L = cdf.pp.shape[-1]
    valid = jnp.arange(L)[None, :] < cdf.counts[:, None]
    pp_tab = jnp.where(valid, cdf.pp, jnp.inf)
    vals_tab = jnp.where(valid, cdf.vals, 0.0)
    return jax.vmap(
        lambda q, p, v, c: _cunnane_map_padded(q, p, v, c, extrapolate, n_endpoints)
    )(qg, pp_tab, vals_tab, cdf.counts)


def grouped_qm_fit(
    y,
    idx,
    mask,
    counts,
    *,
    alpha: float = 0.4,
    beta: float = 0.4,
    detrend: bool = False,
) -> GroupedCdf:
    """``BcsdBase._qm_fit_by_group`` (``bcsd.py:59-67``): one QuantileMapper
    CDF per padded group of ``y``."""
    yg = gather_groups(y, idx, mask, fill=0.0)
    return cunnane_fit_padded(yg, mask, counts, alpha=alpha, beta=beta, detrend=detrend)


def grouped_qm_transform(
    fit_cdf: GroupedCdf,
    x,
    idx,
    mask,
    counts,
    *,
    alpha: float = 0.4,
    beta: float = 0.4,
    extrapolate="both",
    n_endpoints: int = 10,
    detrend: bool = False,
):
    """``BcsdBase._qm_transform_by_group`` (``bcsd.py:69-79``) on padded
    partition groups: per group, build a fresh CDF of the new values,
    transform to plotting positions, then inverse through the stored fit CDF;
    scatter back to a ``(len(x),)`` series."""
    dtype = x.dtype
    xg_raw = gather_groups(x, idx, mask, fill=0.0)
    if detrend:
        slope, intercept = _masked_trend_fit(xg_raw, mask, dtype)
        xg = xg_raw - _trend_line(slope, intercept, xg_raw.shape[-1], dtype)
    else:
        xg = xg_raw
    fresh = cunnane_fit_padded(xg, mask, counts, alpha=alpha, beta=beta, detrend=False)
    pps = cunnane_transform_padded(fresh, xg, extrapolate, n_endpoints)
    mapped = cunnane_inverse_padded(fit_cdf, pps, extrapolate, n_endpoints)
    if detrend:
        mapped = mapped + _trend_line(slope, intercept, xg.shape[-1], dtype)
        # intercept-bias reset (quantile.py:145)
        mapped = mapped - (intercept[:, None] - fit_cdf.trend_intercept[:, None])
    return scatter_groups(mapped, idx, mask, x.shape[0])
