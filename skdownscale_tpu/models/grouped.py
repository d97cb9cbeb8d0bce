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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import interp_rows
from ..ops.regression import ols_1d
from ..ops.rowsort import rank_sort_auto, sort_rows_auto, unsort_auto
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


@functools.lru_cache(maxsize=256)
def _inverse_perm(groups: PaddedGroups, n: int) -> np.ndarray | None:
    """Host inverse of a partition grouping: ``inv[t]`` = flat (g, l) slot of
    time step ``t``, or None if the groups don't cover [0, n) exactly once."""
    flat_idx = groups.indices.reshape(-1)
    mask = groups.mask.reshape(-1)
    tgt = flat_idx[mask]
    if tgt.size != n or not np.array_equal(np.sort(tgt), np.arange(n)):
        return None
    inv = np.zeros(n, np.int32)
    inv[tgt] = np.nonzero(mask)[0].astype(np.int32)
    return inv


def scatter_groups(vals_flat, groups: PaddedGroups, n: int):
    """Scatter flat padded group rows (..., G*L) back to (..., n) (partition
    groups: each time index appears in exactly one (group, slot)).

    A partition scatter is a pure permutation, so it lowers as a static
    gather by the host-precomputed inverse — measured 3.4x faster than the
    ``.at[].add`` scatter on TPU (112 -> 33 ms on (32k, 7440) -> (32k, 7305),
    ``benchmarks/rolling_profile_tpu.py``).  Non-partition groupings (never
    produced by the current callers) fall back to the scatter-add."""
    inv = _inverse_perm(groups, n)
    if inv is not None:
        return vals_flat[..., inv]
    contrib = jnp.where(jnp.asarray(groups.mask.reshape(-1)), vals_flat, 0.0)
    flat_idx = groups.indices.reshape(-1)
    lead = vals_flat.shape[:-1]
    out = jnp.zeros((*lead, n), vals_flat.dtype)
    return out.at[..., flat_idx].add(contrib)


def _padded_pp_from_counts(counts, L: int, alpha: float, beta: float) -> np.ndarray:
    """Host Cunnane plotting positions (G, L) from per-group counts; padding
    repeats the last valid position (monotone table with zero pad slope)."""
    i = np.arange(1, L + 1, dtype=np.float64)[None, :]
    n = np.asarray(counts, np.float64)[:, None]
    return (np.minimum(i, np.maximum(n, 1)) - alpha) / (n + 1.0 - alpha - beta)


def _padded_pp(groups: PaddedGroups, alpha: float, beta: float) -> np.ndarray:
    """Flat (G*L,) flavor of :func:`_padded_pp_from_counts`."""
    G, L = groups.indices.shape
    return _padded_pp_from_counts(groups.counts, L, alpha, beta).reshape(-1)


# counting sort is O(L^2)/row; measured ~1.9x faster than lax.sort at L=40
# and ~1.7x at L=240 (rank_map profile + strip sweep), losing by ~2x at 620
_COUNT_SORT_MAX_LEN = 256


def _seg_kernel_ok(dtype, L: int) -> bool:
    """Route a grouped minor-axis op to the segment Pallas kernels: TPU +
    float32 + vreg-aligned segment length (the kernels slice length-L blocks
    of the transposed array, so L must be a sublane-tile multiple)."""
    from ..ops.pallas.rank_map_kernel import use_rank_map_kernel

    return use_rank_map_kernel(dtype) and L % 8 == 0


def _seg_strip(L: int) -> int:
    """Widest legal roll strip: 16 measured ~11-17% faster than 8 where the
    segment length allows it (BASELINE strip sweep; the daily Lq=240 rank
    map measured 110.2 ms at strip=8 vs 91.4 at the flat form's 16)."""
    return 16 if L % 16 == 0 else 8


def _sort_within_groups(vflat, groups: PaddedGroups):
    """Sort each group's slots by value.

    On TPU/f32 with vreg-aligned group length this runs the segment
    counting-sort kernel directly on the flat (rows, G*L) table — no
    reshape.  The flat->(rows*G, L) reshape is NOT free on TPU: XLA keeps
    the neighboring fusions in the transposed {0,1} layout, so each side of
    the reshape lowers as a physical relayout copy (profiler capture,
    BASELINE roofline: 2 x ~1.6 ms per reshape at the 131k-cell headline
    config, against a 9.15 ms lax.sort).

    Elsewhere it runs as a 2-D (rows*groups, L) sort — short per-group
    sorts (O(L log L) work) on a near-unpadded 2-D buffer.  (A flat two-key
    (group_id, value) sort avoids the relayout copies but costs
    O(GL log GL) — ~5x slower for the 366-group daily tables.)"""
    from ..ops import rowsort as _rs
    from ..ops.pallas.rank_map_kernel import count_sort_segments

    G, L = groups.indices.shape
    shape = vflat.shape
    if _rs._OVERRIDE is not None:
        use, interpret = _rs._OVERRIDE
    else:
        use, interpret = _seg_kernel_ok(vflat.dtype, L), False
    if use and L % 8 == 0 and L <= _COUNT_SORT_MAX_LEN:
        flat2 = vflat.reshape(-1, G * L)  # leading-dim collapse only
        out = count_sort_segments(flat2, L=L, interpret=interpret, strip=_seg_strip(L))
        return out.reshape(shape)
    return sort_rows_auto(vflat.reshape(-1, L)).reshape(shape)


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


def _rank_bracket_row(fg: np.ndarray, qv: np.ndarray):
    """Host-side rank-bracket interp plan for ONE group.

    Both the query plotting-position grid ``qv`` (Lq,) and the fit knot grid
    ``fg`` (nf valid knots, strictly increasing) are pure functions of
    (rank, count) — so the bracketing knot indices, the nearer-knot lerp
    weights, and the clamp/tail regions of ``ops.interp.interp_ramp``'s
    semantics are all data-independent.  Returns
    ``(lo, hi, w0, w1, right, below, above)`` with shapes (Lq,).
    """
    nf = len(fg)
    below = qv < fg[0]
    above = qv > fg[nf - 1]
    lo = np.clip(np.searchsorted(fg, qv, side="right") - 1, 0, nf - 1)
    hi = np.minimum(lo + 1, nf - 1)
    lo = np.where(below, 0, np.where(above, nf - 1, lo))
    hi = np.where(below, 0, np.where(above, nf - 1, hi))
    x0 = fg[lo]
    x1 = fg[hi]
    dx = x1 - x0
    dxs = np.where(dx != 0, dx, 1.0)
    inner = ~(below | above) & (dx != 0)
    w0 = np.where(inner, (qv - x0) / dxs, 0.0)
    w1 = np.where(inner, (qv - x1) / dxs, 0.0)
    right = ~(below | above) & ((qv - x0) > (x1 - qv))
    return lo, hi, w0, w1, right, below, above


def rank_bracket_tables(
    fit_counts: np.ndarray,
    q_pp: np.ndarray,
    Lt: int,
    *,
    alpha: float,
    beta: float,
):
    """Stacked host rank-bracket plans for G groups.

    ``fit_counts``: (G,) valid fit knots per group; ``q_pp``: (G, Lq) query
    rank plotting positions.  The fit knot grid is reconstructed from the
    Cunnane formula (``_padded_pp``), which is how every fit table in this
    module was built.  Returns dict of (G, Lq) arrays plus flat take
    indices (G*Lq,) into a (G*Lt) value table.
    """
    G, Lq = q_pp.shape
    lo = np.zeros((G, Lq), np.int64)
    hi = np.zeros((G, Lq), np.int64)
    w0 = np.zeros((G, Lq), np.float64)
    w1 = np.zeros((G, Lq), np.float64)
    right = np.zeros((G, Lq), bool)
    below = np.zeros((G, Lq), bool)
    above = np.zeros((G, Lq), bool)
    for g in range(G):
        nf = int(fit_counts[g])
        if nf <= 0:
            continue
        i = np.arange(1, nf + 1, dtype=np.float64)
        fg = (i - alpha) / (nf + 1.0 - alpha - beta)
        lo[g], hi[g], w0[g], w1[g], right[g], below[g], above[g] = _rank_bracket_row(
            fg, np.asarray(q_pp[g], np.float64)
        )
    g_off = (np.arange(G) * Lt)[:, None]
    return {
        "lo_flat": (g_off + lo).reshape(-1).astype(np.int32),
        "hi_flat": (g_off + hi).reshape(-1).astype(np.int32),
        "w0": w0,
        "w1": w1,
        "right": right,
        "below": below,
        "above": above,
    }


def _rank_fill_unsort(res, sv, spos, region):
    """Exact np.interp tie semantics for rank-indexed mapped values: all
    members of a tie run take the run END's mapped value (the last tied
    slot's pp — ``ops.ranks.self_quantiles``), NaN queries stay NaN.
    ``res``/``sv``/``spos``/``region``: (rows, L) rank-ordered; ``region``
    is int32 0/1/2 (lo-tail / interior / hi-tail), non-decreasing per row.
    Returns original-order (rows, L).

    The fill ("value at the first run-end >= r") is built from native
    ``lax.cummin`` only: F is monotone non-decreasing *within* each region
    (CDF interp between monotone knots; tail OLS lines over non-decreasing
    knots have slope >= 0), so a per-region reverse running-min over run-end
    values is exact, and the governing run-end's region is itself a reverse
    running-min (region is monotone along ranks).  A general
    ``associative_scan`` segmented-fill also works but its unrolled
    slice/concat levels made the TPU AOT compile ~20 min for this op alone
    and OOM-killed the helper inside the full predict program."""
    inf = jnp.asarray(jnp.inf, res.dtype)
    isn = jnp.isnan(sv)
    run_end = jnp.concatenate(
        [sv[:, 1:] != sv[:, :-1], jnp.ones((sv.shape[0], 1), bool)], axis=1
    )
    live_end = run_end & ~isn
    re_region = jax.lax.cummin(
        jnp.where(live_end, region, jnp.int32(3)), axis=1, reverse=True
    )
    out = None
    for R in range(3):
        key = jnp.where(live_end & (region == R), res, inf)
        fill_R = jax.lax.cummin(key, axis=1, reverse=True)
        out = fill_R if out is None else jnp.where(re_region == R, fill_R, out)
    out = jnp.where(isn, sv, out)
    return unsort_auto(out, spos)


def apply_ranked_rows(res_rows, q_rows, region_rows):
    """Map each query to its rank's result value, np.interp tie semantics.

    ``res_rows``: (rows, L) mapped values by RANK (query-independent:
    rank-bracket takes through the fit CDF); ``q_rows``: (rows, L) query
    values in original order (+inf padded); ``region_rows``: int32 0/1/2
    per rank (lo-tail/interior/hi-tail), used only by the XLA fallback.

    On TPU/f32 this runs the sort-free counting kernel
    (:mod:`..ops.pallas.rank_map_kernel`): ranks by Lq^2 broadcast compares
    in VMEM, ties land on the run-end rank by construction, NaNs pass
    through.  Elsewhere (or under ``rowsort.override``) it runs the rank
    payload sort + reverse-cummin tie fill + payload unsort.
    """
    from ..ops import rowsort as _rs
    from ..ops.pallas.rank_map_kernel import rank_map_rows, use_rank_map_kernel

    if _rs._OVERRIDE is not None:
        use, interpret = _rs._OVERRIDE
    else:
        use, interpret = use_rank_map_kernel(q_rows.dtype), False
    if use:
        return rank_map_rows(q_rows, res_rows, interpret=interpret)
    sv, spos = rank_sort_auto(q_rows)
    return _rank_fill_unsort(res_rows, sv, spos, region_rows)


def apply_ranked_flat(res_flat, q_flat, region_host_flat, L: int):
    """(..., G*L) flavor of :func:`apply_ranked_rows` over length-``L``
    segments.  On TPU/f32 with vreg-aligned ``L`` this feeds the segment
    counting kernel directly — the ``(..., G*L) <-> (rows, L)`` reshape of
    the flat flavor costs two physical relayout copies per side on TPU (see
    ``_sort_within_groups``).  ``region_host_flat``: host (G*L,) int32,
    consumed only by the XLA fallback's tie fill."""
    from ..ops import rowsort as _rs
    from ..ops.pallas.rank_map_kernel import rank_map_segments

    lead = q_flat.shape[:-1]
    GL = q_flat.shape[-1]
    if _rs._OVERRIDE is not None:
        use, interpret = _rs._OVERRIDE
    else:
        use, interpret = _seg_kernel_ok(q_flat.dtype, L), False
    if use and L % 8 == 0:
        q2 = q_flat.reshape(-1, GL)  # leading-dim collapse only
        r2 = jnp.broadcast_to(res_flat, q_flat.shape).reshape(-1, GL)
        return rank_map_segments(
            q2, r2, L=L, interpret=interpret, strip=_seg_strip(L)
        ).reshape(*lead, GL)
    region = jnp.broadcast_to(
        jnp.asarray(region_host_flat), (*lead, GL)
    ).reshape(-1, L)
    return apply_ranked_rows(
        jnp.broadcast_to(res_flat, q_flat.shape).reshape(-1, L),
        q_flat.reshape(-1, L),
        region,
    ).reshape(*lead, GL)


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

    ``alpha``/``beta`` must be the pair the fit CDF was built with (the fit
    pp grid is reconstructed from them host-side for the rank-bracket plan);
    BCSD uses a single pair throughout, as the reference does.
    """
    dtype = x.dtype
    xg_raw = gather_groups(x, groups, fill=0.0)
    if detrend:
        slope, intercept = _masked_trend(xg_raw, groups)
        xg = xg_raw - _trend_line_flat(slope, intercept, groups, dtype)
    else:
        xg = xg_raw
    # fit_transform-on-self == rank plotting positions, and the inverse
    # interp of a rank pp through the fit pp grid is bracket-determined by
    # (rank, counts) alone — so the whole vals->pp->vals chain collapses to
    # one rank sort plus host-precomputed takes (rank_bracket_tables); the
    # sort-merge interp and its two wide payload sorts disappear.
    G, L = groups.indices.shape
    Lt = fit_cdf.vals.shape[-1] // G
    masked = jnp.where(jnp.asarray(groups.mask.reshape(-1)), xg, jnp.inf)
    lead = xg.shape[:-1]
    q_pp_host = _padded_pp(groups, alpha, beta).reshape(G, L)
    rb = rank_bracket_tables(fit_counts, q_pp_host, Lt, alpha=alpha, beta=beta)

    vals_b = jnp.broadcast_to(fit_cdf.vals, (*lead, G * Lt))
    f0 = vals_b[..., jnp.asarray(rb["lo_flat"])]  # static takes, (..., G*L)
    f1 = vals_b[..., jnp.asarray(rb["hi_flat"])]
    df = f1 - f0
    w0 = jnp.asarray(rb["w0"].reshape(-1), dtype)
    w1 = jnp.asarray(rb["w1"].reshape(-1), dtype)
    res = jnp.where(
        jnp.asarray(rb["right"].reshape(-1)), f1 + w1 * df, f0 + w0 * df
    )

    if extrapolate in ("min", "max", "both"):
        ne, w_lo, hi_cols, w_hi = _tail_windows(fit_counts, Lt, n_endpoints)
        # host tail knot positions (pp grid is the Cunnane formula; repeat
        # the last valid pp at padded slots, matching _padded_pp)
        fpp = _padded_pp_from_counts(fit_counts, Lt, alpha, beta)  # (G, Lt)
        valid = jnp.asarray(fit_valid_flat).reshape(G, Lt)
        vals3 = vals_b.reshape(*lead, G, Lt)
        v_last = jnp.max(jnp.where(valid, vals3, -jnp.inf), axis=-1, keepdims=True)
        vals_tab = jnp.where(valid, vals3, v_last)
        qpp_dev = jnp.asarray(q_pp_host, dtype)  # (G, L)
        if extrapolate in ("min", "both"):
            lo_px = jnp.asarray(fpp[:, :ne], dtype)
            lo_s, lo_i = ols_1d(lo_px, vals_tab[..., :ne], jnp.asarray(w_lo, dtype))
            line = (lo_i[..., None] + lo_s[..., None] * qpp_dev).reshape(*lead, G * L)
            res = jnp.where(jnp.asarray(rb["below"].reshape(-1)), line, res)
        if extrapolate in ("max", "both"):
            g_idx = np.arange(G)[:, None]
            hi_px = jnp.asarray(np.take_along_axis(fpp, hi_cols, axis=1), dtype)
            hy = vals_tab[..., g_idx, hi_cols]  # (..., G, ne) static gather
            hi_s, hi_i = ols_1d(hi_px, hy, jnp.asarray(w_hi, dtype))
            line = (hi_i[..., None] + hi_s[..., None] * qpp_dev).reshape(*lead, G * L)
            res = jnp.where(jnp.asarray(rb["above"].reshape(-1)), line, res)

    region_host = np.where(rb["below"], 0, np.where(rb["above"], 2, 1)).astype(np.int32)
    mapped = apply_ranked_flat(res, masked, region_host.reshape(-1), L)
    if detrend:
        mapped = mapped + _trend_line_flat(slope, intercept, groups, dtype)
        # intercept-bias reset (quantile.py:145)
        G, L = groups.indices.shape
        delta = (intercept - fit_cdf.trend_intercept)[..., None]
        mapped = mapped - jnp.broadcast_to(delta, (*delta.shape[:-1], L)).reshape(
            *mapped.shape[:-1], G * L
        )
    return scatter_groups(mapped, groups, x.shape[-1])