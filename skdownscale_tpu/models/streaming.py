"""Group-chunked ("streaming") ragged quantile mapping.

The dense formulation in :mod:`.grouped` materializes every fit group's
window at once: for the ``'daily_nasa-nex'`` flavor
(``/root/reference/skdownscale/pointwise_models/bcsd.py:36-44`` +
``groupers.py:19-82``), the 366 overlapping ±15-day DOY windows expand the
training series 27x, capping a single pass near ~3k cells on one 16 GB chip
(round-1 BASELINE.md config 5).  This module runs the same math as one
``lax.scan`` over *transform-group chunks*: each step gathers only its
chunk's fit windows and queries, sorts, maps, and scatter-adds into the
output, so live HBM is O(cells · chunk) instead of O(cells · 27 · T).

Two key observations make this exact (not an approximation):

* predict-time work factors over the transform partition — each transform
  group maps only through its single matched fit row, so a chunk of
  transform groups needs only its own fit windows (in the daily flavor only
  31 of the 366 fitted DOY windows are ever consulted, because the
  reference's predict groups by *day of month* and looks those keys up in
  the day-of-year table — key-space mixing replicated from
  ``bcsd.py:51-53,69-79``);
* per-group index tables are shared across cells, so they can be scanned
  device arrays (traced operands) without changing the compiled gather
  pattern XLA emits for the host-constant tables of the dense path.

All chunk tables are host-precomputed numpy (:class:`StreamTables`) and
stacked along a leading chunk axis; the scan body is shape-identical across
chunks.  Sorting, Cunnane positions, tail OLS and the intercept-bias reset
replicate :func:`.grouped.grouped_qm_transform` / ``quantile.py:485-545``
row for row, so results match the dense path to float round-off.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.regression import ols_1d
from ..ops.rowsort import sort_rows_auto
from ..utils.timeindex import PaddedGroups
from .grouped import (
    _COUNT_SORT_MAX_LEN,
    _padded_pp,
    _rank_bracket_row,
    _seg_kernel_ok,
    apply_ranked_flat,
    apply_ranked_rows,
)


def _sort_groups_3d(masked3, Lt: int):
    """Sort the ``Lt``-wide windows of a (..., Gc, Lt) chunk.  TPU/f32 with
    vreg-aligned ``Lt`` routes to the segment counting-sort kernel on the
    (..., Gc*Lt) flat view — the (rows, Lt) reshape costs two physical
    relayout copies per side on TPU (see ``grouped._sort_within_groups``)."""
    from ..ops import rowsort as _rs
    from ..ops.pallas.rank_map_kernel import count_sort_segments

    Gc, Lt_ = masked3.shape[-2], masked3.shape[-1]
    if _rs._OVERRIDE is not None:
        use, interpret = _rs._OVERRIDE
    else:
        use, interpret = _seg_kernel_ok(masked3.dtype, Lt), False
    if use and Lt % 8 == 0 and Lt <= _COUNT_SORT_MAX_LEN:
        from .grouped import _seg_strip

        flat = masked3.reshape(-1, Gc * Lt_)
        return count_sort_segments(
            flat, L=Lt, interpret=interpret, strip=_seg_strip(Lt)
        ).reshape(masked3.shape)
    return sort_rows_auto(masked3.reshape(-1, Lt)).reshape(masked3.shape)

__all__ = ["StreamTables", "build_stream_tables", "streaming_qm_transform"]


class StreamTables(NamedTuple):
    """Host-built per-chunk tables, stacked on a leading (NC,) chunk axis.

    ``fit_take`` indexes the *source* array (raw series when
    ``presorted=False``; flat sorted state ``vals`` when ``True``);
    ``q_take`` indexes the query series; ``hi_pos`` indexes the chunk's
    sorted flat ``(Gc*Lt,)`` table.  Float tables are Cunnane plotting
    positions / tail-window 0-1 weights; masks are prefix masks per group.
    """

    fit_take: np.ndarray  # (NC, Gc*Lt) int32
    fit_mask: np.ndarray  # (NC, Gc, Lt) bool
    lo_w: np.ndarray  # (NC, Gc, ne)
    lo_px: np.ndarray  # (NC, Gc, ne)
    hi_pos: np.ndarray  # (NC, Gc*ne) int32
    hi_w: np.ndarray  # (NC, Gc, ne)
    hi_px: np.ndarray  # (NC, Gc, ne)
    q_take: np.ndarray  # (NC, Gc*Lq) int32
    q_mask: np.ndarray  # (NC, Gc, Lq) bool
    q_pp: np.ndarray  # (NC, Gc, Lq)
    trend_cols: np.ndarray  # (NC, Gc) int32 — fit-group column into state trend arrays
    # rank-bracket interp tables: the query pp grid and the fit pp grid are
    # both pure functions of (rank, count), and counts are host data — so
    # each query RANK's bracketing knot indices, lerp weights, anchor side,
    # and tail-region membership are precomputable.  The per-chunk interp
    # then needs no searching and no sort-merge: two takes and one fma.
    rb_lo: np.ndarray  # (NC, Gc*Lq) int32 — flat lower-knot index into (Gc*Lt)
    rb_hi: np.ndarray  # (NC, Gc*Lq) int32 — flat upper-knot index
    rb_w0: np.ndarray  # (NC, Gc, Lq) left-anchor lerp weight (q-x0)/dx
    rb_w1: np.ndarray  # (NC, Gc, Lq) right-anchor lerp weight (q-x1)/dx
    rb_right: np.ndarray  # (NC, Gc, Lq) bool — anchor from the nearer knot
    rb_lo_m: np.ndarray  # (NC, Gc, Lq) bool — rank pp below the first fit pp
    rb_hi_m: np.ndarray  # (NC, Gc, Lq) bool — rank pp above the last fit pp


def build_stream_tables(
    fit: PaddedGroups,
    transform: PaddedGroups,
    t2f: np.ndarray,
    *,
    alpha: float = 0.4,
    beta: float = 0.4,
    n_endpoints: int = 10,
    group_chunk: int = 8,
    source: str = "raw",
    dtype=np.float64,
) -> StreamTables:
    """Precompute scan tables for one (fit groups, transform partition) pair.

    ``t2f[g]`` is the fit row consulted by transform group ``g``
    (``_match_keys`` semantics, ``bcsd.py:69-79``).  ``source='raw'`` makes
    ``fit_take`` gather raw time steps (windows sorted in-chunk);
    ``'state'`` makes it gather the pre-sorted flat ``(G*Lt,)`` state table.
    """
    Gt, Lq = transform.indices.shape
    Gf, Lt = fit.indices.shape
    Gc = min(group_chunk, Gt)
    NC = math.ceil(Gt / Gc)
    Gp = NC * Gc  # padded transform-group count
    ne = min(n_endpoints, Lt)

    rows = np.zeros(Gp, np.int64)
    rows[:Gt] = np.asarray(t2f, np.int64)
    live = np.zeros(Gp, bool)
    live[:Gt] = True

    # --- fit side -----------------------------------------------------
    if source == "raw":
        fit_take = fit.indices[rows].astype(np.int32)  # (Gp, Lt)
    elif source == "state":
        fit_take = (rows[:, None] * Lt + np.arange(Lt)[None, :]).astype(np.int32)
    else:  # pragma: no cover
        raise ValueError(f"unknown source {source!r}")
    fit_mask = fit.mask[rows] & live[:, None]
    counts = np.where(live, fit.counts[rows], 0).astype(np.int64)
    pp_all = np.asarray(_padded_pp(fit, alpha, beta), dtype).reshape(Gf, Lt)
    fit_pp = pp_all[rows]

    j = np.arange(ne)
    lo_w = (j[None, :] < counts[:, None]).astype(dtype)
    lo_px = fit_pp[:, :ne]
    start = np.maximum(counts - ne, 0)
    hi_cols = start[:, None] + j[None, :]  # (Gp, ne)
    hi_w = (hi_cols < counts[:, None]).astype(dtype)
    hi_px = np.take_along_axis(fit_pp, hi_cols, axis=1)
    hi_pos = ((np.arange(Gp) % Gc)[:, None] * Lt + hi_cols).astype(np.int32)

    # --- query side -----------------------------------------------------
    q_take = np.zeros((Gp, Lq), np.int32)
    q_take[:Gt] = transform.indices
    q_mask = np.zeros((Gp, Lq), bool)
    q_mask[:Gt] = transform.mask
    q_pp = np.full((Gp, Lq), 0.5, dtype)
    q_pp[:Gt] = np.asarray(_padded_pp(transform, alpha, beta), dtype).reshape(Gt, Lq)

    # --- rank-bracket interp tables -------------------------------------
    # The sorted query at rank r carries pp q_pp[g, r]; its bracket inside
    # the fit pp grid (and the lerp weights, nearer-knot anchor, and the
    # clamp/tail regions of ops.interp.interp_ramp's semantics) depend only
    # on (r, query count, fit count) — all host data.
    rb_lo = np.zeros((Gp, Lq), np.int64)
    rb_hi = np.zeros((Gp, Lq), np.int64)
    rb_w0 = np.zeros((Gp, Lq), np.float64)
    rb_w1 = np.zeros((Gp, Lq), np.float64)
    rb_right = np.zeros((Gp, Lq), bool)
    rb_lo_m = np.zeros((Gp, Lq), bool)
    rb_hi_m = np.zeros((Gp, Lq), bool)
    for g in range(Gp):
        nf = int(counts[g])
        if nf <= 0:
            continue
        fg = np.asarray(fit_pp[g, :nf], np.float64)
        qv = np.asarray(q_pp[g], np.float64)
        (
            rb_lo[g],
            rb_hi[g],
            rb_w0[g],
            rb_w1[g],
            rb_right[g],
            rb_lo_m[g],
            rb_hi_m[g],
        ) = _rank_bracket_row(fg, qv)
    g_in_chunk = (np.arange(Gp) % Gc)[:, None]
    rb_lo_flat = (g_in_chunk * Lt + rb_lo).astype(np.int32)
    rb_hi_flat = (g_in_chunk * Lt + rb_hi).astype(np.int32)

    def C(a, shape):  # chunk-stack
        return np.ascontiguousarray(a.reshape(NC, *shape))

    return StreamTables(
        fit_take=C(fit_take, (Gc * Lt,)),
        fit_mask=C(fit_mask, (Gc, Lt)),
        lo_w=C(lo_w, (Gc, ne)),
        lo_px=C(lo_px.astype(dtype), (Gc, ne)),
        hi_pos=C(hi_pos, (Gc * ne,)),
        hi_w=C(hi_w, (Gc, ne)),
        hi_px=C(hi_px.astype(dtype), (Gc, ne)),
        q_take=C(q_take, (Gc * Lq,)),
        q_mask=C(q_mask, (Gc, Lq)),
        q_pp=C(q_pp, (Gc, Lq)),
        trend_cols=C(rows.astype(np.int32), (Gc,)),
        rb_lo=C(rb_lo_flat, (Gc * Lq,)),
        rb_hi=C(rb_hi_flat, (Gc * Lq,)),
        rb_w0=C(rb_w0.astype(dtype), (Gc, Lq)),
        rb_w1=C(rb_w1.astype(dtype), (Gc, Lq)),
        rb_right=C(rb_right, (Gc, Lq)),
        rb_lo_m=C(rb_lo_m, (Gc, Lq)),
        rb_hi_m=C(rb_hi_m, (Gc, Lq)),
    )


def _masked_trend_chunk(vals, mask, w):
    """Per-group linear trend vs within-group position (masked OLS against
    ``arange``) — chunk-local version of ``grouped._masked_trend``
    (``LinearTrendTransformer`` per sub-frame, ``quantile.py:97``)."""
    L = vals.shape[-1]
    t = jnp.arange(L, dtype=vals.dtype)
    slope, intercept = ols_1d(t, jnp.where(mask, vals, 0.0), w)
    return slope, intercept  # (..., Gc)


def streaming_qm_transform(
    source,
    x,
    tables: StreamTables,
    n_out: int,
    *,
    presorted: bool,
    extrapolate="both",
    detrend: bool = False,
    state_trend=None,
    out_init=None,
):
    """Grouped QM transform as a ``lax.scan`` over transform-group chunks.

    ``source``: (..., Ns) — raw fit series (``presorted=False``) or flat
    sorted state vals (``presorted=True``); ``x``: (..., Tp) query series;
    ``n_out``: output length (= Tp).  ``state_trend``: (slope (..., Gf),
    intercept (..., Gf)) when ``presorted`` and ``detrend``.  Returns
    (..., n_out) with each query's mapped value scattered to its time step.
    """
    dtype = x.dtype
    lead = x.shape[:-1]
    NC, GcLt = tables.fit_take.shape
    Gc, Lt = tables.fit_mask.shape[1:]
    Lq = tables.q_mask.shape[-1]
    K = Gc * Lq
    inf = jnp.asarray(jnp.inf, dtype)

    # The transform groups partition the output axis, so instead of a
    # scatter-add into a time-ordered carry each step (TPU scatters measured
    # 3.4x slower than gathers, benchmarks/rolling_profile_tpu.py), keep the
    # carry in GROUP order: each step writes its chunk's contiguous
    # ``dynamic_update_slice``, ``out_init`` is pre-gathered into group order
    # (static host indices), and one static inverse-permutation gather
    # restores time order at the end.
    flat_q = np.asarray(tables.q_take).reshape(-1)
    flat_m = np.asarray(tables.q_mask).reshape(-1)
    tgt = flat_q[flat_m]
    group_order = tgt.size == n_out and np.array_equal(np.sort(tgt), np.arange(n_out))
    if group_order:
        inv_t = np.zeros(n_out, np.int32)
        inv_t[tgt] = np.nonzero(flat_m)[0].astype(np.int32)

    # When a pre-sorted source lays its windows out in chunk order (the
    # slide-kernel flat svals: live group g at columns [g*Lt, (g+1)*Lt)),
    # each chunk's fit window is one contiguous ``dynamic_slice`` — no
    # gather.  XLA's traced-index gather strategy materialized multi-GB
    # source copies at 65k cells (the round-3 OOM); dead (masked) rows may
    # hold anything since every downstream read is masked, so only live
    # rows need to sit at their range position and the source must cover
    # the full NC*Gc*Lt span.
    fit_contig = presorted and source.shape[-1] >= NC * GcLt
    if fit_contig:
        ft = np.asarray(tables.fit_take).reshape(NC, Gc, Lt)
        fm = np.asarray(tables.fit_mask)
        exp = np.arange(NC * GcLt).reshape(NC, Gc, Lt)
        live = fm.any(axis=-1)
        fit_contig = bool(np.array_equal(ft[live], exp[live]))

    def _as_dev(a):
        a = jnp.asarray(a)
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

    tabs = jax.tree_util.tree_map(_as_dev, tables)

    def chunk(carry, tab_step):
        tab, step = tab_step
        fit_mask = tab.fit_mask  # (Gc, Lt)
        # -- fit window -> sorted per-group CDF values ------------------
        if fit_contig:
            src = jax.lax.dynamic_slice_in_dim(
                source, step * GcLt, GcLt, axis=-1
            ).reshape(*lead, Gc, Lt)
        else:
            src = jnp.take(source, tab.fit_take, axis=-1).reshape(*lead, Gc, Lt)
        if presorted:
            svals = src  # already sorted + inf-padded state rows
            if detrend:
                f_slope = jnp.take(state_trend[0], tab.trend_cols, axis=-1)
                f_intercept = jnp.take(state_trend[1], tab.trend_cols, axis=-1)
        else:
            if detrend:
                w = fit_mask.astype(dtype)
                f_slope, f_intercept = _masked_trend_chunk(src, fit_mask, w)
                line = f_slope[..., None] * jnp.arange(Lt, dtype=dtype) + f_intercept[..., None]
                src = src - line
            masked = jnp.where(fit_mask, src, inf)
            svals = _sort_groups_3d(masked, Lt)

        # -- queries: rank-bracket map through the fit CDF ----------------
        # (quantile.py:523-545 semantics).  One payload sort recovers each
        # query's rank; the bracketing knots, lerp weights, and tail-region
        # membership at every rank are host tables (rb_*), so the interp
        # itself is two takes + one fma — no sort-merge, no searching.
        xq = jnp.take(x, tab.q_take, axis=-1).reshape(*lead, Gc, Lq)
        if detrend:
            qw = tab.q_mask.astype(dtype)
            q_slope, q_intercept = _masked_trend_chunk(xq, tab.q_mask, qw)
            q_line = q_slope[..., None] * jnp.arange(Lq, dtype=dtype) + q_intercept[..., None]
            xq = xq - q_line
        mq = jnp.where(tab.q_mask, xq, inf)

        v_last = jnp.max(jnp.where(fit_mask, svals, -inf), axis=-1, keepdims=True)
        vals_tab = jnp.where(fit_mask, svals, v_last)

        sflat = svals.reshape(*lead, Gc * Lt)
        f0 = jnp.take(sflat, tab.rb_lo, axis=-1).reshape(*lead, Gc, Lq)
        f1 = jnp.take(sflat, tab.rb_hi, axis=-1).reshape(*lead, Gc, Lq)
        df = f1 - f0
        res = jnp.where(tab.rb_right, f1 + tab.rb_w1 * df, f0 + tab.rb_w0 * df)

        if extrapolate in ("min", "both"):
            # vals_tab (finite pads), not svals: 0-weight pad slots would
            # otherwise contribute 0*inf = NaN to the weighted OLS sums
            lo_py = vals_tab[..., : tab.lo_w.shape[-1]]
            lo_s, lo_i = ols_1d(
                jnp.broadcast_to(tab.lo_px, lo_py.shape), lo_py, tab.lo_w
            )
            res = jnp.where(
                tab.rb_lo_m, lo_i[..., None] + lo_s[..., None] * tab.q_pp, res
            )
        if extrapolate in ("max", "both"):
            hi_py = jnp.take(vals_tab.reshape(*lead, Gc * Lt), tab.hi_pos, axis=-1).reshape(
                *lead, Gc, -1
            )
            hi_s, hi_i = ols_1d(
                jnp.broadcast_to(tab.hi_px, hi_py.shape), hi_py, tab.hi_w
            )
            res = jnp.where(
                tab.rb_hi_m, hi_i[..., None] + hi_s[..., None] * tab.q_pp, res
            )

        # exact np.interp tie semantics + original-order placement (sort-free
        # counting kernel on TPU, segment form — no (rows, Lq) reshape;
        # rank sort + run-end fill + unsort elsewhere)
        region = jnp.where(tab.rb_lo_m, 0, jnp.where(tab.rb_hi_m, 2, 1)).astype(
            jnp.int32
        )
        res = apply_ranked_flat(
            res.reshape(*lead, Gc * Lq),
            mq.reshape(*lead, Gc * Lq),
            region.reshape(-1),
            Lq,
        ).reshape(*lead, Gc, Lq)

        if detrend:
            res = res + q_line
            # intercept-bias reset (quantile.py:145)
            res = res - (q_intercept - f_intercept)[..., None]

        out = jnp.where(tab.q_mask, res, 0.0).reshape(*lead, Gc * Lq)
        if group_order:
            prev = jax.lax.dynamic_slice_in_dim(carry, step * K, K, axis=-1)
            carry = jax.lax.dynamic_update_slice_in_dim(
                carry, prev + out, step * K, axis=-1
            )
        else:
            carry = carry.at[..., tab.q_take].add(out)
        return carry, None

    if group_order:
        # carry holds the group-ordered output; out_init (climate-trend
        # shift, -climatology) pre-gathered by the host chunk tables
        if out_init is None:
            out0 = jnp.zeros((*lead, NC * K), dtype)
        else:
            out0 = jnp.broadcast_to(out_init, (*lead, n_out)).astype(dtype)[
                ..., flat_q
            ]
    elif out_init is None:
        out0 = jnp.zeros((*lead, n_out), dtype)
    else:
        # additive terms folded into the scan carry: one less live
        # (cells, T) buffer at continental scale
        out0 = jnp.broadcast_to(out_init, (*lead, n_out)).astype(dtype)
    out, _ = jax.lax.scan(chunk, out0, (tabs, jnp.arange(NC)))
    if group_order:
        out = out[..., inv_t]
    return out
