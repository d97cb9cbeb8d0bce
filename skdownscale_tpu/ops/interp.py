"""Batched 1-D linear interpolation (the reference's hottest primitive).

``np.interp`` is called throughout the reference's quantile machinery
(``/root/reference/skdownscale/pointwise_models/quantile.py:247,268,488,530,615,620,625``).
Here it becomes a vmappable JAX function with two extensions the TPU build
needs:

* explicit ``left`` / ``right`` fill control matching ``np.interp`` semantics
  (default = clamp to ``fp[0]`` / ``fp[-1]``; ``±inf`` sentinels used by the
  extrapolating callers), and
* *padded-table* support: tables whose tail entries are padding (for ragged
  time-groups under fixed XLA shapes).  Padding ``xp`` with ``+inf`` keeps the
  table sorted; any finite query then lands at or before the last valid entry
  and the result equals ``np.interp`` against the unpadded table.

Single-series functions over the last axis; batch with ``jax.vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["interp", "interp_ramp", "interp_rows", "interp_padded", "pad_table"]


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform.lower() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover - backend init failure
        return False


def _pallas_feasible(L: int, Q: int, itemsize: int) -> bool:
    # mirror of interp_kernel._choose_tb: the lane block cannot shrink
    # below 128, so per-lane VMEM must fit at the 128-lane floor
    per_lane = (L + min(Q, 128) * 3 + 6 * L) * itemsize
    return per_lane * 128 <= 8 * 1024 * 1024


def interp_rows(xp, fp, q):
    """Row-matched batched interp: ``out[..., b, i] = interp(q[..., b, i],
    xp[..., b, :], fp[..., b, :])`` over arbitrary leading dims.

    Strategy by table size (tables must be monotone rows, ragged rows padded
    per :func:`pad_table`):

    * TPU, small tables — the fused Pallas kernel (dense bracketing in VMEM);
    * TPU, large tables — :func:`interp_sortmerge` (gather-free sort-merge:
      O((L+Q) log) with TPU-native sorts, where both the dense O(L*Q)
      bracketing and XLA's binary-search lowering are orders of magnitude
      off);
    * CPU — dense formulation for small tables, ``jnp.interp`` otherwise.
    """
    lead = xp.shape[:-1]
    L = xp.shape[-1]
    Q = q.shape[-1]
    if q.shape[:-1] != lead:
        q = jnp.broadcast_to(q, (*lead, Q))
    xp2, fp2, q2 = xp.reshape(-1, L), fp.reshape(-1, L), q.reshape(-1, Q)
    if _use_pallas():
        if _pallas_feasible(L, Q, q.dtype.itemsize):
            from .pallas.interp_kernel import batched_interp

            out = batched_interp(xp2, fp2, q2)
        else:
            out = interp_sortmerge(xp2, fp2, q2)
    else:
        if L <= 1024:
            out = jax.vmap(lambda qq, xx, ff: interp_ramp(qq, xx, ff))(q2, xp2, fp2)
        else:
            out = interp_sortmerge(xp2, fp2, q2)
    return out.reshape(*lead, Q)


def interp_rows_multi(xp, fps, q):
    """Like :func:`interp_rows` but mapping the same queries through several
    value tables that share one knot vector (fused on the sort-merge path)."""
    lead = xp.shape[:-1]
    L = xp.shape[-1]
    Q = q.shape[-1]
    if q.shape[:-1] != lead:
        q = jnp.broadcast_to(q, (*lead, Q))
    xp2 = xp.reshape(-1, L)
    fps2 = [fp.reshape(-1, L) for fp in fps]
    q2 = q.reshape(-1, Q)
    if _use_pallas() and _pallas_feasible(L, Q, q.dtype.itemsize):
        from .pallas.interp_kernel import batched_interp

        outs = [batched_interp(xp2, fp2, q2) for fp2 in fps2]
    elif not _use_pallas() and L <= 1024:
        outs = [
            jax.vmap(lambda qq, xx, ff: interp_ramp(qq, xx, ff))(q2, xp2, fp2) for fp2 in fps2
        ]
    else:
        outs = interp_sortmerge_multi(xp2, tuple(fps2), q2)
    return [o.reshape(*lead, Q) for o in outs]


def interp_sortmerge(xp, fp, q):
    """Gather-free batched interp via sort-merge (any query order, any L).

    Concatenates knots and queries per row, sorts once with payloads
    (``lax.sort`` is a TPU-native sorting network — no data-dependent
    gathers), recovers each query's bracketing knots with prefix-max /
    suffix-min scans (valid because ``xp`` AND ``fp`` are monotone), and
    restores original query order with a second payload sort.  Semantics
    match :func:`interp_ramp` (np.interp + near-anchor + last-tie: the
    stable sort places tied knots before tied queries, reproducing
    ``side='right'`` bracketing).
    """
    return interp_sortmerge_multi(xp, (fp,), q)[0]


def interp_sortmerge_multi(xp, fps, q):
    """Sort-merge interp of the same queries against SEVERAL monotone value
    tables sharing one knot vector ``xp`` — one merge, multiple payloads
    (EDCDFm maps each test quantile through both the train-X and train-y
    CDFs, whose plotting-position knots are identical by construction)."""
    B, L = xp.shape
    Q = q.shape[-1]
    dtype = q.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype)
    n_fp = len(fps)

    # Operand accounting (sorts are bandwidth-bound; every payload rides all
    # log-passes): the knot/query flag IS ``pos == Q`` (knots carry pos=Q,
    # queries their index), and the back sort needn't carry the query values
    # — restored order makes them ``q`` itself.  4+6 operands -> 3+5 for one
    # value table (measured on-chip on the MBCn loop: see bench.py mbcn).
    keys = jnp.concatenate([xp, q], axis=-1)  # (B, L+Q)
    fvs = [jnp.concatenate([fp, jnp.zeros((B, Q), dtype)], axis=-1) for fp in fps]
    pos = jnp.concatenate(
        [jnp.full((B, L), Q, jnp.int32), jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32), (B, Q))],
        axis=-1,
    )
    # stable + knots first in concatenation order => tied knots sort before
    # tied queries, reproducing np.searchsorted(side='right') bracketing
    sorted_ops = jax.lax.sort((keys, pos, *fvs), num_keys=1, is_stable=True, dimension=1)
    key_s, pos_s = sorted_ops[:2]
    fv_s = sorted_ops[2:]

    knot = pos_s == Q
    x0 = jax.lax.cummax(jnp.where(knot, key_s, -inf), axis=1)
    x1 = jax.lax.cummin(jnp.where(knot, key_s, inf), axis=1, reverse=True)
    f0s = [jax.lax.cummax(jnp.where(knot, fv, -inf), axis=1) for fv in fv_s]
    f1s = [jax.lax.cummin(jnp.where(knot, fv, inf), axis=1, reverse=True) for fv in fv_s]

    # restore original query order: queries sort to the front by pos
    # (knots carry pos=Q and land behind every query)
    back = jax.lax.sort(
        (pos_s, x0, x1, *f0s, *f1s), num_keys=1, is_stable=True, dimension=1
    )
    qv = q  # the restored query keys are q itself — no need to sort them back
    x0, x1 = (a[:, :Q] for a in back[1:3])
    f0s = [a[:, :Q] for a in back[3 : 3 + n_fp]]
    f1s = [a[:, :Q] for a in back[3 + n_fp :]]

    x0c = jnp.clip(x0, -big, big)
    x1c = jnp.clip(x1, -big, big)
    dx = x1c - x0c
    dx_safe = jnp.where(dx != 0, dx, 1.0)
    use_right = (qv - x0c) > (x1c - qv)
    outs = []
    for fp, f0, f1 in zip(fps, f0s, f1s):
        f1c = jnp.minimum(f1, big)
        slope = (f1c - f0) / dx_safe
        slope = jnp.where(dx != 0, slope, 0.0)
        res = jnp.where(use_right, f1c + (qv - x1c) * slope, f0 + (qv - x0c) * slope)
        res = jnp.where(qv < xp[:, :1], fp[:, :1], res)
        res = jnp.where(qv > xp[:, -1:], fp[:, -1:], res)
        outs.append(res)
    return outs


def interp_ramp(x, xp, fp):
    """``np.interp`` (clamped ends) as a dense one-hot formulation — the
    TPU-native interp for small-to-medium tables.

    The interval index is a comparison count (``Σ xp <= x`` — a dense
    (queries x knots) bool reduction on the VPU, no binary search) and the
    knot values are selected with a one-hot matmul (MXU) instead of gathers.
    The final lerp is numpy's own local formula
    ``fp[i] + (x - xp[i]) * (fp[i+1] - fp[i]) / (xp[i+1] - xp[i])`` — no
    telescoping sums, so huge synthetic endpoints (the quantile machinery's
    ±1e20 sentinels) don't poison interior queries.  Orders of magnitude
    faster than ``jnp.interp``'s binary-search lowering under (double-)vmap
    on TPU.

    Edge semantics match ``np.interp``: ends clamp, tied knots resolve to
    the last tie, ``+inf``-padded ragged tails clamp to the last valid knot.
    """
    # Bracketing knots via masked min/max REDUCTIONS over the knot axis —
    # valid because every table here is a CDF (xp and fp both monotone
    # non-decreasing).  XLA fuses broadcast-compare-reduce chains into pure
    # VPU loops with no materialized intermediates, unlike gather/one-hot
    # selection which is orders of magnitude slower under double vmap.
    inf = jnp.asarray(jnp.inf, x.dtype)
    le = x[..., None] >= xp  # (..., L)
    x0 = jnp.max(jnp.where(le, xp, -inf), axis=-1)  # xp[i],  i = last knot <= x
    f0 = jnp.max(jnp.where(le, fp, -inf), axis=-1)  # fp[i]   (last tie wins)
    x1 = jnp.min(jnp.where(le, inf, xp), axis=-1)  # xp[i+1]
    f1 = jnp.min(jnp.where(le, inf, fp), axis=-1)  # fp[i+1]
    # clip ±inf (pads / empty brackets) to a huge finite bound so the pad
    # interval's slope is exactly representable (≈0) instead of inf*0 = NaN
    big = jnp.asarray(jnp.finfo(x.dtype).max / 8, x.dtype)
    x0 = jnp.clip(x0, -big, big)
    x1 = jnp.clip(x1, -big, big)
    f1 = jnp.minimum(f1, big)
    dx = x1 - x0
    slope = (f1 - f0) / jnp.where(dx != 0, dx, 1.0)
    slope = jnp.where(dx != 0, slope, 0.0)  # zero-width interval -> f0
    # evaluate from the NEARER knot: numerically stable when one knot is a
    # huge synthetic endpoint (±1e20 pp sentinels).  np.interp always anchors
    # left and returns catastrophic-cancellation noise there; this returns
    # the exact linear value instead (documented divergence).
    use_right = (x - x0) > (x1 - x)
    res = jnp.where(use_right, f1 + (x - x1) * slope, f0 + (x - x0) * slope)
    res = jnp.where(x < xp[0], fp[0], res)
    res = jnp.where(x > xp[-1], fp[-1], res)
    return res


def interp(x, xp, fp, left=None, right=None):
    """``np.interp`` with static left/right overrides.

    ``left``/``right`` are static Python scalars or None (np.interp default:
    clamp to the end values of ``fp``).  Uses the dense ramp formulation
    (see :func:`interp_ramp`) — the binary-search lowering of
    ``jnp.interp`` is orders of magnitude slower on TPU under vmap.
    """
    res = interp_ramp(x, xp, fp)
    if left is not None:
        res = jnp.where(x < xp[0], left, res)
    if right is not None:
        res = jnp.where(x > xp[-1], right, res)
    return res


def pad_table(xp, fp, valid):
    """Prepare a ragged table for :func:`interp_padded`.

    Invalid (padding) entries must be at the *end*.  Sets padded ``xp`` to
    ``+inf`` (preserves sorted order) and padded ``fp`` to the last *valid*
    ``fp`` — this keeps ``fp`` monotone (required by the reduction-based
    bracketing in :func:`interp_ramp`) and makes the slope into the pad
    region exactly 0, so queries beyond the last valid knot clamp to the
    last valid ``fp`` (np.interp's default right behavior).
    """
    xp = jnp.where(valid, xp, jnp.inf)
    f_last = jnp.max(jnp.where(valid, fp, -jnp.inf), axis=-1, keepdims=True)
    fp = jnp.where(valid, fp, f_last)
    return xp, fp


def interp_padded(x, xp, fp, n_valid, left=None, right=None):
    """``np.interp(x, xp[:n_valid], fp[:n_valid], left, right)`` with a
    fixed-shape padded table.

    ``xp``/``fp`` must already be in :func:`pad_table` form; ``n_valid`` may
    be traced.  ``left``/``right`` are static scalars or None.
    """
    res = interp_ramp(x, xp, fp)  # inf pads clamp to the last valid knot
    if right is not None:
        res = jnp.where(x > xp[n_valid - 1], right, res)
    if left is not None:
        res = jnp.where(x < xp[0], left, res)
    return res
