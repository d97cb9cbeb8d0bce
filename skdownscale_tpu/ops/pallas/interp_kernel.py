"""Pallas TPU kernel: batched monotone-table linear interpolation.

The hottest primitive in the framework (SURVEY.md §2.3: ``np.interp`` is the
reference's single hottest call).  The XLA lowering of the batched bracketing
— a (rows, queries, knots) broadcast-compare plus four masked reductions —
materializes multi-GB intermediates in HBM under double vmap and runs
seconds; this kernel runs the same math in milliseconds.

Layout: the *batch* (row) axis lives in the 128-wide lane dimension.  Each
grid step holds transposed blocks ``xpT (L, TB)``, ``fpT (L, TB)``,
``qT (Q, TB)`` in VMEM and runs one ``fori_loop`` over the L knots, keeping
four running (Q, TB) bracket registers:

* ascending knots with ``xp[l] <= q`` overwrite (x0, f0) — the *last* such
  knot wins, which is exactly np.interp's last-tie semantics;
* the smallest knot ``> q`` is kept by a min-update for (x1, f1).

Every vector op is (Q, TB) with full lane utilization; the only HBM traffic
is one pass over tables + queries + output.  Dynamic ref slicing happens on
the major dimension only (minor-dim dynamic slicing is unsupported).

Requirements: per row, ``xp`` and ``fp`` monotone non-decreasing (CDF
tables); ragged rows padded per ``ops.interp.pad_table`` (+inf / last-valid).
Semantics match ``ops.interp.interp_ramp`` (np.interp with clamped ends,
last-tie resolution, near-anchor evaluation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["batched_interp"]


def _interp_kernel(xpT_ref, fpT_ref, qT_ref, outT_ref):
    dtype = qT_ref.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype)
    L = xpT_ref.shape[0]
    qT = qT_ref[:]  # (Q, TB)

    def body(l, carry):
        x0, f0, x1, f1 = carry
        xl = xpT_ref[pl.ds(l, 1), :]  # (1, TB)
        fl = fpT_ref[pl.ds(l, 1), :]
        le = qT >= xl  # (Q, TB)
        x0 = jnp.where(le, xl, x0)  # ascending: last knot <= q wins
        f0 = jnp.where(le, fl, f0)
        upd = (~le) & (xl < x1)  # smallest knot > q
        x1 = jnp.where(upd, xl, x1)
        f1 = jnp.where(upd, fl, f1)
        return x0, f0, x1, f1

    init = (
        jnp.full_like(qT, -inf),
        jnp.full_like(qT, -inf),
        jnp.full_like(qT, inf),
        jnp.full_like(qT, inf),
    )
    x0, f0, x1, f1 = jax.lax.fori_loop(0, L, body, init)

    x0 = jnp.clip(x0, -big, big)
    x1 = jnp.clip(x1, -big, big)
    f1 = jnp.minimum(f1, big)
    dx = x1 - x0
    slope = (f1 - f0) / jnp.where(dx != 0, dx, 1.0)
    slope = jnp.where(dx != 0, slope, 0.0)
    use_right = (qT - x0) > (x1 - qT)
    res = jnp.where(use_right, f1 + (qT - x1) * slope, f0 + (qT - x0) * slope)
    xp_first = xpT_ref[0:1, :]
    fp_first = fpT_ref[0:1, :]
    xp_last = xpT_ref[L - 1 : L, :]
    fp_last = fpT_ref[L - 1 : L, :]
    res = jnp.where(qT < xp_first, fp_first, res)
    res = jnp.where(qT > xp_last, fp_last, res)
    outT_ref[:] = res


def _choose_tb(B: int, Q: int, L: int, itemsize: int):
    """Lane-dim block: VMEM holds (L+3Q, TB) blocks + ~6 (Q, TB) registers."""
    per_lane = (L + 3 * Q + 6 * Q) * itemsize
    tb = (8 * 1024 * 1024) // max(per_lane, 1)
    return max(128, min(B, tb // 128 * 128, 2048))


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_interp(xp, fp, q, *, interpret: bool = False):
    """Row-batched ``np.interp``: ``out[b, i] = interp(q[b, i], xp[b], fp[b])``.

    ``xp``/``fp``: (B, L) monotone rows (pad ragged rows with
    ``ops.interp.pad_table``); ``q``: (B, Q).  Returns (B, Q).
    """
    B, L = xp.shape
    Q = q.shape[1]
    tb = _choose_tb(B, Q, L, q.dtype.itemsize)

    pad_b = (-B) % tb
    if pad_b:
        # dummy monotone rows keep the kernel well-defined
        filler_x = jnp.broadcast_to(jnp.arange(L, dtype=xp.dtype), (pad_b, L))
        xp = jnp.concatenate([xp, filler_x], axis=0)
        fp = jnp.concatenate([fp, filler_x], axis=0)
        q = jnp.concatenate([q, jnp.zeros((pad_b, Q), q.dtype)], axis=0)

    xpT = xp.T  # (L, Bp)
    fpT = fp.T
    qT = q.T  # (Q, Bp)
    Bp = qT.shape[1]
    outT = pl.pallas_call(
        _interp_kernel,
        out_shape=jax.ShapeDtypeStruct((Q, Bp), q.dtype),
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((L, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xpT, fpT, qT)
    return outT.T[:B]
