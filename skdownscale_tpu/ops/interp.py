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

import jax.numpy as jnp

__all__ = ["interp", "interp_padded", "pad_table"]


def interp(x, xp, fp, left=None, right=None):
    """``np.interp`` with static left/right overrides.

    ``left``/``right`` are static Python scalars or None (np.interp default:
    clamp to the end values of ``fp``).
    """
    res = jnp.interp(x, xp, fp)
    if left is not None:
        res = jnp.where(x < xp[0], left, res)
    if right is not None:
        res = jnp.where(x > xp[-1], right, res)
    return res


def pad_table(xp, fp, valid):
    """Prepare a ragged table for :func:`interp_padded`.

    Invalid (padding) entries must be at the *end*.  Sets padded ``xp`` to
    ``+inf`` (preserves sorted order) and padded ``fp`` to 0 (makes the
    interpolation slope into the pad region exactly 0, so queries beyond the
    last valid knot clamp to the last valid ``fp`` — np.interp's default
    right behavior).
    """
    xp = jnp.where(valid, xp, jnp.inf)
    fp = jnp.where(valid, fp, 0.0)
    return xp, fp


def interp_padded(x, xp, fp, n_valid, left=None, right=None):
    """``np.interp(x, xp[:n_valid], fp[:n_valid], left, right)`` with a
    fixed-shape padded table.

    ``xp``/``fp`` must already be in :func:`pad_table` form; ``n_valid`` may
    be traced.  ``left``/``right`` are static scalars or None.
    """
    res = jnp.interp(x, xp, fp)
    x_last = xp[n_valid - 1]
    f_last = fp[n_valid - 1]
    # beyond the last valid knot: np.interp default clamps to fp[n_valid-1]
    res = jnp.where(x > x_last, f_last if right is None else right, res)
    if left is not None:
        res = jnp.where(x < xp[0], left, res)
    return res
