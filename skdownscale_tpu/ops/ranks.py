"""Rank-based self-quantiles.

``CunnaneTransformer.fit_transform(x)`` — transform a series through the CDF
fit on *itself* — appears on the hot path of both ``QuantileMapper.transform``
(``/root/reference/skdownscale/pointwise_models/quantile.py:138``) and BCSD's
per-group transform.  The general implementation interpolates ``x`` against
``sort(x)``; but for self-queries the answer is exactly the value's rank
plotting position, with ties resolved to the LAST tied slot (np.interp's
tie semantics).  That turns a full batched interpolation into payload
carried through the sort that already exists, plus one reverse scan and one
short unsort — no table interp at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["self_quantiles"]


def self_quantiles(x, pp):
    """``np.interp(x, np.sort(x), pp)`` computed exactly, per row.

    ``x``: (..., n) (may contain +inf padding — pads receive garbage values
    that callers mask out); ``pp``: (n,) or broadcastable (..., n)
    non-decreasing plotting positions assigned to sorted order.

    Returns the per-element plotting position (..., n): element order
    preserved, tied values all take the last tied slot's pp.
    """
    n = x.shape[-1]
    lead = x.shape[:-1]
    rows = x.reshape(-1, n)
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), rows.shape)
    sv, spos = jax.lax.sort((rows, pos), num_keys=1, is_stable=True, dimension=1)

    pp_rows = jnp.broadcast_to(pp, (*lead, n)).reshape(-1, n)
    # last slot of each equal-value run carries the run's pp (np.interp
    # returns the last tie); pp is non-decreasing, so a reverse cummin of
    # run-end pps spreads each run's final pp across the run
    run_end = jnp.concatenate(
        [sv[:, 1:] != sv[:, :-1], jnp.ones((sv.shape[0], 1), bool)], axis=1
    )
    key = jnp.where(run_end, pp_rows, jnp.inf)
    pp_adj = jax.lax.cummin(key, axis=1, reverse=True)

    # unsort: one more short sort by original position with the pp payload
    _, pps = jax.lax.sort((spos, pp_adj), num_keys=1, is_stable=True, dimension=1)
    return pps.reshape(*lead, n)
