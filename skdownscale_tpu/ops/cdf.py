"""CDF construction with synthetic-endpoint extrapolation.

Re-implements the numerical recipe of the reference's quantile machinery —
``plotting_positions`` (``/root/reference/skdownscale/pointwise_models/quantile.py:23-43``)
and ``QuantileMappingReressor._calc_extrapolated_cdf``
(``quantile.py:312-387``) — as fixed-shape, vmappable JAX functions.

A CDF of ``n`` samples is a pair of ``(n+2,)`` vectors: Cunnane plotting
positions bracketed by two synthetic endpoints whose values depend on the
``extrapolate`` mode (``None``/``'1to1'`` duplicate the end knots;
``'min'``/``'max'``/``'both'`` push the endpoint plotting position to
``∓1e20`` and linearly extrapolate the endpoint *value* from the first/last
``n_endpoints`` knots by OLS).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .regression import ols_1d, ols_predict_1d

SYNTHETIC_MIN = -1e20  # quantile.py:17
SYNTHETIC_MAX = 1e20  # quantile.py:18

_VALID_EXTRAPOLATE = (None, "1to1", "min", "max", "both")

__all__ = ["Cdf", "plotting_positions", "calc_extrapolated_cdf", "SYNTHETIC_MIN", "SYNTHETIC_MAX"]


class Cdf(NamedTuple):
    """Mirror of the reference's ``Cdf`` namedtuple (``quantile.py:20``)."""

    pp: jnp.ndarray
    vals: jnp.ndarray


def plotting_positions(n: int, alpha: float = 0.4, beta: float = 0.4, dtype=jnp.float64):
    """Cunnane plotting positions; exact port of ``quantile.py:23-43``."""
    return (jnp.arange(1, n + 1, dtype=dtype) - alpha) / (n + 1.0 - alpha - beta)


def calc_extrapolated_cdf(
    data,
    *,
    sort: bool = True,
    extrapolate: str | None = None,
    n_endpoints: int = 10,
    pp_min: float = SYNTHETIC_MIN,
    pp_max: float = SYNTHETIC_MAX,
) -> Cdf:
    """Build an extrapolated CDF from ``(..., n)`` data (leading batch dims
    preserved; the pp vector broadcasts over them).

    Semantics of ``quantile.py:312-387``.  ``extrapolate`` / ``n_endpoints``
    are static.  Returns ``Cdf`` of two ``(..., n+2)`` arrays.
    """
    if extrapolate not in _VALID_EXTRAPOLATE:
        raise ValueError(f"unknown value for extrapolate: {extrapolate}")
    n = data.shape[-1]
    if sort:
        data = jnp.sort(data, axis=-1)

    pp_core = plotting_positions(n, dtype=data.dtype)
    if extrapolate in (None, "1to1"):
        pp_first, pp_last = pp_core[0], pp_core[-1]
    elif extrapolate == "both":
        pp_first, pp_last = jnp.asarray(pp_min, data.dtype), jnp.asarray(pp_max, data.dtype)
    elif extrapolate == "max":
        pp_first, pp_last = pp_core[0], jnp.asarray(pp_max, data.dtype)
    else:  # 'min'
        pp_first, pp_last = jnp.asarray(pp_min, data.dtype), pp_core[-1]
    pp = jnp.concatenate([pp_first[None], pp_core, pp_last[None]])
    pp = jnp.broadcast_to(pp, (*data.shape[:-1], n + 2))

    v_first = data[..., 0]
    v_last = data[..., -1]
    if extrapolate in ("min", "both"):
        # OLS of vals ~ pp over the first n_endpoints knots, evaluated at pp[0]
        slope, intercept = ols_1d(pp_core[:n_endpoints], data[..., :n_endpoints])
        v_first = ols_predict_1d(slope, intercept, pp_first)
    if extrapolate in ("max", "both"):
        slope, intercept = ols_1d(pp_core[-n_endpoints:], data[..., -n_endpoints:])
        v_last = ols_predict_1d(slope, intercept, pp_last)
    vals = jnp.concatenate([v_first[..., None], data, v_last[..., None]], axis=-1)
    return Cdf(pp, vals)
