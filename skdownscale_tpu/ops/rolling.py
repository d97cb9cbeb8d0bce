"""Centered rolling statistics as masked convolutions.

The reference leans on pandas/xarray rolling windows — the 9-point centered
monthly climate-trend mean in BCSD (``bcsd.py:246-250``,
``rolling(9, center=True, min_periods=1).mean()``) and the 31-day rolling
mean/std in z-score (``zscore.py:185-189``, ``267-269``).  On TPU a small
centered window is a masked convolution: windowed sums of ``x*valid`` and of
``valid`` counts.  This is exact (no cumsum cancellation) and maps to the VPU.

Functions operate on the last axis and broadcast over leading axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rolling_mean", "rolling_std", "rolling_sum_count"]


def _window_sum(x, window: int, center: bool):
    """Sum over a trailing (or centered) window via padded sliding adds.

    One padded buffer + a sequential ``fori_loop`` accumulation: at
    continental scale an unrolled shift stack made XLA keep every shifted
    copy live (~9 x 1.9 GB at 1M cells — the round-2 OOM), while the loop
    carries a single accumulator.  Addition order equals the old unrolled
    ascending-offset stack, so results are bit-identical.  No cumsum
    cancellation (each output is a fresh w-term sum).
    """
    n = x.shape[-1]
    if center:
        # pandas center=True for window w covers indices [i - w//2, i + (w-1)//2]
        lo = -(window // 2)
        hi = (window - 1) // 2
    else:
        lo = -(window - 1)
        hi = 0
    w = hi - lo + 1
    # xp[i + j] == x[i + lo + j] with out-of-range positions = 0
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(-lo, hi)])

    def body(j, acc):
        return acc + jax.lax.dynamic_slice_in_dim(xp, j, n, axis=-1)

    return jax.lax.fori_loop(0, w, body, jnp.zeros_like(x))


def rolling_sum_count(x, valid, window: int, center: bool = True):
    """Windowed sum of ``x*valid`` and windowed count of ``valid``."""
    v = valid.astype(x.dtype)
    return _window_sum(x * v, window, center), _window_sum(v, window, center)


def rolling_mean(x, window: int, *, center: bool = True, min_periods: int | None = None, valid=None):
    """Centered rolling mean with pandas ``min_periods`` semantics.

    ``valid`` marks real (non-padding) entries; positions with fewer than
    ``min_periods`` valid points in their window yield NaN (pandas default
    ``min_periods=window``; BCSD uses ``min_periods=1``, ``bcsd.py:248``).
    """
    if valid is None:
        valid = jnp.ones_like(x, dtype=bool)
    mp = window if min_periods is None else min_periods
    s, c = rolling_sum_count(x, valid, window, center)
    mean = s / jnp.where(c > 0, c, 1)
    return jnp.where(c >= mp, mean, jnp.nan)


def rolling_std(
    x, window: int, *, center: bool = True, min_periods: int | None = None, ddof: int = 1, valid=None
):
    """Centered rolling standard deviation (pandas default ``ddof=1``,
    xarray default ``ddof=0``). Two-pass (mean then centered squares) for
    numerical robustness at f32."""
    if valid is None:
        valid = jnp.ones_like(x, dtype=bool)
    mp = window if min_periods is None else min_periods
    s, c = rolling_sum_count(x, valid, window, center)
    cc = jnp.where(c > 0, c, 1)
    mean = s / cc
    s2, _ = rolling_sum_count(x * x, valid, window, center)
    # sum (x - m)^2 = sum x^2 - 2 m sum x + c m^2
    ss = s2 - 2 * mean * s + c * mean * mean
    denom = jnp.maximum(c - ddof, 1)
    var = jnp.maximum(ss, 0.0) / denom
    std = jnp.sqrt(var)
    return jnp.where((c >= mp) & (c > ddof), std, jnp.nan)
