"""Day-of-year z-score bias correction, TPU-native.

Re-design of ``ZScoreRegressor``
(``/root/reference/skdownscale/pointwise_models/zscore.py``).  The reference
reshapes the series to a (year, day-of-year) xarray with December/January
bookends and takes a 31-day rolling ``construct`` mean/std over (year,
win_day) (``zscore.py:123-193``); here the (year, doy) matrix is a host-built
gather table and the windowed masked statistics are fixed-shape array ops.

Semantics preserved exactly:

* bookends: last ``window//2 + 1`` day-columns prepended, first ``window//2``
  appended (``zscore.py:155-158``), then trim ``window//2 + 1`` from both ends
  (``zscore.py:187-189``) — every remaining window is full-width;
* fit stats pool over years and window with NaN-skipping, ``ddof=0``
  (xarray defaults); predict rolling stats use pandas semantics —
  ``min_periods=window`` (NaN edges) and ``ddof=1`` (``zscore.py:267-269``);
* parameter expansion tiles the first ``min(n, 364)`` day-parameters
  positionally from the start of the series (``zscore.py:299-319``),
  ignoring calendar alignment, exactly as the reference does.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rolling import _window_sum, rolling_mean_std
from .base import SingleCellEstimator, asarray_2d

__all__ = ["ZScoreRegressor", "zscore_fit", "zscore_predict", "build_year_doy_table"]


def build_year_doy_table(index) -> tuple[np.ndarray, np.ndarray]:
    """Host-side (year, doy) gather table for a DatetimeIndex.

    Returns ``(idx, mask)`` of shape (n_years, n_days) where ``idx[y, d]``
    indexes the series and ``mask`` marks observed (year, doy) pairs.  The
    day axis is the union of observed day-of-year values (365 or 366),
    mirroring the xarray groupby/concat alignment (``zscore.py:150-158``).
    """
    years = np.asarray(index.year)
    doys = np.asarray(index.dayofyear)
    uyears = np.unique(years)
    ndays = int(doys.max())
    yrow = {int(y): i for i, y in enumerate(uyears)}
    idx = np.zeros((len(uyears), ndays), dtype=np.int32)
    mask = np.zeros((len(uyears), ndays), dtype=bool)
    for t, (yy, dd) in enumerate(zip(years, doys)):
        idx[yrow[int(yy)], dd - 1] = t
        mask[yrow[int(yy)], dd - 1] = True
    return idx, mask


class ZScoreState(NamedTuple):
    shift: jnp.ndarray  # (D-1,)
    scale: jnp.ndarray  # (D-1,)
    x_mean: jnp.ndarray  # (D-1,)
    x_std: jnp.ndarray
    y_mean: jnp.ndarray
    y_std: jnp.ndarray


def _doy_window_stats(v, idx, mask, window: int):
    """Windowed masked mean/std (ddof=0) per day-of-year, pooled over years
    (``zscore.py:162-193``).

    The year pooling and the day-of-year windowed sum are both linear, so
    they commute: pooling FIRST reduces the six windowed sums from
    ``(cells, Y, ~D+w)`` tensors to ``(cells, ~D+w)`` — ~Y-fold less
    windowed-sum traffic (the unrolled ``w``-tap sum is the most
    bandwidth-hostile op in the program: each tap is a sublane-shifted
    slice; round-5 profiler measured such fusions at ~17% of peak HBM
    bandwidth).  Values are identical up to float summation order
    (reference comparisons hold at 1e-9 in f64)."""
    M = jnp.where(mask, v[idx], 0.0)  # (..., Y, D)
    # pool over years first: one pass over the big gathered tensor
    P1 = jnp.sum(M, axis=-2)  # (..., D)
    P2 = jnp.sum(M * M, axis=-2)
    PC = jnp.sum(mask, axis=-2).astype(P1.dtype)  # (D,)
    # bookends (zscore.py:155-158): late_decs = isel(slice(-window//2, None))
    # — Python floor division makes that ceil(window/2) columns — and
    # early_jans = the first window//2 columns
    nlo = (window + 1) // 2
    nhi = window // 2

    def cat(a):
        return jnp.concatenate([a[..., -nlo:], a, a[..., :nhi]], axis=-1)

    s1 = _window_sum(cat(P1), window, center=True)
    s2 = _window_sum(cat(P2), window, center=True)
    c = jnp.broadcast_to(_window_sum(cat(PC), window, center=True), s1.shape)
    cc = jnp.maximum(c, 1.0)
    mean = s1 / cc
    var = jnp.maximum(s2 / cc - mean * mean, 0.0)
    std = jnp.sqrt(var)
    trim = window // 2 + 1
    return mean[trim:-trim], std[trim:-trim]


@functools.partial(jax.jit, static_argnames=("window",))
def zscore_fit(x, y, idx, mask, *, window: int = 31) -> ZScoreState:
    """``ZScoreRegressor.fit`` core (``zscore.py:32-69``)."""
    x_mean, x_std = _doy_window_stats(x, idx, mask, window)
    y_mean, y_std = _doy_window_stats(y, idx, mask, window)
    shift = y_mean - x_mean  # zscore.py:237
    scale = y_std / x_std  # zscore.py:238
    return ZScoreState(shift, scale, x_mean, x_std, y_mean, y_std)


@functools.partial(jax.jit, static_argnames=("window",))
def zscore_predict(state: ZScoreState, x, expand_inds, *, window: int = 31):
    """``ZScoreRegressor.predict`` core (``zscore.py:71-112``)."""
    # min_periods=window -> NaN edges, ddof=1 (zscore.py:267-269); the fused
    # form shares the windowed sums and, on TPU/f32 long rows, runs all
    # three as one stacked blocked-banded MXU matmul (ops/rolling.py)
    fut_mean, fut_std = rolling_mean_std(x, window, center=True, ddof=1)
    fut_zscore = (x - fut_mean) / fut_std
    shift_exp = state.shift[expand_inds]
    scale_exp = state.scale[expand_inds]
    mean_corr = fut_mean + shift_exp
    std_corr = fut_std * scale_exp
    return fut_zscore * std_corr + mean_corr, fut_mean, fut_std, mean_corr, std_corr


def expand_indices(n: int, len_avgyr: int = 364) -> np.ndarray:
    """``_expand_params`` index construction (``zscore.py:299-319``)."""
    la = min(n, len_avgyr)
    repeats = n // la
    remainder = n % la
    return np.concatenate([np.tile(np.arange(la), repeats), np.arange(remainder)]).astype(np.int32)


class ZScoreRegressor(SingleCellEstimator):
    """API of ``zscore.py:11-120``."""

    _fit_attributes = ["shift_", "scale_"]
    _timestep = "MS"

    def __init__(self, window_width: int = 31):
        # validated at fit time, per sklearn convention (no errors in __init__)
        self.window_width = window_width

    def _index(self, X, n):
        import pandas as pd

        if hasattr(X, "index") and isinstance(X.index, pd.DatetimeIndex):
            return X.index
        import warnings

        warnings.warn("X does not have a pandas DateTimeIndex, making one up...")
        return pd.date_range(start="1950", periods=n, freq=self._timestep)

    def fit(self, X, y):
        if self.window_width <= 0:
            raise ValueError(f"window_width must be positive, got {self.window_width}")
        X, y = self._validate_data(X, y)
        Xa, ya = asarray_2d(X), asarray_2d(y)
        if Xa.shape[1] != 1:
            raise ValueError(f"Zscore only supports 1 feature, found {Xa.shape[1]}")
        index = self._index(X, len(Xa))
        idx, mask = build_year_doy_table(index)
        state = zscore_fit(
            jnp.asarray(Xa[:, 0]),
            jnp.asarray(ya[:, 0]),
            jnp.asarray(idx),
            jnp.asarray(mask),
            window=self.window_width,
        )
        self._state = jax.tree_util.tree_map(np.asarray, state)
        self.shift_ = np.asarray(state.shift)
        self.scale_ = np.asarray(state.scale)
        # day-of-year-indexed pandas Series, as the reference stores them
        # (``zscore.py:58-63``; its groupby('index.dayofyear') yields a
        # 1-based DOY index)
        import pandas as pd

        doy_index = pd.RangeIndex(1, len(np.asarray(state.shift)) + 1, name="dayofyear")
        self.fit_stats_dict_ = {
            "X_mean": pd.Series(np.asarray(state.x_mean), index=doy_index),
            "X_std": pd.Series(np.asarray(state.x_std), index=doy_index),
            "y_mean": pd.Series(np.asarray(state.y_mean), index=doy_index),
            "y_std": pd.Series(np.asarray(state.y_std), index=doy_index),
        }
        return self

    def predict(self, X):
        self._check_is_fitted()
        X = self._validate_data(X, reset=False)
        Xa = asarray_2d(X)
        if Xa.shape[1] != 1:
            raise ValueError(f"X must have exactly 1 feature, got {Xa.shape[1]}")
        inds = expand_indices(len(Xa))
        state = ZScoreState(*[jnp.asarray(a) for a in self._state])
        corrected, meani, stdi, meanf, stdf = zscore_predict(
            state, jnp.asarray(Xa[:, 0]), jnp.asarray(inds), window=self.window_width
        )
        stats = {
            "meani": np.asarray(meani),
            "stdi": np.asarray(stdi),
            "meanf": np.asarray(meanf),
            "stdf": np.asarray(stdf),
        }
        out = np.asarray(corrected)
        if hasattr(X, "iloc"):
            import pandas as pd

            # time-indexed Series, as the reference stores them
            # (``zscore.py:103-108``)
            self.predict_stats_dict_ = {
                k: pd.Series(v, index=X.index) for k, v in stats.items()
            }
            name = list(X.keys())[0] if hasattr(X, "keys") else 0
            return pd.DataFrame({name: out}, index=X.index)
        self.predict_stats_dict_ = stats
        return out.reshape(-1, 1)
