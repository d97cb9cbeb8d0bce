"""Linear trend removal.

TPU-native re-design of ``LinearTrendTransformer``
(``/root/reference/skdownscale/pointwise_models/trend.py:14-91``): the
reference fits one ``sklearn.LinearRegression`` per series against
``arange(n)``; here the fit is a centered closed form (``ops.regression.ols_1d``)
on a per-series functional core, vmappable over cells and feature columns.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.regression import ols_1d, ols_predict_1d
from .base import SingleCellTransformer, asarray_2d

__all__ = [
    "TrendState",
    "trend_fit",
    "trend_fit_opts",
    "trend_line",
    "trend_transform",
    "trend_inverse",
    "LinearTrendTransformer",
]


class TrendState(NamedTuple):
    slope: jnp.ndarray  # (...,) per feature column
    intercept: jnp.ndarray


def trend_fit(x) -> TrendState:
    """Fit ``x ~ a + b*arange(n)`` over the last axis. ``x``: (..., n)."""
    t = jnp.arange(x.shape[-1], dtype=x.dtype)
    slope, intercept = ols_1d(t, x)
    return TrendState(slope, intercept)


def trend_fit_opts(x, fit_intercept: bool = True, positive: bool = False) -> TrendState:
    """``trend_fit`` honoring sklearn ``LinearRegression(fit_intercept,
    positive)`` semantics (the reference forwards ``lr_kwargs`` to sklearn,
    ``trend.py:48-51``).  ``positive`` follows sklearn's NNLS-on-centered-data
    formulation, which for a single regressor reduces to clamping the OLS
    slope at zero and re-solving the intercept."""
    t = jnp.arange(x.shape[-1], dtype=x.dtype)
    if fit_intercept:
        slope, intercept = ols_1d(t, x)
        if positive:
            clamped = slope < 0
            slope = jnp.where(clamped, 0.0, slope)
            intercept = jnp.where(clamped, jnp.mean(x, axis=-1), intercept)
    else:
        slope = jnp.sum(t * x, axis=-1) / jnp.sum(t * t)
        if positive:
            slope = jnp.maximum(slope, 0.0)
        intercept = jnp.zeros_like(slope)
    return TrendState(slope, intercept)


def trend_line(state: TrendState, n: int, dtype=None):
    """Evaluate the fitted trendline at ``arange(n)`` -> (..., n)."""
    dtype = dtype or jnp.result_type(state.slope)
    t = jnp.arange(n, dtype=dtype)
    return ols_predict_1d(state.slope[..., None], state.intercept[..., None], t)


def trend_transform(state: TrendState, x):
    return x - trend_line(state, x.shape[-1], x.dtype)


def trend_inverse(state: TrendState, x):
    return x + trend_line(state, x.shape[-1], x.dtype)


class LinearTrendTransformer(SingleCellTransformer):
    """sklearn-compatible wrapper (API of ``trend.py:14-91``).

    Parameters
    ----------
    lr_kwargs : dict, optional
        Forwarded sklearn ``LinearRegression`` options (``trend.py:48-51``).
        ``fit_intercept`` and ``positive`` are honored; ``copy_X`` / ``n_jobs``
        are accepted no-ops; anything else raises.
    """

    _fit_attributes = ["lr_model_"]

    def __init__(self, lr_kwargs=None):
        self.lr_kwargs = lr_kwargs

    def _lr_options(self):
        kw = dict(self.lr_kwargs or {})
        fit_intercept = bool(kw.pop("fit_intercept", True))
        positive = bool(kw.pop("positive", False))
        kw.pop("copy_X", None)
        kw.pop("n_jobs", None)
        if kw:
            raise ValueError(f"unsupported lr_kwargs: {sorted(kw)}")
        return fit_intercept, positive

    def fit(self, X, y=None):
        X = self._validate_data(X)
        vals = asarray_2d(X)  # (n, k)
        fit_intercept, positive = self._lr_options()
        state = jax.jit(trend_fit_opts, static_argnums=(1, 2))(
            jnp.asarray(vals.T), fit_intercept, positive
        )
        self.lr_model_ = _FittedLinearModel(
            coef_=np.asarray(state.slope).reshape(-1, 1),
            intercept_=np.asarray(state.intercept),
        )
        self._state = state
        self._n_fit = vals.shape[0]
        return self

    def transform(self, X):
        self._check_is_fitted()
        X = self._validate_data(X, reset=False)
        return X - self.trendline(X)

    def inverse_transform(self, X):
        self._check_is_fitted()
        X = self._validate_data(X, reset=False)
        return X + self.trendline(X)

    def trendline(self, X):
        """Trendline evaluated over ``arange(len(X))`` (``trend.py:80-83``)."""
        self._check_is_fitted()
        n = len(asarray_2d(X))
        line = trend_line(self._state, n)
        return np.asarray(line).T  # (n, k)


class _FittedLinearModel:
    """Duck-type of the fitted ``sklearn.LinearRegression`` the reference
    exposes as ``lr_model_`` (used by ``QuantileMapper`` at
    ``quantile.py:145`` for the intercept-bias reset)."""

    def __init__(self, coef_, intercept_):
        self.coef_ = coef_
        self.intercept_ = intercept_

    def predict(self, t):
        t = np.asarray(t).reshape(-1)
        return t[:, None] * self.coef_.T + self.intercept_[None, :]
