"""Batched (vmapped-over-cells) execution of the model zoo.

This module is the heart of the TPU re-design: where the reference runs one
Python estimator object per grid cell
(``/root/reference/skdownscale/pointwise_models/core.py:86-96``), each model
family here exposes a *batched* implementation operating on ``(cells, time)``
arrays — the per-cell functional cores vmapped over a leading cell axis, with
host-side group tables shared across cells.  Fitted state is a pytree of
``(cells, ...)`` arrays: co-sharded with the cell axis on a device mesh,
trivially checkpointable, and gatherable for ``get_attr``.

Dispatch is by estimator type via a registry; estimators without a batched
implementation fall back to the wrapper's per-cell loop (still correct — any
sklearn-style estimator works, as in the reference).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import arrm as _arrm
from . import bcsd as _bcsd
from . import gard as _gard
from . import quantile as _q
from . import trend as _t
from . import zscore as _z

__all__ = ["supports_batched", "batched_fit", "batched_predict", "batched_transform", "batched_attrs"]


class _Impl(NamedTuple):
    fit: Callable  # (model, index_fit, X (C,T,F), y (C,T)|None) -> state
    predict: Callable | None  # (model, state, index_fit, X, index) -> (C,T[,O])
    transform: Callable | None  # (model, state, index_fit, X, index, direction) -> (C,T)
    attrs: Callable | None  # (model, state) -> dict[str, np.ndarray (C,...)]
    accepts: Callable | None = None  # (model) -> bool: this instance batchable?


_REGISTRY: dict[type, _Impl] = {}


def register(cls, impl: _Impl) -> None:
    """Extension point: register a batched implementation for a custom
    estimator class (resolved through the MRO at dispatch time)."""
    _REGISTRY[cls] = impl


def _lookup(model) -> _Impl | None:
    for klass in type(model).__mro__:
        if klass in _REGISTRY:
            return _REGISTRY[klass]
    return None


def supports_batched(model) -> bool:
    impl = _lookup(model)
    return impl is not None and (impl.accepts is None or impl.accepts(model))


def batched_fit(model, index_fit, X, y):
    return _lookup(model).fit(model, index_fit, X, y)


def batched_predict(model, state, index_fit, X, index):
    return _lookup(model).predict(model, state, index_fit, X, index)


def batched_transform(model, state, index_fit, X, index, direction="transform"):
    return _lookup(model).transform(model, state, index_fit, X, index, direction)


def batched_attrs(model, state) -> dict:
    impl = _lookup(model)
    if impl is None or impl.attrs is None:
        return {}
    return impl.attrs(model, state)


def _single(X):
    """(C, T, F) -> (C, T), asserting a single feature."""
    if X.shape[-1] != 1:
        raise ValueError(f"this model supports 1 feature, found {X.shape[-1]}")
    return X[..., 0]


# ----------------------------------------------------------------------
# LinearTrendTransformer
# ----------------------------------------------------------------------


def _trend_fit(model, index_fit, X, y):
    # (C, T, F) -> per (cell, feature) slope/intercept
    return _t.trend_fit(jnp.moveaxis(X, 1, -1))  # (C, F, T) -> state (C, F)


def _trend_transform(model, state, index_fit, X, index, direction):
    line = _t.trend_line(state, X.shape[1], X.dtype)  # (C, F, T)
    line = jnp.moveaxis(line, -1, 1)
    return _single(X - line) if direction == "transform" else _single(X + line)


_REGISTRY[_t.LinearTrendTransformer] = _Impl(
    _trend_fit,
    None,
    _trend_transform,
    lambda model, state: {"slope_": np.asarray(state.slope), "intercept_": np.asarray(state.intercept)},
)


# ----------------------------------------------------------------------
# QuantileMapper
# ----------------------------------------------------------------------


def _qm_fit(model, index_fit, X, y):
    p = model._qt_params()
    return _q.qm_fit(_single(X), detrend=bool(model.detrend), alpha=p["alpha"], beta=p["beta"])


def _qm_transform(model, state, index_fit, X, index, direction):
    if direction != "transform":
        raise NotImplementedError("QuantileMapper has no inverse_transform in the reference")
    p = model._qt_params()
    return _q.qm_transform(
        state,
        _single(X),
        detrend=bool(model.detrend),
        alpha=p["alpha"],
        beta=p["beta"],
        extrapolate=p["extrapolate"],
        n_endpoints=p["n_endpoints"],
    )


_REGISTRY[_q.QuantileMapper] = _Impl(_qm_fit, None, _qm_transform, None)


# ----------------------------------------------------------------------
# CunnaneTransformer
# ----------------------------------------------------------------------


def _cunnane_fit(model, index_fit, X, y):
    return _q.cunnane_fit(_single(X), model.alpha, model.beta)


def _cunnane_transform(model, state, index_fit, X, index, direction):
    if direction == "transform":
        return _q.cunnane_transform(state, _single(X), model.extrapolate, model.n_endpoints)
    return _q.cunnane_inverse(state, _single(X), model.extrapolate, model.n_endpoints)


_REGISTRY[_q.CunnaneTransformer] = _Impl(_cunnane_fit, None, _cunnane_transform, None)


# ----------------------------------------------------------------------
# QuantileMappingReressor / EquidistantCdfMatcher
# ----------------------------------------------------------------------


def _qmr_fit(model, index_fit, X, y):
    return _q.qmr_fit(_single(X), y, extrapolate=model.extrapolate, n_endpoints=model.n_endpoints)


def _qmr_predict(model, state, index_fit, X, index):
    return _q.qmr_predict(
        state, _single(X), extrapolate=model.extrapolate, n_endpoints=model.n_endpoints
    )


_REGISTRY[_q.QuantileMappingReressor] = _Impl(_qmr_fit, _qmr_predict, None, None)


def _edcdfm_predict(model, state, index_fit, X, index):
    return _q.edcdfm_predict(
        state,
        _single(X),
        kind=model.kind,
        extrapolate=model.extrapolate,
        n_endpoints=model.n_endpoints,
        max_ratio=model.max_ratio,
    )


_REGISTRY[_q.EquidistantCdfMatcher] = _Impl(_qmr_fit, _edcdfm_predict, None, None)


# ----------------------------------------------------------------------
# TrendAwareQuantileMappingRegressor
# ----------------------------------------------------------------------


def _ta_trend_opts(model):
    """(fit_intercept, positive) of the model's LinearTrendTransformer."""
    tt = model.trend_transformer
    return _t.LinearTrendTransformer._lr_options(tt)


def _ta_accepts(model):
    """Batched path requires a plain ``LinearTrendTransformer`` (with
    supported ``lr_kwargs``) and a batchable inner qm_estimator; anything
    else falls back to the wrapper's exact per-cell loop."""
    tt = model.trend_transformer
    if type(tt) is not _t.LinearTrendTransformer:
        return False
    try:
        _ta_trend_opts(model)
    except ValueError:
        return False
    return supports_batched(model.qm_estimator)


def _ta_fit(model, index_fit, X, y):
    x = _single(X)
    fit_intercept, positive = _ta_trend_opts(model)
    x_mean = jnp.mean(x, axis=1)
    y_mean = jnp.mean(y, axis=1)
    x_tr = _t.trend_fit_opts(x, fit_intercept, positive)
    y_tr = _t.trend_fit_opts(y, fit_intercept, positive)
    x_det = x - _t.trend_line(x_tr, x.shape[1], x.dtype)
    y_det = y - _t.trend_line(y_tr, y.shape[1], y.dtype)
    inner = batched_fit(model.qm_estimator, index_fit, x_det[..., None], y_det)
    return {"inner": inner, "x_mean": x_mean, "y_mean": y_mean}


def _ta_predict(model, state, index_fit, X, index):
    x = _single(X)
    fit_intercept, positive = _ta_trend_opts(model)
    tr = _t.trend_fit_opts(x, fit_intercept, positive)
    line = _t.trend_line(tr, x.shape[1], x.dtype)
    x_det = x - line
    y_hat = batched_predict(model.qm_estimator, state["inner"], index_fit, x_det[..., None], index)
    delta = (jnp.mean(x, axis=1) - state["x_mean"]) + state["y_mean"]
    trendline = line - jnp.mean(line, axis=1, keepdims=True)
    return y_hat + trendline + delta[:, None]


_REGISTRY[_q.TrendAwareQuantileMappingRegressor] = _Impl(
    _ta_fit, _ta_predict, None, None, _ta_accepts
)


# ----------------------------------------------------------------------
# BCSD
# ----------------------------------------------------------------------


# Above this many cells the monthly BCSD also switches to the streaming
# (lazy fit + group-chunked scan predict) formulation: the dense path's
# materialized group temporaries cap a single 16 GB-chip pass near 256k
# cells.  The daily flavor always streams (27x window expansion).
STREAMING_CELL_THRESHOLD = 200_000


def _bcsd_fit(model, index_fit, X, y):
    # batch-native core: group tables are host constants, no outer vmap
    fg = model._fit_groups(index_fit)
    p = model._qm_params()
    if model._timestep_kind == "daily" or X.shape[0] >= STREAMING_CELL_THRESHOLD:
        fit = _bcsd._jit_fit_lazy(fg, model._with_x_climo)
    else:
        fit = _bcsd._jit_fit(fg, model._with_x_climo, p["alpha"], p["beta"], p["detrend"])
    return fit(_single(X), y)


def _bcsd_predict(model, state, index_fit, X, index):
    fg = model._fit_groups(index_fit)
    plan = model._predict_plan(fg, index)
    if model.return_anoms and plan.anom_labels is None:
        raise ValueError("daily BCSD with return_anoms=True is unsupported (reference crashes)")
    p = model._qm_params()
    variable = "temperature" if model._with_x_climo else "precipitation"
    if isinstance(state, _bcsd.BcsdLazyState):
        # chunk size bounds the scan's live (C, Gc*L) temporaries; the
        # monthly flavor streams only at continental cell counts, so it
        # gets a smaller chunk than the always-streaming daily flavor
        group_chunk = 8 if model._timestep_kind == "daily" else 3
        pred = _bcsd._jit_predict_stream(
            plan,
            variable,
            bool(model.return_anoms),
            p["alpha"],
            p["beta"],
            p["extrapolate"],
            p["n_endpoints"],
            p["detrend"],
            group_chunk,
        )
    else:
        pred = _bcsd._jit_predict(
            plan,
            variable,
            bool(model.return_anoms),
            p["alpha"],
            p["beta"],
            p["extrapolate"],
            p["n_endpoints"],
            p["detrend"],
        )
    return pred(state, _single(X))


def _bcsd_attrs(model, state):
    if isinstance(state, _bcsd.BcsdLazyState):
        climo = state.aux.reshape(*state.aux.shape[:-1], 2, -1)[..., 0, :]
    else:
        climo = state.aux.reshape(*state.aux.shape[:-1], 4, -1)[..., 2, :]
    return {"y_climo_": np.asarray(climo)}


_REGISTRY[_bcsd.BcsdBase] = _Impl(_bcsd_fit, _bcsd_predict, None, _bcsd_attrs)


# ----------------------------------------------------------------------
# ZScore
# ----------------------------------------------------------------------


def _zscore_fit(model, index_fit, X, y):
    idx, mask = _z.build_year_doy_table(index_fit)
    fn = lambda x, yy: _z.zscore_fit(
        x, yy, jnp.asarray(idx), jnp.asarray(mask), window=model.window_width
    )
    return jax.vmap(fn)(_single(X), y)


def _zscore_predict(model, state, index_fit, X, index):
    x = _single(X)
    inds = jnp.asarray(_z.expand_indices(x.shape[1]))
    fn = lambda s, xx: _z.zscore_predict(s, xx, inds, window=model.window_width)[0]
    return jax.vmap(fn)(state, x)


_REGISTRY[_z.ZScoreRegressor] = _Impl(
    _zscore_fit,
    _zscore_predict,
    None,
    lambda model, state: {"shift_": np.asarray(state.shift), "scale_": np.asarray(state.scale)},
)


# ----------------------------------------------------------------------
# ARRM / PiecewiseLinearRegression
# ----------------------------------------------------------------------


def _arrm_fit(model, index_fit, X, y):
    return _arrm.arrm_fit_batched(
        _single(X), y, fit_option=model.fit_option, n_segments=int(model.n_segments)
    )


def _arrm_predict(model, state, index_fit, X, index):
    return _arrm.arrm_predict_batched(state, _single(X))


def _arrm_attrs(model, state):
    # pwlf-style break vector [x_min, interior..., x_max] per cell (ref
    # arrm.py:154 via the single-cell wrapper's fit_breaks_)
    fb = np.concatenate(
        [
            np.asarray(state.x_min)[:, None],
            np.asarray(state.breaks),
            np.asarray(state.x_max)[:, None],
        ],
        axis=1,
    )
    return {"fit_breaks_": fb}


_REGISTRY[_arrm.PiecewiseLinearRegression] = _Impl(_arrm_fit, _arrm_predict, None, _arrm_attrs)


# ----------------------------------------------------------------------
# GARD
# ----------------------------------------------------------------------


class GardState(NamedTuple):
    X_train: jnp.ndarray  # (C, T, F)
    y_train: jnp.ndarray  # (C, T)


def _gard_fit(model, index_fit, X, y):
    n = X.shape[1]
    if n >= model.n_analogs:
        model.k_ = int(model.n_analogs)
    else:
        import warnings

        warnings.warn("length of X is less than n_analogs, setting n_analogs = len(X)")
        model.k_ = n
    return GardState(X, y)


def _pure_analog_predict(model, state, index_fit, X, index):
    m = X.shape[1]
    if model.kind == "best_analog" or model.n_analogs == 1:
        k, kind = 1, "best_analog"
    else:
        k, kind = model.k_, model.kind
    if kind == "sample_analogs":
        rng = np.random.default_rng(model.random_state)
        rand = jnp.asarray(rng.integers(0, k, (X.shape[0], m)), dtype=jnp.int32)
    else:
        rand = jnp.zeros((X.shape[0], m), dtype=jnp.int32)
    return _gard.pure_analog_predict_batched(
        state.X_train, state.y_train, X, rand, k=k, kind=kind, thresh=model.thresh
    )


_REGISTRY[_gard.PureAnalog] = _Impl(_gard_fit, _pure_analog_predict, None,
                                    lambda model, state: {"k_": np.full(state.y_train.shape[0], model.k_)})


def _analog_reg_predict(model, state, index_fit, X, index):
    return _gard.analog_regression_predict_batched(
        state.X_train, state.y_train, X, k=model.k_, thresh=model.thresh
    )


_REGISTRY[_gard.AnalogRegression] = _Impl(_gard_fit, _analog_reg_predict, None,
                                          lambda model, state: {"k_": np.full(state.y_train.shape[0], model.k_)})


def _pure_reg_fit(model, index_fit, X, y):
    fn = lambda xx, yy: _gard.pure_regression_fit(xx, yy, thresh=model.thresh)
    return jax.vmap(fn)(X, y)


def _pure_reg_predict(model, state, index_fit, X, index):
    return jax.vmap(_gard.pure_regression_predict)(state, X)


_REGISTRY[_gard.PureRegression] = _Impl(
    _pure_reg_fit,
    _pure_reg_predict,
    None,
    lambda model, state: {"fit_error_": np.asarray(state.fit_error)},
)
