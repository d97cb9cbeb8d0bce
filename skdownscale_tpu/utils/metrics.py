"""Evaluation metrics for downscaling output.

The reference's roadmap names a ``metrics`` component that was never
implemented (``/root/reference/docs/roadmap.rst:59-65``); its notebooks
compute RMSE/MAE/correlation/r² ad hoc (``docs/tutorials/analog-methods.ipynb``
cell 18).  This module formalizes them as batched JAX reductions over the
time axis — one call scores every grid cell at once, NaN-aware (ocean
cells / rolling edges).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rmse", "mae", "bias", "pearsonr", "r2", "score_all"]


def _valid(y_true, y_pred):
    v = jnp.isfinite(y_true) & jnp.isfinite(y_pred)
    n = jnp.sum(v, axis=-1)
    return v, jnp.maximum(n, 1), n


def rmse(y_true, y_pred):
    """Root mean squared error over the last (time) axis, NaN-skipping."""
    v, n, _ = _valid(y_true, y_pred)
    se = jnp.where(v, (y_true - y_pred) ** 2, 0.0)
    return jnp.sqrt(jnp.sum(se, axis=-1) / n)


def mae(y_true, y_pred):
    v, n, _ = _valid(y_true, y_pred)
    ae = jnp.where(v, jnp.abs(y_true - y_pred), 0.0)
    return jnp.sum(ae, axis=-1) / n


def bias(y_true, y_pred):
    """Mean error (pred - true)."""
    v, n, _ = _valid(y_true, y_pred)
    e = jnp.where(v, y_pred - y_true, 0.0)
    return jnp.sum(e, axis=-1) / n


def pearsonr(y_true, y_pred):
    v, n, _ = _valid(y_true, y_pred)
    t = jnp.where(v, y_true, 0.0)
    p = jnp.where(v, y_pred, 0.0)
    tm = jnp.sum(t, axis=-1, keepdims=True) / n[..., None]
    pm = jnp.sum(p, axis=-1, keepdims=True) / n[..., None]
    td = jnp.where(v, t - tm, 0.0)
    pd_ = jnp.where(v, p - pm, 0.0)
    cov = jnp.sum(td * pd_, axis=-1)
    denom = jnp.sqrt(jnp.sum(td * td, axis=-1) * jnp.sum(pd_ * pd_, axis=-1))
    return cov / jnp.where(denom > 0, denom, 1.0)


def r2(y_true, y_pred):
    """Coefficient of determination (sklearn ``r2_score`` semantics)."""
    v, n, _ = _valid(y_true, y_pred)
    t = jnp.where(v, y_true, 0.0)
    tm = jnp.sum(t, axis=-1, keepdims=True) / n[..., None]
    ss_res = jnp.sum(jnp.where(v, (y_true - y_pred) ** 2, 0.0), axis=-1)
    ss_tot = jnp.sum(jnp.where(v, (y_true - tm) ** 2, 0.0), axis=-1)
    return 1.0 - ss_res / jnp.where(ss_tot > 0, ss_tot, 1.0)


def score_all(y_true, y_pred) -> dict:
    """All metrics at once (shares the masked moments)."""
    return {
        "rmse": rmse(y_true, y_pred),
        "mae": mae(y_true, y_pred),
        "bias": bias(y_true, y_pred),
        "pearsonr": pearsonr(y_true, y_pred),
        "r2": r2(y_true, y_pred),
    }
