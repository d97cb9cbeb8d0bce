"""Pooled ("global") linear downscaling models.

The reference roadmap names a ``global_models`` component — models fit
jointly across space instead of one estimator per grid cell — but never
built it (``/root/reference/docs/roadmap.rst:59-65``).  This is the
TPU-native realization: one weighted least-squares problem pooled over
every valid (cell, time) sample.

Unlike the pointwise zoo (embarrassingly parallel over cells, zero
collectives), a global fit genuinely reduces *across* the cell axis.  The
design follows the standard JAX SPMD recipe: inputs arrive cell-sharded
over a :class:`jax.sharding.Mesh` (``parallel.mesh.shard_cells``) and the
sufficient statistics are plain ``jnp.sum`` contractions over the
(cells, time) sample axes — XLA partitions them into per-device partial
sums plus an all-reduce over ICI.  Only the tiny (f+1, f+1) solve is
replicated.  No shard_map, no manual psum: the sharding annotation is the
whole parallel program.

Two intercept modes:

* ``cell_intercepts=False`` — one shared intercept: classic pooled OLS.
* ``cell_intercepts=True`` — per-cell intercepts (the fixed-effects /
  within estimator): slopes from within-cell-centered covariances, then
  ``intercept_c = mean_c(y) - coef . mean_c(x)``.  This is the pooled
  analogue of the reference's per-cell ``LinearRegression`` loop collapsed
  to one closed-form program.

NaN handling matches the grid convention everywhere else in the package:
any sample whose target or any feature is non-finite gets weight 0, and
all-NaN (ocean) cells produce NaN per-cell intercepts / predictions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.regression import _psolve

# the default TPU matmul truncates f32 operands toward bf16 (~8-bit
# mantissa); the pooled sufficient statistics feed a direct solve, so keep
# the contractions at full precision
_HIGHEST = jax.lax.Precision.HIGHEST

__all__ = ["GlobalLinearState", "GlobalLinearRegressor", "global_linear_fit", "global_linear_predict"]


class GlobalLinearState(NamedTuple):
    coef: jnp.ndarray  # (f,) shared slopes
    intercept: jnp.ndarray  # () shared intercept (global mode) else 0
    cell_intercept: jnp.ndarray  # (C,) per-cell intercepts (NaN where unused/empty)
    n_samples: jnp.ndarray  # () pooled valid-sample count


def _valid_mask(X, y):
    m = jnp.isfinite(y)
    m = m & jnp.all(jnp.isfinite(X), axis=-1)
    return m.astype(X.dtype)


@functools.partial(jax.jit, static_argnames=("cell_intercepts",))
def global_linear_fit(X, y, *, cell_intercepts: bool = False) -> GlobalLinearState:
    """Pooled WLS fit.  ``X``: (C, T, f); ``y``: (C, T).

    All sums run over both sample axes; with cell-sharded inputs XLA emits
    one all-reduce of the (f, f)+(f,) statistics over the mesh.
    """
    dtype = X.dtype
    w = _valid_mask(X, y)  # (C, T)
    yz = jnp.where(w > 0, y, 0.0)
    Xz = jnp.where(w[..., None] > 0, X, 0.0)
    n = jnp.sum(w)
    n_safe = jnp.where(n > 0, n, 1.0)

    if cell_intercepts:
        wc = jnp.sum(w, axis=1)  # (C,)
        wc_safe = jnp.where(wc > 0, wc, 1.0)
        xm = jnp.sum(Xz * w[..., None], axis=1) / wc_safe[:, None]  # (C, f)
        ym = jnp.sum(yz * w, axis=1) / wc_safe  # (C,)
        # center the zeroed copies: invalid samples stay finite (0*w) instead
        # of NaN-poisoning the contraction
        Xc = (Xz - xm[:, None, :]) * w[..., None]
        yc = (yz - ym[:, None]) * w
        G = jnp.einsum("cti,ctj->ij", Xc, Xc, precision=_HIGHEST)
        b = jnp.einsum("cti,ct->i", Xc, yc, precision=_HIGHEST)
        coef = _psolve(G, b)
        cell_intercept = jnp.where(wc > 0, ym - xm @ coef, jnp.nan)
        intercept = jnp.zeros((), dtype)
    else:
        xm = jnp.sum(Xz * w[..., None], axis=(0, 1)) / n_safe  # (f,)
        ym = jnp.sum(yz * w) / n_safe
        Xc = (Xz - xm) * w[..., None]
        yc = (yz - ym) * w
        G = jnp.einsum("cti,ctj->ij", Xc, Xc, precision=_HIGHEST)
        b = jnp.einsum("cti,ct->i", Xc, yc, precision=_HIGHEST)
        coef = _psolve(G, b)
        intercept = ym - xm @ coef
        cell_intercept = jnp.full(X.shape[:1], jnp.nan, dtype)
    return GlobalLinearState(coef, intercept, cell_intercept, n)


@functools.partial(jax.jit, static_argnames=("cell_intercepts",))
def global_linear_predict(state: GlobalLinearState, X, *, cell_intercepts: bool = False):
    """Predict (C, T) from (C, T, f).  Cell-sharded in, cell-sharded out —
    the shared ``coef`` is replicated, so predict is collective-free."""
    base = jnp.einsum("ctf,f->ct", X, state.coef)
    if cell_intercepts:
        return base + state.cell_intercept[:, None]
    return base + state.intercept


class GlobalLinearRegressor:
    """sklearn-flavored wrapper around the pooled fit.

    Parameters
    ----------
    cell_intercepts : bool
        False (default): one shared intercept.  True: per-cell intercepts
        (fixed-effects estimator).

    ``fit(X, y)`` takes ``X`` (cells, time, features) and ``y``
    (cells, time); 2-D ``X`` is treated as a single cell.  Cell-sharded
    device arrays (``parallel.mesh.shard_cells``) parallelize the fit over
    the mesh transparently.
    """

    _fit_attributes = ["state_", "n_features_in_"]

    def __init__(self, cell_intercepts: bool = False):
        self.cell_intercepts = cell_intercepts

    @staticmethod
    def _coerce(X, y=None):
        X = jnp.asarray(X)
        if X.ndim == 2:  # (T, f) single cell
            X = X[None]
        if y is not None:
            y = jnp.asarray(y)
            if y.ndim == 1:
                y = y[None]
            return X, y
        return X

    def fit(self, X, y):
        X, y = self._coerce(X, y)
        self.n_features_in_ = X.shape[-1]
        self.state_ = global_linear_fit(X, y, cell_intercepts=self.cell_intercepts)
        return self

    def predict(self, X):
        X = self._coerce(X)
        return global_linear_predict(self.state_, X, cell_intercepts=self.cell_intercepts)

    # sklearn-ish param protocol (clone-compatible)
    def get_params(self, deep: bool = True):
        return {"cell_intercepts": self.cell_intercepts}

    def set_params(self, **params):
        for k, v in params.items():
            setattr(self, k, v)
        return self

    def score(self, X, y):
        pred = np.asarray(self.predict(X))
        yt = np.asarray(self._coerce(X, y)[1] if not hasattr(y, "shape") else jnp.asarray(y))
        yt = yt.reshape(pred.shape)
        v = np.isfinite(yt) & np.isfinite(pred)
        ss_res = float(((yt[v] - pred[v]) ** 2).sum())
        ss_tot = float(((yt[v] - yt[v].mean()) ** 2).sum())
        return 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
