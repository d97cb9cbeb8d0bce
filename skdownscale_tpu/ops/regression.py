"""Batched closed-form regression kernels.

The reference delegates every regression to scikit-learn objects fit one at a
time in Python loops (``trend.py:50-51``, ``quantile.py:256-264,369-385``,
``gard.py:175,209-215``).  On TPU those become closed-form / fixed-iteration
array programs: thousands of tiny solves batched with ``vmap`` so the MXU sees
large fused batches instead of the host seeing tiny sequential ones.

All functions are single-problem over the last axes; batch with ``jax.vmap``.
Weights of 0/1 subsume the reference's boolean-mask row subsetting exactly
(weighted least squares with 0/1 weights == OLS on the selected rows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "ols_1d",
    "ols_predict_1d",
    "linreg_fit",
    "linreg_predict",
    "logistic_fit",
    "logistic_predict_proba",
    "rmse",
]


def ols_1d(x, y, w=None):
    """Simple least squares ``y ~ a + b*x`` over the LAST axis ->
    (slope, intercept) with the leading (batch) dims preserved.

    Matches ``sklearn.linear_model.LinearRegression`` on one feature
    (centered closed form).  ``w`` is an optional 0/1 (or general) weight
    array selecting/weighting samples.  Inputs broadcast against each other.
    """
    if w is None:
        x, y = jnp.broadcast_arrays(x, y)
        xm = jnp.mean(x, axis=-1, keepdims=True)
        ym = jnp.mean(y, axis=-1, keepdims=True)
        dx = x - xm
        num = jnp.sum(dx * (y - ym), axis=-1)
        den = jnp.sum(dx * dx, axis=-1)
    else:
        x, y, w = jnp.broadcast_arrays(x, y, w)
        wsum = jnp.sum(w, axis=-1, keepdims=True)
        xm = jnp.sum(w * x, axis=-1, keepdims=True) / wsum
        ym = jnp.sum(w * y, axis=-1, keepdims=True) / wsum
        dx = x - xm
        num = jnp.sum(w * dx * (y - ym), axis=-1)
        den = jnp.sum(w * dx * dx, axis=-1)
    xm = xm[..., 0]
    ym = ym[..., 0]
    # zero-variance design: sklearn's lstsq returns the min-norm solution
    # (coef 0, intercept = mean) — the quantile tail re-extrapolation hits
    # this when cancellation collapses the pp knots to a constant
    slope = jnp.where(den != 0, num / jnp.where(den != 0, den, 1.0), 0.0)
    intercept = ym - slope * xm
    return slope, intercept


def ols_predict_1d(slope, intercept, x):
    return intercept + slope * x


def linreg_fit(X, y, w=None):
    """Multi-feature least squares with intercept -> (coef (k,), intercept).

    ``X``: (n, k); ``y``: (n,); ``w``: optional (n,) weights (0/1 weights ==
    row subsetting, as the reference does with boolean masks at
    ``gard.py:215`` / ``gard.py:441``).

    Solves the centered normal equations with a pseudo-inverse so rank-
    deficient analog sets (duplicate rows) yield the minimum-norm solution,
    matching sklearn's lstsq-based fit.
    """
    if w is None:
        n = X.shape[0]
        xm = jnp.mean(X, axis=0)
        ym = jnp.mean(y)
        Xc = X - xm
        yc = y - ym
    else:
        wsum = jnp.sum(w)
        xm = jnp.sum(w[:, None] * X, axis=0) / wsum
        ym = jnp.sum(w * y) / wsum
        sw = jnp.sqrt(w)
        Xc = sw[:, None] * (X - xm)
        yc = sw * (y - ym)
    G = Xc.T @ Xc
    b = Xc.T @ yc
    coef = _psolve(G, b)
    intercept = ym - jnp.dot(coef, xm)
    return coef, intercept


def _psolve(G, b):
    """Solve G x = b for symmetric PSD G via eigendecomposition pinv
    (rank-deficient safe, vmappable, TPU-friendly).

    For the 1x1 and 2x2 systems that dominate GARD (f <= 2) the
    eigendecomposition is analytic — elementwise ops instead of an ``eigh``
    custom call per tiny matrix (747k of them per AnalogRegression predict
    at bench sizes; the eigh path was most of the 165 ms XLA finish).  Same
    spectral cutoff, so rank-deficient behavior is identical to round-off.
    """
    n = G.shape[0]
    eps = jnp.finfo(G.dtype).eps
    if n == 1:
        g = G[0, 0]
        keep = g > eps * jnp.abs(g)  # g > 0 up to round-off, as the eigh path
        return jnp.where(keep, b / jnp.where(keep, g, 1.0), 0.0)
    if n == 2:
        a, c, off = G[0, 0], G[1, 1], G[0, 1]
        h = 0.5 * (a + c)
        d = 0.5 * (a - c)
        r = jnp.sqrt(d * d + off * off)
        l1, l2 = h + r, h - r
        cutoff = eps * 2.0 * jnp.maximum(jnp.abs(l1), jnp.abs(l2))
        # eigenvector for l1 from whichever (G - l1 I) row is better
        # conditioned; the degenerate G = h*I case (both rows ~0) falls back
        # to (1, 0) — any orthonormal basis gives the same pinv
        v1a = jnp.stack([off, l1 - a])
        v1b = jnp.stack([l1 - c, off])
        n1a = jnp.sum(v1a * v1a)
        n1b = jnp.sum(v1b * v1b)
        v1 = jnp.where(n1a >= n1b, v1a, v1b)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(v1 * v1), 0.0))
        v1 = jnp.where(norm > 0, v1 / jnp.where(norm > 0, norm, 1.0), jnp.asarray([1.0, 0.0], G.dtype))
        v2 = jnp.stack([-v1[1], v1[0]])
        x = jnp.zeros_like(b)
        x = x + jnp.where(l1 > cutoff, jnp.dot(v1, b) / jnp.where(l1 > cutoff, l1, 1.0), 0.0) * v1
        x = x + jnp.where(l2 > cutoff, jnp.dot(v2, b) / jnp.where(l2 > cutoff, l2, 1.0), 0.0) * v2
        return x
    evals, evecs = jnp.linalg.eigh(G)
    cutoff = eps * n * jnp.max(jnp.abs(evals))
    inv = jnp.where(evals > cutoff, 1.0 / jnp.where(evals > cutoff, evals, 1.0), 0.0)
    return evecs @ (inv * (evecs.T @ b))


def linreg_predict(coef, intercept, X):
    return X @ coef + intercept


def rmse(y_true, y_pred, w=None):
    """Root mean squared error (optionally 0/1-weighted), matching
    ``sklearn.metrics.root_mean_squared_error`` (``gard.py:217-219``)."""
    if w is None:
        return jnp.sqrt(jnp.mean((y_true - y_pred) ** 2))
    return jnp.sqrt(jnp.sum(w * (y_true - y_pred) ** 2) / jnp.sum(w))


# ----------------------------------------------------------------------
# logistic regression (sklearn-compatible objective)
# ----------------------------------------------------------------------


def _solve_small(H, g):
    """Solve H x = g for tiny static sizes via closed-form inverses (batched
    LU on (n<=4) matrices is a TPU serialization cliff — explicit cofactor
    math is pure VPU elementwise work)."""
    n = H.shape[-1]
    if n == 1:
        return g / H[..., 0, 0:1]
    if n == 2:
        a, b = H[..., 0, 0], H[..., 0, 1]
        c, d = H[..., 1, 0], H[..., 1, 1]
        det = a * d - b * c
        x0 = (d * g[..., 0] - b * g[..., 1]) / det
        x1 = (a * g[..., 1] - c * g[..., 0]) / det
        return jnp.stack([x0, x1], axis=-1)
    if n == 3:
        a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
        d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
        g_, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
        A = e * i - f * h
        B = -(d * i - f * g_)
        Cc = d * h - e * g_
        det = a * A + b * B + c * Cc
        inv00, inv01, inv02 = A, -(b * i - c * h), b * f - c * e
        inv10, inv11, inv12 = B, a * i - c * g_, -(a * f - c * d)
        inv20, inv21, inv22 = Cc, -(a * h - b * g_), a * e - b * d
        x0 = (inv00 * g[..., 0] + inv01 * g[..., 1] + inv02 * g[..., 2]) / det
        x1 = (inv10 * g[..., 0] + inv11 * g[..., 1] + inv12 * g[..., 2]) / det
        x2 = (inv20 * g[..., 0] + inv21 * g[..., 1] + inv22 * g[..., 2]) / det
        return jnp.stack([x0, x1, x2], axis=-1)
    return jnp.linalg.solve(H, g)


def logistic_fit(X, y, w=None, C: float = 1.0, n_iter: int = 12):
    """L2-regularized logistic regression -> (coef (k,), intercept).

    Minimizes sklearn's ``LogisticRegression`` objective (penalty='l2',
    intercept unpenalized)::

        0.5 * ||coef||^2 + C * sum_i w_i * log(1 + exp(-s_i * (X_i @ coef + b)))

    with ``s = 2y - 1``.  Fixed-iteration damped Newton (the problem is
    convex; 12 steps land within ~5e-4 of sklearn's lbfgs optimum on the
    200-sample analog fits, far inside its 1e-4-gradient stopping rule).
    The reference fits one of these per time step per grid cell
    (``gard.py:209``); here the whole batch solves at once under vmap.
    """
    n, k = X.shape
    if w is None:
        w = jnp.ones(n, X.dtype)
    Xb = jnp.concatenate([X, jnp.ones((n, 1), X.dtype)], axis=1)  # (n, k+1)
    reg = jnp.concatenate([jnp.ones(k, X.dtype), jnp.zeros(1, X.dtype)])

    def step(beta, _):
        z = Xb @ beta
        p = jax.nn.sigmoid(z)
        # gradient of C * logloss + 0.5 beta' R beta
        g = C * Xb.T @ (w * (p - y)) + reg * beta
        h_diag = C * w * p * (1.0 - p)
        H = (Xb * h_diag[:, None]).T @ Xb + jnp.diag(reg)
        # Levenberg damping keeps early steps stable when separable
        H = H + jnp.finfo(X.dtype).eps * 10 * jnp.eye(k + 1, dtype=X.dtype)
        delta = _solve_small(H, g)
        return beta - delta, None

    beta0 = jnp.zeros(k + 1, X.dtype)
    beta, _ = jax.lax.scan(step, beta0, None, length=n_iter)
    return beta[:k], beta[k]


def logistic_predict_proba(coef, intercept, X):
    """Probability of class 1 (sklearn column ``[:, 1]``)."""
    return jax.nn.sigmoid(X @ coef + intercept)
