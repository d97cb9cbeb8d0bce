"""ARRM piecewise-linear regression, TPU-native.

Re-design of ``/root/reference/skdownscale/pointwise_models/arrm.py``.  The
reference wraps ``pwlf.PiecewiseLinFit`` (optional dependency; the class
raises ``ImportError`` without it, ``arrm.py:138``).  Here the model is
self-contained:

* :func:`arrm_breakpoints` ports the reference's windowed-r² breakpoint
  search (``arrm.py:19-105``) exactly — sliding trailing-window correlations
  over the sorted marginals, global-minimum picking with ±10-point exclusion
  zones, upper then lower half — as a fixed-shape JAX program (window
  positions and banker's-rounded midpoints are static given ``n``).
* Continuous piecewise-linear fits use the hinge basis
  ``y ~ b0 + b1·x + Σ_k c_k·max(0, x - t_k)`` solved by least squares —
  the same model family pwlf assembles.
* ``fit_option='auto'`` replaces pwlf's stochastic differential evolution
  with a deterministic fixed-iteration Adam refinement of quantile-spaced
  breakpoints; ``'fast'`` is a single solve at quantile-spaced breakpoints.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rolling import _window_sum
from .base import SingleCellEstimator, asarray_2d

__all__ = [
    "PiecewiseLinearRegression",
    "arrm_breakpoints",
    "piecewise_fit",
    "piecewise_predict",
    "ArrmState",
    "arrm_fit_batched",
    "arrm_predict_batched",
]

_MIN_WIDTH = 10  # arrm.py:37


def _bankers(v: float) -> int:
    """Python round() half-to-even, applied to window midpoints (arrm.py:66)."""
    return int(round(v))


def _trailing_corr2(x, y, width: int):
    """r² of the trailing ``width`` window ending at each index."""
    w = float(width)
    sx = _window_sum(x, width, center=False)
    sy = _window_sum(y, width, center=False)
    sxx = _window_sum(x * x, width, center=False)
    syy = _window_sum(y * y, width, center=False)
    sxy = _window_sum(x * y, width, center=False)
    cov = w * sxy - sx * sy
    vx = w * sxx - sx * sx
    vy = w * syy - sy * sy
    return (cov * cov) / (vx * vy)


def _mask_around(r2, center, half: int):
    """``r2[center-half : center+half+1] = 1`` (``arrm.py:77,101``) with exact
    Python-slice semantics: when ``center < half`` the negative start *wraps*
    and the assignment is empty — no masking happens at all (a reference
    quirk that matters in the lower-half pass, where small indices win)."""
    pos = jnp.arange(r2.shape[0])
    in_zone = (jnp.abs(pos - center) <= half) & (center >= half)
    return jnp.where(in_zone, jnp.ones_like(r2), r2)


@functools.partial(jax.jit, static_argnames=("window_width", "max_breakpoints"))
def _arrm_breakpoints_core(Xs, Ys, *, window_width: float, max_breakpoints: int):
    n = Xs.shape[0]
    dtype = Xs.dtype

    # static geometry (depends only on n)
    quantiles = (np.arange(1, n + 1) - 0.4) / (n + 0.2)
    start = int(np.argmin(np.abs(quantiles - 0.4)))  # arrm.py:55
    width = max(_bankers(window_width * n), _MIN_WIDTH)  # arrm.py:58

    corr2 = _trailing_corr2(Xs, Ys, width)

    r2 = jnp.full(n, 2.0, dtype)
    # phase 1: windows [right-width, right) for right in [start, n] (arrm.py:63-67).
    # Odd widths make banker's-rounded midpoints collide; the reference's
    # ascending loop means the LARGER right wins — dedupe accordingly.
    rights = np.arange(start, n + 1)
    mids1 = np.array([_bankers((2 * r - width) / 2) for r in rights])
    _, rev_first = np.unique(mids1[::-1], return_index=True)
    keep1 = len(mids1) - 1 - rev_first  # last occurrence per unique mid
    r2 = r2.at[mids1[keep1]].set(corr2[rights[keep1] - 1])

    half = max_breakpoints // 2

    def pick(r2, _):
        mind = jnp.argmin(r2)
        return _mask_around(r2, mind, _MIN_WIDTH), mind

    r2, bp1 = jax.lax.scan(pick, r2, None, length=half)

    # phase 2: trailing windows below the first breakpoint (arrm.py:79-91);
    # `min(breakpoints, default=start)` falls back to start only when empty
    start2 = jnp.min(bp1) if half > 0 else jnp.asarray(start)
    start2 = start2 - (_MIN_WIDTH // 2 + 1)
    # descending loop: the SMALLER left wins on midpoint collisions
    lefts = np.arange(0, max(n - width + 1, 1))
    mids2_all = np.array([_bankers((2 * ll + width) / 2) for ll in lefts])
    _, keep2 = np.unique(mids2_all, return_index=True)  # first occurrence per mid
    lefts2 = lefts[keep2]
    mids2 = mids2_all[keep2]
    vals2 = corr2[np.minimum(lefts2 + width - 1, n - 1)]
    apply2 = jnp.asarray(lefts2) <= start2
    r2 = r2.at[mids2].set(jnp.where(apply2, vals2, r2[mids2]))

    pos = jnp.arange(n)

    def pick2(r2, _):
        masked = jnp.where(pos < start2, r2, jnp.inf)
        mind = jnp.argmin(masked)
        return _mask_around(r2, mind, _MIN_WIDTH), mind

    r2, bp2 = jax.lax.scan(pick2, r2, None, length=half)

    bps = jnp.sort(jnp.concatenate([bp1, bp2]))
    return Xs[bps]


def arrm_breakpoints(X, y, window_width: float, max_breakpoints: int):
    """Port of ``arrm_breakpoints`` (``arrm.py:19-105``): breakpoint *values*
    from the sorted marginals of X and y."""
    Xa = asarray_2d(X)
    if Xa.shape[1] != 1:
        raise ValueError(f"X must have exactly 1 feature, got {Xa.shape[1]}")
    ya = np.asarray(y, dtype=float).ravel()
    if len(Xa) != len(ya):
        raise ValueError(f"X and y must have the same length, got {len(Xa)} and {len(ya)}")
    Xs = jnp.sort(jnp.asarray(Xa[:, 0]))
    Ys = jnp.sort(jnp.asarray(ya))
    return np.asarray(
        _arrm_breakpoints_core(Xs, Ys, window_width=window_width, max_breakpoints=max_breakpoints)
    )


# ----------------------------------------------------------------------
# continuous piecewise-linear least squares (hinge basis)
# ----------------------------------------------------------------------


def _hinge_design(x, breaks):
    return jnp.concatenate(
        [jnp.ones_like(x)[:, None], x[:, None], jnp.maximum(0.0, x[:, None] - breaks[None, :])],
        axis=1,
    )


def piecewise_fit(x, y, breaks):
    """Least-squares continuous piecewise-linear fit with interior ``breaks``."""
    A = _hinge_design(x, breaks)
    AtA = A.T @ A + 1e-10 * jnp.eye(A.shape[1], dtype=x.dtype)
    beta = jnp.linalg.solve(AtA, A.T @ y)
    return beta


def piecewise_predict(beta, breaks, x):
    return _hinge_design(x, breaks) @ beta


@functools.partial(jax.jit, static_argnames=("n_interior", "n_iter"))
def _optimize_breaks(x, y, *, n_interior: int, n_iter: int = 200):
    """Deterministic breakpoint refinement (replacement for pwlf's stochastic
    differential evolution): Adam on SSR through the hinge-basis solve,
    starting from quantile-spaced breaks."""
    lo, hi = jnp.min(x), jnp.max(x)
    qs = jnp.linspace(0.0, 1.0, n_interior + 2)[1:-1]
    breaks0 = lo + qs * (hi - lo)
    span = hi - lo

    def ssr(breaks):
        beta = piecewise_fit(x, y, breaks)
        r = piecewise_predict(beta, breaks, x) - y
        return jnp.sum(r * r)

    lr = 0.02 * span
    g_fn = jax.grad(ssr)

    def step(carry, _):
        breaks, m, v, t = carry
        g = g_fn(breaks)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mhat = m / (1 - 0.9**t)
        vhat = v / (1 - 0.999**t)
        breaks = breaks - lr * mhat / (jnp.sqrt(vhat) + 1e-8 * span)
        breaks = jnp.clip(jnp.sort(breaks), lo, hi)
        return (breaks, m, v, t + 1), None

    init = (breaks0, jnp.zeros_like(breaks0), jnp.zeros_like(breaks0), jnp.asarray(1.0, x.dtype))
    (breaks, _, _, _), _ = jax.lax.scan(step, init, None, length=n_iter)
    return breaks


# ----------------------------------------------------------------------
# batched (cells-leading) cores — one XLA program over all grid cells
# ----------------------------------------------------------------------


class ArrmState(NamedTuple):
    """Fitted piecewise-linear state for a batch of cells.

    ``breaks``: (C, K) interior breakpoints; ``beta``: (C, K+2) hinge-basis
    coefficients ``[b0, b1, c_1..c_K]``; ``x_min``/``x_max``: (C,) data range
    (the outer entries of pwlf-style ``fit_breaks_``, ref ``arrm.py:154``).
    """

    breaks: jnp.ndarray
    beta: jnp.ndarray
    x_min: jnp.ndarray
    x_max: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("fit_option", "n_segments"))
def arrm_fit_batched(x, y, *, fit_option: str, n_segments: int) -> ArrmState:
    """Batched :class:`PiecewiseLinearRegression` fit over ``(C, T)`` arrays.

    Same math as the single-cell ``fit`` (ref ``arrm.py:144-167`` semantics),
    vmapped over the leading cell axis: the ARRM breakpoint scan's geometry
    (window width, midpoints) depends only on T, so one compiled program
    serves every cell.
    """
    k = max(n_segments - 1, 1)
    x_min = jnp.min(x, axis=1)
    x_max = jnp.max(x, axis=1)
    if fit_option == "arrm":
        xs = jnp.sort(x, axis=1)
        ys = jnp.sort(y, axis=1)
        interior = jax.vmap(
            lambda a, b: _arrm_breakpoints_core(
                a, b, window_width=0.05, max_breakpoints=n_segments
            )
        )(xs, ys)
    elif fit_option == "auto":
        interior = jax.vmap(lambda a, b: _optimize_breaks(a, b, n_interior=k))(x, y)
    elif fit_option == "fast":
        qs = jnp.asarray(np.linspace(0.0, 1.0, k + 2)[1:-1], x.dtype)
        interior = x_min[:, None] + qs[None, :] * (x_max - x_min)[:, None]
    else:
        raise ValueError(f"unsupported fit_option '{fit_option}'")
    beta = jax.vmap(piecewise_fit)(x, y, interior)
    return ArrmState(interior, beta, x_min, x_max)


def arrm_predict_batched(state: ArrmState, x):
    """Batched hinge-basis predict: ``(C, T)`` queries through per-cell fits."""
    b0 = state.beta[:, 0:1]
    b1 = state.beta[:, 1:2]
    c = state.beta[:, 2:]  # (C, K)
    hinge = jnp.maximum(0.0, x[:, :, None] - state.breaks[:, None, :])  # (C, T, K)
    return b0 + b1 * x + jnp.einsum("ctk,ck->ct", hinge, c)


class PiecewiseLinearRegression(SingleCellEstimator):
    """API of ``arrm.py:108-177`` (no pwlf dependency).

    Parameters
    ----------
    n_segments : int
        Desired number of line segments.
    fit_option : {'auto', 'fast', 'arrm'}
        'auto' — deterministic breakpoint optimization; 'fast' —
        quantile-spaced breakpoints; 'arrm' — reference ARRM windowed-r²
        breakpoint search.
    """

    _fit_attributes = ["model_", "fit_breaks_"]

    def __init__(self, n_segments: int = 7, fit_option: str = "auto", pwlf_kwargs=None):
        self.n_segments = n_segments
        self.fit_option = fit_option
        self.pwlf_kwargs = pwlf_kwargs

    def fit(self, X, y, **kwargs):
        Xa = asarray_2d(X)
        ya = asarray_2d(y)[:, 0]
        if Xa.shape[1] != 1:
            raise ValueError(f"X must have exactly 1 feature, got {Xa.shape[1]}")
        self._check_n_features(Xa, reset=True)
        x = jnp.asarray(Xa[:, 0])
        yj = jnp.asarray(ya)

        if self.fit_option == "arrm":
            interior = jnp.asarray(arrm_breakpoints(Xa, ya, 0.05, self.n_segments))
        elif self.fit_option == "auto":
            interior = _optimize_breaks(x, yj, n_interior=max(self.n_segments - 1, 1))
        elif self.fit_option == "fast":
            lo, hi = float(np.min(Xa)), float(np.max(Xa))
            k = max(self.n_segments - 1, 1)
            interior = jnp.asarray(lo + np.linspace(0, 1, k + 2)[1:-1] * (hi - lo))
        else:
            raise ValueError(f"unsupported fit_option '{self.fit_option}'")

        beta = piecewise_fit(x, yj, interior)
        self._breaks = np.asarray(interior)
        self._beta = np.asarray(beta)
        # pwlf-style break vector: [x_min, interior..., x_max] (arrm.py:154)
        self.fit_breaks_ = np.concatenate([[float(np.min(Xa))], self._breaks, [float(np.max(Xa))]])
        self.model_ = self  # duck-type of the fitted pwlf model handle
        self.X_ = Xa
        self.y_ = ya
        return self

    def predict(self, X):
        self._check_is_fitted()
        Xa = asarray_2d(X)
        self._check_n_features(Xa, reset=False)
        out = piecewise_predict(
            jnp.asarray(self._beta), jnp.asarray(self._breaks), jnp.asarray(Xa[:, 0])
        )
        return np.asarray(out)
