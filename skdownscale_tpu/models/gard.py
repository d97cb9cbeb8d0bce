"""GARD model family (analog methods), TPU-native.

Re-design of ``/root/reference/skdownscale/pointwise_models/gard.py``.  The
reference's ``AnalogRegression.predict`` is its slowest path: a Python loop
fitting one sklearn ``LogisticRegression`` + ``LinearRegression`` per time
step per grid cell (``gard.py:178-224``).  Here each cell's predict is one
fixed-shape program: a single kNN matmul for all time steps, then thousands
of tiny masked least-squares / IRLS solves batched with vmap — the canonical
TPU win.

All three estimators return the reference's 3 columns
``['pred', 'exceedance_prob', 'prediction_error']`` (``gard.py:133-134``).
Replicated quirks:

* ``AnalogRegression`` exceedance probability is ``predict_proba(X)[0, 0]``
  — the probability of the *non*-exceedance class (``gard.py:210``) —
  while ``PureRegression`` uses column 1 (``gard.py:467``).
* ``PureAnalog`` masked mean/weighted kinds propagate NaN when *any* analog
  is below threshold and then zero-fill ``pred`` only (``gard.py:329-343``):
  ``prediction_error`` keeps its NaNs.
* Where the reference *crashes* on single-class logistic fits
  (all analogs below threshold), we return probability 0 instead.

Divergences: brute-force kNN (exact, index tie-broken) instead of KDTree;
``sample_analogs`` draws via an explicit RNG.
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gather import take_rows
from ..ops.knn import knn
from ..ops.regression import (
    linreg_fit,
    linreg_predict,
    logistic_fit,
    logistic_predict_proba,
    rmse,
)
from .base import SingleCellEstimator, asarray_2d

__all__ = [
    "AnalogBase",
    "AnalogRegression",
    "PureAnalog",
    "PureRegression",
    "pure_analog_predict",
    "pure_analog_predict_batched",
    "analog_regression_predict",
    "analog_regression_predict_batched",
    "pure_regression_fit",
    "pure_regression_predict",
]

OUTPUT_NAMES = ["pred", "exceedance_prob", "prediction_error"]


# ======================================================================
# functional cores
# ======================================================================


@functools.partial(jax.jit, static_argnames=("k", "kind", "thresh"))
def pure_analog_predict(X_train, y_train, Xq, rand_inds, *, k: int, kind: str, thresh=None):
    """``PureAnalog.predict`` core (``gard.py:273-346``).

    ``rand_inds``: (m,) analog choices for ``sample_analogs`` (ignored for
    other kinds; pass zeros).  Returns (m, 3).
    """
    m = Xq.shape[0]
    dist, inds = knn(X_train, Xq, k)
    analogs = take_rows(y_train[:, None], inds.reshape(-1))[..., 0].reshape(m, k)

    if thresh is not None:
        analog_mask = analogs > thresh
        masked_analogs = jnp.where(analog_mask, analogs, jnp.nan)

    if kind == "best_analog":
        predicted = analogs[:, 0]
    elif kind == "sample_analogs":
        predicted = analogs[jnp.arange(m), rand_inds]
    elif kind == "weight_analogs":
        tiny = 1e-20
        weights = 1.0 / jnp.where(dist == 0, tiny, dist)
        src = masked_analogs if thresh is not None else analogs
        # np.average: NaN analogs poison the sum (gard.py:325-327)
        predicted = jnp.sum(src * weights, axis=1) / jnp.sum(weights, axis=1)
    elif kind == "mean_analogs":
        src = masked_analogs if thresh is not None else analogs
        predicted = jnp.mean(src, axis=1)  # plain mean: NaNs propagate
    else:
        raise ValueError(f"got unexpected kind {kind}")

    if thresh is not None:
        predicted = jnp.nan_to_num(predicted, nan=0.0)
        prediction_error = jnp.std(masked_analogs, axis=1)  # NaNs kept (gard.py:342)
        exceedance_prob = jnp.mean(jnp.where(analog_mask, 1.0, 0.0), axis=1)
    else:
        prediction_error = jnp.std(analogs, axis=1)
        exceedance_prob = jnp.ones(m, X_train.dtype)

    return jnp.stack([predicted, exceedance_prob, prediction_error], axis=1)


def pure_analog_predict_batched(
    X_train, y_train, Xq, rand_inds, *, k: int, kind: str, thresh=None,
    force_kernel=None, interpret=False,
):
    """Cell-batched ``PureAnalog.predict``: (C, n, f)/(C, n)/(C, m, f) -> (C, m, 3).

    On TPU with float32 inputs this runs the fused Pallas kernel
    (:func:`~skdownscale_tpu.ops.pallas.knn_kernel.pure_analog_stats`):
    distances, exact rank-k selection, and the analog statistics never leave
    VMEM — no (cells·queries, train) distance matrix, no top-k sort, no
    gathers (VERDICT r1 #3).  Elsewhere it vmaps the reference-parity
    single-cell core.  ``force_kernel=True`` + ``interpret=True`` runs the
    Pallas kernel in interpret mode on CPU (tests / multi-chip dryrun)."""
    use_kernel = force_kernel
    if use_kernel is None:
        use_kernel = (
            X_train.dtype == jnp.float32
            and X_train.shape[-1] <= 6
            and k <= 4096
        )
        if use_kernel:
            try:
                platform = jax.devices()[0].platform.lower()
            except Exception:  # pragma: no cover - backend init failure
                platform = "cpu"
            use_kernel = platform not in ("cpu", "gpu")
    if use_kernel:
        from ..ops.pallas.knn_kernel import pure_analog_stats

        return pure_analog_stats(
            X_train, y_train, Xq, rand_inds, k=k, kind=kind, thresh=thresh,
            interpret=interpret,
        )
    fn = lambda xt, yt, xq, r: pure_analog_predict(xt, yt, xq, r, k=k, kind=kind, thresh=thresh)
    return jax.vmap(fn)(X_train, y_train, Xq, rand_inds)


def _ar_finish(stats, prob, mu, ybar, Xq, f: int):
    """Finish AnalogRegression from the fused kernel's sufficient statistics:
    the tiny per-query OLS solves and the rmse, replicating
    ``ops.regression.linreg_fit``'s centered pinv algebra (coef invariant to
    the kernel's per-cell x/y centering; pred/intercept shift back)."""
    from ..ops.regression import _psolve

    tri_n = f * (f + 1) // 2
    sw = stats[..., 0]  # (C, m)
    swx = stats[..., 1 : 1 + f]
    tri = stats[..., 1 + f : 1 + f + tri_n]
    swy = stats[..., 1 + f + tri_n]
    swxy = stats[..., 2 + f + tri_n : 2 + 2 * f + tri_n]
    swy2 = stats[..., 2 + 2 * f + tri_n]

    # unpack the upper-triangular Σw x xᵀ
    swxx = jnp.zeros((*sw.shape, f, f), stats.dtype)
    t = 0
    for j in range(f):
        for l in range(j, f):
            swxx = swxx.at[..., j, l].set(tri[..., t])
            swxx = swxx.at[..., l, j].set(tri[..., t])
            t += 1

    sw_safe = jnp.where(sw > 0, sw, 1.0)
    xm = swx / sw_safe[..., None]
    ym = swy / sw_safe
    G = swxx - sw_safe[..., None, None] * xm[..., :, None] * xm[..., None, :]
    b = swxy - swx * ym[..., None]
    coef = jax.vmap(jax.vmap(_psolve))(G, b)  # (C, m, f)
    intercept_c = ym - jnp.sum(coef * xm, axis=-1)

    qc = Xq - mu  # (C, m, f): same per-cell centering as the kernel
    pred = jnp.sum(coef * qc, axis=-1) + intercept_c + ybar

    # Σw r² by quadratic expansion over the centered stats
    ssr = (
        swy2
        - 2.0 * jnp.sum(coef * swxy, axis=-1)
        - 2.0 * intercept_c * swy
        + jnp.einsum("...j,...jl,...l->...", coef, swxx, coef)
        + 2.0 * intercept_c * jnp.sum(coef * swx, axis=-1)
        + intercept_c * intercept_c * sw
    )
    err = jnp.sqrt(jnp.maximum(ssr, 0.0) / sw_safe)
    nan = jnp.asarray(jnp.nan, stats.dtype)
    pred = jnp.where(sw > 0, pred, nan)
    err = jnp.where(sw > 0, err, nan)
    return jnp.stack([pred, prob, err], axis=-1)


def analog_regression_predict_batched(
    X_train, y_train, Xq, *, k: int, thresh=None, logistic_n_iter=8, force_kernel=None, interpret=False
):
    """Cell-batched ``AnalogRegression.predict``: (C, n, f)/(C, n)/(C, m, f)
    -> (C, m, 3).

    ``logistic_n_iter=8``: the ridge-damped Newton on the (f+1)-parameter
    local exceedance fit is measured converged by 6-8 iterations (max
    |prob_8 - prob_24| <= 9e-7 across correlated / separable / extreme-
    imbalance analog sets; pinned by ``test_gard_golden.py``'s convergence
    test), with 12 the iteration count was ~1/4 of the fused kernel's
    runtime for no numerical gain.

    On TPU with float32 inputs and 1-5 features this runs the fused Pallas
    kernel (:func:`~skdownscale_tpu.ops.pallas.knn_kernel.analog_regression_stats`):
    selection, the local weighted-OLS sums, and the per-step logistic
    exceedance fit all happen in VMEM — no distance matrix, no top-k, no
    analog gathers.  Elsewhere it vmaps the single-cell core."""
    f = X_train.shape[-1]
    use_kernel = force_kernel
    if use_kernel is None:
        use_kernel = X_train.dtype == jnp.float32 and 1 <= f <= 5 and k <= 4096
        if use_kernel:
            try:
                platform = jax.devices()[0].platform.lower()
            except Exception:  # pragma: no cover - backend init failure
                platform = "cpu"
            use_kernel = platform not in ("cpu", "gpu")
    if use_kernel:
        from ..ops.pallas.knn_kernel import analog_regression_stats

        stats, prob, mu, ybar = analog_regression_stats(
            X_train, y_train, Xq, k=k, thresh=thresh, n_iter=logistic_n_iter, interpret=interpret
        )
        return _ar_finish(stats, prob, mu, ybar, Xq, f)
    fn = lambda xt, yt, xq: analog_regression_predict(
        xt, yt, xq, k=k, thresh=thresh, logistic_n_iter=logistic_n_iter
    )
    return jax.vmap(fn)(X_train, y_train, Xq)


@functools.partial(jax.jit, static_argnames=("k", "thresh", "logistic_n_iter"))
def analog_regression_predict(X_train, y_train, Xq, *, k: int, thresh=None, logistic_n_iter=8):
    """``AnalogRegression.predict`` core (``gard.py:152-224``): per time step,
    a local linear model on the k nearest analogs (optionally threshold-
    masked) plus a local logistic exceedance model — all steps batched."""
    inds = knn(X_train, Xq, k, return_distance=False)  # (m, k)
    m, f = Xq.shape[0], X_train.shape[1]
    # one fused row-gather for predictors + target (one-hot MXU path on TPU)
    payload = jnp.concatenate([X_train, y_train[:, None]], axis=-1)
    rows = take_rows(payload, inds.reshape(-1)).reshape(m, k, f + 1)
    xk = rows[..., :f]  # (m, k, f)
    yk = rows[..., f]  # (m, k)

    if thresh is not None:
        exceed = yk > thresh
    else:
        exceed = jnp.ones_like(yk, dtype=bool)
    w = exceed.astype(Xq.dtype)

    def one_step(x_loc, y_loc, w_loc, e_loc, q):
        coef, intercept = linreg_fit(x_loc, y_loc, w_loc)
        pred = jnp.dot(q, coef) + intercept
        err = rmse(y_loc, linreg_predict(coef, intercept, x_loc), w_loc)
        if thresh is not None:
            all_exceed = jnp.all(e_loc)
            none_exceed = jnp.all(~e_loc)
            lcoef, lint = logistic_fit(
                x_loc, e_loc.astype(q.dtype), C=1.0, n_iter=logistic_n_iter
            )
            # predict_proba(X)[0, 0]: probability of class 0 (gard.py:210)
            p0 = 1.0 - logistic_predict_proba(lcoef, lint, q[None, :])[0]
            prob = jnp.where(all_exceed, 1.0, p0)  # gard.py:211-212
            prob = jnp.where(none_exceed, 0.0, prob)  # reference crashes here
        else:
            prob = jnp.asarray(1.0, q.dtype)
        return pred, prob, err

    pred, prob, err = jax.vmap(one_step)(xk, yk, w, exceed, Xq)
    return jnp.stack([pred, prob, err], axis=1)


class PureRegressionState(NamedTuple):
    lin_coef: jnp.ndarray  # (f,)
    lin_intercept: jnp.ndarray  # ()
    log_coef: jnp.ndarray  # (f,) — zeros when no threshold
    log_intercept: jnp.ndarray  # ()
    fit_error: jnp.ndarray  # ()
    has_logistic: jnp.ndarray  # () bool


@functools.partial(jax.jit, static_argnames=("thresh", "logistic_n_iter"))
def pure_regression_fit(X, y, *, thresh=None, logistic_n_iter=12) -> PureRegressionState:
    """``PureRegression.fit`` core (``gard.py:408-447``)."""
    f = X.shape[1]
    if thresh is not None:
        exceed = y > thresh
        one_class = jnp.all(exceed) | jnp.all(~exceed)
        lcoef, lint = logistic_fit(X, exceed.astype(X.dtype), C=1.0, n_iter=logistic_n_iter)
        lcoef = jnp.where(one_class, jnp.zeros(f, X.dtype), lcoef)
        lint = jnp.where(one_class, 0.0, lint)
        has_logistic = ~one_class
        w = exceed.astype(X.dtype)
    else:
        has_logistic = jnp.asarray(False)
        lcoef = jnp.zeros(f, X.dtype)
        lint = jnp.zeros((), X.dtype)
        w = jnp.ones(X.shape[0], X.dtype)
    coef, intercept = linreg_fit(X, y, w)
    err = rmse(y, linreg_predict(coef, intercept, X), w)
    return PureRegressionState(coef, intercept, lcoef, lint, err, has_logistic)


@jax.jit
def pure_regression_predict(state: PureRegressionState, Xq):
    """``PureRegression.predict`` core (``gard.py:449-493``)."""
    pred = linreg_predict(state.lin_coef, state.lin_intercept, Xq)
    # column 1: probability of exceedance (gard.py:467)
    p1 = logistic_predict_proba(state.log_coef, state.log_intercept, Xq)
    prob = jnp.where(state.has_logistic, p1, jnp.ones_like(p1))
    err = jnp.full(Xq.shape[0], state.fit_error, Xq.dtype)
    return jnp.stack([pred, prob, err], axis=1)


# ======================================================================
# sklearn-compatible wrappers
# ======================================================================


class _BruteForceIndex:
    """Duck-type stand-in for the reference's fitted ``kdtree_`` attribute."""

    def __init__(self, data):
        self.data = data

    def query(self, X, k=1, return_distance=True, **kwargs):
        res = knn(jnp.asarray(self.data), jnp.asarray(asarray_2d(X)), k, return_distance=return_distance)
        if return_distance:
            return np.asarray(res[0]), np.asarray(res[1])
        return np.asarray(res)


class AnalogBase(SingleCellEstimator):
    """Fit: store the training set and clamp ``k`` (``gard.py:55-87``)."""

    _fit_attributes = ["kdtree_", "X_", "y_", "k_"]
    n_outputs = 3
    output_names = OUTPUT_NAMES

    def fit(self, X, y):
        self._validate_data(X, y)
        Xa = asarray_2d(X)
        ya = asarray_2d(y)[:, 0]

        if len(Xa) >= self.n_analogs:
            self.k_ = int(self.n_analogs)
        else:
            warnings.warn("length of X is less than n_analogs, setting n_analogs = len(X)")
            self.k_ = len(Xa)

        self.kdtree_ = _BruteForceIndex(Xa)
        self.X_ = Xa
        self.y_ = ya
        return self

    def _maybe_df(self, out, X):
        if hasattr(X, "iloc"):
            import pandas as pd

            return pd.DataFrame(np.asarray(out), columns=self.output_names)
        return np.asarray(out)


class AnalogRegression(AnalogBase):
    """API of ``gard.py:101-224``."""

    def __init__(
        self,
        n_analogs: int = 200,
        thresh: float | None = None,
        kdtree_kwargs: dict[str, Any] | None = None,
        query_kwargs: dict[str, Any] | None = None,
        logistic_kwargs: dict[str, Any] | None = None,
        lr_kwargs: dict[str, Any] | None = None,
    ):
        self.n_analogs = n_analogs
        self.thresh = thresh
        self.kdtree_kwargs = kdtree_kwargs
        self.query_kwargs = query_kwargs
        self.logistic_kwargs = logistic_kwargs
        self.lr_kwargs = lr_kwargs

    def predict(self, X):
        self._check_is_fitted()
        X = self._validate_data(X, reset=False)
        Xa = asarray_2d(X)
        out = analog_regression_predict(
            jnp.asarray(self.X_),
            jnp.asarray(self.y_),
            jnp.asarray(Xa),
            k=self.k_,
            thresh=self.thresh,
        )
        return self._maybe_df(out, X)


class PureAnalog(AnalogBase):
    """API of ``gard.py:227-364``.

    ``random_state`` (additive parameter): seed for ``sample_analogs`` draws
    (the reference uses the numpy global RNG, ``gard.py:315``).
    """

    def __init__(
        self,
        n_analogs: int = 200,
        kind: str = "best_analog",
        thresh: float | None = None,
        kdtree_kwargs: dict[str, Any] | None = None,
        query_kwargs: dict[str, Any] | None = None,
        random_state: int | None = None,
    ):
        self.n_analogs = n_analogs
        self.kind = kind
        self.thresh = thresh
        self.kdtree_kwargs = kdtree_kwargs
        self.query_kwargs = query_kwargs
        self.random_state = random_state

    def predict(self, X):
        self._check_is_fitted()
        X = self._validate_data(X, reset=False)
        Xa = asarray_2d(X)
        m = len(Xa)

        if self.kind == "best_analog" or self.n_analogs == 1:
            k, kind = 1, "best_analog"
        else:
            k, kind = self.k_, self.kind
        if kind not in ("best_analog", "sample_analogs", "weight_analogs", "mean_analogs"):
            raise ValueError(f"got unexpected kind {kind}")

        if kind == "sample_analogs":
            # host-side draw mirrors np.random.randint (gard.py:315)
            rng = np.random.default_rng(self.random_state) if self.random_state is not None else np.random
            rand_inds = rng.randint(0, k, m) if rng is np.random else rng.integers(0, k, m)
        else:
            rand_inds = np.zeros(m, dtype=np.int32)

        out = pure_analog_predict(
            jnp.asarray(self.X_),
            jnp.asarray(self.y_),
            jnp.asarray(Xa),
            jnp.asarray(rand_inds),
            k=k,
            kind=kind,
            thresh=self.thresh,
        )
        return self._maybe_df(out, X)


class PureRegression(SingleCellEstimator):
    """API of ``gard.py:367-504``.

    Unlike the reference (which mutates ``self.thresh`` on single-class fits,
    ``gard.py:436`` — a clone-semantics bug flagged in SURVEY §5), the
    effective threshold lives in the fitted attribute ``thresh_``.
    """

    _fit_attributes = ["logistic_model_", "linear_model_", "fit_error_"]
    n_outputs = 3
    output_names = OUTPUT_NAMES

    def __init__(
        self,
        thresh: float | None = None,
        logistic_kwargs: dict[str, Any] | None = None,
        linear_kwargs: dict[str, Any] | None = None,
    ):
        self.thresh = thresh
        self.logistic_kwargs = logistic_kwargs
        self.linear_kwargs = linear_kwargs

    def fit(self, X, y):
        self._validate_data(X, y)
        Xa = asarray_2d(X)
        ya = asarray_2d(y)[:, 0]

        thresh = self.thresh
        if thresh is not None:
            exceed = ya > thresh
            if len(np.unique(exceed)) == 1:
                if not exceed.any():
                    # reference crashes fitting linear on zero rows (gard.py:441)
                    raise ValueError(
                        "all targets are below thresh; no samples to fit the linear model"
                    )
                warnings.warn(
                    "Found only one class while attempting logistic regression. "
                    "Falling back to thresh=None behavior"
                )
                thresh = None
        self.thresh_ = thresh

        state = pure_regression_fit(jnp.asarray(Xa), jnp.asarray(ya), thresh=thresh)
        self._state = jax.tree_util.tree_map(np.asarray, state)
        self.fit_error_ = float(state.fit_error)
        self.linear_model_ = {"coef_": np.asarray(state.lin_coef), "intercept_": float(state.lin_intercept)}
        self.logistic_model_ = (
            {"coef_": np.asarray(state.log_coef), "intercept_": float(state.log_intercept)}
            if thresh is not None
            else None
        )
        return self

    def predict(self, X):
        self._check_is_fitted()
        X = self._validate_data(X, reset=False)
        Xa = asarray_2d(X)
        state = PureRegressionState(*[jnp.asarray(a) for a in self._state])
        out = pure_regression_predict(state, jnp.asarray(Xa))
        if hasattr(X, "iloc"):
            import pandas as pd

            return pd.DataFrame(np.asarray(out), columns=self.output_names)
        return np.asarray(out)
