"""Evaluation metrics for downscaling output.

The reference's roadmap names a ``metrics`` component that was never
implemented (``/root/reference/docs/roadmap.rst:59-65``); its notebooks
compute RMSE/MAE/correlation/r² ad hoc (``docs/tutorials/analog-methods.ipynb``
cell 18).  This module formalizes them as batched JAX reductions over the
time axis — one call scores every grid cell at once, NaN-aware (ocean
cells / rolling edges).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rmse",
    "mae",
    "bias",
    "pearsonr",
    "r2",
    "score_all",
    "ks_stat",
    "quantile_bias",
    "wet_day_freq_bias",
    "annual_cycle_rmse",
    "trend_bias",
    "energy_distance",
    "validation_report",
]


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


def ks_stat(y_true, y_pred):
    """Two-sample Kolmogorov-Smirnov statistic per cell (batched).

    ``sup |F_true - F_pred|`` between the two empirical CDFs along the last
    axis — THE standard distribution-shape check for bias correction (moment
    metrics cannot see the distribution mismatch quantile mapping exists to
    fix).  One payload sort of the merged samples; the CDF gap is evaluated
    at tie-run ends (``scipy.stats.ks_2samp`` semantics).  NaNs are skipped;
    all-NaN rows return NaN.
    """
    v1 = jnp.isfinite(y_true)
    v2 = jnp.isfinite(y_pred)
    n1 = jnp.sum(v1, axis=-1)
    n2 = jnp.sum(v2, axis=-1)
    inf = jnp.asarray(jnp.inf, y_true.dtype)
    a = jnp.where(v1, y_true, inf)
    b = jnp.where(v2, y_pred, inf)
    vals = jnp.concatenate([a, b], axis=-1)
    one = jnp.ones((), vals.dtype)
    w1 = jnp.concatenate([v1.astype(vals.dtype), jnp.zeros_like(b)], axis=-1)
    w2 = jnp.concatenate([jnp.zeros_like(a), v2.astype(vals.dtype)], axis=-1)
    sv, s1, s2 = jax.lax.sort([vals, w1, w2], num_keys=1)
    c1 = jnp.cumsum(s1, axis=-1) / jnp.maximum(n1, 1)[..., None]
    c2 = jnp.cumsum(s2, axis=-1) / jnp.maximum(n2, 1)[..., None]
    gap = jnp.abs(c1 - c2)
    # evaluate only at tie-run ends over FINITE values (inf pads excluded)
    run_end = jnp.concatenate(
        [sv[..., :-1] != sv[..., 1:], jnp.ones((*sv.shape[:-1], 1), bool)], axis=-1
    )
    d = jnp.max(jnp.where(run_end & jnp.isfinite(sv), gap, 0.0), axis=-1)
    return jnp.where((n1 > 0) & (n2 > 0), d, jnp.nan)


def quantile_bias(y_true, y_pred, q):
    """``quantile(y_pred, q) - quantile(y_true, q)`` per cell, NaN-skipping.

    ``q`` may be a scalar or a 1-D array of probabilities (prepended as a
    leading axis, numpy ``nanquantile`` convention).  Tail-quantile bias
    (e.g. q=0.95/0.99) is the standard extreme-preservation check.
    """
    qt = jnp.nanquantile(y_true, q, axis=-1)
    qp = jnp.nanquantile(y_pred, q, axis=-1)
    return qp - qt


def wet_day_freq_bias(y_true, y_pred, thresh=0.1):
    """Difference in exceedance frequency P(x > thresh) (pred - true).

    For precipitation with the trace threshold (0.1 mm/day by convention)
    this is the wet-day-frequency bias — the drizzle-problem check.
    """
    v, n, _ = _valid(y_true, y_pred)
    ft = jnp.sum(jnp.where(v, (y_true > thresh).astype(y_true.dtype), 0.0), axis=-1) / n
    fp = jnp.sum(jnp.where(v, (y_pred > thresh).astype(y_pred.dtype), 0.0), axis=-1) / n
    return fp - ft


def annual_cycle_rmse(y_true, y_pred, group_labels, n_groups: int = 12):
    """RMSE between per-group climatologies (e.g. monthly means).

    ``group_labels``: (T,) host int array in ``[0, n_groups)`` (month or DOY
    labels).  Group means are one mean-pooling matmul per series (NaN-aware);
    the result is the seasonal-cycle preservation error per cell.
    """
    labels = np.asarray(group_labels)
    M = jnp.asarray(
        (labels[:, None] == np.arange(n_groups)[None, :]).astype(np.float32)
    )
    v1 = jnp.isfinite(y_true)
    v2 = jnp.isfinite(y_pred)

    def gmean(x, v):
        xs = jnp.matmul(jnp.where(v, x, 0.0), M.astype(x.dtype))
        c = jnp.matmul(v.astype(x.dtype), M.astype(x.dtype))
        return xs / jnp.maximum(c, 1.0), c

    mt, ct = gmean(y_true, v1)
    mp, cp = gmean(y_pred, v2)
    ok = (ct > 0) & (cp > 0)
    ng = jnp.maximum(jnp.sum(ok, axis=-1), 1)
    se = jnp.where(ok, (mp - mt) ** 2, 0.0)
    return jnp.sqrt(jnp.sum(se, axis=-1) / ng)


def trend_bias(y_true, y_pred):
    """Difference of the linear-trend slopes (pred - true), per cell.

    Masked OLS against ``arange(T)`` (``LinearTrendTransformer``'s model);
    units are y-units per time step.  Checks that the correction preserves
    the long-term climate-change signal.
    """
    from ..ops.regression import ols_1d

    T = y_true.shape[-1]
    t = jnp.arange(T, dtype=y_true.dtype)
    v1 = jnp.isfinite(y_true)
    v2 = jnp.isfinite(y_pred)
    s_t, _ = ols_1d(t, jnp.where(v1, y_true, 0.0), v1.astype(y_true.dtype))
    s_p, _ = ols_1d(t, jnp.where(v2, y_pred, 0.0), v2.astype(y_pred.dtype))
    return s_p - s_t


def energy_distance(x, y):
    """Multivariate two-sample energy distance per cell (batched).

    ``x``: (..., n, d) samples, ``y``: (..., m, d) samples; returns
    ``sqrt(2 E||X-Y|| - E||X-X'|| - E||Y-Y'||)`` with the V-statistic
    (all-pairs) empirical means — THE convergence diagnostic for
    multivariate bias correction (MBCn iterates until this stops falling;
    Cannon 2018 §2.3).  Zero iff the joint distributions match.

    Pairwise distances ride the MXU (expanded ``x·x + y·y - 2 x·y`` form);
    memory is O(n*m) per cell, so subsample long records before calling.
    NaN anywhere in a sample row poisons that cell (multivariate rows have
    no per-component masking) — filter rows first.
    """

    def _mean_pdist(a, b):
        an = jnp.sum(a * a, axis=-1)  # (..., n)
        bn = jnp.sum(b * b, axis=-1)  # (..., m)
        cross = a @ jnp.swapaxes(b, -1, -2)  # (..., n, m) MXU
        d2 = an[..., :, None] + bn[..., None, :] - 2.0 * cross
        return jnp.mean(jnp.sqrt(jnp.maximum(d2, 0.0)), axis=(-2, -1))

    e2 = 2.0 * _mean_pdist(x, y) - _mean_pdist(x, x) - _mean_pdist(y, y)
    return jnp.sqrt(jnp.maximum(e2, 0.0))


def score_all(y_true, y_pred) -> dict:
    """All metrics at once (shares the masked moments)."""
    return {
        "rmse": rmse(y_true, y_pred),
        "mae": mae(y_true, y_pred),
        "bias": bias(y_true, y_pred),
        "pearsonr": pearsonr(y_true, y_pred),
        "r2": r2(y_true, y_pred),
    }


def validation_report(y_true, preds: dict, *, quantile: float = 0.95, wet_thresh=None):
    """Moment + distribution validation table for a panel of corrections.

    ``y_true``: (..., T) observations; ``preds``: {name: (..., T)} candidate
    series (include the raw model as a row to show the starting point).
    Returns a pandas DataFrame (rows = names) of cell-averaged metrics:
    bias, rmse, r², two-sample KS, tail-quantile bias, and (when
    ``wet_thresh`` is given) wet-day-frequency bias — the panel the tutorial
    notebook prints, as a reusable helper.
    """
    import pandas as pd

    rows = []
    for name, p in preds.items():
        p = jnp.asarray(p)
        row = {
            "bias": float(jnp.nanmean(bias(y_true, p))),
            "rmse": float(jnp.nanmean(rmse(y_true, p))),
            "r2": float(jnp.nanmean(r2(y_true, p))),
            "ks": float(jnp.nanmean(ks_stat(y_true, p))),
            f"q{int(quantile * 100)}_bias": float(
                jnp.nanmean(quantile_bias(y_true, p, quantile))
            ),
        }
        if wet_thresh is not None:
            row["wet_day_freq_bias"] = float(
                jnp.nanmean(wet_day_freq_bias(y_true, p, wet_thresh))
            )
        rows.append(pd.Series(row, name=name))
    return pd.DataFrame(rows)
