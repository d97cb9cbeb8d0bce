"""Spatial disaggregation (the "SD" in BCSD).

The reference repo bias-corrects only; its legacy CLI delegates spatial
disaggregation to an *external* package (``scripts/run_bcsd.py:9`` imports
``xsd.bcsd``).  This module provides the standard SD step TPU-natively so
the full BCSD pipeline is self-contained:

1. interpolate coarse bias-corrected anomalies onto the fine grid
   (bilinear, via ``jax.image.resize`` — pure XLA, batched over time), and
2. apply a fine-scale climatology — additive for temperature, multiplicative
   for precipitation (matching the anomaly conventions of
   ``BcsdTemperature`` / ``BcsdPrecipitation``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from skdownscale_tpu.utils.timeindex import TimeIndex

__all__ = [
    "interp_to_fine",
    "regrid_weights_1d",
    "regrid_separable",
    "apply_climatology",
    "spatial_disaggregate",
    "temporal_disaggregate",
    "bcsd_disaggregator",
    "daily_index_for_months",
]


def regrid_weights_1d(src_coords, dst_coords) -> np.ndarray:
    """Host ``(D, S)`` linear-interpolation weight matrix along one axis.

    Row ``i`` holds the two bracketing weights of ``dst_coords[i]`` in the
    strictly-increasing ``src_coords`` (np.interp semantics: clamp beyond
    the ends).  Rows sum to 1, so applying the matrix is a mean-preserving
    MXU matmul — the coordinate-aware alternative to ``jax.image.resize``
    for non-uniform grids (real latitude spacings, Gaussian grids).
    """
    src = np.asarray(src_coords, dtype=np.float64)
    dst = np.asarray(dst_coords, dtype=np.float64)
    if src.ndim != 1 or len(src) < 2 or (np.diff(src) <= 0).any():
        raise ValueError("src_coords must be 1-D, length >= 2, strictly increasing")
    hi = np.clip(np.searchsorted(src, dst, side="left"), 1, len(src) - 1)
    lo = hi - 1
    w = (dst - src[lo]) / (src[hi] - src[lo])
    w = np.clip(w, 0.0, 1.0)
    out = np.zeros((len(dst), len(src)), dtype=np.float64)
    rows = np.arange(len(dst))
    out[rows, lo] = 1.0 - w
    out[rows, hi] += w
    return out


@jax.jit
def regrid_separable(data, wy, wx):
    """Coordinate-based bilinear regrid of (..., ny, nx) fields: two
    separable matmuls ``wy @ data @ wx.T`` batched over leading dims (the
    weights come from :func:`regrid_weights_1d` per axis; rows sum to 1)."""
    data = jnp.asarray(data)
    wy = jnp.asarray(wy, data.dtype)
    wx = jnp.asarray(wx, data.dtype)
    tmp = jnp.einsum("...yx,Xx->...yX", data, wx)
    return jnp.einsum("...yX,Yy->...YX", tmp, wy)


@functools.partial(jax.jit, static_argnames=("shape", "method", "nan_aware"))
def interp_to_fine(coarse, shape, method: str = "bilinear", nan_aware: bool = False):
    """Resample (..., ny, nx) fields to ``shape=(NY, NX)`` (batched).

    With ``nan_aware=True``, NaN source cells (ocean/missing) are excluded
    by mask-renormalization — ``resize(x*m) / resize(m)`` — so coastal fine
    cells take the weighted mean of their *valid* coarse neighbors instead
    of being NaN-poisoned; fine cells with zero valid coverage stay NaN.
    """
    out_shape = (*coarse.shape[:-2], *shape)
    if not nan_aware:
        return jax.image.resize(coarse, out_shape, method=method)
    valid = jnp.isfinite(coarse)
    num = jax.image.resize(jnp.where(valid, coarse, 0.0), out_shape, method=method)
    den = jax.image.resize(valid.astype(coarse.dtype), out_shape, method=method)
    eps = jnp.asarray(1e-6, coarse.dtype)
    return jnp.where(den > eps, num / jnp.where(den > eps, den, 1.0), jnp.nan)


def apply_climatology(anoms_fine, climo_fine, month_labels, *, kind: str = "temperature"):
    """Combine fine-grid anomalies with a fine-grid monthly climatology.

    ``anoms_fine``: (T, NY, NX); ``climo_fine``: (12, NY, NX) keyed by the
    per-step ``month_labels`` (T,) in 0..11.  Additive for ``'temperature'``,
    multiplicative for ``'precipitation'``.
    """
    climo_t = climo_fine[month_labels]  # (T, NY, NX)
    if kind == "temperature":
        return anoms_fine + climo_t
    if kind == "precipitation":
        return anoms_fine * climo_t
    raise ValueError(f"unknown kind: {kind}")


def spatial_disaggregate(
    anoms_coarse,
    climo_fine,
    month_labels,
    *,
    kind: str = "temperature",
    method: str = "bilinear",
    nan_aware: bool = False,
):
    """Full SD step: coarse anomalies -> fine grid -> climatology applied.

    Parameters
    ----------
    anoms_coarse : (T, ny, nx) bias-corrected anomalies (the output of a
        ``Bcsd*`` model with ``return_anoms=True`` over a grid).
    climo_fine : (12, NY, NX) fine-scale monthly climatology.
    month_labels : (T,) int month-1 labels for each time step.
    kind : 'temperature' (additive) or 'precipitation' (multiplicative).
    nan_aware : exclude NaN (ocean) coarse cells by mask-renormalized
        regridding instead of letting bilinear NaN-poison the coasts.
    """
    fine = interp_to_fine(
        jnp.asarray(anoms_coarse), climo_fine.shape[-2:], method=method, nan_aware=nan_aware
    )
    return apply_climatology(fine, jnp.asarray(climo_fine), jnp.asarray(month_labels), kind=kind)


# ---------------------------------------------------------------------------
# Temporal disaggregation (monthly -> daily)
# ---------------------------------------------------------------------------
#
# The reference's roadmap envisions ``bcsd_disaggregator(downscaled,
# obs_daily)`` as the final BCSD step (``/root/reference/docs/roadmap.rst:21-38``)
# but never implements it; its legacy CLI delegates the whole disaggregation
# to the external ``xsd`` package (``/root/reference/scripts/run_bcsd.py:9``).
# This is the classic Wood et al. (2004) temporal step: distribute each
# bias-corrected *monthly* value over the days of that month using the daily
# observed climatology's within-month structure —
#
#   temperature:    daily_t = monthly[m(t)] + pattern[doy(t)]
#   precipitation:  daily_t = monthly[m(t)] * pattern[doy(t)]
#
# where ``pattern`` is the across-years mean of the obs' within-month daily
# deviation (difference of, or ratio to, that (year, month)'s mean).  With
# ``conserve=True`` (default) each output month is re-shifted/re-scaled so its
# mean equals the input monthly value exactly (mass/energy conservation).
#
# TPU-first layout: all calendar/group structure is HOST data (normalized
# membership matrices from ``TimeIndex``); the device computation is three
# mean-pooling matmuls + elementwise combines, batched over any trailing
# spatial dims.


def daily_index_for_months(monthly_index):
    """Host helper: the daily DatetimeIndex spanning a monthly index's months."""
    import pandas as pd

    idx = pd.DatetimeIndex(monthly_index)
    start = idx[0].replace(day=1)
    end = (idx[-1] + pd.offsets.MonthEnd(0)).normalize()
    return pd.date_range(start, end, freq="D")


def _month_ids(ti: TimeIndex):
    """(year, month) group ids: labels (n,) in [0, M) plus the (M, 2) keys."""
    keys = np.stack([ti.year, ti.month], axis=1)
    uniq, labels = np.unique(keys, axis=0, return_inverse=True)
    return labels.astype(np.int32), uniq


def _mean_matrix(labels: np.ndarray, n_groups: int) -> np.ndarray:
    """(n_groups, n) row-normalized membership matrix (rows mean-pool)."""
    n = len(labels)
    m = np.zeros((n_groups, n), dtype=np.float64)
    m[labels, np.arange(n)] = 1.0
    counts = m.sum(axis=1, keepdims=True)
    return m / np.maximum(counts, 1.0)


@functools.partial(jax.jit, static_argnames=("kind", "conserve"))
def _temporal_disagg_device(
    monthly,
    obs,
    obs_month_mean_mat,  # (Mo, To) mean over each obs (year, month)
    obs_month_labels,  # (To,) int32 -> rows of obs_month_mean_mat
    doy_mean_mat,  # (D, To) mean over obs steps sharing a DOY
    doy_counts,  # (D,) how many obs steps back each DOY row
    midx_out,  # (Tout,) int32 -> rows of `monthly`
    doy_out,  # (Tout,) int32 -> rows of the DOY pattern
    out_month_mean_mat,  # (Tm, Tout) mean over each output month
    *,
    kind: str,
    conserve: bool,
):
    monthly = jnp.asarray(monthly)
    obs = jnp.asarray(obs)
    # per-(year, month) obs means, broadcast back to each obs day
    mm = jnp.einsum("mt,t...->m...", obs_month_mean_mat, obs)
    mm_t = mm[obs_month_labels]
    if kind == "temperature":
        dev = obs - mm_t
    else:
        # all-dry months give 0/0 -> define the ratio as 0 (obs is 0 there)
        dev = jnp.where(mm_t > 0, obs / jnp.where(mm_t > 0, mm_t, 1.0), 0.0)
    pattern = jnp.einsum("dt,t...->d...", doy_mean_mat, dev)
    # DOYs absent from obs (e.g. leap day under a noleap record): neutral
    shape = (-1,) + (1,) * (obs.ndim - 1)
    seen = (doy_counts > 0).reshape(shape)
    neutral = 0.0 if kind == "temperature" else 1.0
    pattern = jnp.where(seen, pattern, neutral)

    base = monthly[midx_out]
    out = base + pattern[doy_out] if kind == "temperature" else base * pattern[doy_out]
    if conserve:
        mo = jnp.einsum("mt,t...->m...", out_month_mean_mat, out)
        if kind == "temperature":
            out = out + (monthly - mo)[midx_out]
        else:
            # re-scale each month to the target mean; a month whose pattern
            # collapsed to zero mean cannot be rescaled -> distribute the
            # monthly value uniformly over its days instead
            safe = mo > 0
            scale = jnp.where(safe, monthly / jnp.where(safe, mo, 1.0), 0.0)
            out = out * scale[midx_out] + jnp.where(safe, 0.0, monthly)[midx_out]
    return out


def temporal_disaggregate(
    monthly,
    monthly_index,
    obs_daily,
    obs_index,
    out_index=None,
    *,
    kind: str = "temperature",
    conserve: bool = True,
):
    """Distribute monthly values over days using the obs daily climatology.

    Parameters
    ----------
    monthly : (Tm, ...) bias-corrected monthly series (any trailing spatial
        dims; e.g. the output of a gridded ``BcsdTemperature`` predict).
    monthly_index : DatetimeIndex / ``TimeIndex`` with one entry per month.
    obs_daily : (To, ...) daily observations on the same spatial layout.
    obs_index : daily DatetimeIndex / ``TimeIndex`` for ``obs_daily``.
    out_index : daily index for the output; defaults to the days spanning
        ``monthly_index``'s months (requires a pandas ``monthly_index``).
    kind : 'temperature' (additive pattern) or 'precipitation' (ratio).
    conserve : re-anchor each output month so its mean equals the monthly
        input exactly (the Wood et al. conservation property).

    Every output (year, month) must appear in ``monthly_index``.
    """
    if kind not in ("temperature", "precipitation"):
        raise ValueError(f"unknown kind: {kind}")
    if out_index is None:
        out_index = daily_index_for_months(monthly_index)
    m_ti = TimeIndex.from_any(monthly_index)
    o_ti = TimeIndex.from_any(obs_index)
    t_ti = TimeIndex.from_any(out_index)

    obs_labels, _ = _month_ids(o_ti)
    n_obs_months = int(obs_labels.max()) + 1
    obs_mean = _mean_matrix(obs_labels, n_obs_months)

    n_doy = max(int(o_ti.dayofyear.max()), int(t_ti.dayofyear.max()))
    doy_labels = (o_ti.dayofyear - 1).astype(np.int32)
    doy_mean = _mean_matrix(doy_labels, n_doy)
    doy_counts = np.bincount(doy_labels, minlength=n_doy).astype(np.int32)

    # map output days onto rows of `monthly` via (year, month) keys
    m_keys = {(int(y), int(m)): i for i, (y, m) in enumerate(zip(m_ti.year, m_ti.month))}
    try:
        midx_out = np.asarray(
            [m_keys[(int(y), int(m))] for y, m in zip(t_ti.year, t_ti.month)], dtype=np.int32
        )
    except KeyError as e:
        raise ValueError(f"output month {e} missing from monthly_index") from None
    # conservation pools over *output* months but must scatter through the
    # monthly rows they map to, so build the matrix in monthly-row space
    out_mean = np.zeros((len(m_ti), len(t_ti)), dtype=np.float64)
    out_mean[midx_out, np.arange(len(t_ti))] = 1.0
    counts = out_mean.sum(axis=1, keepdims=True)
    out_mean = out_mean / np.maximum(counts, 1.0)

    return _temporal_disagg_device(
        jnp.asarray(monthly),
        jnp.asarray(obs_daily),
        jnp.asarray(obs_mean),
        jnp.asarray(obs_labels),
        jnp.asarray(doy_mean),
        jnp.asarray(doy_counts),
        jnp.asarray(midx_out),
        jnp.asarray((t_ti.dayofyear - 1).astype(np.int32)),
        jnp.asarray(out_mean),
        kind=kind,
        conserve=conserve,
    )


def bcsd_disaggregator(downscaled, obs_daily, out_index=None, *, kind: str = "temperature"):
    """Roadmap-named convenience wrapper (``roadmap.rst:38``).

    Accepts ``xlite.DataArray`` (or real xarray) inputs carrying a ``time``
    coord — ``bcsd_disaggregator(downscaled_temp, da_temp_obs_daily)`` — and
    returns a DataArray of the same flavor; plain arrays require explicit
    indexes via :func:`temporal_disaggregate`.
    """
    mi = downscaled.coords["time"] if hasattr(downscaled, "coords") else None
    oi = obs_daily.coords["time"] if hasattr(obs_daily, "coords") else None
    if mi is None or oi is None:
        raise TypeError("bcsd_disaggregator expects DataArray inputs with a 'time' coord")
    if out_index is None:
        out_index = daily_index_for_months(mi)
    vals = np.asarray(
        temporal_disaggregate(
            np.asarray(downscaled.data), mi, np.asarray(obs_daily.data), oi, out_index, kind=kind
        )
    )
    if type(downscaled).__module__.startswith("xarray"):  # pragma: no cover - real-xarray images
        import xarray as xr

        coords = {d: downscaled.coords[d] for d in downscaled.dims if d != "time"}
        coords["time"] = out_index
        return xr.DataArray(vals, dims=downscaled.dims, coords=coords)
    from skdownscale_tpu.xlite import DataArray

    coords = dict(downscaled.coords)
    coords["time"] = out_index
    return DataArray(vals, downscaled.dims, coords)
