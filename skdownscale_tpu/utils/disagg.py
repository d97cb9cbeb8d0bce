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

__all__ = ["interp_to_fine", "apply_climatology", "spatial_disaggregate"]


@functools.partial(jax.jit, static_argnames=("shape", "method"))
def interp_to_fine(coarse, shape, method: str = "bilinear"):
    """Resample (..., ny, nx) fields to ``shape=(NY, NX)`` (batched)."""
    out_shape = (*coarse.shape[:-2], *shape)
    return jax.image.resize(coarse, out_shape, method=method)


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
):
    """Full SD step: coarse anomalies -> fine grid -> climatology applied.

    Parameters
    ----------
    anoms_coarse : (T, ny, nx) bias-corrected anomalies (the output of a
        ``Bcsd*`` model with ``return_anoms=True`` over a grid).
    climo_fine : (12, NY, NX) fine-scale monthly climatology.
    month_labels : (T,) int month-1 labels for each time step.
    kind : 'temperature' (additive) or 'precipitation' (multiplicative).
    """
    fine = interp_to_fine(jnp.asarray(anoms_coarse), climo_fine.shape[-2:], method=method)
    return apply_climatology(fine, jnp.asarray(climo_fine), jnp.asarray(month_labels), kind=kind)
