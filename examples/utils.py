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


def zscore_ds_plot(training, target, future, corrected, var="uas"):
    """Time-series overlay of the four z-score example series (mirror of
    ``/root/reference/examples/utils.py:106-134``; takes pandas objects and
    uses each one's own index instead of the reference's hard-coded
    1980s/1990s ranges, and a matplotlib palette instead of seaborn)."""
    import matplotlib.pyplot as plt

    labels = ["training", "future", "target", "corrected"]
    cmap = plt.get_cmap("Set2")
    colors = {k: cmap(i) for i, k in enumerate(labels)}
    alpha = 0.5

    def _series(obj):
        if hasattr(obj, "columns") and var in getattr(obj, "columns", ()):
            return obj[var]
        return obj.squeeze()

    plt.figure(figsize=(8, 4))
    for name, obj in (
        ("training", training),
        ("target", target),
        ("future", future),
        ("corrected", corrected),
    ):
        s = _series(obj)
        plt.plot(s.index, np.asarray(s), label=name, alpha=alpha, c=colors[name])
    plt.xlabel("Time")
    plt.ylabel("Eastward Near-Surface Wind (m s-1)")
    plt.legend()
    return plt.gcf()


def _gaus(mean, std, doy):
    """``/root/reference/examples/utils.py:172-177``."""
    import scipy.stats

    mu = mean[doy]
    sigma = std[doy]
    x = np.linspace(mu - 3 * sigma, mu + 3 * sigma, 100)
    y = scipy.stats.norm.pdf(x, mu, sigma)
    return x, y


def zscore_correction_plot(zscore, doy: int = 20):
    """Per-DOY gaussian overlay from a fitted+predicted ``ZScoreRegressor``
    (mirror of ``/root/reference/examples/utils.py:137-169``): training vs
    target fit stats and the future vs corrected rolling stats, all reduced
    to day-of-year ``doy``."""
    import matplotlib.pyplot as plt

    training_mean = zscore.fit_stats_dict_["X_mean"]
    training_std = zscore.fit_stats_dict_["X_std"]
    target_mean = zscore.fit_stats_dict_["y_mean"]
    target_std = zscore.fit_stats_dict_["y_std"]

    def _doy_mean(s):
        return s.groupby(s.index.dayofyear).mean()

    future_mean = _doy_mean(zscore.predict_stats_dict_["meani"])
    future_std = _doy_mean(zscore.predict_stats_dict_["stdi"])
    corrected_mean = _doy_mean(zscore.predict_stats_dict_["meanf"])
    corrected_std = _doy_mean(zscore.predict_stats_dict_["stdf"])

    labels = ["training", "future", "target", "corrected"]
    cmap = plt.get_cmap("Set2")
    colors = {k: cmap(i) for i, k in enumerate(labels)}

    plt.figure()
    for name, (m, s) in (
        ("training", (training_mean, training_std)),
        ("target", (target_mean, target_std)),
        ("future", (future_mean, future_std)),
        ("corrected", (corrected_mean, corrected_std)),
    ):
        x, y = _gaus(m, s, doy)
        plt.plot(x, y, c=colors[name], label=name)
    plt.legend()
    return plt.gcf()
