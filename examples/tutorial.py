#!/usr/bin/env python
"""Tutorial: end-to-end downscaling walkthrough (script form of the
reference's talk notebook ``examples/2020ECAHM-scikit-downscale.ipynb`` and
``docs/tutorials``).

Narrative, runnable top-to-bottom, producing the reference workflow's
diagnostic artifacts on disk:

1. load daily GCM-like training data + observations (synthetic stand-ins —
   no object-store egress here; see ``examples/utils.py``);
2. fit a panel of downscaling models on the single-cell API;
3. compare them with skill metrics and the reference's Q-Q probability
   plots (``prob_plots``, mirror of ref ``examples/utils.py:80-119``),
   saved to ``examples/output/tutorial_probplots.png``;
4. scale the winning model over a (time, y, x) grid with
   ``PointWiseDownscaler`` (NaN ocean cells masked), saving a bias map to
   ``examples/output/tutorial_bias_map.png``;
5. correct wind speeds with ``ZScoreRegressor`` (two diagnostic figures);
6. temporally disaggregate the corrected monthly grid to daily with
   ``bcsd_disaggregator`` (``examples/output/tutorial_disagg.png``);
7. correct tmax and pr jointly with ``MBCn`` (multivariate, beyond
   reference parity), checked with the energy distance.

Run: python examples/tutorial.py   (~1 min on CPU; figures need matplotlib)
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import skdownscale_tpu as sdt
from skdownscale_tpu.utils import metrics

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def main():
    from utils import get_sample_data, get_sample_grid, prob_plots

    os.makedirs(OUT_DIR, exist_ok=True)

    # ------------------------------------------------------------------
    # 1. data: 30 years of daily temperature; a biased/drifting GCM series
    #    and observed targets at the same location
    # ------------------------------------------------------------------
    training = get_sample_data("training")
    targets = get_sample_data("targets")
    split = "2000-01-01"  # fit on 1980-1999, evaluate on 2000-2009
    X_hist, X_fut = training[:split], training[split:]
    y_hist, y_fut = targets[:split], targets[split:]
    print(f"training {X_hist.shape}, evaluation {X_fut.shape}")
    print(f"raw GCM bias over evaluation period: "
          f"{float(X_fut['tmax'].mean() - y_fut['tmax'].mean()):+.2f} K")

    # ------------------------------------------------------------------
    # 2. a panel of models, all on the sklearn-style fit/predict API
    #    (the reference notebook's model dict, code cells 12-16)
    # ------------------------------------------------------------------
    models = {
        "BCSD: BcsdTemperature": sdt.BcsdTemperature(return_anoms=False),
        "QDM: EquidistantCdfMatcher": sdt.EquidistantCdfMatcher(
            kind="difference", extrapolate="both"
        ),
        "QM: QuantileMappingReressor": sdt.QuantileMappingReressor(extrapolate="both"),
        "ZScore: ZScoreRegressor": sdt.ZScoreRegressor(window_width=31),
    }

    preds = {}
    print("\nmodel skill over the held-out decade:")
    for name, model in models.items():
        model.fit(X_hist, y_hist["tmax"])
        yh = np.asarray(model.predict(X_fut)).reshape(-1)
        preds[name] = yh
        obs = y_fut["tmax"].to_numpy()
        ok = np.isfinite(yh) & np.isfinite(obs)
        print(
            f"  {name:32s} bias {float(yh[ok].mean() - obs[ok].mean()):+6.2f} K   "
            f"rmse {float(metrics.rmse(obs[ok], yh[ok])):5.2f}   "
            f"r2 {float(metrics.r2(obs[ok], yh[ok])):.3f}"
        )

    # ------------------------------------------------------------------
    # 3. diagnostic Q-Q plots (the reference's prob_plots figure)
    # ------------------------------------------------------------------
    try:
        fig = prob_plots(
            X_fut["tmax"].to_numpy(),
            y_fut["tmax"].to_numpy(),
            {k: np.nan_to_num(v, nan=np.nanmean(v)) for k, v in preds.items()},
            shape=(2, 2),
        )
        path = os.path.join(OUT_DIR, "tutorial_probplots.png")
        fig.savefig(path, dpi=110, bbox_inches="tight")
        print(f"\nsaved Q-Q probability plots -> {path}")
    except ImportError as e:  # pragma: no cover - matplotlib-less images
        print(f"\n(skipping figures: {e})")
        return

    # ------------------------------------------------------------------
    # 4. the same correction over a grid: PointWiseDownscaler batches every
    #    valid cell into one XLA program; ocean cells stay NaN
    # ------------------------------------------------------------------
    gcm, obs = get_sample_grid(ny=12, nx=12, years=10)
    d = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False))
    d.fit(gcm, obs)
    out = d.predict(gcm)
    v = np.asarray(out.values)
    raw_bias = np.asarray(gcm.values).mean(axis=0) - np.asarray(obs.values).mean(axis=0)
    cor_bias = v.mean(axis=0) - np.asarray(obs.values).mean(axis=0)
    print(f"grid: raw |bias| {np.nanmean(np.abs(raw_bias)):.2f} K -> "
          f"corrected {np.nanmean(np.abs(cor_bias)):.2f} K; "
          f"ocean NaN preserved: {bool(np.isnan(v[:, :, :2]).all())}")

    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(9, 4), sharey=True)
    for ax, (title, field) in zip(
        axes, [("raw GCM bias (K)", raw_bias), ("after BCSD (K)", cor_bias)]
    ):
        im = ax.imshow(field, cmap="RdBu_r", vmin=-2, vmax=2, origin="lower")
        ax.set_title(title)
    fig.colorbar(im, ax=axes, shrink=0.8)
    path = os.path.join(OUT_DIR, "tutorial_bias_map.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"saved bias maps -> {path}")

    # ------------------------------------------------------------------
    # 5. z-score wind correction + the reference's two diagnostic figures
    #    (mirror of the zscore tutorial, ref examples/utils.py:106-169)
    # ------------------------------------------------------------------
    from utils import zscore_correction_plot, zscore_ds_plot

    hist = get_sample_data("wind-hist")
    wobs = get_sample_data("wind-obs")
    rcp = get_sample_data("wind-rcp")
    z = sdt.ZScoreRegressor()
    z.fit(hist, wobs)
    zout = z.predict(rcp)
    f1 = zscore_ds_plot(hist, wobs, rcp, zout)
    p1 = os.path.join(OUT_DIR, "tutorial_zscore_series.png")
    f1.savefig(p1, dpi=110, bbox_inches="tight")
    f2 = zscore_correction_plot(z)
    p2 = os.path.join(OUT_DIR, "tutorial_zscore_gaussians.png")
    f2.savefig(p2, dpi=110, bbox_inches="tight")
    print(f"saved z-score diagnostics -> {p1}, {p2}")

    # ------------------------------------------------------------------
    # 6. monthly -> daily: the disaggregation step ("SD" in BCSD).  The
    #    reference roadmap sketches bcsd_disaggregator(downscaled, obs_daily)
    #    (ref docs/roadmap.rst:21-38) but never implements it; here it
    #    distributes each corrected monthly value over its days using the
    #    obs daily climatology, conserving every monthly mean exactly.
    # ------------------------------------------------------------------
    import pandas as pd

    from skdownscale_tpu.utils.disagg import bcsd_disaggregator
    from skdownscale_tpu.xlite import DataArray

    oi = pd.date_range("1990-01-01", "1994-12-31", freq="D")
    doy = np.asarray(oi.dayofyear)
    rng = np.random.default_rng(1)
    obs_daily = (
        283
        + 10 * np.sin(2 * np.pi * doy / 365.25)[:, None, None]
        + rng.normal(0, 2, (len(oi), 12, 12))
    )
    obs_daily_da = DataArray(
        obs_daily, ("time", "y", "x"), {"time": oi, "y": np.arange(12), "x": np.arange(12)}
    )
    daily = bcsd_disaggregator(out, obs_daily_da, kind="temperature")
    dvals = np.asarray(daily.data)
    dtime = daily.coords["time"]
    key = np.asarray(dtime.year) * 100 + np.asarray(dtime.month)
    mvals = np.asarray(out.values)
    cons = max(
        float(np.nanmax(np.abs(dvals[key == k].mean(axis=0) - mvals[i])))
        for i, k in enumerate(np.unique(key))
    )
    print(f"disaggregated {dvals.shape[0]} daily steps; "
          f"max monthly-mean conservation error {cons:.2e} K")

    sel = slice(0, 730)  # two years at one land cell
    fig, ax = plt.subplots(figsize=(9, 3.2))
    ax.plot(np.asarray(dtime)[sel], dvals[sel, 6, 6], lw=0.6, label="daily (disaggregated)")
    ax.step(
        np.asarray(out.coords["time"])[:24], mvals[:24, 6, 6],
        where="post", lw=1.8, color="C1", label="monthly (bias-corrected)",
    )
    ax.set_ylabel("K")
    ax.legend(loc="upper right")
    path = os.path.join(OUT_DIR, "tutorial_disagg.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"saved disaggregation figure -> {path}")

    # ------------------------------------------------------------------
    # 7. multivariate: correct tmax and pr JOINTLY with MBCn (the
    #    univariate zoo leaves cross-variable dependence uncorrected)
    # ------------------------------------------------------------------
    import jax.numpy as jnp

    from skdownscale_tpu.utils.metrics import energy_distance

    mb_rng = np.random.default_rng(7)

    def make_tp(index, corr_tp, t_bias=0.0, p_scale=1.0):
        n, mdoy = len(index), np.asarray(index.dayofyear)
        L = np.linalg.cholesky(np.array([[1.0, corr_tp], [corr_tp, 1.0]]))
        zz = mb_rng.standard_normal((n, 2)) @ L.T
        return pd.DataFrame({
            "tmax": 285 + 10 * np.sin(2 * np.pi * mdoy / 365.25) + 3 * zz[:, 0] + t_bias,
            "pr": np.maximum(0.05, np.exp(0.8 * zz[:, 1]) * p_scale),
        }, index=index)

    obs_tp = make_tp(pd.date_range("1980-01-01", "1999-12-31", freq="D"), -0.6, 0.0, 2.0)
    hist_tp = make_tp(pd.date_range("1980-01-01", "1999-12-31", freq="D"), -0.1, 2.0, 3.0)
    fut_tp = make_tp(pd.date_range("2050-01-01", "2069-12-31", freq="D"), -0.1, 2.8, 3.2)
    mb = sdt.MBCn(n_iterations=25, kind=("difference", "ratio"), random_state=0)
    corrected_tp = mb.fit(hist_tp, obs_tp).predict(fut_tp)
    for name, df in [("obs", obs_tp), ("raw future", fut_tp), ("MBCn future", corrected_tp)]:
        c = float(np.corrcoef(df["tmax"], df["pr"])[0, 1])
        e = float(energy_distance(
            jnp.asarray(df.to_numpy()[::5]), jnp.asarray(obs_tp.to_numpy()[::5])
        ))
        print(f"  MBCn panel {name:12s} tmax-pr corr {c:+.3f}  energy dist {e:.3f}")


if __name__ == "__main__":
    main()
