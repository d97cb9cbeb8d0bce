#!/usr/bin/env python
"""The complete BCSD chain: bias correction + spatial + temporal disaggregation.

The reference implements only the bias-correction step; its legacy CLI
delegates the disaggregation halves to the external ``xsd`` package
(``/root/reference/scripts/run_bcsd.py:9``) and its roadmap sketches a
``bcsd_disaggregator`` that was never built (``docs/roadmap.rst:21-38``).
This framework ships all three stages TPU-native; this example runs them
end-to-end on a synthetic CONUS-like workload:

1. **Bias-correct** coarse monthly GCM output against coarse monthly obs —
   `PointWiseDownscaler(BcsdTemperature(return_anoms=True))`, every valid
   cell in one batched XLA program; output = monthly *anomalies*.
2. **Spatially disaggregate** the coarse anomalies onto the 4x fine grid
   and add the fine-scale observed monthly climatology
   (`utils.disagg.spatial_disaggregate` — batched bilinear resize).
3. **Temporally disaggregate** the fine monthly fields to daily using the
   fine daily obs' within-month patterns with exact per-month mean
   conservation (`utils.disagg.temporal_disaggregate`).

Saves a 3-panel figure (coarse anomaly / fine monthly / fine daily) to
``examples/output/full_bcsd_pipeline.png``.  Runs on CPU or TPU.
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def main():
    import pandas as pd

    import skdownscale_tpu as sdt
    from skdownscale_tpu.utils.disagg import spatial_disaggregate, temporal_disaggregate
    from skdownscale_tpu.xlite import DataArray

    rng = np.random.default_rng(4)
    ny, nx, scale = 12, 16, 4
    NY, NX = ny * scale, nx * scale
    mi = pd.date_range("1980-01-01", periods=240, freq="MS")  # 20y monthly
    oi = pd.date_range("1980-01-01", "1989-12-31", freq="D")  # 10y fine daily obs

    # synthetic truth: seasonal cycle + smooth topographic gradient
    seas_m = 10 * np.sin(2 * np.pi * (np.asarray(mi.month) - 1) / 12)
    topo_f = 4 * np.sin(np.linspace(0, np.pi, NY))[:, None] * np.cos(
        np.linspace(0, 2 * np.pi, NX)
    )[None, :]
    topo_c = topo_f.reshape(ny, scale, nx, scale).mean(axis=(1, 3))

    coarse = lambda b: (
        284 + seas_m[:, None, None] + topo_c + rng.normal(0, 2, (len(mi), ny, nx)) + b
    )
    gcm_c, obs_c = coarse(1.8), coarse(0.0)
    gcm_c[:, :2, :3] = np.nan  # ocean corner
    obs_c[:, :2, :3] = np.nan
    coords = {"time": mi, "y": np.arange(ny), "x": np.arange(nx)}
    gcm_da = DataArray(gcm_c, ("time", "y", "x"), coords)
    obs_da = DataArray(obs_c, ("time", "y", "x"), coords)

    # fine daily obs (for the fine climatology + the daily patterns)
    doy = np.asarray(oi.dayofyear)
    obs_fd = (
        284
        + 10 * np.sin(2 * np.pi * doy / 365.25)[:, None, None]
        + topo_f
        + rng.normal(0, 2.5, (len(oi), NY, NX))
    )

    # --- 1. bias correction (anomaly output) over the coarse grid --------
    d = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=True))
    d.fit(gcm_da, obs_da)
    anoms = np.asarray(d.predict(gcm_da).values)  # (240, ny, nx), NaN ocean
    print(f"1. bias correction: coarse anomalies {anoms.shape}, "
          f"mean |anom| {np.nanmean(np.abs(anoms)):.2f} K")

    # --- 2. spatial disaggregation: coarse anoms -> fine grid + climo ----
    month_labels = np.asarray(mi.month) - 1
    fine_climo = np.stack(
        [obs_fd[np.asarray(oi.month) == m + 1].mean(axis=0) for m in range(12)]
    )
    fine_monthly = np.asarray(
        spatial_disaggregate(
            anoms, fine_climo, month_labels, kind="temperature", nan_aware=True
        )
    )
    # coastal fine cells take renormalized valid-neighbor means; fully-ocean
    # fine cells stay NaN -> fill with climatology for the daily step
    fine_monthly = np.where(
        np.isfinite(fine_monthly), fine_monthly, fine_climo[month_labels]
    )
    print(f"2. spatial disaggregation: {anoms.shape[1:]} -> {fine_monthly.shape[1:]} "
          f"(bilinear x{scale} + fine monthly climatology)")

    # --- 3. temporal disaggregation: fine monthly -> fine daily ----------
    daily = np.asarray(
        temporal_disaggregate(fine_monthly, mi, obs_fd, oi, kind="temperature")
    )
    out_index = pd.date_range(mi[0], mi[-1] + pd.offsets.MonthEnd(0), freq="D")
    key = np.asarray(out_index.year) * 100 + np.asarray(out_index.month)
    cons = max(
        float(np.max(np.abs(daily[key == k].mean(axis=0) - fine_monthly[i])))
        for i, k in enumerate(np.unique(key)[:24])
    )
    print(f"3. temporal disaggregation: {daily.shape[0]} daily steps on the fine "
          f"grid; monthly-mean conservation error {cons:.1e} K")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("(matplotlib unavailable; skipping the figure)")
        return
    os.makedirs(OUT_DIR, exist_ok=True)
    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
    im0 = axes[0].imshow(anoms[6], cmap="RdBu_r", vmin=-3, vmax=3, origin="lower")
    axes[0].set_title(f"coarse anomaly {anoms.shape[1:]} (K)")
    fig.colorbar(im0, ax=axes[0], shrink=0.8)
    im1 = axes[1].imshow(fine_monthly[6], cmap="viridis", origin="lower")
    axes[1].set_title(f"fine monthly {fine_monthly.shape[1:]} (K)")
    fig.colorbar(im1, ax=axes[1], shrink=0.8)
    im2 = axes[2].imshow(daily[190], cmap="viridis", origin="lower")
    axes[2].set_title("fine daily snapshot (K)")
    fig.colorbar(im2, ax=axes[2], shrink=0.8)
    path = os.path.join(OUT_DIR, "full_bcsd_pipeline.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"saved pipeline figure -> {path}")


if __name__ == "__main__":
    main()
