#!/usr/bin/env python
"""Multivariate bias correction example (MBCn, Cannon 2018).

Every estimator the reference ships is univariate in y: correcting tmax and
pr independently leaves their cross-correlation wrong — compound events
(hot-dry spells, warm-wet storms) end up with the model's dependence, not
the observed one.  ``MBCn`` corrects the JOINT distribution: QDM margins
plus an N-dimensional pdf transform (random rotations + quantile mapping of
each rotated coordinate).

Prints the tmax-pr correlation and the multivariate energy distance before
and after, and (with matplotlib) saves a joint-scatter comparison to
``examples/output/mbcn_joint.png``.  Runs on CPU or TPU; the batch-native
core (``models.mbc.mbcn_correct``) takes leading cell dims for grids.
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def make_series(rng, index, corr_tp, t_bias=0.0, p_scale=1.0):
    """tmax (K) + pr (mm/day) with a seasonal cycle and given dependence."""
    import pandas as pd

    n = len(index)
    doy = np.asarray(index.dayofyear)
    L = np.linalg.cholesky(np.array([[1.0, corr_tp], [corr_tp, 1.0]]))
    z = rng.standard_normal((n, 2)) @ L.T
    tmax = 285 + 10 * np.sin(2 * np.pi * doy / 365.25) + 3 * z[:, 0] + t_bias
    pr = np.maximum(0.05, np.exp(0.8 * z[:, 1]) * p_scale)
    return pd.DataFrame({"tmax": tmax, "pr": pr}, index=index)


def main():
    import jax.numpy as jnp
    import pandas as pd

    import skdownscale_tpu as sdt
    from skdownscale_tpu.utils import metrics

    rng = np.random.default_rng(7)
    obs = make_series(rng, pd.date_range("1980-01-01", "1999-12-31", freq="D"), -0.6, 0.0, 2.0)
    hist = make_series(rng, pd.date_range("1980-01-01", "1999-12-31", freq="D"), -0.1, 2.0, 3.0)
    fut = make_series(rng, pd.date_range("2050-01-01", "2069-12-31", freq="D"), -0.1, 2.8, 3.2)

    model = sdt.MBCn(n_iterations=25, kind=("difference", "ratio"), random_state=0)
    model.fit(hist, obs)
    corrected = model.predict(fut)

    def report(name, df):
        c = float(np.corrcoef(df["tmax"], df["pr"])[0, 1])
        e = float(
            metrics.energy_distance(
                jnp.asarray(df.to_numpy()[::5]), jnp.asarray(obs.to_numpy()[::5])
            )
        )
        print(f"  {name:14s} tmax-pr corr {c:+.3f}   energy distance to obs {e:.3f}")
        return c, e

    print("joint-distribution diagnostics (obs dependence is the target):")
    report("obs", obs)
    _, e_raw = report("raw future", fut)
    _, e_cor = report("MBCn future", corrected)
    print(f"  energy distance reduced {e_raw / max(e_cor, 1e-9):.1f}x; "
          f"pr > 0 everywhere: {bool((corrected['pr'] > 0).all())}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("(matplotlib unavailable; skipping the joint scatter figure)")
        return
    os.makedirs(OUT_DIR, exist_ok=True)
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.6), sharex=True, sharey=True)
    for ax, (title, df) in zip(
        axes, [("observations", obs), ("raw future", fut), ("MBCn-corrected future", corrected)]
    ):
        ax.scatter(df["tmax"][::10], df["pr"][::10], s=3, alpha=0.3)
        ax.set_title(title)
        ax.set_xlabel("tmax (K)")
        ax.set_yscale("log")
    axes[0].set_ylabel("pr (mm/day, log)")
    path = os.path.join(OUT_DIR, "mbcn_joint.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"saved joint-distribution scatter -> {path}")


if __name__ == "__main__":
    main()
