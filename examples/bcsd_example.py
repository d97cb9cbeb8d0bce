#!/usr/bin/env python
"""BCSD example (script form of the reference's ``bcsd_example.ipynb``).

Fits ``BcsdTemperature`` and ``BcsdPrecipitation`` on daily(monthly-grouped)
training data, bias-corrects a future period, and reports skill metrics.
Runs on synthetic data (this environment has no object-store access; see
``examples/utils.py``).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import pandas as pd

import skdownscale_tpu as sdt
from skdownscale_tpu.utils import metrics


def main():
    from utils import get_sample_data

    # --- temperature ---------------------------------------------------
    training = get_sample_data("training").resample("MS").mean()
    targets = get_sample_data("targets").resample("MS").mean()

    bcsd_t = sdt.BcsdTemperature(return_anoms=False)
    bcsd_t.fit(training, targets)
    out_t = bcsd_t.predict(training)
    print("BcsdTemperature:")
    print(f"  raw bias      : {float(training['tmax'].mean() - targets['tmax'].mean()):+.2f} K")
    print(f"  corrected bias: {float(out_t['tmax'].mean() - targets['tmax'].mean()):+.2f} K")
    print(f"  r2 vs obs     : {float(metrics.r2(targets['tmax'].to_numpy(), out_t['tmax'].to_numpy())):.3f}")

    # --- precipitation (ratio anomalies) -------------------------------
    rng = np.random.default_rng(1)
    idx = training.index
    pr_model = pd.DataFrame({"pr": rng.gamma(2.0, 30.0, len(idx)) + 1}, index=idx)
    pr_obs = pd.DataFrame({"pr": rng.gamma(2.2, 25.0, len(idx)) + 1}, index=idx)

    bcsd_p = sdt.BcsdPrecipitation(return_anoms=False)
    bcsd_p.fit(pr_model, pr_obs)
    out_p = bcsd_p.predict(pr_model)
    print("BcsdPrecipitation:")
    print(f"  raw mean {float(pr_model['pr'].mean()):.1f} -> corrected {float(out_p['pr'].mean()):.1f} "
          f"(obs {float(pr_obs['pr'].mean()):.1f})")


if __name__ == "__main__":
    main()
