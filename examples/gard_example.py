#!/usr/bin/env python
"""GARD example (script form of the reference's ``gard_example.ipynb``).

Runs the GARD family — ``PureAnalog`` (all kinds), ``AnalogRegression``,
``PureRegression`` — on daily wind data and compares skill.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import skdownscale_tpu as sdt
from skdownscale_tpu.utils import metrics


def main():
    from utils import get_sample_data

    hist = get_sample_data("wind-hist")
    obs = get_sample_data("wind-obs")
    rcp = get_sample_data("wind-rcp")

    models = {
        "PureAnalog-best-1": sdt.PureAnalog(kind="best_analog", n_analogs=1),
        "PureAnalog-sample-10": sdt.PureAnalog(kind="sample_analogs", n_analogs=10, random_state=0),
        "PureAnalog-weight-10": sdt.PureAnalog(kind="weight_analogs", n_analogs=10),
        "PureAnalog-mean-10": sdt.PureAnalog(kind="mean_analogs", n_analogs=10),
        "AnalogRegression-100": sdt.AnalogRegression(n_analogs=100),
        "PureRegression": sdt.PureRegression(),
    }

    y = obs["uas"].to_numpy()
    print(f"{'model':<24} {'rmse':>7} {'r':>6}")
    for name, model in models.items():
        model.fit(hist, obs["uas"])
        pred = np.asarray(model.predict(hist))[:, 0]
        print(
            f"{name:<24} {float(metrics.rmse(y, pred)):7.3f} "
            f"{float(metrics.pearsonr(y, pred)):6.3f}"
        )
        # future projection just to exercise the path
        model.predict(rcp)


if __name__ == "__main__":
    main()
