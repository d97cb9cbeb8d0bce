"""Smoke tests for the example data/plot helpers (examples/utils.py).

The reference ships these as notebook utilities
(``/root/reference/examples/utils.py:80-177``); here they are plain
functions, so exercise them on tiny synthetic data.  Plot tests are gated
on matplotlib/scipy availability.
"""

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/examples")

from utils import get_sample_data, get_sample_grid  # noqa: E402


def test_get_sample_data_kinds():
    for kind in ("training", "targets", "wind-hist", "wind-obs", "wind-rcp"):
        df = get_sample_data(kind)
        assert isinstance(df.index, pd.DatetimeIndex)
        assert len(df) > 1000
        assert np.isfinite(np.asarray(df)).all()


def test_get_sample_grid_shapes():
    gcm, obs = get_sample_grid(ny=4, nx=5, years=2)
    assert gcm.dims == ("time", "y", "x")
    assert np.asarray(gcm.values).shape[1:] == (4, 5)


def test_prob_plots_smoke(rng):
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    pytest.importorskip("scipy")
    from utils import prob_plots

    x = rng.normal(0, 1, 400)
    y = rng.normal(0.5, 1.2, 400)
    fig = prob_plots(x, y, {"qm": y + 0.01, "qdm": y - 0.01}, shape=(1, 2))
    assert fig is not None


def test_tutorial_notebook_builder():
    """The notebook builder must emit a valid nbformat document whose code
    cells compile (execution is exercised by the shipped tutorial.ipynb)."""
    nbf = pytest.importorskip("nbformat")
    import make_tutorial_notebook as mtn

    nb = nbf.v4.new_notebook()
    nb.cells = [
        nbf.v4.new_markdown_cell(src) if kind == "md" else nbf.v4.new_code_cell(src)
        for kind, src in mtn.CELLS
    ]
    nbf.validate(nb)
    for c in nb.cells:
        if c.cell_type == "code":
            src = "\n".join(
                line for line in c.source.splitlines() if not line.startswith("%")
            )
            compile(src, "<cell>", "exec")


def test_zscore_plots_smoke(rng):
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    pytest.importorskip("scipy")
    from utils import zscore_correction_plot, zscore_ds_plot

    import skdownscale_tpu as sdt

    idx = pd.date_range("2000-01-01", periods=3 * 365, freq="D")
    seas = 3.0 * np.sin(2 * np.pi * (idx.dayofyear.to_numpy() - 1) / 365.25)
    hist = pd.DataFrame({"uas": seas + rng.normal(0, 1, len(idx)) + 1.0}, index=idx)
    obs = pd.DataFrame({"uas": seas + rng.normal(0, 0.9, len(idx))}, index=idx)
    fut = pd.DataFrame({"uas": seas + rng.normal(0, 1, len(idx)) + 1.2}, index=idx)

    z = sdt.ZScoreRegressor()
    z.fit(hist, obs)
    out = z.predict(fut)

    # reference-parity types: DOY-indexed fit stats, time-indexed predict
    # stats (ref zscore.py:58-63, 103-108)
    assert isinstance(z.fit_stats_dict_["X_mean"], pd.Series)
    assert z.fit_stats_dict_["X_mean"].index[0] == 1
    assert isinstance(z.predict_stats_dict_["meani"], pd.Series)
    assert z.predict_stats_dict_["meani"].index.equals(fut.index)

    assert zscore_ds_plot(hist, obs, fut, out) is not None
    assert zscore_correction_plot(z) is not None
