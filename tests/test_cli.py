"""End-to-end test of the BCSD batch runner CLI (scripts/run_bcsd.py).

The reference's legacy script (``/root/reference/scripts/run_bcsd.py``)
delegates both bias correction and disaggregation to the external ``xsd``
package; this runner is self-contained, and ``--daily-obs`` exercises the
temporal-disaggregation SD step on top of the gridded bias correction.
"""

import importlib.util
import json
from pathlib import Path

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def cli():
    spec = importlib.util.spec_from_file_location(
        "run_bcsd_cli", str(Path(__file__).parents[1] / "scripts" / "run_bcsd.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_grid(path, data, index):
    np.savez(path, data=data, time=np.asarray(index).astype("datetime64[ns]"))
    return str(path)


def test_cli_full_pipeline_with_daily_disagg(tmp_path, rng, capsys, cli):
    ny, nx = 2, 3
    mi = pd.date_range("1980-01-01", periods=120, freq="MS")
    season = 8 * np.sin(2 * np.pi * (np.asarray(mi.month) - 1) / 12)[:, None, None]
    obs = 283 + season + rng.normal(0, 2, (120, ny, nx))
    ref = obs + 1.5 + rng.normal(0, 0.5, obs.shape)
    oi = pd.date_range("1980-01-01", "1983-12-31", freq="D")
    doy = np.asarray(oi.dayofyear)
    obs_daily = 283 + 8 * np.sin(2 * np.pi * doy / 365.25)[:, None, None] + rng.normal(
        0, 2, (len(oi), ny, nx)
    )

    out = str(tmp_path / "out.npz")
    cli.main(
        [
            "--obs", _write_grid(tmp_path / "obs.npz", obs, mi),
            "--ref", _write_grid(tmp_path / "ref.npz", ref, mi),
            "--predict", _write_grid(tmp_path / "ref2.npz", ref, mi),
            "--kind", "temperature",
            "--no-anoms",
            "--daily-obs", _write_grid(tmp_path / "obsd.npz", obs_daily, oi),
            "--out", out,
        ]
    )

    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    stats = json.loads(lines[0])
    assert stats["cells"] == ny * nx and stats["time_steps"] == 120

    with np.load(out) as z:
        monthly = z["data"]
    assert monthly.shape == (120, ny, nx)
    # bias-corrected toward obs
    assert abs(monthly.mean() - obs.mean()) < abs(ref.mean() - obs.mean())

    with np.load(out + ".daily.npz") as z:
        daily, dtime = z["data"], pd.DatetimeIndex(z["time"])
    assert daily.shape[1:] == (ny, nx)
    assert dtime[0] == mi[0] and dtime[-1] == mi[-1] + pd.offsets.MonthEnd(0)
    # conservation: each month's daily mean equals the monthly value (f32)
    key = np.asarray(dtime.year) * 100 + np.asarray(dtime.month)
    for i, k in enumerate(np.unique(key)):
        npt.assert_allclose(daily[key == k].mean(axis=0), monthly[i], rtol=1e-5)


def test_cli_demo_smoke(tmp_path, capsys, cli):
    cli.main(["--demo", "--out", str(tmp_path / "demo.npz")])
    out = capsys.readouterr().out
    assert "cells_per_sec" in out
    with np.load(str(tmp_path / "demo.npz")) as z:
        assert np.isfinite(z["data"]).any()


def test_cli_daily_obs_requires_no_anoms(tmp_path, rng, cli):
    mi = pd.date_range("1980-01-01", periods=24, freq="MS")
    g = 283 + rng.normal(0, 2, (24, 2, 2))
    a = _write_grid(tmp_path / "g.npz", g, mi)
    with pytest.raises(SystemExit):
        cli.main(
            ["--obs", a, "--ref", a, "--predict", a, "--daily-obs", a,
             "--out", str(tmp_path / "o.npz")]
        )
