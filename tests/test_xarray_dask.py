"""Real-xarray / dask-chunked input tests (gated on availability).

This image ships neither xarray nor dask, so these tests skip cleanly here;
in an image that has them they exercise the REAL branches that
tests/test_xarray_compat.py can only mock:

* xarray ``Dataset.to_array`` / ``expand_dims`` / output construction in
  ``PointWiseDownscaler`` (reference ``core.py:427-440``);
* dask-chunked DataArray inputs — the lazy packing adapter computes one
  spatial block at a time and lines device passes up with the dask chunks
  (reference's chunked path is ``xr.map_blocks``, ``core.py:256-262,300-336``).
"""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

xr = pytest.importorskip("xarray")
if getattr(xr, "__version__", "").endswith("-stub"):
    # conftest installs an inert xarray stub for reference golden tests;
    # it must not satisfy this module's gate
    pytest.skip("real xarray not installed (stub present)", allow_module_level=True)

import skdownscale_tpu as sdt


def _grid(rng, chunked=False, ny=3, nx=4):
    idx = pd.date_range("1990-01-01", "1997-12-01", freq="MS")
    T = len(idx)
    X = 283 + rng.normal(0, 2, (T, ny, nx))
    X[:, 0, 0] = np.nan  # ocean cell
    y = X - 1.2 + rng.normal(0, 0.5, (T, ny, nx))
    coords = {"time": idx, "y": np.arange(ny), "x": np.arange(nx)}
    Xda = xr.DataArray(X, dims=("time", "y", "x"), coords=coords)
    yda = xr.DataArray(y, dims=("time", "y", "x"), coords=coords)
    if chunked:
        pytest.importorskip("dask")
        Xda = Xda.chunk({"time": -1, "y": 1})
        yda = yda.chunk({"time": -1, "y": 1})
    return Xda, yda


def test_real_xarray_dataarray_roundtrip(rng):
    X, y = _grid(rng)
    d = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False))
    d.fit(X, y)
    out = d.predict(X)
    assert isinstance(out, xr.DataArray)
    assert out.dims == ("time", "y", "x")
    assert np.isnan(np.asarray(out)[:, 0, 0]).all()
    assert np.isfinite(np.asarray(out)[:, 1:, :]).all()


def test_real_xarray_dataset_packing(rng):
    X, y = _grid(rng)
    ds = xr.Dataset({"tmax": X})
    d = sdt.PointWiseDownscaler(sdt.QuantileMappingReressor())
    d.fit(ds, y)
    out = d.predict(ds)
    assert isinstance(out, xr.DataArray)
    assert out.dims == ("time", "y", "x")


def test_dask_chunked_matches_eager(rng):
    Xe, ye = _grid(rng)
    # same data both ways: chunk the eager grid
    pytest.importorskip("dask")
    Xc = Xe.chunk({"time": -1, "y": 1})
    yc = ye.chunk({"time": -1, "y": 1})

    d_eager = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False))
    d_eager.fit(Xe, ye)
    out_e = np.asarray(d_eager.predict(Xe))

    d_lazy = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False))
    d_lazy.fit(Xc, yc)
    # fit must have produced one state chunk per dask block with valid cells
    assert len(d_lazy._state) >= 2
    out_l = np.asarray(d_lazy.predict(Xc))
    npt.assert_allclose(out_e, out_l, rtol=1e-6, atol=1e-6)


def test_dask_chunked_transform(rng):
    X, _ = _grid(rng)
    pytest.importorskip("dask")
    Xc = X.chunk({"time": -1, "y": 2})
    d = sdt.PointWiseDownscaler(sdt.QuantileMapper())
    d.fit(Xc)
    out = d.transform(Xc)
    assert out.dims == ("time", "variable", "y", "x")


def test_dask_time_rechunked_to_single(rng):
    """Time-chunked input must still work: the adapter forces the time and
    feature dims to single chunks (reference ``core.py:435-437``)."""
    X, y = _grid(rng)
    pytest.importorskip("dask")
    Xc = X.chunk({"time": 24, "y": 1})
    yc = y.chunk({"time": 24, "y": 1})
    d = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False))
    d.fit(Xc, yc)
    out = d.predict(Xc)
    assert out.dims == ("time", "y", "x")
