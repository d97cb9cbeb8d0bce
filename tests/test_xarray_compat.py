"""Validate the real-xarray code path with a faithful API mock.

xarray is not installed in this environment, but PointWiseDownscaler has
xarray-specific branches (expand_dims signature, output construction).
This mock implements the exact xarray signatures those branches use, with
``__module__ = 'xarray....'`` so the dispatch treats it as real xarray.
"""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import skdownscale_tpu as sdt


class MockXrDataArray:
    """Implements the xarray.DataArray subset PointWiseDownscaler touches,
    with xarray's signatures (not xlite's)."""

    def __init__(self, data, dims=None, coords=None, name=None):
        self.data = np.asarray(data)
        self.dims = tuple(dims)
        self.coords = dict(coords or {})
        self.name = name

    @property
    def values(self):
        return self.data

    @property
    def shape(self):
        return self.data.shape

    @property
    def sizes(self):
        return dict(zip(self.dims, self.data.shape))

    def expand_dims(self, axis=None, **dim_kwargs):
        # xarray signature: expand_dims(**{dim: labels}, axis=1)
        ((dim, labels),) = dim_kwargs.items()
        data = np.repeat(np.expand_dims(self.data, axis), len(labels), axis=axis)
        dims = list(self.dims)
        dims.insert(axis, dim)
        coords = dict(self.coords)
        coords[dim] = list(labels)
        return type(self)(data, dims, coords, self.name)

    def transpose(self, *dims):
        axes = [self.dims.index(d) for d in dims]
        return type(self)(self.data.transpose(axes), dims, self.coords, self.name)


class MockXrDataset:
    def __init__(self, data_vars):
        self.data_vars = dict(data_vars)

    def to_array(self, dim="variable"):
        names = list(self.data_vars)
        first = self.data_vars[names[0]]
        stacked = np.stack([self.data_vars[n].values for n in names])
        coords = dict(first.coords)
        coords[dim] = names
        return MockXrDataArray(stacked, (dim, *first.dims), coords)


# make the dispatch treat the mocks as xarray objects
MockXrDataArray.__module__ = "xarray.core.dataarray"
MockXrDataset.__module__ = "xarray.core.dataset"


@pytest.fixture
def xr_grid(rng):
    idx = pd.date_range("1990-01-01", "1997-12-01", freq="MS")
    T, ny, nx = len(idx), 3, 4
    X = 283 + rng.normal(0, 2, (T, ny, nx))
    X[:, 0, 0] = np.nan
    y = X - 1.2 + rng.normal(0, 0.5, (T, ny, nx))
    coords = {"time": idx, "y": np.arange(ny), "x": np.arange(nx)}
    return (
        MockXrDataArray(X, ("time", "y", "x"), coords),
        MockXrDataArray(np.nan_to_num(y, nan=0.0) * 0 + y, ("time", "y", "x"), coords),
    )


def test_xarray_dataarray_path(xr_grid):
    X, y = xr_grid
    d = sdt.PointWiseDownscaler(sdt.QuantileMappingReressor(extrapolate="both"))
    d.fit(X, y)
    out = d.predict(X)
    # output must be constructed as an "xarray" object (the mock)
    assert type(out).__module__.startswith("xarray")
    assert out.dims == ("time", "y", "x")
    assert np.isnan(out.values[:, 0, 0]).all()
    assert np.isfinite(out.values[:, 1:, :]).all()


def test_xarray_dataset_path(xr_grid):
    X, _ = xr_grid
    ds = MockXrDataset({"tmax": X})
    d = sdt.PointWiseDownscaler(sdt.QuantileMapper())
    d.fit(ds)
    out = d.transform(ds)
    assert out.values.shape[0] == X.values.shape[0]


def test_xarray_expand_dims_branch(xr_grid):
    # a DataArray without a variable dim exercises the xarray expand_dims
    # signature branch directly
    X, y = xr_grid
    d = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False))
    d.fit(X, y)
    out = d.predict(X)
    assert out.values.shape == X.values.shape
    cy, cx = 1, 2
    single = sdt.BcsdTemperature(return_anoms=False).fit(
        pd.DataFrame({"v": X.values[:, cy, cx]}, index=X.coords["time"]),
        pd.DataFrame({"v": y.values[:, cy, cx]}, index=X.coords["time"]),
    )
    expected = single.predict(pd.DataFrame({"v": X.values[:, cy, cx]}, index=X.coords["time"]))
    npt.assert_allclose(out.values[:, cy, cx], expected.to_numpy().ravel(), rtol=1e-8)
