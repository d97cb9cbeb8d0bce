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
        # like xarray: keep a dask-backed payload lazy, else coerce to numpy
        self.data = data if type(data).__module__.startswith("dask") else np.asarray(data)
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


# ----------------------------------------------------------------------
# dask-chunked input adapter (faithful dask.array subset mock)
# ----------------------------------------------------------------------


class MockDaskArray:
    """Implements the dask.array subset the lazy packing adapter touches:
    ndim/shape/chunks, dict-based rechunk, slicing, and compute-on-asarray."""

    def __init__(self, data, chunks):
        self._data = np.asarray(data)
        self.chunks = chunks  # tuple of per-dim chunk tuples, dask-style
        self.compute_log = []  # slices materialized (shared across derived views)

    @property
    def ndim(self):
        return self._data.ndim

    @property
    def shape(self):
        return self._data.shape

    @property
    def dtype(self):
        return self._data.dtype

    def rechunk(self, spec):
        chunks = list(self.chunks)
        for axis, c in spec.items():
            if c == -1:
                chunks[axis] = (self._data.shape[axis],)
            else:
                raise NotImplementedError
        out = MockDaskArray(self._data, tuple(chunks))
        out.compute_log = self.compute_log
        return out

    def transpose(self, axes):
        out = MockDaskArray(
            self._data.transpose(axes), tuple(self.chunks[a] for a in axes)
        )
        out.compute_log = self.compute_log
        return out

    def __getitem__(self, key):
        out = MockDaskArray(self._data[key], None)
        out.compute_log = self.compute_log
        out._slice = key
        return out

    def __array__(self, dtype=None):
        self.compute_log.append(getattr(self, "_slice", None))
        return self._data if dtype is None else self._data.astype(dtype)


MockDaskArray.__module__ = "dask.array.core"


def _chunks_for(shape, spec):
    out = []
    for axis, n in enumerate(shape):
        c = spec.get(axis, n)
        out.append(tuple([c] * (n // c) + ([n % c] if n % c else [])))
    return tuple(out)


@pytest.fixture
def dask_grid(xr_grid):
    # pre-shaped (time, variable, y, x) so the packer's transpose is lazy
    # (the mock DataArray's expand_dims would materialize); chunked per-row
    # on the leading spatial dim, dask-style
    def lazify(da, name):
        data4 = da.data[:, None]
        coords = dict(da.coords)
        coords["variable"] = [name]
        out = MockXrDataArray(data4, ("time", "variable", *da.dims[1:]), coords)
        out.data = MockDaskArray(data4, _chunks_for(data4.shape, {2: 1}))
        return out

    X, y = xr_grid
    return lazify(X, "tmax"), lazify(y, "tmax")


def test_dask_adapter_matches_eager(xr_grid, dask_grid):
    X, y = xr_grid
    Xc, yc = dask_grid
    eager = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False))
    eager.fit(X, y)
    ref = eager.predict(X)

    lazy = sdt.PointWiseDownscaler(sdt.BcsdTemperature(return_anoms=False))
    lazy.fit(Xc, yc)
    # one state chunk per spatial dask block that holds valid cells
    assert len(lazy._state) == 3
    out = lazy.predict(Xc)
    npt.assert_allclose(
        np.asarray(out.values)[:, 1:, :], np.asarray(ref.values)[:, 1:, :], rtol=1e-9
    )
    assert np.isnan(np.asarray(out.values)[:, 0, 0]).all()
    # the adapter must never have materialized the whole grid in one pull:
    # every compute was a partial slice (or the 1-element mask slice)
    assert all(s is not None for s in Xc.data.compute_log)


def test_dask_adapter_respects_cell_chunk_size(dask_grid):
    Xc, yc = dask_grid
    lazy = sdt.PointWiseDownscaler(
        sdt.BcsdTemperature(return_anoms=False), cell_chunk_size=2
    )
    lazy.fit(Xc, yc)
    # 11 valid cells across 3 row-blocks of (3, 4, 4), split at <=2 cells
    assert [len(ids) for _, ids in lazy._state_plan] == [2, 1, 2, 2, 2, 2]
    out = lazy.predict(Xc)
    # single-output predict drops the feature dim (core.py:300-310)
    assert out.values.shape == (Xc.values.shape[0], *Xc.values.shape[2:])
