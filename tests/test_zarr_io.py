"""Zarr v2 store round-trip + the zarr -> per-host-shards input pipeline.

Covers utils/zarrlite (dependency-free zarr v2 reader/writer) and
parallel/zarr_io (host-slice mapping onto the chunked store feeding the
cell-sharded mesh; VERDICT r2 missing #2 / next #6).
"""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

from skdownscale_tpu.utils import zarrlite


@pytest.mark.parametrize("compressor", [None, "zlib", "gzip"])
@pytest.mark.parametrize("chunks", [None, (7, 5), (16, 3), (100, 100)])
def test_array_roundtrip(tmp_path, rng, compressor, chunks):
    a = rng.normal(size=(23, 11)).astype(np.float32)
    a[0, 0] = np.nan
    p = zarrlite.save_array(str(tmp_path / "a.zarr"), a, chunks=chunks, compressor=compressor)
    z = zarrlite.open_array(p)
    assert z.shape == a.shape and z.dtype == a.dtype
    npt.assert_array_equal(np.asarray(z), a)


def test_array_slicing(tmp_path, rng):
    a = rng.normal(size=(10, 8, 6))
    p = zarrlite.save_array(str(tmp_path / "a.zarr"), a, chunks=(4, 3, 5))
    z = zarrlite.open_array(p)
    npt.assert_array_equal(z[2:9, 1:7, 3], a[2:9, 1:7, 3])
    npt.assert_array_equal(z[0], a[0])
    npt.assert_array_equal(z[:, -2, :], a[:, -2, :])
    with pytest.raises(IndexError):
        z[::2]


def test_int_array_roundtrip(tmp_path):
    a = np.arange(48, dtype=np.int64).reshape(6, 8)
    p = zarrlite.save_array(str(tmp_path / "i.zarr"), a, chunks=(4, 4))
    npt.assert_array_equal(np.asarray(zarrlite.open_array(p)), a)


def test_missing_chunk_reads_fill(tmp_path, rng):
    import os

    a = rng.normal(size=(8, 8))
    p = zarrlite.save_array(str(tmp_path / "a.zarr"), a, chunks=(4, 4))
    os.remove(str(tmp_path / "a.zarr" / "1.1"))
    z = zarrlite.open_array(p)
    out = np.asarray(z)
    assert np.isnan(out[4:, 4:]).all()
    npt.assert_array_equal(out[:4], a[:4])


def test_unsupported_compressor_raises(tmp_path, rng):
    import json

    a = rng.normal(size=(4, 4))
    p = zarrlite.save_array(str(tmp_path / "a.zarr"), a)
    meta = json.load(open(f"{p}/.zarray"))
    meta["compressor"] = {"id": "blosc", "cname": "lz4"}
    json.dump(meta, open(f"{p}/.zarray", "w"))
    with pytest.raises(ValueError, match="blosc"):
        np.asarray(zarrlite.open_array(p))


def test_group_roundtrip(tmp_path, rng):
    g = zarrlite.save_group(
        str(tmp_path / "g.zarr"),
        {"tmax": rng.normal(size=(5, 4)), "time": np.arange(5)},
        chunks={"tmax": (2, 4), "time": None},
        attrs={"title": "test"},
    )
    grp = zarrlite.open_group(g)
    assert grp.attrs["title"] == "test"
    assert grp.array_keys() == ["time", "tmax"]
    assert "tmax" in grp and "missing" not in grp
    assert grp["tmax"].shape == (5, 4)


# ----------------------------------------------------------------------
# input pipeline
# ----------------------------------------------------------------------


def _grid_store(tmp_path, rng, T=24, ny=6, nx=5, chunks=(24, 2, 5)):
    index = pd.date_range("2000-01-01", periods=T, freq="MS")
    X = rng.normal(280, 3, (T, ny, nx))
    zarrlite.save_group(
        str(tmp_path / "s.zarr"),
        {"gcm": X, "time": np.asarray(index, dtype="datetime64[ns]").view(np.int64)},
        chunks={"gcm": chunks, "time": None},
    )
    zarrlite.save_array(
        str(tmp_path / "s.zarr" / "time"), np.asarray(index, dtype="datetime64[ns]").view(np.int64), attrs={"kind": "datetime64[ns]"}
    )
    return str(tmp_path / "s.zarr"), X, index


def test_grid_source_read_cells(tmp_path, rng):
    from skdownscale_tpu.parallel.zarr_io import ZarrGridSource

    store, X, index = _grid_store(tmp_path, rng)
    src = ZarrGridSource(store, "gcm")
    assert src.n_cells == 30 and src.n_time == 24
    assert (src.index == index).all()
    flat = X.reshape(24, -1)
    for lo, hi in [(0, 30), (3, 17), (29, 30), (7, 7), (25, 40)]:
        got = src.read_cells(lo, hi)
        npt.assert_array_equal(got, flat[:, lo : min(hi, 30)].T)


def test_grid_source_autodetects_single_var(tmp_path, rng):
    from skdownscale_tpu.parallel.zarr_io import ZarrGridSource

    store, X, _ = _grid_store(tmp_path, rng)
    src = ZarrGridSource(store)  # only non-time member
    assert src.var == "gcm"


def test_feed_zarr_cells_sharded(tmp_path, rng):
    """Host-slice read + feed == the direct shard of the full array (the
    8-virtual-device single-process case: host slice covers all cells)."""
    import jax

    from skdownscale_tpu.parallel import cell_mesh, shard_cells
    from skdownscale_tpu.parallel.zarr_io import feed_zarr_cells

    store, X, index = _grid_store(tmp_path, rng)
    mesh = cell_mesh(jax.devices())
    arr, n_cells, idx = feed_zarr_cells(store, mesh, "gcm")
    assert n_cells == 30
    assert (idx == index).all()
    direct, _ = shard_cells(X.reshape(24, -1).T, mesh)
    assert arr.shape == direct.shape  # padded to device multiple
    npt.assert_array_equal(np.asarray(arr)[:30], np.asarray(direct)[:30])
    assert arr.sharding.spec == direct.sharding.spec


def test_zarr_fed_bcsd_matches_in_memory(tmp_path, rng):
    """End-to-end: BCSD on the zarr-fed sharded array == in-memory arrays."""
    import jax

    from skdownscale_tpu.models.bcsd import BcsdTemperature, bcsd_fit, bcsd_predict
    from skdownscale_tpu.parallel import cell_mesh
    from skdownscale_tpu.parallel.zarr_io import feed_zarr_cells

    T, ny, nx = 120, 4, 4
    index = pd.date_range("1990-01-01", periods=T, freq="MS")
    seas = 8 * np.sin(2 * np.pi * (index.month.to_numpy() - 1) / 12)
    X = 283 + seas[:, None, None] + rng.normal(0, 2, (T, ny, nx))
    y = 282 + seas[:, None, None] + rng.normal(0, 1.8, (T, ny, nx))
    zarrlite.save_group(
        str(tmp_path / "b.zarr"),
        {"gcm": X, "obs": y, "time": np.asarray(index, dtype="datetime64[ns]").view(np.int64)},
        chunks={"gcm": (T, 1, nx), "obs": (T, 2, nx), "time": None},
    )
    zarrlite.save_array(
        str(tmp_path / "b.zarr" / "time"), np.asarray(index, dtype="datetime64[ns]").view(np.int64), attrs={"kind": "datetime64[ns]"}
    )
    mesh = cell_mesh(jax.devices())
    xs, n_cells, idx = feed_zarr_cells(str(tmp_path / "b.zarr"), mesh, "gcm")
    ys, _, _ = feed_zarr_cells(str(tmp_path / "b.zarr"), mesh, "obs")

    model = BcsdTemperature(return_anoms=False)
    fg = model._fit_groups(idx)
    plan = model._predict_plan(fg, idx)
    state = bcsd_fit(xs, ys, fg, with_x_climo=True)
    out = np.asarray(
        bcsd_predict(state, xs, plan, variable="temperature", return_anoms=False)
    )[:n_cells]

    x2 = X.reshape(T, -1).T
    y2 = y.reshape(T, -1).T
    state2 = bcsd_fit(x2, y2, fg, with_x_climo=True)
    want = np.asarray(bcsd_predict(state2, x2, plan, variable="temperature", return_anoms=False))
    npt.assert_allclose(out, want, rtol=1e-10, atol=1e-10)
