"""Multi-process input feeding actually executes (VERDICT r3 weak #1 / next #2).

Every other test and the dryrun run with ``jax.process_count() == 1``, which
short-circuits ``parallel.multihost.feed_cells`` to a plain ``device_put``
before the code under claim.  Here two real OS processes form a JAX
distributed job over localhost (``jax.distributed.initialize``), each feeds
its ``host_cell_slice`` of a zarr store through ``feed_zarr_cells`` — taking
the ``jax.make_array_from_process_local_data`` branch
(``parallel/multihost.py``) — and runs the jitted batched BCSD fit+predict
over the global 8-device cell mesh.  The reassembled output must be BITWISE
equal to a single-process run of the identical 8-device SPMD program (the
reference's equivalent worker boundary: dask ``map_blocks``, ref
``core.py:262``).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import numpy.testing as npt
import pandas as pd

from skdownscale_tpu.utils import zarrlite

_WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _write_store(path, n_cells=30, n_time=48):
    rng = np.random.default_rng(0)
    index = pd.date_range("1990-01-01", periods=n_time, freq="MS")
    seasonal = 8.0 * np.sin(2 * np.pi * (index.month.to_numpy() - 1) / 12)
    side = n_cells  # 1-D "grid": (time, cells)
    x = (283.0 + seasonal[:, None] + rng.normal(0, 2, (n_time, side)) + 1.5).astype(np.float64)
    y = (282.0 + seasonal[:, None] + rng.normal(0, 1.8, (n_time, side))).astype(np.float64)
    tvals = np.asarray(index, dtype="datetime64[ns]").view(np.int64)
    zarrlite.save_group(
        path,
        {"gcm": x, "obs": y, "time": tvals},
        chunks={"gcm": (n_time, 7), "obs": (n_time, 7), "time": (n_time,)},
    )
    zarrlite.save_array(f"{path}/time", tvals, attrs={"kind": "datetime64[ns]"})
    return path


def _run_job(nprocs, store, outdir, timeout=600):
    os.makedirs(outdir, exist_ok=True)
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=_REPO)
    env.pop("XLA_FLAGS", None)  # worker pins device count via jax config
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nprocs), str(port), store, outdir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nprocs)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return _assemble(outdir, nprocs)


def _assemble(outdir, nprocs):
    meta = json.load(open(os.path.join(outdir, "meta_0.json")))
    out = np.full(meta["global_shape"], np.nan)
    seen = 0
    for pid in range(nprocs):
        z = np.load(os.path.join(outdir, f"shards_{pid}.npz"))
        for start, block in z.items():
            out[int(start) : int(start) + block.shape[0]] = block
            seen += block.shape[0]
    assert seen == meta["global_shape"][0], "shards must tile the global array"
    assert meta["process_count"] == nprocs
    return out[: meta["n_cells"]]


def test_two_process_feed_matches_single_process(tmp_path):
    store = _write_store(str(tmp_path / "grid.zarr"))
    single = _run_job(1, store, str(tmp_path / "out1"))
    multi = _run_job(2, store, str(tmp_path / "out2"))
    assert np.isfinite(multi).all()
    npt.assert_array_equal(multi, single)  # bitwise: same SPMD program

    # anchor against the in-process batched core (same math, 8 local devices)
    from skdownscale_tpu.models.bcsd import BcsdTemperature, bcsd_fit, bcsd_predict

    src = zarrlite.open_group(store)
    x = np.asarray(src["gcm"]).T  # (cells, time)
    y = np.asarray(src["obs"]).T
    index = pd.DatetimeIndex(np.asarray(src["time"]).view("datetime64[ns]"))
    model = BcsdTemperature(return_anoms=False)
    fg = model._fit_groups(index)
    plan = model._predict_plan(fg, index)
    want = np.asarray(
        bcsd_predict(
            bcsd_fit(x, y, fg, with_x_climo=True), x, plan,
            variable="temperature", return_anoms=False,
        )
    )
    npt.assert_allclose(multi, want, rtol=1e-9, atol=1e-9)
