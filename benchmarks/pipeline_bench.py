"""Store -> chip -> store pipeline measurement (BASELINE "pipeline" row).

Measures :func:`skdownscale_tpu.parallel.pipeline.run_pointwise_pipeline`
end-to-end on a local-disk zarr v3 store (blosc chunks): read + decode,
NaN-compact pack, H2D, device fit+predict, D2H, encode + write — the
reference's production workflow (`examples/utils.py:12-77` +
`core.py:256-336`) as one measured loop with a per-stage split.

``--compute-only`` times the same chunked batched fit+predict on
device-resident data (no store, no transfers): the denominator for the
pipeline-efficiency claim.  On this rig the TPU pipeline split is dominated
by the 0.02 GB/s dev tunnel (a rig property, measured and named in the
output — production TPU hosts feed at PCIe/DMA rates); the CPU backend has
a memcpy-speed H2D, so ``--cpu`` runs demonstrate the pipeline MACHINERY's
overlap efficiency (pipeline rate / compute-only rate).

Usage:
    python benchmarks/pipeline_bench.py [n_side] [cell_chunk] [--cpu]
        [--compute-only] [--iters N]
Defaults: n_side=512 (262,144 cells), cell_chunk=65536, 2 timed iters
(first full run warms every compile).
"""

import json
import shutil
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _enable_compile_cache

_enable_compile_cache()

import numpy as np


def build_store(path, n_side, n_time=480):
    import pandas as pd

    from skdownscale_tpu.utils import zarrlite

    index = pd.date_range("1970-01-01", periods=n_time, freq="MS")
    rng = np.random.default_rng(0)
    seas = 8.0 * np.sin(2 * np.pi * (index.month.to_numpy() - 1) / 12)
    shape = (n_time, n_side, n_side)
    X = (283.0 + seas[:, None, None] + rng.normal(0, 2, shape) + 1.5).astype(np.float32)
    y = (282.0 + seas[:, None, None] + rng.normal(0, 1.8, shape)).astype(np.float32)
    X[:, 0, 0] = np.nan  # one ocean cell exercises the masking path
    cy = max(n_side // 8, 1)
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.perf_counter()
    zarrlite.save_group(
        path,
        {"gcm": X, "obs": y},
        zarr_format=3,
        chunks={"gcm": (n_time, cy, n_side), "obs": (n_time, cy, n_side)},
        compressor="blosc",
    )
    zarrlite.save_array(
        path,
        np.asarray(index, dtype="datetime64[ns]").view(np.int64),
        prefix="time",
        zarr_format=3,
        attrs={"kind": "datetime64[ns]"},
    )
    return time.perf_counter() - t0, index


def compute_only(n_side, cell_chunk, n_time=480, n_iters=2):
    """Chunked batched fit+predict on device-resident chunks (no store)."""
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from skdownscale_tpu.models import batched as _b
    from skdownscale_tpu.models.bcsd import BcsdTemperature

    index = pd.date_range("1970-01-01", periods=n_time, freq="MS")
    rng = np.random.default_rng(0)
    seas = 8.0 * np.sin(2 * np.pi * (index.month.to_numpy() - 1) / 12)
    n_cells = n_side * n_side
    model = BcsdTemperature(return_anoms=False)
    chunks = []
    for lo in range(0, n_cells, cell_chunk):
        c = min(cell_chunk, n_cells - lo)
        xc = (283.0 + seas[None, :] + rng.normal(0, 2, (c, n_time)) + 1.5).astype(np.float32)
        yc = (282.0 + seas[None, :] + rng.normal(0, 1.8, (c, n_time))).astype(np.float32)
        chunks.append((jax.device_put(xc)[..., None], jax.device_put(yc)))

    def run():
        s = 0.0
        for xd, yd in chunks:
            st = _b.batched_fit(model, index, xd, yd)
            out = _b.batched_predict(model, st, index, xd, index)
            s += float(jnp.sum(out))
        return s

    run()
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return n_cells / dt, dt


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_side = int(args[0]) if args else 512
    cell_chunk = int(args[1]) if len(args) > 1 else 65536
    n_iters = 2
    if "--iters" in sys.argv:
        n_iters = int(sys.argv[sys.argv.index("--iters") + 1])
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if "--compute-only" in sys.argv:
        cps, dt = compute_only(n_side, cell_chunk, n_iters=n_iters)
        print(json.dumps({
            "config": f"compute_only_{n_side}x{n_side}",
            "cells_per_sec": round(cps, 1),
            "wall_s": round(dt, 3),
        }))
        return

    from skdownscale_tpu.parallel.pipeline import run_pointwise_pipeline

    store = f"/tmp/sdt_pipe_{n_side}.zarr"
    build_s, _ = build_store(store, n_side)
    out_store = store + ".out"
    best = None
    for it in range(n_iters + 1):  # iteration 0 warms every compile
        shutil.rmtree(out_store, ignore_errors=True)
        rep = run_pointwise_pipeline(
            store, out_store, cell_chunk=cell_chunk, zarr_format=3,
            compressor="blosc", checksum=True, pad_to=cell_chunk,
        )
        if it and (best is None or rep.wall_s < best.wall_s):
            best = rep
    r = best
    print(json.dumps({
        "config": f"pipeline_{n_side}x{n_side}_chunk{cell_chunk}",
        "cells_per_sec": round(r.cells_per_sec, 1),
        "wall_s": round(r.wall_s, 3),
        "read_s": round(r.read_s, 3),
        "pack_s": round(r.pack_s, 3),
        "h2d_s": round(r.put_s, 3),
        "device_s": round(r.device_s, 3),
        "write_s": round(r.write_s, 3),
        "overlap_hidden_s": round(r.overlap_s, 3),
        "n_chunks": r.n_chunks,
        "n_valid": r.n_valid,
        "store_build_s": round(build_s, 2),
    }))


if __name__ == "__main__":
    main()
