"""Multi-process worker for tests/test_multiprocess.py (not collected).

Runs one JAX process of an ``nprocs``-process CPU job: feeds this process's
cell slice of a zarr store through ``feed_zarr_cells`` (the
``make_array_from_process_local_data`` branch when nprocs > 1 — the one
distributed code path a single-process test can't reach), runs the jitted
batched BCSD fit+predict over the global cell-sharded mesh, and dumps this
process's addressable output shards for the parent to reassemble.

Launch: python _mp_worker.py <pid> <nprocs> <port> <store> <outdir>
"""

import json
import os
import sys


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    store, outdir = sys.argv[4], sys.argv[5]

    import jax

    # 8 global devices regardless of process count, so the 1-process and
    # 2-process runs compile the identical SPMD program (bitwise comparable)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8 // nprocs)
    jax.config.update("jax_enable_x64", True)
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
        )

    import numpy as np

    assert jax.process_count() == nprocs, (jax.process_count(), nprocs)
    assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu"

    from jax.sharding import NamedSharding, PartitionSpec as P

    from skdownscale_tpu.models.bcsd import BcsdTemperature, bcsd_fit, bcsd_predict
    from skdownscale_tpu.parallel import cell_mesh
    from skdownscale_tpu.parallel.zarr_io import feed_zarr_cells

    mesh = cell_mesh(jax.devices())
    x, n_cells, index = feed_zarr_cells(store, mesh, var="gcm")
    y, n_cells_y, _ = feed_zarr_cells(store, mesh, var="obs")
    assert n_cells == n_cells_y
    if nprocs > 1:
        # the claim under test: the global array really was assembled from
        # per-process local shards over the process-feed branch
        assert not x.is_fully_addressable

    model = BcsdTemperature(return_anoms=False)
    fg = model._fit_groups(index)
    plan = model._predict_plan(fg, index)
    sh = NamedSharding(mesh, P("cells", None))
    step = jax.jit(
        lambda x_, y_: bcsd_predict(
            bcsd_fit(x_, y_, fg, with_x_climo=True), x_, plan,
            variable="temperature", return_anoms=False,
        ),
        in_shardings=(sh, sh),
        out_shardings=sh,
    )
    out = step(x, y)
    out.block_until_ready()

    shards = {str(s.index[0].start): np.asarray(s.data) for s in out.addressable_shards}
    np.savez(os.path.join(outdir, f"shards_{pid}.npz"), **shards)
    with open(os.path.join(outdir, f"meta_{pid}.json"), "w") as f:
        json.dump(
            {
                "n_cells": int(n_cells),
                "global_shape": list(out.shape),
                "process_count": jax.process_count(),
            },
            f,
        )
    print(f"worker {pid}/{nprocs} OK", flush=True)


if __name__ == "__main__":
    main()
