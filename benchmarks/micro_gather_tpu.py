"""Micro-benchmark: minor-dim gather/scatter with host-constant vs traced
shared index vectors on the real TPU.

Decides the daily-BCSD streaming design (VERDICT r1 #2): the group-chunked
``lax.map`` formulation needs per-chunk index tables to be *scanned device
arrays* (traced), not baked constants.  If traced-index takes are as fast as
the static gathers the repo uses today, the scan design is safe.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=3):
    out = fn(*args)
    _ = float(jnp.sum(out))  # axon-safe barrier
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    C, T = 8192, 7305
    Gc, Lt = 8, 620
    K = Gc * Lt
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(C, T)).astype(np.float32))
    idx_np = rng.integers(0, T, size=K).astype(np.int32)
    idx = jnp.asarray(idx_np)

    # (a) host-constant static gather (the repo's current pattern)
    f_static = jax.jit(lambda x: x[:, idx_np] * 2.0)
    print("static gather :", timed(f_static, x))

    # (b) traced shared-index take
    f_take = jax.jit(lambda x, i: jnp.take(x, i, axis=1) * 2.0)
    print("traced take   :", timed(f_take, x, idx))

    # (c) traced scatter-add back to (C, T)
    perm = rng.permutation(T).astype(np.int32)[:K]  # unique targets
    permd = jnp.asarray(perm)
    v = jnp.asarray(rng.normal(size=(C, K)).astype(np.float32))
    f_scat = jax.jit(lambda v, i: jnp.zeros((C, T), jnp.float32).at[:, i].add(v))
    print("traced scatter:", timed(f_scat, v, permd))

    # (d) lax.map over 6 chunks, each taking K columns via scanned tables
    tables = jnp.asarray(rng.integers(0, T, size=(6, K)).astype(np.int32))

    def chunk(i):
        g = jnp.take(x, i, axis=1)
        return jnp.sort(g.reshape(C * Gc, Lt), axis=-1).reshape(C, K)

    f_map = jax.jit(lambda tabs: jax.lax.map(chunk, tabs))
    print("map take+sort :", timed(f_map, tables))

    # (e) same work as one fused static gather+sort (today's formulation)
    big_idx = np.concatenate([np.asarray(tables).reshape(-1)])
    f_big = jax.jit(lambda x: jnp.sort(x[:, big_idx].reshape(C * 6 * Gc, Lt), axis=-1))
    print("static all+sort:", timed(f_big, x))


if __name__ == "__main__":
    main()
