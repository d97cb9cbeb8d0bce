"""Pallas TPU kernel: sort-free application of rank-indexed results.

The grouped QM transform's per-query work is: find each query's RANK within
its group, then take the (host-precomputed rank-bracket) mapped value at
that rank (``models/grouped.py`` / ``models/streaming.py``; ref semantics
``quantile.py:485-545``).  The XLA formulation needs a payload rank sort, a
tie-run fill, and a payload unsort — measured ~350-450 ms of the 0.92 s
daily-BCSD pass at 32k cells, and lax.sort is already near the HBM roofline
(see ``sort_kernel.use_sort_kernel`` for the negative result on beating it
with an in-VMEM bitonic network).

This kernel removes the sorts instead of accelerating them.  Per (row,
element) it computes

    rank_t = #{t' : x_{t'} <= x_t} - 1

by a ``fori_loop`` of broadcast compares in VMEM — Lq^2 VPU ops per row —
and then assembles ``out_t = res[rank_t]`` with a second select loop.  Key
properties:

* ``rank_t`` is the LAST rank of a tie run, so every tied query takes the
  run end's mapped value — exactly np.interp's tie semantics that
  ``grouped._rank_fill_unsort`` reproduces with three reverse cummins;
  here it falls out of the counting definition for free;
* NaN queries compare false everywhere -> rank -1 -> no select matches ->
  the NaN-initialized output passes NaN through (``quantile.py`` NaN
  behavior);
* the rank-ordered results ``res`` are pure functions of the fit CDF and
  the host bracket tables — query-independent — so nothing needs
  unsorting.

Layout: rows on lanes, (Lq, TB) transposed blocks, one read + one write of
HBM.  float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rank_map_rows", "use_rank_map_kernel"]


def use_rank_map_kernel(dtype) -> bool:
    """TPU + float32 only (mirrors the GARD kernels' platform gate)."""
    if dtype not in (jnp.float32, np.dtype("float32")):
        return False
    try:
        platform = jax.devices()[0].platform.lower()
    except Exception:  # pragma: no cover - backend init failure
        platform = "cpu"
    return platform not in ("cpu", "gpu")


def _make_kernel(Lp: int, strip: int = 8):
    """Mosaic lowers neither ``dynamic_slice`` nor gathers inside kernels;
    rows are fetched by a running ``pltpu.roll`` by -8 (a vreg-aligned
    sublane-group move — unaligned roll-by-1 measured ~1.5x slower than the
    XLA sort path; this strip-mined form cuts loop trips 8x and keeps every
    roll on vreg boundaries) with the 8 in-between rows taken by static
    slices.  All ``Lp`` rows are counted: pads are NaN, and
    ``1[NaN <= x] == 0`` for EVERY query (finite, +inf mask pads, NaN), so
    pad rows contaminate no count and pad queries rank -1 -> NaN out."""
    assert strip % 8 == 0 and Lp % strip == 0
    n_blocks = Lp // strip

    def kernel(xq_ref, res_ref, out_ref):
        xq = xq_ref[:]  # (Lp, TB) queries, original order
        res = res_ref[:]  # (Lp, TB) mapped values by rank

        def count(nb, carry):
            cnt, rolled = carry
            for k in range(strip):  # static slices of the front rows
                cnt = cnt + (rolled[k : k + 1] <= xq).astype(jnp.int32)
            return cnt, pltpu.roll(rolled, Lp - strip, axis=0)

        rank, _ = jax.lax.fori_loop(
            0, n_blocks, count, (jnp.zeros(xq.shape, jnp.int32), xq)
        )
        rank = rank - 1

        nan = jnp.asarray(jnp.nan, xq.dtype)

        def place(nb, carry):
            out, rolled = carry
            base = nb * strip
            for k in range(strip):
                out = jnp.where(rank == base + k, rolled[k : k + 1], out)
            return out, pltpu.roll(rolled, Lp - strip, axis=0)

        out, _ = jax.lax.fori_loop(
            0, n_blocks, place, (jnp.full(xq.shape, nan, xq.dtype), res)
        )
        out_ref[:] = out

    return kernel


def _pick_tb(B: int, Lq: int):
    per_lane = 3 * Lq * 4
    tb = (2 * 1024 * 1024) // max(per_lane, 1)
    return max(128, min(-(-B // 128) * 128, tb // 128 * 128, 1024))


@functools.partial(jax.jit, static_argnames=("interpret", "strip"))
def rank_map_rows(xq, res, *, interpret: bool = False, strip: int = 16):
    """``out[b, t] = res[b, rank of xq[b, t] within row b]`` (NaN -> NaN).

    ``xq``: (B, Lq) queries in original order; ``res``: (B, Lq) mapped
    values indexed by rank (run-end tie semantics by construction).
    """
    B, Lq = xq.shape
    Lp = -(-Lq // strip) * strip  # strip multiple for aligned rolls/slices
    tb = _pick_tb(B, Lp)
    pad_b = (-B) % tb
    inf = jnp.asarray(jnp.inf, xq.dtype)
    xqT = xq.T
    resT = res.T
    if pad_b:
        xqT = jnp.pad(xqT, ((0, 0), (0, pad_b)), constant_values=inf)
        resT = jnp.pad(resT, ((0, 0), (0, pad_b)))
    if Lp != Lq:
        # NaN pad rows: ``NaN <= x`` is false for every query (including
        # real +inf mask pads), so pad rows add 0 to every count; as queries
        # they rank -1 -> NaN out, and they are sliced off below
        nan = jnp.asarray(jnp.nan, xq.dtype)
        xqT = jnp.pad(xqT, ((0, Lp - Lq), (0, 0)), constant_values=nan)
        resT = jnp.pad(resT, ((0, Lp - Lq), (0, 0)))
    Bp = xqT.shape[1]
    spec = pl.BlockSpec((Lp, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
    outT = pl.pallas_call(
        _make_kernel(Lp, strip),
        out_shape=jax.ShapeDtypeStruct((Lp, Bp), xq.dtype),
        grid=(Bp // tb,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(xqT, resT)
    return outT[:Lq].T[:B]
