"""Pallas TPU kernel: batched in-VMEM bitonic row sort.

The BCSD pipelines are dominated by short per-group row sorts — the daily
flavor's scan body spends ~0.55 s of 0.68 s in ``jnp.sort`` /
``lax.sort`` over ``(C*Gc, 620)`` fit windows and ``(C*Gc, ~240)`` query
ranks (BASELINE.md roofline notes; ref hot path ``np.sort`` at
``quantile.py:346,462``).  XLA lowers each sort to a ~``log^2 n``-stage
network whose every stage round-trips HBM; for 620-wide rows that is ~100
passes over the buffer.  This kernel runs the whole bitonic network on a
block held in VMEM: the only HBM traffic is one read + one write.

Design:

* rows live in the 128-wide **lane** dimension (transposed ``(Lp, TB)``
  blocks, like ``interp_kernel``); every compare-exchange stage is a pair of
  elementwise min/max over the block with *static* sublane permutations
  (XOR-partner = swap of two contiguous half-blocks, expressed as reshape +
  slice concat), so the network is pure VPU work;
* keys are bitcast to **monotone int32**: ``x >= 0 -> bits | 0x80000000``,
  ``x < 0 -> ~bits`` — a total order matching ``lax.sort`` float semantics
  (-inf < finite < +inf < NaN), immune to NaN-poisoning min/max;
* an optional int32 payload rides along through the same selects (positions
  for rank sorts / unsorts).  Bitonic is not stable — fine here: ties get
  identical mapped values downstream (``grouped._rank_fill_unsort``), so
  tie order is unobservable.

Rows are padded to a power of two with +inf (int key INT32_MAX) which lands
at the tail, matching the grouped-table pad convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sort_rows", "sort_rows_with_positions", "unsort_rows", "use_sort_kernel"]

_I32_MAX = np.int32(np.iinfo(np.int32).max)


def use_sort_kernel(dtype) -> bool:
    """Default OFF everywhere: measured on a v5e (benchmarks/micro_sort_tpu.py),
    this kernel LOSES to XLA's lax.sort — 287 vs 101 ms on (262144, 620)
    value sorts, ~2x worse on payload sorts, parity at L=40.  lax.sort is
    already near the HBM roofline and the dynamic-roll partner exchange is
    VPU-expensive.  Kept (with tests) as a documented negative result; the
    production query-side fix is ops/pallas/rank_map (no sort at all).
    Force via ``rowsort.override`` for tests."""
    return False


_MSB = np.int32(-0x80000000)  # 0x80000000 (numpy scalar: safe to close over)


def _to_ordered_int(x):
    """float32 -> int32 with the same total order (lax.sort semantics:
    -NaN < -inf < ... < -0 < +0 < ... < +inf < +NaN).

    sign-clear floats keep their bits (already ascending as signed ints);
    sign-set floats map to ``~bits ^ 0x80000000`` (reverses their internal
    order and places them below every non-negative key)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(bits >= 0, bits, jnp.invert(bits) ^ _MSB)


def _from_ordered_int(k):
    bits = jnp.where(k >= 0, k, jnp.invert(k ^ _MSB))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _xor_partner(a, d: int):
    """Partner values at index ``i ^ d`` along axis 0 (power-of-two d)."""
    Lp = a.shape[0]
    g = a.reshape(Lp // (2 * d), 2, d, *a.shape[1:])
    return jnp.concatenate([g[:, 1:2], g[:, 0:1]], axis=1).reshape(a.shape)


def _bitonic_stages(Lp: int):
    """(k, j) compare-exchange schedule of a full bitonic sort of Lp=2^m."""
    out = []
    k = 2
    while k <= Lp:
        j = k // 2
        while j >= 1:
            out.append((k, j))
            j //= 2
        k *= 2
    return out


def _make_sort_kernel_rolled(Lp: int, with_payload: bool, out_float: bool):
    """Loop-form bitonic network: O(log^2 Lp) *traced* stages as nested
    ``fori_loop``s with ``pltpu.roll`` partner exchange.

    The fully unrolled reshape/concat formulation (``_make_sort_kernel``)
    is ~55 distinct stages of fresh HLO — the remote TPU compiler chews on
    it for tens of minutes.  Here the partner at ``i ^ j`` is fetched with
    two dynamic circular rolls (±j along the sublane axis) selected by the
    ``bit_j(i)`` mask; the wrap rows are always masked out, so circularity
    is harmless.  One traced body serves every stage: compile time is flat
    in Lp."""
    m = Lp.bit_length() - 1

    def kernel(*refs):
        if with_payload:
            key_ref, pay_ref, out_k_ref, out_p_ref = refs
            pay0 = pay_ref[:]
        else:
            key_ref, out_k_ref = refs
            pay0 = None
        keys0 = key_ref[:]  # (Lp, TB) int32
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (Lp, 1), 0)

        def stage(sj, sk, keys, pay):
            j = jnp.int32(1) << sj
            low = ((i_idx >> sj) & 1) == 0  # partner is at i + j
            pk = jnp.where(
                low,
                pltpu.roll(keys, -j, axis=0),
                pltpu.roll(keys, j, axis=0),
            )
            bits = ((i_idx >> sj) ^ (i_idx >> sk)) & 1
            use_gt = bits == 0
            swap = (use_gt & (keys > pk)) | (jnp.logical_not(use_gt) & (keys < pk))
            keys = jnp.where(swap, pk, keys)
            if with_payload:
                pp = jnp.where(
                    low,
                    pltpu.roll(pay, -j, axis=0),
                    pltpu.roll(pay, j, axis=0),
                )
                pay = jnp.where(swap, pp, pay)
            return keys, pay

        def outer(l, carry):
            def inner(s, carry):
                keys, pay = carry
                return stage(l - 1 - s, l, keys, pay)

            return jax.lax.fori_loop(0, l, inner, carry)

        keys, pay = jax.lax.fori_loop(
            1, m + 1, outer, (keys0, pay0 if with_payload else keys0)
        )

        out_k_ref[:] = _from_ordered_int(keys) if out_float else keys
        if with_payload:
            out_p_ref[:] = pay

    return kernel


def _make_sort_kernel(Lp: int, with_payload: bool, out_float: bool):
    stages = _bitonic_stages(Lp)

    def kernel(*refs):
        if with_payload:
            key_ref, pay_ref, out_k_ref, out_p_ref = refs
            pay = pay_ref[:]
        else:
            key_ref, out_k_ref = refs
        keys = key_ref[:]  # (Lp, TB) int32
        # row index along the sublane axis (masks derived in-kernel; Pallas
        # kernels cannot close over host array constants)
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (Lp, 1), 0)

        for k, j in stages:
            pk = _xor_partner(keys, j)
            # pair-consistent exchange: the pair (i, i^j) swaps iff it is
            # strictly out of order for its direction; both members compute
            # the SAME decision (ties never swap), so key/payload pairs move
            # together and no payload is duplicated or lost.
            # sel: use (keys > pk) when bit_j(i) == bit_k(i), else (keys < pk)
            # — kept as integer bit arithmetic + and/or of comparisons
            # (Mosaic rejects bool-valued selects/equality at these shapes)
            sj, sk = j.bit_length() - 1, k.bit_length() - 1
            bits = ((i_idx >> sj) ^ (i_idx >> sk)) & 1  # (Lp, 1) int32
            use_gt = bits == 0
            swap = (use_gt & (keys > pk)) | (jnp.logical_not(use_gt) & (keys < pk))
            keys = jnp.where(swap, pk, keys)
            if with_payload:
                pp = _xor_partner(pay, j)
                pay = jnp.where(swap, pp, pay)

        out_k_ref[:] = _from_ordered_int(keys) if out_float else keys
        if with_payload:
            out_p_ref[:] = pay

    return kernel


def _pick_tb(B: int, Lp: int, n_bufs: int, itemsize: int = 4):
    """Lane-block width.  Budget ~2 MB of VMEM for the in/out refs: the
    16 MB scoped limit must also hold ~4 live (Lp, TB) register values in
    the roll/compare body plus Pallas's double buffering of every ref."""
    per_lane = n_bufs * Lp * itemsize
    tb = (2 * 1024 * 1024) // max(per_lane, 1)
    return max(128, min(-(-B // 128) * 128, tb // 128 * 128, 1024))


def _run(keysT, paysT, Lp, with_payload, out_float, interpret):
    B = keysT.shape[1]
    tb = _pick_tb(B, Lp, 4 if with_payload else 2)
    pad_b = (-B) % tb
    if pad_b:
        keysT = jnp.pad(keysT, ((0, 0), (0, pad_b)), constant_values=_I32_MAX)
        if with_payload:
            paysT = jnp.pad(paysT, ((0, 0), (0, pad_b)))
    Bp = keysT.shape[1]
    kern = _make_sort_kernel_rolled(Lp, with_payload, out_float)
    spec = pl.BlockSpec((Lp, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
    kdt = jnp.float32 if out_float else jnp.int32
    if with_payload:
        outs = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((Lp, Bp), kdt),
                jax.ShapeDtypeStruct((Lp, Bp), jnp.int32),
            ),
            grid=(Bp // tb,),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
            interpret=interpret,
        )(keysT, paysT)
        return outs[0][:, :B], outs[1][:, :B]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Lp, Bp), kdt),
        grid=(Bp // tb,),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )(keysT)
    return out[:, :B], None


def _pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_rows(x, *, interpret: bool = False):
    """Rows of ``x`` (B, L) sorted ascending (float32; NaN last, like
    ``jnp.sort``).  One VMEM-resident bitonic network per 128-row block."""
    B, L = x.shape
    Lp = _pow2(L)
    keys = _to_ordered_int(x.astype(jnp.float32))
    if Lp != L:
        keys = jnp.pad(keys, ((0, 0), (0, Lp - L)), constant_values=_I32_MAX)
    outT, _ = _run(keys.T, None, Lp, False, True, interpret)
    return outT.T[:, :L]


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_rows_with_positions(x, *, interpret: bool = False):
    """(sorted x, original positions): the payload-sort form of
    ``lax.sort((x, iota), num_keys=1)`` (tie order unspecified)."""
    B, L = x.shape
    Lp = _pow2(L)
    keys = _to_ordered_int(x.astype(jnp.float32))
    pos = jnp.broadcast_to(jnp.arange(Lp, dtype=jnp.int32), (B, Lp))
    if Lp != L:
        keys = jnp.pad(keys, ((0, 0), (0, Lp - L)), constant_values=_I32_MAX)
    kT, pT = _run(keys.T, pos.T, Lp, True, True, interpret)
    return kT.T[:, :L], pT.T[:, :L]


@functools.partial(jax.jit, static_argnames=("interpret",))
def unsort_rows(vals, pos, *, interpret: bool = False):
    """Scatter ``vals`` back to original order: row-sort by the permutation
    ``pos`` carrying ``vals`` (float32) as payload."""
    B, L = vals.shape
    Lp = _pow2(L)
    keys = pos.astype(jnp.int32)
    pay = jax.lax.bitcast_convert_type(vals.astype(jnp.float32), jnp.int32)
    if Lp != L:
        keys = jnp.pad(keys, ((0, 0), (0, Lp - L)), constant_values=_I32_MAX)
        pay = jnp.pad(pay, ((0, 0), (0, Lp - L)))
    _, vT = _run(keys.T, pay.T, Lp, True, False, interpret)
    return jax.lax.bitcast_convert_type(vT.T[:, :L], jnp.float32)
