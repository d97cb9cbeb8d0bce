"""Pallas TPU kernel: sliding sorted window over overlapping fit groups.

The daily-NASA-NEX BCSD predict consults 31 overlapping ±15-day DOY fit
windows (ref ``bcsd.py:36-44`` + ``groupers.py:19-82``; key-space mixing
``bcsd.py:51-53,69-79`` selects DOYs 1..31), and the streaming scan's
dominant cost is re-sorting every window from scratch — (cells·groups, 620)
``lax.sort`` rows, ~0.4 s of the 0.92 s pass at 32k cells (BASELINE.md
daily profile).  But adjacent windows share 30/31 of their members: window
d+1 = window d − (day d−15's rows) + (day d+16's rows), a ±~20-element
multiset update of a 620-element sorted array.

This kernel sorts ONCE (window 0, a single XLA payload-free sort outside
the kernel) and then *slides*: each grid step removes one day-bucket and
merge-inserts the next, entirely in VMEM:

* values are order-isomorphic int32 keys (``sort_kernel._to_ordered_int``),
  so the total order matches ``lax.sort`` exactly (-inf < finite < +inf <
  NaN) and index pads (``_PAD = INT32_MAX``) sort after everything;
* removal is BY VALUE via the inverse merge-path identity: the k-th sorted
  removed element accounts for position ``#{W <= r_k} − #{R <= r_k} + k``
  — exact for multisets (ties resolve to *a* copy, and copies are
  indistinguishable by value, which is all downstream consumes);
* survivors compact left / expand right by their removal/insertion counts
  (bounded by the bucket width ``BW``), as BW+1 static-shift
  ``pltpu.roll`` + select passes — displacement is bounded, so the pass
  count is too (the same bounded-displacement argument that makes a full
  re-sort unnecessary);
* the merged window's first ``Lt`` rows are streamed out per grid step, so
  VMEM holds one window state, not 31 outputs.

The host-side step tables (which members enter/leave per consulted window)
are generic set differences of ``PaddedGroups`` rows — no calendar logic —
see ``models.slide.build_slide_plan``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sort_kernel import _from_ordered_int, _to_ordered_int

__all__ = ["slide_sorted_windows", "use_slide_kernel"]

_PAD = np.int32(np.iinfo(np.int32).max)  # sorts after every real key (incl NaN)
_INF_BITS = np.int32(0x7F800000)  # ordered-int key of +inf


def use_slide_kernel(dtype) -> bool:
    """TPU + float32 only (same gate as the other Pallas kernels)."""
    if dtype not in (jnp.float32, np.dtype("float32")):
        return False
    try:
        platform = jax.devices()[0].platform.lower()
    except Exception:  # pragma: no cover - backend init failure
        platform = "cpu"
    return platform not in ("cpu", "gpu")


def _shift_left(vals, key, Wp: int, BW: int, iota):
    """Monotone bounded shift-left: row ``p`` moves to ``p - key[p]`` for
    ``key[p] in [0, BW]``; ``key == -1`` rows are dropped; uncovered output
    rows become ``_PAD``.

    Two-level decomposition ``s = 8a + b``: 8 unaligned single-row rolls
    for the remainder, then ``BW//8 + 1`` vreg-aligned rolls for the
    quotient (unaligned sublane rolls are the expensive op — the
    strip-mining lesson from ``rank_map_kernel``).  No collisions in the
    intermediate phase: ``key`` is a prefix count of dropped rows, so
    ``key[p2] - key[p1] <= p2 - p1`` with equality only if every row in
    ``[p1, p2)`` dropped — impossible for two survivors — and a phase-1
    (or phase-2) collision would require exactly that equality.  (This
    bounded-increment property is specific to the compact direction;
    :func:`_shift_right` needs the opposite phase order.)
    """
    v1 = jnp.full(vals.shape, _PAD, vals.dtype)
    k1 = jnp.full(key.shape, -1, jnp.int32)
    for b in range(min(BW, 7) + 1):
        kk = key if b == 0 else pltpu.roll(key, Wp - b, axis=0)
        vv = vals if b == 0 else pltpu.roll(vals, Wp - b, axis=0)
        cond = (kk >= 0) & ((kk & 7) == b) & (iota < Wp - b)
        v1 = jnp.where(cond, vv, v1)
        k1 = jnp.where(cond, kk, k1)
    out = jnp.full(vals.shape, _PAD, vals.dtype)
    for a in range(BW // 8 + 1):
        s = 8 * a
        kk = k1 if a == 0 else pltpu.roll(k1, Wp - s, axis=0)
        vv = v1 if a == 0 else pltpu.roll(v1, Wp - s, axis=0)
        cond = (kk >= 0) & ((kk >> 3) == a) & (iota < Wp - s)
        out = jnp.where(cond, vv, out)
    return out


def _shift_right(vals, key, Wp: int, BW: int, iota):
    """Monotone bounded shift-right: row ``p`` moves to ``p + key[p]``,
    ``key[p] in [0, BW]`` nondecreasing; rows pushed past ``Wp`` drop;
    uncovered output rows become ``_PAD``.

    QUOTIENT-FIRST phase order (``8a`` then ``b``): unlike the compact
    direction, ``key`` here (#inserted below a value) can jump by more
    than the row gap, so remainder-first would collide (e.g. keys 7 -> 8
    seven rows apart).  Quotient-first is collision-free: a phase-A
    collision needs ``a1 > a2`` for ``p2 > p1``, impossible for a
    nondecreasing key since ``8a2 + b2 >= 8a1 + b1`` forces ``a2 >= a1``;
    a phase-B collision then forces ``key[p2] < key[p1]``."""
    v1 = jnp.full(vals.shape, _PAD, vals.dtype)
    k1 = jnp.full(key.shape, -1, jnp.int32)
    for a in range(BW // 8 + 1):
        s = 8 * a
        kk = key if s == 0 else pltpu.roll(key, s, axis=0)
        vv = vals if s == 0 else pltpu.roll(vals, s, axis=0)
        cond = (kk >= 0) & ((kk >> 3) == a) & (iota >= s)
        v1 = jnp.where(cond, vv, v1)
        k1 = jnp.where(cond, kk, k1)
    out = jnp.full(vals.shape, _PAD, vals.dtype)
    for b in range(min(BW, 7) + 1):
        kk = k1 if b == 0 else pltpu.roll(k1, b, axis=0)
        vv = v1 if b == 0 else pltpu.roll(v1, b, axis=0)
        cond = (kk >= 0) & ((kk & 7) == b) & (iota >= b)
        out = jnp.where(cond, vv, out)
    return out


def _make_kernel(Wp: int, BW: int, Lt: int):
    def kernel(w0_ref, add_ref, rem_ref, out_ref, w_ref):
        w = pl.program_id(1)

        @pl.when(w == 0)
        def _init():
            w_ref[:] = w0_ref[:]

        @pl.when(w > 0)
        def _step():
            W = w_ref[:]  # (Wp, TB) sorted ascending int32 keys
            a = add_ref[:]  # (BW, TB) sorted entering keys (_PAD tail)
            r = rem_ref[:]  # (BW, TB) sorted leaving keys (_PAD tail)
            iota = jax.lax.broadcasted_iota(jnp.int32, (Wp, 1), 0)

            # -- removal: inverse merge-path positions ------------------
            # pos_k = #{W <= r_k} - #{R <= r_k} + k marks the copy of r_k
            # that dies; _PAD removal rows get pos >= live count's pad
            # region or past Wp (harmless either way: a _PAD slot dies).
            dead = jnp.zeros(W.shape, jnp.bool_)
            shl = jnp.zeros(W.shape, jnp.int32)  # # dead strictly before p
            for k in range(BW):
                rk = r[k : k + 1]
                c_w = jnp.sum((W <= rk).astype(jnp.int32), axis=0, keepdims=True)
                c_r = jnp.sum((r <= rk).astype(jnp.int32), axis=0, keepdims=True)
                pos = c_w - c_r + k  # (1, TB)
                dead = dead | (iota == pos)
                shl = shl + (iota > pos).astype(jnp.int32)

            key = jnp.where(dead, -1, shl)  # survivor left-shift in [0, BW]
            Wc = _shift_left(W, key, Wp, BW, iota)

            # -- merge-insert the entering bucket -----------------------
            # survivors shift right by #{a < w} (insert-after-equals);
            # a_k lands at #{Wc <= a_k} + k.  _PAD entries of `a` land at
            # or past the pad region and _PAD stays _PAD.
            shr = jnp.zeros(W.shape, jnp.int32)
            for k in range(BW):
                shr = shr + (a[k : k + 1] < Wc).astype(jnp.int32)
            Wn = _shift_right(Wc, shr, Wp, BW, iota)
            for k in range(BW):
                ak = a[k : k + 1]
                cnt = jnp.sum((Wc <= ak).astype(jnp.int32), axis=0, keepdims=True)
                Wn = jnp.where(iota == cnt + k, jnp.broadcast_to(ak, Wn.shape), Wn)
            w_ref[:] = Wn

        out_ref[:] = w_ref[0:Lt]

    return kernel


def _pick_tb(B: int, Wp: int):
    # W scratch + w0 + out + 2 small blocks, double-buffered in/out:
    # budget ~2.5 MB for the (Wp, TB) buffers
    per_lane = 3 * Wp * 4
    tb = (5 * 1024 * 1024 // 2) // max(per_lane, 1)
    return max(128, min(-(-B // 128) * 128, tb // 128 * 128, 512))


@functools.partial(
    jax.jit, static_argnames=("n_windows", "Lt", "BW", "interpret")
)
def _run(w0_bits, add_bits, rem_bits, *, n_windows, Lt, BW, interpret):
    """(C, Wp) sorted window-0 keys, (S, BW, C)-shaped entering/leaving key
    blocks (S = n_windows, block 0 a dummy) -> (n_windows*Lto, C) keys,
    ``Lto`` = Lt rounded up to a sublane multiple (Mosaic block rule)."""
    C, Wp = w0_bits.shape
    Lto = -(-Lt // 8) * 8
    tb = _pick_tb(C, Wp)
    pad_c = (-C) % tb
    if pad_c:
        w0_bits = jnp.pad(w0_bits, ((0, pad_c), (0, 0)), constant_values=_PAD)
        add_bits = jnp.pad(
            add_bits, ((0, 0), (0, 0), (0, pad_c)), constant_values=_PAD
        )
        rem_bits = jnp.pad(
            rem_bits, ((0, 0), (0, 0), (0, pad_c)), constant_values=_PAD
        )
    Cp = C + pad_c
    w0T = w0_bits.T  # (Wp, Cp)
    addT = add_bits.reshape(n_windows * BW, Cp)
    remT = rem_bits.reshape(n_windows * BW, Cp)
    grid = (Cp // tb, n_windows)
    out = pl.pallas_call(
        _make_kernel(Wp, BW, Lto),
        out_shape=jax.ShapeDtypeStruct((n_windows * Lto, Cp), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Wp, tb), lambda b, w: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((BW, tb), lambda b, w: (w, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((BW, tb), lambda b, w: (w, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Lto, tb), lambda b, w: (w, b), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((Wp, tb), jnp.int32)],
        interpret=interpret,
    )(w0T, addT, remT)
    return out[:, :C]


def _gather_keys(bits, idx_host):
    """Take key columns at host indices; -1 pads become ``_PAD`` keys."""
    idx = jnp.asarray(np.maximum(idx_host, 0))
    taken = bits[..., idx.reshape(-1)].reshape(*bits.shape[:-1], *idx_host.shape)
    padm = jnp.asarray(idx_host < 0)
    return jnp.where(padm, jnp.int32(_PAD), taken)


def slide_sorted_windows(y, plan, *, n_rows: int | None = None, interpret: bool = False):
    """Sorted values of every consulted fit window, FLAT: (..., n_rows*Lto).

    ``y``: (..., T) float32 series; ``plan``: a ``models.slide.SlidePlan``;
    ``Lto = ceil(plan.Lt / 8) * 8`` (the kernel's sublane-padded row width,
    ``plan.Lto``).  Window ``i`` occupies columns ``[i*Lto, (i+1)*Lto)``;
    its first ``count_i`` positions equal ``jnp.sort(window_i values)
    [:count_i]`` (the only positions downstream consults; pad positions and
    the ``n_rows - n_windows`` trailing pad windows hold +inf).  Equivalent
    by construction to the per-window ``lax.sort`` the streaming scan would
    do (``quantile.py:346,462`` delegated-sort semantics).

    The flat layout is deliberate: a (..., S, Lto) output re-tiles its two
    minor dims and the consumer's flatten back is a ~5 GB copy at 65k
    cells (the round-3 OOM); here the one transpose out of the kernel's
    (rows, cells) layout is the only copy, and ``n_rows`` lets the caller
    pad to a chunkable width so the streaming scan can consume windows by
    contiguous ``dynamic_slice`` instead of gathers.
    """
    lead = y.shape[:-1]
    yf = y.reshape(-1, y.shape[-1]).astype(jnp.float32)
    bits = _to_ordered_int(yf)

    w0 = jnp.sort(_gather_keys(bits, plan.w0_idx), axis=-1)  # (C, Wp)
    S = plan.add_idx.shape[0] + 1  # dummy first block
    BW = plan.add_idx.shape[1]
    adds = jnp.sort(_gather_keys(bits, plan.add_idx), axis=-1)  # (C, S-1, BW)
    rems = jnp.sort(_gather_keys(bits, plan.rem_idx), axis=-1)
    dummy = jnp.full((yf.shape[0], 1, BW), _PAD, jnp.int32)
    addb = jnp.concatenate([dummy, adds], axis=1).transpose(1, 2, 0)  # (S, BW, C)
    remb = jnp.concatenate([dummy, rems], axis=1).transpose(1, 2, 0)

    out = _run(
        w0, addb, remb,
        n_windows=S, Lt=plan.Lt, BW=BW, interpret=interpret,
    )  # (S*Lto, C)
    Lto = out.shape[0] // S
    if n_rows is not None and n_rows != S:
        assert n_rows > S, "n_rows must cover every consulted window"
        out = jnp.pad(out, ((0, (n_rows - S) * Lto), (0, 0)), constant_values=_PAD)
    out = jnp.where(out == _PAD, jnp.int32(_INF_BITS), out)
    vals = _from_ordered_int(out)  # (n_rows*Lto, C)
    return vals.T.reshape(*lead, vals.shape[0])
