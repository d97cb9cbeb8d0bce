"""Plane-major sorting network for short, static sort axes.

The grouped-QM fit windows are short rows — monthly BCSD sorts
``(cells*groups, ~40)`` — and ``lax.sort`` over a minor axis of 40 runs
~15x off the HBM roofline on TPU: XLA pads the 40-lane minor dim to 128
(3.2x wasted bandwidth) and its generic sort lowering makes multiple
passes (profiled 73 ms for 1.9 GB logical at 1M cells,
``benchmarks/hbm_profile_tpu.py``).

This module sorts along a *non-minor* axis instead: each of the L sort
slots is a full contiguous plane (``..., L, cells`` layout with cells
minor), and a Batcher odd-even mergesort network of elementwise
``min``/``max`` pairs runs over the planes.  XLA fuses the whole network
into a handful of loop fusions — one-ish HBM pass over the data —
because every comparator is an elementwise op on (plane,)-shaped values.
No Pallas needed; composes (fuses) with neighboring elementwise ops.

Total order matches ``lax.sort`` / ``np.sort`` exactly (``-NaN < -inf <
... < -0 < +0 < ... < +inf < +NaN``) by running the network on
order-isomorphic signed-integer keys (the float bit trick of
``.pallas.sort_kernel._to_ordered_int``, generalized to f64) — the key
map is a bijection on bit patterns, so results are bitwise identical to
``lax.sort``, NaN payloads included.  Plain float ``min``/``max`` would
instead spread a single NaN across the whole row.

Cost model: Batcher's network for L=40 is ~260 comparators (~13 int
ops/element) — VPU-cheap next to the HBM pass.  Comparator count grows
O(L log^2 L); above ``MAX_NETWORK_LEN`` callers should keep ``lax.sort``
(the daily 620-wide windows stay on the slide kernel / lax.sort paths).

**Measured NEGATIVE on-chip — not wired into any model path.**  At the
monthly fit-window shape ((1M*12, 40) f32, ``benchmarks/
planesort_micro_tpu.py`` / ``shortsort_micro_tpu.py``):

* this network, data already plane-major:  146.6 ms vs lax.sort 106.9 —
  XLA does NOT fuse the comparator chain; intermediates round-trip HBM
  (27.5 GB/s effective);
* drop-in flavor (transposes inside the jit): 136.5 ms;
* the in-VMEM Pallas bitonic (static unrolled / rolled): 149.6 / 168.3 ms,
  decomposed as kernel-only 128.6 ms + 36 ms per HBM transpose — the
  partner-exchange sublane shuffles are VPU-bound, same conclusion as the
  round-3 bitonic negatives (``sort_kernel.use_sort_kernel``).

``lax.sort`` stays the production short-row sort.  Kept (with tests) as a
documented negative result and for CPU-side callers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["batcher_pairs", "sort_planes", "MAX_NETWORK_LEN"]

# above this the comparator count (and XLA instruction count) outweighs the
# bandwidth win; the known-good regime is the short grouped-fit windows
MAX_NETWORK_LEN = 64


@functools.lru_cache(maxsize=None)
def batcher_pairs(n: int) -> tuple[tuple[int, int], ...]:
    """Comparator list (i, j), i<j, of Batcher's odd-even mergesort on ``n``
    wires.  Built for the next power of two; comparators touching a wire
    >= n are dropped — exact, because a dropped wire behaves as a +inf
    sentinel: ``min(x, +inf) == x`` leaves the kept wire unchanged and the
    network for 2^k sorts sentinels to the tail."""
    if n <= 1:
        return ()
    p2 = 1
    while p2 < n:
        p2 *= 2
    pairs = []
    p = 1
    while p < p2:
        k = p
        while k >= 1:
            for j in range(k % p, p2 - k, 2 * k):
                for i in range(min(k, p2 - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        if i + j + k < n:
                            pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return tuple(pairs)


_MSB32 = np.int32(-0x80000000)
_MSB64 = np.int64(-0x8000000000000000)


def _ordered_int(x):
    """float -> same-width signed int with lax.sort's total order."""
    if x.dtype == jnp.float32:
        it, msb = jnp.int32, _MSB32
    elif x.dtype == jnp.float64:
        it, msb = jnp.int64, _MSB64
    else:  # pragma: no cover - guarded by sort_planes
        raise TypeError(f"unsupported dtype {x.dtype}")
    bits = jax.lax.bitcast_convert_type(x, it)
    return jnp.where(bits >= 0, bits, jnp.invert(bits) ^ msb)


def _from_ordered_int(k, dtype):
    msb = _MSB32 if dtype == jnp.float32 else _MSB64
    bits = jnp.where(k >= 0, k, jnp.invert(k ^ msb))
    return jax.lax.bitcast_convert_type(bits, dtype)


def sort_planes(x, axis: int = -2):
    """Sort ``x`` ascending along ``axis`` (static length), bitwise equal to
    ``lax.sort`` over that axis.  Intended for plane-major layouts where
    ``axis`` is NOT the minor axis — each sort slot is then a contiguous
    plane and the network is one fused pass instead of a padded minor-dim
    sort.  Integer inputs run the network directly; floats run it on
    order-isomorphic int keys."""
    axis = axis % x.ndim
    L = x.shape[axis]
    if L <= 1:
        return x
    if jnp.issubdtype(x.dtype, jnp.floating):
        keys = _ordered_int(x)
        out = _network(keys, axis)
        return _from_ordered_int(out, x.dtype)
    return _network(x, axis)


def _network(k, axis: int):
    L = k.shape[axis]
    planes = [jax.lax.index_in_dim(k, i, axis, keepdims=False) for i in range(L)]
    for i, j in batcher_pairs(L):
        a, b = planes[i], planes[j]
        planes[i] = jnp.minimum(a, b)
        planes[j] = jnp.maximum(a, b)
    return jnp.stack(planes, axis=axis)
