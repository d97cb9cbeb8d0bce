"""Row-sort dispatch: Pallas in-VMEM bitonic kernel on TPU, lax.sort elsewhere.

The BCSD pipelines sort short rows — ``(cells*groups, group_len)`` fit
windows and query-rank payload sorts.  On TPU with float32 these route to
:mod:`.pallas.sort_kernel` (one HBM pass; the whole network runs in VMEM);
on CPU/GPU or in float64 they fall back to XLA's sort, which the golden
tests pin.  ``force``/``interpret`` exist so the CPU test image can execute
the kernel path (interpret mode) against the fallback.

Note the kernel's payload sort is NOT stable; both call sites are
tie-insensitive (tie runs receive identical mapped values via
``grouped._rank_fill_unsort``, and value-only sorts carry no payload).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pallas.sort_kernel import (
    sort_rows,
    sort_rows_with_positions,
    unsort_rows,
    use_sort_kernel,
)

__all__ = ["sort_rows_auto", "rank_sort_auto", "unsort_auto", "override"]

# above this row length the (Lp, lanes) working set risks VMEM pressure
# under double buffering; the long-row sorts (QDM's (C, 3650+2)) stay XLA
_MAX_KERNEL_LEN = 2048

_OVERRIDE: tuple | None = None  # (force, interpret) — tests only


class override:
    """Context manager forcing the dispatch (CPU tests run the kernel path
    in interpret mode against the XLA fallback).  Trace-time only: callers
    must not hold cached jits across the switch."""

    def __init__(self, force: bool, interpret: bool = True):
        self._val = (force, interpret)

    def __enter__(self):
        global _OVERRIDE
        self._prev = _OVERRIDE
        _OVERRIDE = self._val
        return self

    def __exit__(self, *exc):
        global _OVERRIDE
        _OVERRIDE = self._prev
        return False


def _use(x, force):
    if force is not None:
        return force
    if _OVERRIDE is not None:
        return _OVERRIDE[0]
    return use_sort_kernel(x.dtype) and x.shape[-1] <= _MAX_KERNEL_LEN


def _interp(interpret):
    if _OVERRIDE is not None:
        return _OVERRIDE[1]
    return interpret


def sort_rows_auto(rows, *, force=None, interpret: bool = False):
    """``jnp.sort(rows, axis=-1)`` for 2-D rows."""
    if _use(rows, force):
        return sort_rows(rows, interpret=_interp(interpret))
    return jnp.sort(rows, axis=-1)


def rank_sort_auto(rows, *, force=None, interpret: bool = False):
    """``lax.sort((rows, iota), num_keys=1)``: (sorted, positions int32).
    Tie order is backend-dependent (callers must be tie-insensitive)."""
    if _use(rows, force):
        return sort_rows_with_positions(rows, interpret=_interp(interpret))
    pos = jnp.broadcast_to(jnp.arange(rows.shape[-1], dtype=jnp.int32), rows.shape)
    return jax.lax.sort((rows, pos), num_keys=1, is_stable=True, dimension=rows.ndim - 1)


def unsort_auto(vals, pos, *, force=None, interpret: bool = False):
    """Restore original order (``pos`` a permutation): payload sort by pos."""
    if _use(vals, force):
        return unsort_rows(vals, pos, interpret=_interp(interpret))
    _, out = jax.lax.sort((pos, vals), num_keys=1, is_stable=True, dimension=vals.ndim - 1)
    return out
