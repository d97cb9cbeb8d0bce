"""Pooled ("global") quantile mapping over all cells.

Second member of the reference roadmap's never-built ``global_models``
component (``/root/reference/docs/roadmap.rst:59-65``): one quantile
correction estimated from every valid sample in the (cells, time) grid,
applied to every cell.  The pointwise ``QuantileMapper`` fits one CDF per
cell; the pooled flavor is standard when per-cell records are short or a
spatially-coherent correction is wanted.

TPU-native distributed quantile estimation
------------------------------------------
The pooled CDF needs order statistics of up to ~2e10 values spread across
a device mesh.  A global sort would all-gather the grid; instead the fit
uses a *stratified order-statistic sketch* under ``shard_map``:

1. each device sorts its local shard once (TPU-native ``jnp.sort``) and
   takes ``m`` equally-spaced order statistics with weight ``n_local/m``;
2. one ``all_gather`` over ICI moves the (devices, m) sketch — KBs, not
   the grid — to every device;
3. the weighted merge (payload sort + midpoint-rank cumsum) evaluates the
   Cunnane plotting-position ladder, replicated.

The sketch is deterministic with worst-case rank error ``n_local/(2m)``
per device (each sample represents a run of ``n_local/m`` consecutive
order statistics); at the default ``m=8192`` that is <0.007% of pooled
rank per device.  Unsharded fits skip the sketch and use the exact sorted
ladder.

Transforms never need collectives: both ladders share one plotting-position
grid, so quantile mapping composes into a single monotone table
``x_ladder -> y_ladder`` evaluated per cell row with ``ops.interp.interp_rows``
(cell-sharded in, cell-sharded out).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..ops.interp import interp_rows, interp_sortmerge

__all__ = [
    "GlobalQuantileState",
    "GlobalQuantileMapper",
    "pooled_quantile_table",
]

_ALPHA = 0.4  # Cunnane plotting positions, as everywhere in the package
_BETA = 0.4


def ladder_positions(n_quantiles: int, dtype=jnp.float64) -> jnp.ndarray:
    i = jnp.arange(n_quantiles, dtype=dtype)
    return (i + 1 - _ALPHA) / (n_quantiles + 1 - _ALPHA - _BETA)


class GlobalQuantileState(NamedTuple):
    pp: jnp.ndarray  # (Q,) shared plotting positions
    x_ladder: jnp.ndarray  # (Q,) pooled model quantiles
    y_ladder: jnp.ndarray  # (Q,) pooled observed quantiles
    n_x: jnp.ndarray  # () valid model samples
    n_y: jnp.ndarray  # () valid observed samples


def _ladder_from_weighted(vals, w, pp):
    """Evaluate the ladder from weighted samples: payload-sort by value,
    midpoint-rank plotting positions, monotone interp onto ``pp``."""
    vals, w = jax.lax.sort([vals, w], num_keys=1)
    W = jnp.sum(w)
    mid = jnp.cumsum(w) - 0.5 * w  # midpoint rank of each sample
    sp = (mid + 0.5 - _ALPHA) / (W + 1 - _ALPHA - _BETA)
    # zero-weight (+inf pad) samples sort last; clamp them onto the last
    # finite knot so the table stays monotone-finite
    finite = jnp.isfinite(vals) & (w > 0)
    v_last = jnp.max(jnp.where(finite, vals, -jnp.inf))
    sp = jnp.where(finite, sp, jnp.inf)
    vals = jnp.where(finite, vals, v_last)
    out = interp_rows(sp[None, :], vals[None, :], pp[None, :])[0]
    return jnp.where(W > 0, out, jnp.nan)


def _exact_ladder(vals, mask, pp):
    """Exact pooled ladder: one global sort of the flattened valid values."""
    flat = jnp.where(mask, vals, jnp.inf).reshape(-1)
    n = jnp.sum(mask)
    s = jnp.sort(flat)
    w = (jnp.arange(s.shape[0]) < n).astype(vals.dtype)
    return _ladder_from_weighted(s, w, pp), n


def _sketch_ladder(vals, mask, pp, m: int, axis_name: str):
    """Per-device sort + m-point stratified sketch + all_gather merge
    (runs inside shard_map; ``vals``/``mask`` are the local shards)."""
    dtype = vals.dtype
    flat = jnp.where(mask, vals, jnp.inf).reshape(-1)
    cnt = jnp.sum(mask).astype(dtype)
    s = jnp.sort(flat)
    j = jnp.arange(m, dtype=dtype)
    r = jnp.clip(((j + 0.5) * cnt / m), 0, jnp.maximum(cnt - 1, 0)).astype(jnp.int32)
    sample = jnp.take(s, r)
    w = jnp.full((m,), cnt / m, dtype)
    empty = cnt == 0
    sample = jnp.where(empty, jnp.inf, sample)
    w = jnp.where(empty, 0.0, w)
    all_s = jax.lax.all_gather(sample, axis_name).reshape(-1)
    all_w = jax.lax.all_gather(w, axis_name).reshape(-1)
    n = jax.lax.psum(jnp.sum(mask), axis_name)
    return _ladder_from_weighted(all_s, all_w, pp), n


_exact_ladder_jit = jax.jit(_exact_ladder)


@functools.lru_cache(maxsize=64)
def _sketch_ladder_jit(mesh: Mesh, m: int):
    """Cached jitted shard_map sketch for one (mesh, sample size) pair —
    a fresh wrapper per fit would retrace and recompile every call (remote
    TPU compiles are minutes; CLAUDE.md's lru_cache'd-jit convention)."""
    axis = mesh.axis_names[0]
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    fn = shard_map(
        functools.partial(_sketch_ladder, m=m, axis_name=axis),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(fn)


def pooled_quantile_table(vals, pp, mesh: Mesh | None = None, *, sample_per_shard: int = 8192):
    """Pooled quantile ladder of the finite entries of ``vals`` (C, T).

    ``mesh=None``: exact (single global sort — fine on one device, gathers
    a sharded grid).  With a 1-D cell mesh: the sketch path above, exact to
    ``n_local/(2*sample_per_shard)`` in rank, with only a KB-scale
    ``all_gather`` touching ICI.  Returns (ladder (Q,), n_valid ()).
    """
    vals = jnp.asarray(vals)
    mask = jnp.isfinite(vals)
    if mesh is None or mesh.devices.size == 1:
        return _exact_ladder_jit(vals, mask, pp)
    return _sketch_ladder_jit(mesh, sample_per_shard)(vals, mask, pp)


class GlobalQuantileMapper:
    """Pooled quantile mapping: fit on (cells, time) model + observed grids,
    transform maps model values through the pooled correction.

    Parameters
    ----------
    n_quantiles : int | None
        Ladder size (default: min(2048, pooled sample count)).
    sample_per_shard : int
        Sketch size per device on the sharded path.
    mesh : jax.sharding.Mesh | None
        1-D cell mesh for the distributed fit; None = exact local fit.

    ``transform`` maps X -> observed space (x_ladder -> y_ladder);
    ``inverse_transform`` maps back.  Tails extrapolate flat (clamp), the
    convention of ``np.interp`` / the reference's default edge handling.
    """

    _fit_attributes = ["state_"]

    def __init__(self, n_quantiles: int | None = None, sample_per_shard: int = 8192, mesh: Mesh | None = None):
        self.n_quantiles = n_quantiles
        self.sample_per_shard = sample_per_shard
        self.mesh = mesh

    @staticmethod
    def _grid(a):
        a = jnp.asarray(a)
        return a[None] if a.ndim == 1 else a

    def fit(self, X, y):
        X = self._grid(X)
        y = self._grid(y)
        dtype = jnp.result_type(X.dtype, jnp.float32)
        nq = self.n_quantiles
        if nq is None:
            nq = int(min(2048, X.size, y.size))
        pp = ladder_positions(nq, dtype)
        x_ladder, n_x = pooled_quantile_table(
            X.astype(dtype), pp, self.mesh, sample_per_shard=self.sample_per_shard
        )
        y_ladder, n_y = pooled_quantile_table(
            y.astype(dtype), pp, self.mesh, sample_per_shard=self.sample_per_shard
        )
        self.state_ = GlobalQuantileState(pp, x_ladder, y_ladder, n_x, n_y)
        return self

    def _map(self, V, src, dst):
        # per-CELL-row sort-merge against the shared ladder: O((T+Q) log)
        # per row, stays cell-sharded on a mesh (no single-row gather), and
        # avoids the dense O(T*Q) per-row CPU formulation interp_rows picks
        # for ladder-sized tables
        V = self._grid(V)
        C = V.shape[0]
        L = src.shape[0]
        xp = jnp.broadcast_to(src[None, :], (C, L))
        fp = jnp.broadcast_to(dst[None, :], (C, L))
        out = interp_sortmerge(xp, fp, V.astype(src.dtype))
        return jnp.where(jnp.isfinite(V), out, jnp.nan)

    def transform(self, X):
        st = self.state_
        return self._map(X, st.x_ladder, st.y_ladder)

    def inverse_transform(self, y):
        st = self.state_
        return self._map(y, st.y_ladder, st.x_ladder)

    def get_params(self, deep: bool = True):
        return {
            "n_quantiles": self.n_quantiles,
            "sample_per_shard": self.sample_per_shard,
            "mesh": self.mesh,
        }

    def set_params(self, **params):
        for k, v in params.items():
            setattr(self, k, v)
        return self
