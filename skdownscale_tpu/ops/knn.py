"""Brute-force batched k-nearest-neighbour search.

The reference builds a ``sklearn.neighbors.KDTree`` per grid cell and queries
it per time step (``/root/reference/skdownscale/pointwise_models/gard.py:82,194,299``).
On TPU, brute force wins: the (queries x train) distance matrix is one MXU
matmul, and ``jax.lax.top_k`` selects neighbours — no pointer-chasing tree,
and the whole thing batches over cells with vmap.

Results are sorted ascending by distance, matching ``KDTree.query``.
Ties are broken by training index (deterministic; KDTree's tie order is
implementation-defined).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["knn"]


def _knn_block(train, tn, queries, k: int, approx: bool = False):
    f = train.shape[-1]
    if f <= 4:
        # direct difference form: the expanded |q|^2 - 2qt + |t|^2 suffers
        # catastrophic f32 cancellation for clustered climate values (~300 K),
        # flipping near-tie neighbor sets; for few features the broadcasted
        # form is exact and the matmul wasn't the bottleneck anyway
        diff = queries[:, None, :] - train[None, :, :]  # (m, n, f)
        d2 = jnp.sum(diff * diff, axis=-1)
    else:
        # |q - t|^2 = |q|^2 - 2 q.t + |t|^2 ; the cross term is an MXU
        # matmul.  precision=HIGHEST: the default TPU matmul truncates
        # operands toward bf16, whose ~8-bit mantissa perturbs the cross
        # term by ~|q||t|/256 — far larger than near-tie distance gaps on
        # centered data (callers center; see knn()).
        qn = jnp.sum(queries * queries, axis=-1, keepdims=True)  # (m, 1)
        cross = jax.lax.dot_general(
            queries,
            train,
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (m, n)
        d2 = qn - 2.0 * cross + tn[None, :]
    d2 = jnp.maximum(d2, 0.0)
    if approx:
        # TPU-optimized approximate selection (recall ~0.95 default);
        # results are NOT sorted-set-identical to exact kNN — opt-in only
        neg, inds = jax.lax.approx_max_k(-d2, k)
    else:
        # top_k on negative distance; ties broken toward lower index (stable)
        neg, inds = jax.lax.top_k(-d2, k)
    return jnp.sqrt(-neg), inds


def knn(train, queries, k: int, *, return_distance: bool = True, query_chunk: int = 64, approx: bool = False):
    """k nearest neighbours by Euclidean distance.

    Parameters
    ----------
    train : (n, f) training points
    queries : (m, f) query points
    k : static neighbour count
    query_chunk : process queries in chunks of this size — the (m, n)
        distance matrix (plus top_k's index temp) otherwise dominates HBM at
        climate scale (cells x time_steps x train_steps).  ``None`` disables
        chunking.

    Returns
    -------
    (dist, inds) : ((m, k), (m, k)) — ascending by distance — or just inds
    if ``return_distance=False``.
    """
    # center on the training mean: distances are translation-invariant, and
    # centering shrinks |t|^2/|q|^2 to the data's spread so the expanded
    # form's cancellation error sits far below near-tie gaps (the raw form
    # on ~300 K climate values loses ~7 digits and flips neighbor sets)
    mu = jnp.mean(train, axis=0, keepdims=True)
    train = train - mu
    queries = queries - mu
    tn = jnp.sum(train * train, axis=-1)  # (n,)
    m = queries.shape[0]
    if query_chunk is None or m <= query_chunk:
        dist, inds = _knn_block(train, tn, queries, k, approx)
    else:
        pad = (-m) % query_chunk
        qp = jnp.pad(queries, ((0, pad), (0, 0)))
        blocks = qp.reshape(-1, query_chunk, queries.shape[1])
        dist, inds = jax.lax.map(lambda qb: _knn_block(train, tn, qb, k, approx), blocks)
        dist = dist.reshape(-1, k)[:m]
        inds = inds.reshape(-1, k)[:m]
    if not return_distance:
        return inds
    return dist, inds
