"""ops.planesort — Batcher network plane sort vs lax.sort (bitwise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skdownscale_tpu.ops.planesort import MAX_NETWORK_LEN, batcher_pairs, sort_planes


def _apply_network_01(n):
    """Exhaustively sort every 0/1 vector of length n through the pair list
    (the 0-1 principle: a comparator network sorting all 0/1 inputs sorts
    everything)."""
    vecs = ((np.arange(2**n)[:, None] >> np.arange(n)[None, :]) & 1).astype(np.int8)
    for i, j in batcher_pairs(n):
        a = np.minimum(vecs[:, i], vecs[:, j])
        b = np.maximum(vecs[:, i], vecs[:, j])
        vecs[:, i], vecs[:, j] = a, b
    return vecs


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8, 11, 12])
def test_zero_one_principle_exhaustive(n):
    out = _apply_network_01(n)
    assert bool((np.diff(out.astype(np.int16), axis=1) >= 0).all())


@pytest.mark.parametrize("n", [13, 31, 40, 47, 62, 64])
def test_zero_one_principle_sampled(n):
    rng = np.random.default_rng(n)
    vecs = (rng.random((200_000, n)) < rng.random((200_000, 1))).astype(np.int8)
    for i, j in batcher_pairs(n):
        a = np.minimum(vecs[:, i], vecs[:, j])
        b = np.maximum(vecs[:, i], vecs[:, j])
        vecs[:, i], vecs[:, j] = a, b
    assert bool((np.diff(vecs.astype(np.int16), axis=1) >= 0).all())


def test_pair_indices_in_range():
    for n in range(1, MAX_NETWORK_LEN + 1):
        for i, j in batcher_pairs(n):
            assert 0 <= i < j < n


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
@pytest.mark.parametrize("L", [1, 2, 5, 40, 64])
def test_bitwise_vs_lax_sort(dtype, L):
    rng = np.random.default_rng(L)
    x = rng.normal(0, 10, (3, L, 17)).astype(dtype)
    # ties, signed zeros, infs, NaNs — lax.sort's full total order
    x[0, : L // 2, :5] = np.float32(1.5)
    if L >= 4:
        x[1, 0, :] = -0.0
        x[1, 1, :] = 0.0
        x[1, 2, :] = np.inf
        x[1, 3, :] = -np.inf
        x[2, 0, ::2] = np.nan
    got = np.asarray(sort_planes(jnp.asarray(x), axis=1))
    want = np.asarray(jax.lax.sort(jnp.asarray(np.swapaxes(x, 1, 2))))
    want = np.swapaxes(want, 1, 2)
    assert got.dtype == x.dtype
    np.testing.assert_array_equal(got.view(np.int32 if dtype == jnp.float32 else np.int64),
                                  want.view(np.int32 if dtype == jnp.float32 else np.int64))


def test_negative_zero_ordering():
    x = jnp.asarray(np.array([[0.0], [-0.0], [0.0], [-0.0]], np.float32))
    out = np.asarray(sort_planes(x, axis=0)).view(np.int32).ravel()
    # -0.0 (sign bit set) sorts before +0.0
    assert list(out < 0) == [True, True, False, False]


def test_integer_inputs():
    rng = np.random.default_rng(0)
    x = rng.integers(-50, 50, (7, 23, 9), dtype=np.int32)
    got = np.asarray(sort_planes(jnp.asarray(x), axis=1))
    np.testing.assert_array_equal(got, np.sort(x, axis=1))


def test_axis_variants():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(6, 4, 5)).astype(np.float32)
    for axis in (0, 1, 2, -1, -2, -3):
        got = np.asarray(sort_planes(jnp.asarray(x), axis=axis))
        np.testing.assert_array_equal(got, np.sort(x, axis=axis))


def test_under_jit_and_grad_free_shapes():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(12, 40, 33)), jnp.float32)
    f = jax.jit(lambda a: sort_planes(a, axis=-2))
    np.testing.assert_array_equal(np.asarray(f(x)), np.sort(np.asarray(x), axis=-2))
