"""Centered rolling statistics as masked convolutions.

The reference leans on pandas/xarray rolling windows — the 9-point centered
monthly climate-trend mean in BCSD (``bcsd.py:246-250``,
``rolling(9, center=True, min_periods=1).mean()``) and the 31-day rolling
mean/std in z-score (``zscore.py:185-189``, ``267-269``).  On TPU a small
centered window is a masked convolution: windowed sums of ``x*valid`` and of
``valid`` counts.  This is exact (no cumsum cancellation) and maps to the VPU.

Functions operate on the last axis and broadcast over leading axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rolling_mean",
    "rolling_std",
    "rolling_mean_std",
    "rolling_sum_count",
    "rolling_mean_grouped_flat",
    "grouped_rolling_matrix",
    "use_rolling_matmul",
    "use_stats_matmul",
]

# Unroll the windowed sum below this many input elements (2.4 GB f32): the
# unrolled form is one fused HBM pass but lets XLA keep ~w slices of the
# padded buffer live if it declines to fuse; the fori_loop form is w passes
# but O(1) extra memory (the continental-scale default).
_UNROLL_ELEMS = 600_000_000


def _window_sum(x, window: int, center: bool):
    """Sum over a trailing (or centered) window via padded sliding adds.

    One padded buffer, then either w unrolled static slices of it (fused by
    XLA into a single HBM pass — the default below ``_UNROLL_ELEMS``) or a
    sequential ``fori_loop`` accumulation (O(1) extra memory, w separate
    passes — the continental-scale fallback: an unrolled stack of padded
    *copies* caused the round-2 1M-cell OOM, but slices of one shared buffer
    do not add live copies).  Both forms add in ascending window offset, so
    results are bit-identical.  No cumsum cancellation (each output is a
    fresh w-term sum).
    """
    n = x.shape[-1]
    if center:
        # pandas center=True for window w covers indices [i - w//2, i + (w-1)/2]
        lo = -(window // 2)
        hi = (window - 1) // 2
    else:
        lo = -(window - 1)
        hi = 0
    w = hi - lo + 1
    # xp[i + j] == x[i + lo + j] with out-of-range positions = 0
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(-lo, hi)])

    if x.size <= _UNROLL_ELEMS:
        # Static slices of the ONE padded buffer fuse into a single HBM pass
        # (each fori_loop iteration is a separate pass: read xp + read/write
        # the carry — w*3 passes vs 1).  Same ascending-offset addition order
        # as the loop, so results are bit-identical.  The 32k-cell z-score
        # config (five w=31 window sums over (32768, 7305)) measured
        # 22,416 -> 92,816 cells/s end-to-end from this (bench.py zscore).
        s = jnp.zeros_like(x)
        for j in range(w):
            s = s + jax.lax.slice_in_dim(xp, j, j + n, axis=-1)
        return s

    def body(j, acc):
        return acc + jax.lax.dynamic_slice_in_dim(xp, j, n, axis=-1)

    return jax.lax.fori_loop(0, w, body, jnp.zeros_like(x))


def rolling_mean_grouped_flat(x_flat, window: int, valid: np.ndarray, *, min_periods: int = 1):
    """Per-group centered rolling mean on a FLAT ``(..., G*L)`` layout.

    Equivalent to ``rolling_mean(x.reshape(..., G, L), window, center=True,
    valid=valid)`` but without ever materializing a 3-D ``(..., G, L)``
    tensor: XLA tiles the two minor dims to (8, 128), so at continental
    scale a (cells, 12, 40) rolling buffer pads 3.5x in HBM (the 1M-cell
    OOM).  Group boundaries are enforced by host-precomputed per-offset
    segment masks (a window term is kept only when it stays inside the
    source position's group), and the valid-count/min_periods bookkeeping
    is entirely host-side.  Addition order matches ``rolling_mean`` (masked
    cross-boundary terms contribute exact 0.0), so results are identical on
    the valid slots; padding slots return 0.

    ``valid``: host (G, L) bool mask of real entries (prefix masks).
    """
    G, L = valid.shape
    n = G * L
    lo = -(window // 2)
    hi = (window - 1) // 2
    w = hi - lo + 1
    pos = np.arange(n)
    vflat = valid.reshape(-1)

    seg = np.zeros((w, n), np.float64)
    cnt = np.zeros(n, np.float64)
    for j in range(w):
        src = pos + lo + j
        ok = (src >= 0) & (src < n) & ((src // L) == (pos // L))
        seg[j, ok] = 1.0
        cnt[ok] += vflat[np.clip(src, 0, n - 1)][ok]

    dtype = x_flat.dtype
    xp = jnp.pad(
        x_flat * jnp.asarray(vflat, dtype), [(0, 0)] * (x_flat.ndim - 1) + [(-lo, hi)]
    )
    segd = jnp.asarray(seg, dtype)

    if x_flat.size <= _UNROLL_ELEMS:
        # static slices of the ONE padded buffer: XLA fuses the w adds into
        # a single HBM pass (the round-2 1M-cell OOM came from w separate
        # jnp.pad-shifted COPIES, not from unrolling per se; slices of a
        # shared buffer add no live copies).  Measured 2.7x over the
        # fori_loop at 32k cells (benchmarks/rolling_profile_tpu.py).
        s = jnp.zeros_like(x_flat)
        for j in range(w):
            s = s + jax.lax.slice_in_dim(xp, j, j + n, axis=-1) * segd[j]
    else:

        def body(j, acc):
            return acc + jax.lax.dynamic_slice_in_dim(xp, j, n, axis=-1) * segd[j]

        s = jax.lax.fori_loop(0, w, body, jnp.zeros_like(x_flat))
    denom = jnp.asarray(np.where(cnt > 0, cnt, 1.0), dtype)
    keep = jnp.asarray((cnt >= min_periods) & vflat)
    return jnp.where(keep, s / denom, 0.0)


@functools.lru_cache(maxsize=64)
def grouped_rolling_matrix(groups, window: int, n: int, min_periods: int = 1) -> np.ndarray | None:
    """Host ``(n, n)`` matrix ``R`` with ``R @ x == scatter_groups(
    rolling_mean_grouped_flat(gather_groups(x, groups, fill=0.0), window,
    groups.mask, min_periods=min_periods), groups, n)`` for a PARTITION
    grouping of ``[0, n)`` — the whole gather -> masked grouped rolling mean
    -> inverse-permutation scatter pipeline is linear in ``x`` with
    host-known coefficients, so it collapses to one matrix.

    Why this exists: on TPU the unrolled windowed sum's ``w`` sublane-shifted
    slices of the padded ``{0,1}``-layout buffer defeat tile reuse — the
    round-5 profiler capture measured the 9-tap monthly fusion at ~143 GB/s
    (~17% of peak, 28.2 ms of the 1M-cell pass) while ordinary fusions in
    the same program moved ~75% of peak.  As a ``(cells, n) x (n, n)``
    matmul the same map runs on the MXU at HIGHEST precision and the
    gather/scatter permutations vanish into the matrix.  Worth it only for
    small ``n`` (monthly T=480; the daily T=7305 matrix would be 213 MB and
    ~10 TFLOP) — see :func:`use_rolling_matmul`.

    Returns None when the grouping is not an exact partition of ``[0, n)``.
    """
    G, L = groups.mask.shape
    idx = groups.indices.reshape(-1).astype(np.int64)
    msk = groups.mask.reshape(-1)
    flatN = G * L
    tgt = idx[msk]
    if tgt.size != n or not np.array_equal(np.sort(tgt), np.arange(n)):
        return None
    lo = -(window // 2)
    hi = (window - 1) // 2
    w = hi - lo + 1
    pos = np.arange(flatN)
    R_flat = np.zeros((flatN, n), np.float64)
    cnt = np.zeros(flatN, np.float64)
    for j in range(w):
        src = pos + lo + j
        ok = (src >= 0) & (src < flatN) & ((src // L) == (pos // L))
        oksrc = src[ok]
        vsrc = msk[oksrc]
        rows = pos[ok][vsrc]
        np.add.at(R_flat, (rows, idx[oksrc][vsrc]), 1.0)
        cnt[pos[ok][vsrc]] += 1.0
    denom = np.where(cnt > 0, cnt, 1.0)
    keep = (cnt >= min_periods) & msk
    R_flat = np.where(keep[:, None], R_flat / denom[:, None], 0.0)
    inv = np.zeros(n, np.int64)
    inv[tgt] = np.nonzero(msk)[0]
    return np.ascontiguousarray(R_flat[inv])


# test hook: True/False forces the matmul grouped-rolling path regardless of
# platform/dtype (size and partition checks still apply); None = platform gate
_MATMUL_OVERRIDE: bool | None = None


def use_rolling_matmul(dtype, n: int) -> bool:
    """Gate for the matmul form of the grouped rolling mean: TPU + float32
    (HIGHEST-precision MXU matmul ~ f32 accuracy) and ``n`` small enough
    that the dense ``(n, n)`` matrix and its FLOPs stay negligible."""
    if n > 2048:
        return False
    if _MATMUL_OVERRIDE is not None:
        return _MATMUL_OVERRIDE
    if dtype not in (jnp.float32, np.dtype("float32")):
        return False
    try:
        platform = jax.devices()[0].platform.lower()
    except Exception:  # pragma: no cover - backend init failure
        platform = "cpu"
    return platform not in ("cpu", "gpu")


def rolling_sum_count(x, valid, window: int, center: bool = True):
    """Windowed sum of ``x*valid`` and windowed count of ``valid``.

    ``valid=None`` means every entry is valid: the count then depends only on
    position along the window axis, so it is computed on a single ``(n,)``
    vector and broadcast — one full-plane windowed sum (and its padded copy)
    less per statistic on ``(cells, time)`` inputs."""
    if valid is None:
        c = _window_sum(jnp.ones(x.shape[-1:], x.dtype), window, center)
        return _window_sum(x, window, center), jnp.broadcast_to(c, x.shape)
    v = valid.astype(x.dtype)
    return _window_sum(x * v, window, center), _window_sum(v, window, center)


def rolling_mean(x, window: int, *, center: bool = True, min_periods: int | None = None, valid=None):
    """Centered rolling mean with pandas ``min_periods`` semantics.

    ``valid`` marks real (non-padding) entries; positions with fewer than
    ``min_periods`` valid points in their window yield NaN (pandas default
    ``min_periods=window``; BCSD uses ``min_periods=1``, ``bcsd.py:248``).
    """
    mp = window if min_periods is None else min_periods
    s, c = rolling_sum_count(x, valid, window, center)
    mean = s / jnp.where(c > 0, c, 1)
    return jnp.where(c >= mp, mean, jnp.nan)


# test hook mirroring _MATMUL_OVERRIDE for the blocked-banded stats form
_STATS_MATMUL_OVERRIDE: bool | None = None

_STATS_BLOCK = 128  # lane width; one output block reads two input blocks


def use_stats_matmul(dtype, n: int, window: int) -> bool:
    """Gate for the blocked-banded MXU form of the long-row rolling
    mean/std: TPU + float32, the window must fit one neighbour block
    (``w - 1 <= 128``), and the row must be long enough that the per-block
    matmul amortizes (short rows stay on the fused unrolled slices)."""
    if window > _STATS_BLOCK + 1 or n < 4 * _STATS_BLOCK:
        return False
    if _STATS_MATMUL_OVERRIDE is not None:
        return _STATS_MATMUL_OVERRIDE
    if dtype not in (jnp.float32, np.dtype("float32")):
        return False
    try:
        platform = jax.devices()[0].platform.lower()
    except Exception:  # pragma: no cover - backend init failure
        platform = "cpu"
    return platform not in ("cpu", "gpu")


@functools.lru_cache(maxsize=32)
def _stats_band_weights(window: int, center: bool) -> tuple[np.ndarray, np.ndarray]:
    """Host ``(B, B)`` 0/1 band matrices ``(W0, W1)`` with
    ``y[kB + t] = (xb[k] @ W0)[t] + (xb[k+1] @ W1)[t]`` where
    ``xb`` are non-overlapping B-blocks of the zero-padded input and
    ``y[i] = sum_{j=0..w-1} xp[i + j]`` (the centered windowed sum)."""
    if center:
        lo = -(window // 2)
        hi = (window - 1) // 2
    else:
        lo = -(window - 1)
        hi = 0
    w = hi - lo + 1
    B = _STATS_BLOCK
    u = np.arange(B)[:, None]
    t = np.arange(B)[None, :]
    W0 = ((t <= u) & (u <= t + w - 1)).astype(np.float64)
    W1 = ((t <= u + B) & (u + B <= t + w - 1)).astype(np.float64)
    return W0, W1


def _window_sums_matmul(planes, n: int, window: int, center: bool):
    """Centered windowed sum of each plane via two banded ``(B, B)``
    matmuls per block — the MXU form of :func:`_window_sum`.

    Why: the unrolled form's ``w`` sublane-shifted slices of the padded
    buffer defeat tile reuse (round-5 profiler: ~17% of peak HBM bandwidth
    on such fusions), and at ``w = 31`` the slice forest is ~2/3 of the
    z-score predict pass.  Blocked into non-overlapping 128-wide time
    blocks, the same map is ``y_k = xb_k @ W0 + xb_{k+1} @ W1`` — two
    HIGHEST-precision MXU matmuls reading each input element exactly
    twice.  Each output is a fresh tree-reduced ``w``-term sum (no cumsum
    cancellation; if anything, better-conditioned than the sequential
    slice adds).

    ``planes``: (..., n) stacked sum operands; returns (..., n) sums.
    """
    if center:
        lo = -(window // 2)
        hi = (window - 1) // 2
    else:
        lo = -(window - 1)
        hi = 0
    B = _STATS_BLOCK
    Kout = -(-n // B)
    # xp[i] = x[i + lo] zero-padded; blocks need Kout*B + B entries
    pad_hi = Kout * B + B - (-lo + n)
    xp = jnp.pad(planes, [(0, 0)] * (planes.ndim - 1) + [(-lo, pad_hi)])
    xb = xp.reshape(*planes.shape[:-1], Kout + 1, B)
    W0, W1 = _stats_band_weights(window, center)
    w0 = jnp.asarray(W0, planes.dtype)
    w1 = jnp.asarray(W1, planes.dtype)
    nd = xb.ndim
    # both dots read the SAME xb buffer; the k-shift is applied to the dot
    # OUTPUTS (slices fused into the add) — input-side shifted slices would
    # materialize two full copies of the padded buffer
    z0 = jax.lax.dot_general(
        xb, w0, (((nd - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    z1 = jax.lax.dot_general(
        xb, w1, (((nd - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    y = z0[..., :Kout, :] + z1[..., 1 : Kout + 1, :]
    return y.reshape(*planes.shape[:-1], Kout * B)[..., :n]


def rolling_mean_std(
    x, window: int, *, center: bool = True, min_periods: int | None = None, ddof: int = 1
):
    """Centered rolling mean AND std in one pass, sharing the windowed
    sums (the separate :func:`rolling_mean` + :func:`rolling_std` calls
    each re-run the ``sum(x)``/count sums — one full-plane windowed sum
    wasted).  pandas semantics: ``min_periods`` defaults to ``window``
    (NaN edges), NaN inputs poison every window they touch, ``ddof=1``
    default (``zscore.py:267-269``).

    On TPU/f32 long rows the three windowed sums (``x``, ``x^2``, NaN
    count) run as ONE stacked blocked-banded MXU matmul
    (:func:`_window_sums_matmul`); elsewhere the fused unrolled slice form
    of :func:`_window_sum` is used with the sums shared.
    """
    mp = window if min_periods is None else min_periods
    n = x.shape[-1]
    # center per row before squaring: kills the f32 cancellation in
    # ``s2 - c*m^2`` (raw squares of ~283 K temperatures are ~2.5e6 against
    # a true windowed ss of ~1e2 — the separate rolling_std carries ~1%
    # f32 std error from this); mean/std are shift-equivariant/-invariant,
    # so add mu0 back at the end
    mu0 = jnp.nanmean(x, axis=-1, keepdims=True)
    xm = x - mu0
    if use_stats_matmul(x.dtype, n, window):
        nanmask = jnp.isnan(x)
        xc = jnp.where(nanmask, jnp.zeros_like(x), xm)
        # sequential per-plane calls: a stacked (3, C, n) operand costs 3x
        # the padded-buffer + dot-output temps SIMULTANEOUSLY and blows the
        # 65k-cell single-pass HBM budget; XLA frees between these
        s = _window_sums_matmul(xc, n, window, center)
        s2 = _window_sums_matmul(xc * xc, n, window, center)
        nan_hits = _window_sums_matmul(nanmask.astype(x.dtype), n, window, center)
        poison = nan_hits > 0.5
    else:
        s = _window_sum(xm, window, center)
        s2 = _window_sum(xm * xm, window, center)
        # NaN x propagates through s/s2 exactly like the separate calls
        poison = None
    # positional window count (valid=None): pure function of (n, window)
    c = _window_sum(jnp.ones((n,), x.dtype), window, center)
    c = jnp.broadcast_to(c, x.shape)
    cc = jnp.where(c > 0, c, 1)
    mean_raw = s / cc
    ss = s2 - 2 * mean_raw * s + c * mean_raw * mean_raw
    var = jnp.maximum(ss, 0.0) / jnp.maximum(c - ddof, 1)
    std_raw = jnp.sqrt(var)
    bad_mean = c < mp
    bad_std = (c < mp) | (c <= ddof)
    if poison is not None:
        bad_mean = bad_mean | poison
        bad_std = bad_std | poison
    mean_raw = mean_raw + mu0
    mean = jnp.where(bad_mean, jnp.nan, mean_raw)
    std = jnp.where(bad_std, jnp.nan, std_raw)
    return mean, std


def rolling_std(
    x, window: int, *, center: bool = True, min_periods: int | None = None, ddof: int = 1, valid=None
):
    """Centered rolling standard deviation (pandas default ``ddof=1``,
    xarray default ``ddof=0``). Two-pass (mean then centered squares) for
    numerical robustness at f32."""
    mp = window if min_periods is None else min_periods
    s, c = rolling_sum_count(x, valid, window, center)
    cc = jnp.where(c > 0, c, 1)
    mean = s / cc
    s2, _ = rolling_sum_count(x * x, valid, window, center)
    # sum (x - m)^2 = sum x^2 - 2 m sum x + c m^2
    ss = s2 - 2 * mean * s + c * mean * mean
    denom = jnp.maximum(c - ddof, 1)
    var = jnp.maximum(ss, 0.0) / denom
    std = jnp.sqrt(var)
    return jnp.where((c >= mp) & (c > ddof), std, jnp.nan)
