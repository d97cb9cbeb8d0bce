"""Property tests for the rank-bracket grouped QM transform.

`grouped_qm_transform` now computes the vals->pp->vals chain from
host-precomputed rank tables (grouped.rank_bracket_tables) instead of
self-quantiles + sort-merge interp.  These tests pin it against a direct
numpy reimplementation of the reference semantics
(``/root/reference/skdownscale/pointwise_models/quantile.py:485-545``):
np.interp of each query's self plotting position through the fit CDF with
OLS tail extrapolation — over random ragged groups, duplicate-heavy data,
and every extrapolate mode.
"""

import numpy as np
import numpy.testing as npt
import pytest

import jax.numpy as jnp

from skdownscale_tpu.models.grouped import (
    cunnane_fit_padded,
    gather_groups,
    grouped_qm_transform,
    _padded_pp_from_counts,
)
from skdownscale_tpu.utils.timeindex import PaddedGroups


def _random_partition(rng, T, G):
    """Random partition of range(T) into G non-empty groups -> PaddedGroups."""
    labels = rng.integers(0, G, T)
    for g in range(G):  # ensure non-empty
        if not (labels == g).any():
            labels[rng.integers(0, T)] = g
    members = [np.flatnonzero(labels == g) for g in range(G)]
    L = max(len(m) for m in members)
    idx = np.zeros((G, L), np.int64)
    mask = np.zeros((G, L), bool)
    for g, m in enumerate(members):
        idx[g, : len(m)] = m
        mask[g, : len(m)] = True
    counts = mask.sum(axis=1)
    return PaddedGroups(
        indices=idx, mask=mask, counts=counts, keys=np.arange(G), labels=labels
    )


def _np_reference(x, groups, fit_vals_sorted, fit_counts, extrapolate, ne=10, alpha=0.4, beta=0.4):
    """Direct numpy port of quantile.py:485-545 per group."""
    out = np.zeros_like(x)
    G, Lt = fit_vals_sorted.shape
    for g in range(G):
        m = groups.indices[g][groups.mask[g]]
        v = x[m]
        nq = len(v)
        # self plotting positions with np.interp tie semantics (last tie)
        sort_v = np.sort(v)
        pp_q = (np.arange(1, nq + 1) - alpha) / (nq + 1 - alpha - beta)
        pps = np.interp(v, sort_v, pp_q)
        nf = int(fit_counts[g])
        fv = fit_vals_sorted[g, :nf]
        pp_f = (np.arange(1, nf + 1) - alpha) / (nf + 1 - alpha - beta)
        res = np.interp(pps, pp_f, fv)
        if extrapolate in ("min", "both"):
            k = min(ne, nf)
            s, i = np.polyfit(pp_f[:k], fv[:k], 1)
            lo = pps < pp_f[0]
            res[lo] = i + s * pps[lo]
        if extrapolate in ("max", "both"):
            k = min(ne, nf)
            s, i = np.polyfit(pp_f[-k:], fv[-k:], 1)
            hi = pps > pp_f[-1]
            res[hi] = i + s * pps[hi]
        out[m] = res
    return out


@pytest.mark.parametrize("extrapolate", ["none", "min", "max", "both"])
@pytest.mark.parametrize("quantize", [False, True])
def test_grouped_qm_transform_matches_numpy(rng, extrapolate, quantize):
    T, G = 730, 7
    for trial in range(3):
        groups = _random_partition(rng, T, G)
        y = rng.normal(10, 4, T)
        x = rng.normal(11, 5, T)  # shifted/wider: exercises both tails
        if quantize:
            y = np.round(y)  # heavy exact ties, incl. across region edges
            x = np.round(x)
        cdf = cunnane_fit_padded(
            jnp.asarray(gather_groups(jnp.asarray(y), groups, fill=0.0)), groups
        )
        fit_counts = groups.counts
        got = np.asarray(
            grouped_qm_transform(
                cdf,
                fit_counts,
                groups.mask.reshape(-1),
                jnp.asarray(x),
                groups,
                extrapolate=extrapolate,
            )
        )
        fit_sorted = np.asarray(cdf.vals).reshape(G, -1)
        want = _np_reference(x, groups, fit_sorted, fit_counts, extrapolate)
        npt.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_grouped_qm_transform_batched_cells(rng):
    T, G, C = 365, 5, 4
    groups = _random_partition(rng, T, G)
    y = rng.normal(0, 1, (C, T))
    x = rng.normal(0.5, 1.2, (C, T))
    yg = gather_groups(jnp.asarray(y), groups, fill=0.0)
    cdf = cunnane_fit_padded(yg, groups)
    got = np.asarray(
        grouped_qm_transform(
            cdf, groups.counts, groups.mask.reshape(-1), jnp.asarray(x), groups,
            extrapolate="both",
        )
    )
    for c in range(C):
        fit_sorted = np.asarray(cdf.vals)[c].reshape(G, -1)
        want = _np_reference(x[c], groups, fit_sorted, groups.counts, "both")
        npt.assert_allclose(got[c], want, rtol=1e-9, atol=1e-9)


def test_rank_bracket_tables_identity_when_counts_match(rng):
    """Equal query/fit counts at the same alpha/beta: the map must be the
    identity gather (lo=rank, w=0) — the QDM fast-path invariant."""
    from skdownscale_tpu.models.grouped import rank_bracket_tables

    counts = np.array([40, 17, 1, 23])
    Lq = counts.max()
    q_pp = _padded_pp_from_counts(counts, Lq, 0.4, 0.4)
    rb = rank_bracket_tables(counts, q_pp, Lq, alpha=0.4, beta=0.4)
    for g, n in enumerate(counts):
        lo = rb["lo_flat"].reshape(len(counts), Lq)[g, :n] - g * Lq
        npt.assert_array_equal(lo, np.arange(n))
        npt.assert_allclose(rb["w0"][g, :n], 0.0, atol=1e-15)
        assert not rb["below"][g, :n].any() and not rb["above"][g, :n].any()
