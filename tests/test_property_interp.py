"""Property-based fuzzing of the interp strategies against np.interp.

Every interp strategy must agree with ``np.interp`` on arbitrary monotone
tables and arbitrary queries (in-range, out-of-range, exact knot hits, tied
knots) — these are the kernels everything else stands on.
"""

import numpy as np
import numpy.testing as npt
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from skdownscale_tpu.ops.interp import interp_ramp, interp_sortmerge
from skdownscale_tpu.ops.ranks import self_quantiles


@st.composite
def table_and_queries(draw):
    L = draw(st.integers(min_value=2, max_value=60))
    Q = draw(st.integers(min_value=1, max_value=40))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    quantize = draw(st.booleans())  # force ties
    rng = np.random.default_rng(seed)
    xp = np.sort(rng.normal(0, 5, L))
    if quantize:
        xp = np.round(xp)
        xp.sort()
    fp = np.cumsum(rng.uniform(0, 1, L))  # monotone
    mode = draw(st.sampled_from(["inrange", "wide", "knots"]))
    if mode == "inrange":
        q = rng.uniform(xp[0], xp[-1], Q)
    elif mode == "wide":
        q = rng.normal(0, 12, Q)
    else:  # exact knot hits
        q = rng.choice(xp, Q)
    return xp, fp, q


@settings(max_examples=120, deadline=None)
@given(table_and_queries())
def test_interp_ramp_matches_numpy(case):
    xp, fp, q = case
    got = np.asarray(interp_ramp(jnp.asarray(q), jnp.asarray(xp), jnp.asarray(fp)))
    npt.assert_allclose(got, np.interp(q, xp, fp), rtol=1e-9, atol=1e-9)


@settings(max_examples=120, deadline=None)
@given(table_and_queries())
def test_interp_sortmerge_matches_numpy(case):
    xp, fp, q = case
    got = np.asarray(
        interp_sortmerge(
            jnp.asarray(xp)[None], jnp.asarray(fp)[None], jnp.asarray(q)[None]
        )
    )[0]
    npt.assert_allclose(got, np.interp(q, xp, fp), rtol=1e-9, atol=1e-9)


@settings(max_examples=80, deadline=None)
@given(st.integers(min_value=2, max_value=80), st.integers(0, 2**31 - 1), st.booleans())
def test_self_quantiles_matches_numpy(n, seed, quantize):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 3, n)
    if quantize:
        x = np.round(x)  # ties
    pp = (np.arange(1, n + 1) - 0.4) / (n + 0.2)
    got = np.asarray(self_quantiles(jnp.asarray(x), jnp.asarray(pp)))
    expected = np.interp(x, np.sort(x), pp)
    npt.assert_allclose(got, expected, rtol=1e-12)
