"""ARRM tests: breakpoint-search parity with the reference + fit quality.

The reference's ``PiecewiseLinearRegression`` requires pwlf (absent here;
``arrm.py:138`` raises), so class-level golden comparison is impossible —
but ``arrm_breakpoints`` itself is pure numpy and is compared exactly.
"""

import numpy as np
import numpy.testing as npt
import pytest

from skdownscale_tpu.models.arrm import PiecewiseLinearRegression, arrm_breakpoints


@pytest.mark.parametrize("n", [200, 500, 1001])
@pytest.mark.parametrize("max_breakpoints", [4, 6, 7])
def test_arrm_breakpoints_golden(skref, rng, n, max_breakpoints):
    from skdownscale.pointwise_models.arrm import arrm_breakpoints as ref_bp

    X = rng.normal(10, 3, (n, 1))
    y = 2 * np.abs(X[:, 0] - 10) + rng.normal(0, 1, n)
    ref = ref_bp(X.copy(), y.copy(), 0.05, max_breakpoints)
    ours = arrm_breakpoints(X, y, 0.05, max_breakpoints)
    npt.assert_allclose(ours, ref, rtol=1e-12)


def piecewise_truth(x):
    return np.where(x < 0, -1.0 * x, np.where(x < 5, 2.0 * x, 10 + 0.5 * (x - 5)))


@pytest.mark.parametrize("fit_option", ["auto", "fast", "arrm"])
def test_piecewise_fit_quality(rng, fit_option):
    x = rng.uniform(-10, 15, 600)
    y = piecewise_truth(x) + rng.normal(0, 0.3, 600)
    m = PiecewiseLinearRegression(n_segments=6, fit_option=fit_option).fit(x.reshape(-1, 1), y)
    pred = m.predict(x.reshape(-1, 1))
    res_rmse = np.sqrt(np.mean((pred - y) ** 2))
    # a single straight line leaves ~5x the noise; segments must get close to it
    assert res_rmse < 1.0, f"{fit_option}: rmse {res_rmse}"
    assert m.fit_breaks_[0] == pytest.approx(x.min())
    assert m.fit_breaks_[-1] == pytest.approx(x.max())


def test_piecewise_bad_option(rng):
    x = rng.normal(size=(50, 1))
    with pytest.raises(ValueError, match="fit_option"):
        PiecewiseLinearRegression(fit_option="bogus").fit(x, x[:, 0])


def test_breakpoints_input_validation(rng):
    with pytest.raises(ValueError, match="same length"):
        arrm_breakpoints(rng.normal(size=(50, 1)), rng.normal(size=40), 0.05, 4)
    with pytest.raises(ValueError, match="1 feature"):
        arrm_breakpoints(rng.normal(size=(50, 2)), rng.normal(size=50), 0.05, 4)
