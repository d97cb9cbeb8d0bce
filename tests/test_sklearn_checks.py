"""Executed sklearn estimator-check battery.

The reference's conformance test (``test_pointwise_models.py:34-53``) runs
``parametrize_with_checks`` over 12 estimator instances, but under
sklearn>=1.6 the blanket ``_skip_test`` tag every estimator carries reduces
the battery to ZERO executed checks.  This module goes further: the blanket
tag is bypassed (via trivial subclasses), every applicable check is
EXECUTED, and only the named checks that are genuinely incompatible are
expected-failed — each with a reference-grounded reason.
"""

from __future__ import annotations

import pytest

sklearn_checks = pytest.importorskip("sklearn.utils.estimator_checks")

import skdownscale_tpu as sdt  # noqa: E402


# -- battery subclasses: identical estimators minus the blanket skip tag
# (module-level so check_estimators_pickle can pickle them) ---------------
class AnalogRegression(sdt.AnalogRegression):
    _sklearn_skip_reason = None


class BcsdPrecipitation(sdt.BcsdPrecipitation):
    _sklearn_skip_reason = None


class BcsdTemperature(sdt.BcsdTemperature):
    _sklearn_skip_reason = None


class PureAnalog(sdt.PureAnalog):
    _sklearn_skip_reason = None


class PureRegression(sdt.PureRegression):
    _sklearn_skip_reason = None


class ZScoreRegressor(sdt.ZScoreRegressor):
    _sklearn_skip_reason = None


class QuantileMappingReressor(sdt.QuantileMappingReressor):
    _sklearn_skip_reason = None


class EquidistantCdfMatcher(sdt.EquidistantCdfMatcher):
    _sklearn_skip_reason = None


class LinearTrendTransformer(sdt.LinearTrendTransformer):
    _sklearn_skip_reason = None


class CunnaneTransformer(sdt.CunnaneTransformer):
    _sklearn_skip_reason = None


class QuantileMapper(sdt.QuantileMapper):
    _sklearn_skip_reason = None


ESTIMATORS = [
    AnalogRegression(),
    BcsdPrecipitation(),
    BcsdTemperature(),
    PureAnalog(),
    PureRegression(),
    ZScoreRegressor(),
    QuantileMappingReressor(n_endpoints=2),
    EquidistantCdfMatcher(kind="difference", n_endpoints=2),
    EquidistantCdfMatcher(kind="ratio", n_endpoints=2),
    LinearTrendTransformer(),
    CunnaneTransformer(),
    QuantileMapper(),
]


# -- expected-failure reasons ---------------------------------------------

ONE_FEATURE = (
    "only supports 1 feature; the sklearn battery feeds multi-feature X "
    "(the reference opts out wholesale for the same reason: "
    "quantile.py:394, bcsd.py:133-134)"
)
SERIES_1D = (
    "1-D X is deliberately accepted as a single-feature series, matching the "
    "reference's ensure_samples_features (utils.py:28-43)"
)
TEMPORAL = (
    "temporal estimator: sample order/subset carries meaning (the reference "
    "opts out wholesale with 'Temporal transformer - sample order matters')"
)
THREE_OUTPUTS = (
    "GARD predicts 3 columns ['pred','exceedance_prob','prediction_error'] "
    "(gard.py:133-134), not a 1-D y"
)

# checks that fail purely because sklearn generates multi-feature X and the
# estimator (like the reference's) is single-feature by contract
_ONE_FEATURE_COMMON = [
    "check_dict_unchanged",
    "check_dont_overwrite_parameters",
    "check_dtype_object",
    "check_estimators_dtypes",
    "check_estimators_fit_returns_self",
    "check_estimators_overwrite_params",
    "check_estimators_pickle",
    "check_f_contiguous_array_estimator",
    "check_fit2d_predict1d",
    "check_fit_check_is_fitted",
    "check_fit_idempotent",
    "check_fit_score_takes_y",
    "check_methods_sample_order_invariance",
    "check_methods_subset_invariance",
    "check_n_features_in",
    "check_n_features_in_after_fitting",
    "check_pipeline_consistency",
    "check_positive_only_tag_during_fit",
    "check_readonly_memmap_input",
]
_ONE_FEATURE_REGRESSOR = _ONE_FEATURE_COMMON + [
    "check_regressor_data_not_an_array",
    "check_regressors_int",
    "check_regressors_no_decision_function",
    "check_regressors_train",
    "check_supervised_y_2d",
]
_ONE_FEATURE_TRANSFORMER = _ONE_FEATURE_COMMON + [
    "check_transformer_data_not_an_array",
    "check_transformer_general",
    "check_transformer_preserve_dtypes",
    "check_fit2d_1sample",
]


def _one_feature_regressor(extra=()):
    d = {name: ONE_FEATURE for name in _ONE_FEATURE_REGRESSOR}
    d["check_fit1d"] = SERIES_1D
    d.update(extra)
    return d


def _one_feature_transformer():
    d = {name: ONE_FEATURE for name in _ONE_FEATURE_TRANSFORMER}
    d["check_fit1d"] = SERIES_1D
    return d


_GARD = {
    "check_fit1d": SERIES_1D,
    "check_regressors_train": THREE_OUTPUTS,
}

EXPECTED_FAILURES = {
    "AnalogRegression": _GARD,
    "PureAnalog": _GARD,
    "PureRegression": _GARD,
    "BcsdPrecipitation": _one_feature_regressor({"check_fit2d_1sample": ONE_FEATURE}),
    "BcsdTemperature": _one_feature_regressor({"check_fit2d_1sample": ONE_FEATURE}),
    "ZScoreRegressor": _one_feature_regressor({"check_fit2d_1sample": ONE_FEATURE}),
    "QuantileMappingReressor": _one_feature_regressor(),
    "EquidistantCdfMatcher": _one_feature_regressor(),
    "LinearTrendTransformer": {
        "check_fit1d": SERIES_1D,
        "check_methods_sample_order_invariance": TEMPORAL,
        "check_methods_subset_invariance": TEMPORAL,
    },
    "CunnaneTransformer": _one_feature_transformer(),
    "QuantileMapper": _one_feature_transformer(),
}


def _expected(est):
    return EXPECTED_FAILURES.get(type(est).__name__, {})


@sklearn_checks.parametrize_with_checks(ESTIMATORS, expected_failed_checks=_expected)
def test_sklearn_compatible_estimator(estimator, check):
    check(estimator)


def test_battery_executes_nonzero_checks():
    """Guard against the reference's failure mode: a battery that silently
    yields zero checks.  Each estimator must yield a meaningful number of
    executable checks once the blanket tag is lifted."""
    for est in ESTIMATORS:
        n = sum(
            1
            for _ in sklearn_checks.estimator_checks_generator(
                est, legacy=True, mark=None
            )
        )
        assert n >= 40, f"{type(est).__name__} yielded only {n} checks"
