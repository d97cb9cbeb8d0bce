"""Public API parity with the reference's export surface."""

REFERENCE_ALL = [
    "PiecewiseLinearRegression",
    "BcsdPrecipitation",
    "BcsdTemperature",
    "PointWiseDownscaler",
    "AnalogRegression",
    "PureAnalog",
    "PureRegression",
    "DAY_GROUPER",
    "MONTH_GROUPER",
    "PaddedDOYGrouper",
    "GroupedRegressor",
    "CunnaneTransformer",
    "EquidistantCdfMatcher",
    "QuantileMapper",
    "QuantileMappingReressor",
    "TrendAwareQuantileMappingRegressor",
    "LinearTrendTransformer",
    "ZScoreRegressor",
]


def test_all_reference_names_exported(skref):
    import skdownscale_tpu as sdt

    # the reference's __all__ (pointwise_models/__init__.py:17-36)
    assert set(REFERENCE_ALL) == set(skref.__all__)
    for name in skref.__all__:
        assert hasattr(sdt, name), f"missing public name {name}"


def test_migration_shim():
    from skdownscale_tpu import pointwise_models as pm

    for name in REFERENCE_ALL:
        assert hasattr(pm, name)


def test_constructor_signatures_match(skref):
    """Constructor parameter names are a superset of the reference's
    (additive params like random_state are allowed)."""
    import inspect

    import skdownscale_tpu as sdt

    for name in REFERENCE_ALL:
        ref_obj = getattr(skref, name)
        our_obj = getattr(sdt, name)
        if not (inspect.isclass(ref_obj) and hasattr(ref_obj, "__init__")):
            continue
        if name == "PiecewiseLinearRegression":
            continue  # reference constructor raises without pwlf
        ref_params = set(inspect.signature(ref_obj.__init__).parameters) - {"self"}
        our_params = set(inspect.signature(our_obj.__init__).parameters) - {"self"}
        missing = ref_params - our_params
        assert not missing, f"{name} missing constructor params: {missing}"


def test_sklearn_skip_tag_parity():
    """The shipped estimators carry the reference-style blanket ``_skip_test``
    tag (so ``check_estimator`` on user code behaves like the reference's).
    The battery itself is EXECUTED for real in tests/test_sklearn_checks.py,
    which bypasses this tag and xfails only named incompatible checks."""
    import skdownscale_tpu as sdt
    from sklearn.utils._tags import get_tags

    estimators = [
        sdt.AnalogRegression(),
        sdt.BcsdPrecipitation(),
        sdt.BcsdTemperature(),
        sdt.PureAnalog(),
        sdt.PureRegression(),
        sdt.ZScoreRegressor(),
        sdt.QuantileMappingReressor(n_endpoints=2),
        sdt.EquidistantCdfMatcher(kind="difference", n_endpoints=2),
        sdt.EquidistantCdfMatcher(kind="ratio", n_endpoints=2),
        sdt.LinearTrendTransformer(),
        sdt.CunnaneTransformer(),
        sdt.QuantileMapper(),
    ]
    for est in estimators:
        assert get_tags(est)._skip_test  # opt-out, like the reference's tags
