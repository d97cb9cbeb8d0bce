"""Migration shim: the reference's import path, one package swap away.

The reference is used as ``from skdownscale.pointwise_models import ...``
(``/root/reference/skdownscale/pointwise_models/__init__.py``); this module
lets existing code switch with a single top-level rename::

    from skdownscale_tpu.pointwise_models import BcsdTemperature, PointWiseDownscaler
"""

from skdownscale_tpu import (
    DAY_GROUPER,
    MONTH_GROUPER,
    AnalogRegression,
    BcsdPrecipitation,
    BcsdTemperature,
    CunnaneTransformer,
    EquidistantCdfMatcher,
    GroupedRegressor,
    LinearTrendTransformer,
    PaddedDOYGrouper,
    PiecewiseLinearRegression,
    PointWiseDownscaler,
    PureAnalog,
    PureRegression,
    QuantileMapper,
    QuantileMappingReressor,
    TrendAwareQuantileMappingRegressor,
    ZScoreRegressor,
)

__all__ = [
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
