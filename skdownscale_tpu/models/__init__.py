from skdownscale_tpu.models import batched
from skdownscale_tpu.models.arrm import PiecewiseLinearRegression
from skdownscale_tpu.models.bcsd import BcsdPrecipitation, BcsdTemperature
from skdownscale_tpu.models.gard import AnalogRegression, PureAnalog, PureRegression
from skdownscale_tpu.models.groupers import DAY_GROUPER, MONTH_GROUPER, PaddedDOYGrouper
from skdownscale_tpu.models.grouping import GroupedRegressor
from skdownscale_tpu.models.mbc import MBCn
from skdownscale_tpu.models.quantile import (
    CunnaneTransformer,
    EquidistantCdfMatcher,
    QuantileMapper,
    QuantileMappingReressor,
    TrendAwareQuantileMappingRegressor,
)
from skdownscale_tpu.models.trend import LinearTrendTransformer
from skdownscale_tpu.models.zscore import ZScoreRegressor

__all__ = [
    "batched",
    "MBCn",
    "PiecewiseLinearRegression",
    "BcsdPrecipitation",
    "BcsdTemperature",
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
