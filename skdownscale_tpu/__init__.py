"""scikit-downscale-tpu: TPU-native statistical downscaling.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
pangeo-data/scikit-downscale: the reference's object-per-grid-cell execution
model is inverted into batched functional kernels vmapped over cells and
sharded over a TPU mesh.  The public estimator API mirrors the reference
(``/root/reference/skdownscale/pointwise_models/__init__.py:17-36``).
"""

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
from skdownscale_tpu.pointwise import PointWiseDownscaler
from skdownscale_tpu import global_models, xlite
from skdownscale_tpu.global_models import (
    GlobalDownscaler,
    GlobalLinearRegressor,
    GlobalQuantileMapper,
)

__version__ = "0.1.0"

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
    "xlite",
    # beyond reference parity: the roadmap's unbuilt global_models component
    # (/root/reference/docs/roadmap.rst:59-65)
    "global_models",
    "GlobalDownscaler",
    "GlobalLinearRegressor",
    "GlobalQuantileMapper",
    # beyond reference parity: multivariate bias correction (Cannon 2018)
    "MBCn",
]
