"""Global (pooled-across-space) downscaling models.

The reference's roadmap names three components — ``pointwise_models``,
``global_models``, ``metrics`` — and implements only the first
(``/root/reference/docs/roadmap.rst:59-65``).  This subpackage builds the
second, TPU-first: pooled fits are cross-cell *reductions* over the device
mesh (all-reduced sufficient statistics, sketch-merged distributed
quantiles), where the pointwise zoo is embarrassingly parallel.
"""

from .downscaler import GlobalDownscaler
from .linear import GlobalLinearRegressor, global_linear_fit, global_linear_predict
from .quantile import GlobalQuantileMapper, pooled_quantile_table

__all__ = [
    "GlobalDownscaler",
    "GlobalLinearRegressor",
    "GlobalQuantileMapper",
    "global_linear_fit",
    "global_linear_predict",
    "pooled_quantile_table",
]
