"""scikit-downscale-tpu: TPU-native statistical downscaling.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
pangeo-data/scikit-downscale: the reference's object-per-grid-cell execution
model is inverted into batched functional kernels vmapped over cells and
sharded over a TPU mesh.  The public estimator API mirrors the reference
(``/root/reference/skdownscale/pointwise_models/__init__.py:17-36``).
"""

from skdownscale_tpu.models.quantile import (
    CunnaneTransformer,
    EquidistantCdfMatcher,
    QuantileMapper,
    QuantileMappingReressor,
    TrendAwareQuantileMappingRegressor,
)
from skdownscale_tpu.models.trend import LinearTrendTransformer

__version__ = "0.1.0"

__all__ = [
    "CunnaneTransformer",
    "EquidistantCdfMatcher",
    "QuantileMapper",
    "QuantileMappingReressor",
    "TrendAwareQuantileMappingRegressor",
    "LinearTrendTransformer",
]
