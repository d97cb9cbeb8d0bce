from skdownscale_tpu.ops.cdf import Cdf, calc_extrapolated_cdf, plotting_positions
from skdownscale_tpu.ops.gather import take_rows
from skdownscale_tpu.ops.interp import (
    interp,
    interp_padded,
    interp_ramp,
    interp_rows,
    interp_rows_multi,
    interp_sortmerge,
    pad_table,
)
from skdownscale_tpu.ops.knn import knn
from skdownscale_tpu.ops.ranks import self_quantiles
from skdownscale_tpu.ops.regression import (
    linreg_fit,
    linreg_predict,
    logistic_fit,
    logistic_predict_proba,
    ols_1d,
    ols_predict_1d,
    rmse,
)
from skdownscale_tpu.ops.rolling import (
    rolling_mean,
    rolling_mean_std,
    rolling_std,
    rolling_sum_count,
)

__all__ = [
    "Cdf",
    "calc_extrapolated_cdf",
    "plotting_positions",
    "take_rows",
    "interp",
    "interp_padded",
    "interp_ramp",
    "interp_rows",
    "interp_rows_multi",
    "interp_sortmerge",
    "pad_table",
    "knn",
    "self_quantiles",
    "linreg_fit",
    "linreg_predict",
    "logistic_fit",
    "logistic_predict_proba",
    "ols_1d",
    "ols_predict_1d",
    "rmse",
    "rolling_mean",
    "rolling_mean_std",
    "rolling_std",
    "rolling_sum_count",
]
