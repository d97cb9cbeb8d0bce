from skdownscale_tpu.ops.cdf import Cdf, calc_extrapolated_cdf, plotting_positions
from skdownscale_tpu.ops.interp import interp, interp_padded, pad_table
from skdownscale_tpu.ops.regression import (
    linreg_fit,
    linreg_predict,
    logistic_fit,
    logistic_predict_proba,
    ols_1d,
    ols_predict_1d,
    rmse,
)

__all__ = [
    "Cdf",
    "calc_extrapolated_cdf",
    "plotting_positions",
    "interp",
    "interp_padded",
    "pad_table",
    "linreg_fit",
    "linreg_predict",
    "logistic_fit",
    "logistic_predict_proba",
    "ols_1d",
    "ols_predict_1d",
    "rmse",
]
