"""Port of the reference's smoke/analytic test battery
(``test_pointwise_models.py``): fit+predict over the model-config matrix,
GARD threshold behaviors, multi-feature inputs, DOY grouper membership,
and analytic EDCDFm/zscore/trend checks."""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import skdownscale_tpu as sdt


@pytest.fixture(scope="module")
def sample_X_y():
    n = 365
    index = pd.date_range("2019-01-01", periods=n)
    rng = np.random.default_rng(0)
    X = pd.DataFrame(
        {"foo": np.sin(np.linspace(-10 * np.pi, 10 * np.pi, n)) * 10, "bar": rng.random(n)},
        index=index,
    )
    y = X["foo"] + 2
    return X, y


# model-config matrix (test_pointwise_models.py:111-141)
LINEAR_MODELS = [
    sdt.BcsdTemperature(),
    sdt.PureAnalog(),
    sdt.AnalogRegression(),
    sdt.PureRegression(),
    sdt.ZScoreRegressor(),
    sdt.QuantileMappingReressor(),
    sdt.QuantileMappingReressor(extrapolate="min"),
    sdt.QuantileMappingReressor(extrapolate="max"),
    sdt.QuantileMappingReressor(extrapolate="both"),
    sdt.QuantileMappingReressor(extrapolate="1to1"),
    sdt.EquidistantCdfMatcher(),
    sdt.EquidistantCdfMatcher(extrapolate="min"),
    sdt.EquidistantCdfMatcher(extrapolate="max"),
    sdt.EquidistantCdfMatcher(extrapolate="both"),
    sdt.EquidistantCdfMatcher(extrapolate="1to1"),
]


@pytest.mark.parametrize("model", LINEAR_MODELS, ids=lambda m: repr(m)[:50])
def test_linear_model(model):
    n = 365
    index = pd.date_range("2019-01-01", periods=n)
    X = pd.DataFrame({"foo": np.sin(np.linspace(-10 * np.pi, 10 * np.pi, n)) * 10}, index=index)
    y = X + 2
    model.fit(X, y)
    y_hat = model.predict(X)
    assert len(y_hat) == len(X)


@pytest.mark.parametrize("model_cls", [sdt.PureAnalog, sdt.AnalogRegression, sdt.PureRegression])
def test_models_with_multiple_features(sample_X_y, model_cls):
    X, y = sample_X_y
    model = model_cls()
    model.fit(X, y)
    assert len(model.predict(X)) == len(X)


@pytest.mark.parametrize("kind", ["best_analog", "sample_analogs", "weight_analogs", "mean_analogs"])
def test_gard_analog_models(sample_X_y, kind):
    X, y = sample_X_y
    model = sdt.PureAnalog(kind=kind, n_analogs=3)
    model.fit(X, y)
    out = model.predict(X)
    assert len(out["exceedance_prob"]) == len(out["prediction_error"]) == len(out["pred"]) == len(X)
    assert (out["exceedance_prob"] == 1).all()

    model = sdt.PureAnalog(kind=kind, n_analogs=3, thresh=0)
    model.fit(X, y)
    out = model.predict(X)
    prob = out["exceedance_prob"]
    assert ((prob >= 0) & (prob <= 1)).all()


@pytest.mark.parametrize("thresh", [None, 3])
def test_gard_analog_regression_models(sample_X_y, thresh):
    X, y = sample_X_y
    model = sdt.AnalogRegression(thresh=thresh)
    model.fit(X, y)
    out = model.predict(X)
    prob = out["exceedance_prob"]
    assert len(out) == len(X)
    if thresh:
        assert ((prob >= 0) & (prob <= 1)).all()
    else:
        assert (prob == 1).all()


@pytest.mark.parametrize("thresh", [None, 3])
def test_gard_pure_regression_models(sample_X_y, thresh):
    X, y = sample_X_y
    model = sdt.PureRegression(thresh=thresh)
    model.fit(X, y)
    out = model.predict(X)
    prob = out["exceedance_prob"]
    if thresh:
        assert ((prob >= 0) & (prob <= 1)).all()
    else:
        assert (prob == 1).all()


def test_linear_model_prec(rng):
    n = 365
    index = pd.date_range("2019-01-01", periods=n)
    X = pd.DataFrame({"foo": rng.random(n)}, index=index)
    y = X + 2
    model = sdt.BcsdPrecipitation()
    model.fit(X, y)
    assert len(model.predict(X)) == len(X)


def test_paddeddoygrouper(rng):
    # membership of the iterator-flavour grouper (test_pointwise_models.py:302)
    index = pd.date_range(start="1980-01-01", end="1982-12-31")
    X = pd.DataFrame({"foo": rng.random(len(index))}, index=index)
    day_groups = sdt.PaddedDOYGrouper(X)
    doy_group_list = dict(list(day_groups))
    day_of_year = 123
    days_included = np.arange(day_of_year - 15, day_of_year + 16)
    npt.assert_array_equal(np.unique(doy_group_list[day_of_year].index.dayofyear), days_included)


def test_bcsd_temperature_nasanex(rng):
    index = pd.date_range(start="1980-01-01", end="1982-12-31")
    X = pd.DataFrame({"foo": rng.random(len(index))}, index=index)
    y = pd.DataFrame({"foo": rng.random(len(index))}, index=index)
    model = sdt.BcsdTemperature(time_grouper="daily_nasa-nex", return_anoms=False).fit(X, y)
    assert model._timestep_kind == "daily"
    assert len(model.predict(X)) == len(X)


def test_equidistant_cdf_matcher_exact():
    # exact delta/ratio preservation (test_pointwise_models.py:323-344)
    x = np.arange(1, 22).astype(float)
    projected_change = 2.0
    bias = 3.0
    X_train = pd.DataFrame(x)
    y_train = pd.DataFrame(x + bias)
    for kind in ["difference", "ratio"]:
        X_test = pd.DataFrame(x + projected_change if kind == "difference" else x * projected_change)
        m = sdt.EquidistantCdfMatcher(kind=kind)
        m.fit(X=X_train, y=y_train)
        y_test = m.predict(X_test)
        expected = (
            y_train.values + projected_change
            if kind == "difference"
            else y_train.values * projected_change
        )
        npt.assert_allclose(y_test.reshape(-1, 1), expected, rtol=1e-12)


def test_grouped_regressor(rng):
    # model of the reference's test_grouping.py
    from sklearn.linear_model import LinearRegression

    index = pd.date_range("2000-01-01", periods=730)
    X = pd.DataFrame({"x": rng.normal(size=730)}, index=index)
    y = pd.DataFrame({"y": 2 * X["x"] + 1 + rng.normal(0, 0.01, 730)}, index=index)
    gr = sdt.GroupedRegressor(
        estimator=LinearRegression,
        fit_grouper=sdt.models.grouping.PaddedDOYGrouper,
        predict_grouper=lambda x: x.dayofyear,
        fit_grouper_kwargs={"window": 5},
    )
    gr.fit(X, y)
    pred = gr.predict(X)
    assert pred.shape == (730, 1)
    npt.assert_allclose(pred[:, 0], y["y"].to_numpy(), atol=0.1)
