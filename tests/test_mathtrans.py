"""Native log1p / PolynomialFeatures / PowerTransformer steps vs
driver-computed numpy oracles (the reference reaches these through
StepSklearn — reference tests/test_steps.py:406–440)."""

import numpy as np
import pandas as pd
import pytest

from recipys_spark import Recipe
from recipys_spark.operators import (
    StepLog1p,
    StepPolynomialFeatures,
    StepPowerTransform,
)
from recipys_spark.operators.mathtrans import (
    _yj_numpy,
    fit_yeo_johnson_lambda,
    yeo_johnson_expr,
)
from recipys_spark.selector import all_of


@pytest.fixture
def pdf():
    rng = np.random.RandomState(11)
    return pd.DataFrame(
        {
            "id": np.arange(60),
            "x1": rng.uniform(0.0, 30.0, 60),
            "x2": rng.normal(4.0, 2.0, 60),
        }
    )


def test_log1p_in_place(spark, pdf):
    rec = Recipe(spark.createDataFrame(pdf), predictors=["x1"]).add_step(
        StepLog1p(sel=all_of(["x1"]))
    )
    got = rec.prep().orderBy("id").toPandas()
    # JVM Math.log1p vs C libm log1p: 1-ulp differences expected
    np.testing.assert_allclose(
        got["x1"].to_numpy(), np.log1p(pdf["x1"].to_numpy()), rtol=1e-15
    )
    np.testing.assert_array_equal(got["x2"].to_numpy(), pdf["x2"].to_numpy())


def test_log1p_new_column(spark, pdf):
    rec = Recipe(spark.createDataFrame(pdf), predictors=["x1"]).add_step(
        StepLog1p(sel=all_of(["x1"]), in_place=False)
    )
    got = rec.prep().orderBy("id").toPandas()
    assert "x1_log1p" in got.columns
    np.testing.assert_allclose(
        got["x1_log1p"].to_numpy(), np.log1p(pdf["x1"].to_numpy()), rtol=1e-15
    )


def test_polynomial_degree2_sklearn_order(spark, pdf):
    """degree=2 over (x1, x2) → [x1, x2, x1², x1x2, x2²] named
    PolynomialFeatures_1..5 (sklearn column order, reference naming)."""
    rec = Recipe(spark.createDataFrame(pdf), predictors=["x1", "x2"]).add_step(
        StepPolynomialFeatures(sel=all_of(["x1", "x2"]), degree=2)
    )
    got = rec.prep().orderBy("id").toPandas()
    x1, x2 = pdf["x1"].to_numpy(), pdf["x2"].to_numpy()
    oracle = [x1, x2, x1 * x1, x1 * x2, x2 * x2]
    for i, exp in enumerate(oracle, start=1):
        np.testing.assert_array_equal(
            got[f"PolynomialFeatures_{i}"].to_numpy(), exp, err_msg=str(i)
        )
    assert f"PolynomialFeatures_6" not in got.columns


def test_polynomial_interaction_only_and_bias(spark, pdf):
    rec = Recipe(spark.createDataFrame(pdf), predictors=["x1", "x2"]).add_step(
        StepPolynomialFeatures(
            sel=all_of(["x1", "x2"]),
            degree=2,
            interaction_only=True,
            include_bias=True,
        )
    )
    got = rec.prep().orderBy("id").toPandas()
    # [1, x1, x2, x1x2]
    np.testing.assert_array_equal(got["PolynomialFeatures_1"].to_numpy(), 1.0)
    np.testing.assert_array_equal(
        got["PolynomialFeatures_4"].to_numpy(),
        pdf["x1"].to_numpy() * pdf["x2"].to_numpy(),
    )
    assert "PolynomialFeatures_5" not in got.columns


@pytest.mark.parametrize("lmbda", [0.0, 0.5, 1.0, 2.0, -0.3])
def test_yeo_johnson_expr_matches_numpy(spark, lmbda):
    x = np.linspace(-5, 5, 41)
    df = spark.createDataFrame(pd.DataFrame({"i": np.arange(len(x)), "x": x}))
    from pyspark.sql import functions as F

    got = (
        df.select("i", yeo_johnson_expr(F.col("x"), lmbda).alias("y"))
        .orderBy("i")
        .toPandas()["y"]
        .to_numpy()
    )
    np.testing.assert_allclose(got, _yj_numpy(x, lmbda), rtol=1e-12)


def _inverse_yj(z, lmbda):
    out = np.empty_like(z, dtype=float)
    pos = z >= 0
    if abs(lmbda) < 1e-12:
        out[pos] = np.expm1(z[pos])
    else:
        out[pos] = (z[pos] * lmbda + 1.0) ** (1.0 / lmbda) - 1.0
    if abs(lmbda - 2.0) < 1e-12:
        out[~pos] = -np.expm1(-z[~pos])
    else:
        out[~pos] = 1.0 - (1.0 - z[~pos] * (2.0 - lmbda)) ** (1.0 / (2.0 - lmbda))
    return out


@pytest.mark.parametrize("true_lmbda", [0.3, 1.5])
def test_power_transform_recovers_lambda(true_lmbda):
    rng = np.random.RandomState(5)
    z = rng.normal(0, 0.4, 5000)
    x = _inverse_yj(z, true_lmbda)
    fitted = fit_yeo_johnson_lambda(x)
    assert abs(fitted - true_lmbda) < 0.15, fitted


def test_power_transform_standardizes(spark):
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {"id": np.arange(2000), "x1": rng.lognormal(1.0, 0.7, 2000)}
    )
    df = spark.createDataFrame(pdf)
    rec = Recipe(df, predictors=["x1"]).add_step(
        StepPowerTransform(sel=all_of(["x1"]))
    )
    got = rec.prep().orderBy("id").toPandas()["x1"].to_numpy()
    assert abs(got.mean()) < 1e-9
    assert abs(got.std() - 1.0) < 1e-9
    # skewness should be tamed vs the raw lognormal
    raw = pdf["x1"].to_numpy()
    skew = lambda a: np.mean(((a - a.mean()) / a.std()) ** 3)
    assert abs(skew(got)) < abs(skew(raw)) / 3

    # prep ≡ bake with frozen lambda/mean/std
    baked = rec.bake(df).orderBy("id").toPandas()["x1"].to_numpy()
    np.testing.assert_array_equal(got, baked)


def _partition_of_unity_check(got, prefix, n_basis):
    cols = [f"{prefix}_{i}" for i in range(1, n_basis + 1)]
    total = sum(got[c].to_numpy() for c in cols)
    np.testing.assert_allclose(total, 1.0, atol=1e-12)
    for c in cols:
        v = got[c].to_numpy()
        assert (v >= -1e-12).all() and (v <= 1 + 1e-12).all()


@pytest.mark.parametrize("knots", ["uniform", "quantile"])
def test_spline_basis_properties_and_numpy_parity(spark, pdf, knots):
    from recipys_spark.operators import StepSpline
    from recipys_spark.operators.mathtrans import _bspline_numpy, _extend_knots

    step = StepSpline(sel=all_of(["x1"]), n_knots=5, degree=3, knots=knots)
    rec = Recipe(spark.createDataFrame(pdf), predictors=["x1"]).add_step(step)
    got = rec.prep().orderBy("id").toPandas()
    n_basis = step.n_basis
    assert n_basis == 7
    _partition_of_unity_check(got, "Spline", n_basis)

    # exact parity with the numpy mirror at the fitted knots
    ext = _extend_knots(step.state["x1"]["base_knots"], 3)
    oracle = _bspline_numpy(pdf["x1"].to_numpy(), ext, 3)
    for i in range(n_basis):
        np.testing.assert_allclose(
            got[f"Spline_{i+1}"].to_numpy(), oracle[i], atol=1e-12, err_msg=str(i)
        )


def test_spline_constant_extrapolation(spark, pdf):
    """Bake data outside the fitted range must clamp (constant
    extrapolation), not produce zeros/nulls."""
    from recipys_spark.operators import StepSpline

    import pandas as pd

    df = spark.createDataFrame(pdf)
    step = StepSpline(sel=all_of(["x1"]), n_knots=4, degree=2)
    rec = Recipe(df, predictors=["x1"]).add_step(step)
    rec.prep().count()

    lo, hi = (
        float(pdf["x1"].min()),
        float(pdf["x1"].max()),
    )
    out_of_range = pd.DataFrame(
        {"id": [0, 1, 2, 3], "x1": [-1e6, 1e6, lo, hi], "x2": [0.0] * 4}
    )
    got = rec.bake(spark.createDataFrame(out_of_range)).orderBy("id").toPandas()
    n_basis = step.n_basis
    _partition_of_unity_check(got, "Spline", n_basis)
    # constant extrapolation: extreme inputs == the boundary basis vector
    cols = [f"Spline_{i}" for i in range(1, n_basis + 1)]
    np.testing.assert_array_equal(
        got.loc[0, cols].to_numpy(float), got.loc[2, cols].to_numpy(float)
    )
    np.testing.assert_array_equal(
        got.loc[1, cols].to_numpy(float), got.loc[3, cols].to_numpy(float)
    )
