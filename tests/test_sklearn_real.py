"""Real-scikit-learn integration surface for StepSklearn.

This sandbox has no sklearn, so the escape hatch is normally exercised
against protocol doubles (tests/test_sklearn_compat.py). This module
is the conditional CI surface (VERDICT r4 #6): wherever sklearn IS
installed, it runs StepSklearn against actual transformers and asserts
parity with (a) the native steps and (b) a driver-side application of
the same fitted object — the contract of the reference's sklearn tests
(reference tests/test_steps.py:239–440). Here it skips cleanly.
"""

import numpy as np
import pandas as pd
import pytest

sklearn = pytest.importorskip(
    "sklearn", reason="scikit-learn not installed (sandbox); module "
    "activates automatically wherever it is"
)

from recipys_spark import Recipe  # noqa: E402
from recipys_spark.operators import (  # noqa: E402
    StepOrdinalEncode,
    StepScale,
    StepSklearn,
)
from recipys_spark.selector import all_of  # noqa: E402


@pytest.fixture
def pdf():
    rng = np.random.RandomState(11)
    d = pd.DataFrame(
        {
            "id": np.arange(60),
            "x1": rng.normal(5, 2, 60),
            "x2": rng.uniform(-3, 3, 60),
            "cat": rng.choice(["red", "green", "blue"], 60),
        }
    )
    d.loc[[4, 17, 31], "x1"] = np.nan
    return d


def _baked(spark, pdf, step, cols):
    df = spark.createDataFrame(pdf)
    rec = Recipe(df, predictors=cols).add_step(step)
    return rec.prep().orderBy("id").toPandas()


def test_real_standard_scaler_matches_native_step(spark, pdf):
    """sklearn.StandardScaler through the hatch ≡ native StepScale
    (both use the population std, ddof=0)."""
    from sklearn.preprocessing import StandardScaler

    hatch = _baked(
        spark, pdf, StepSklearn(StandardScaler(), sel=all_of(["x2"])), ["x2"]
    )
    native = _baked(spark, pdf, StepScale(sel=all_of(["x2"])), ["x2"])
    np.testing.assert_allclose(
        hatch["x2"].to_numpy(), native["x2"].to_numpy(), rtol=1e-9
    )


def test_real_ordinal_encoder_matches_native_step(spark, pdf):
    """sklearn.OrdinalEncoder ≡ native StepOrdinalEncode (both assign
    codes by lexicographic category order)."""
    from sklearn.preprocessing import OrdinalEncoder

    hatch = _baked(
        spark, pdf, StepSklearn(OrdinalEncoder(), sel=all_of(["cat"])), ["cat"]
    )
    native = _baked(spark, pdf, StepOrdinalEncode(sel=all_of(["cat"])), ["cat"])
    np.testing.assert_array_equal(
        hatch["cat"].to_numpy().astype(float),
        native["cat"].to_numpy().astype(float),
    )


def test_real_knn_imputer_matches_driver_side(spark, pdf):
    """KNNImputer has no native analog (escape-hatch-only per SURVEY
    §2): the hatch's distributed mapInPandas transform must equal the
    fitted object applied driver-side to the same rows (KNN neighbors
    come from the FIT table, so batch boundaries cannot change
    results)."""
    from sklearn.impute import KNNImputer

    cols = ["x1", "x2"]
    hatch = _baked(
        spark, pdf, StepSklearn(KNNImputer(n_neighbors=3), sel=all_of(cols)), cols
    )
    oracle = KNNImputer(n_neighbors=3).fit(pdf[cols])
    expected = oracle.transform(pdf.sort_values("id")[cols])
    got = hatch[cols].to_numpy()
    assert not np.isnan(got).any()
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_real_simple_imputer_prep_equals_bake(spark, pdf):
    """Fit-state freeze: bake on new data reuses the PREP-fitted
    statistics (the reference's train-vs-apply separation)."""
    from sklearn.impute import SimpleImputer

    df = spark.createDataFrame(pdf)
    step = StepSklearn(SimpleImputer(strategy="mean"), sel=all_of(["x1"]))
    rec = Recipe(df, predictors=["x1"]).add_step(step)
    rec.prep()
    fit_mean = float(step.fitted.statistics_[0])
    # bake on a shifted frame: imputed values must use the PREP mean
    shifted = pdf.copy()
    shifted["x1"] = shifted["x1"] + 100.0
    baked = rec.bake(spark.createDataFrame(shifted)).orderBy("id").toPandas()
    nan_rows = pdf["x1"].isna().to_numpy()
    np.testing.assert_allclose(
        baked.loc[nan_rows, "x1"].to_numpy(), fit_mean, rtol=1e-9
    )
