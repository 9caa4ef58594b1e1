"""StepSklearn escape hatch, exercised via sklearn-protocol test
doubles (sklearn itself is not installed in this sandbox; the hatch is
duck-typed, so real sklearn transformers take the identical code path).

Mirrors the reference's sklearn-step surface: fit/transform round-trip
(reference tests/test_steps.py:239–267), misuse errors (442–483), plus
the engine's own determinism rule for sampled fits.
"""

import numpy as np
import pandas as pd
import pytest

from recipys_spark import Recipe
from recipys_spark.operators import StepSklearn
from recipys_spark.selector import all_of


def _doubles():
    class MeanImputerDouble:
        """SimpleImputer(strategy='mean') double: 2-D fit/transform."""

        def fit(self, X):
            self.means_ = np.nanmean(np.asarray(X, dtype=float), axis=0)
            return self

        def transform(self, X):
            a = np.asarray(X, dtype=float).copy()
            idx = np.where(np.isnan(a))
            a[idx] = np.take(self.means_, idx[1])
            return a

    class OneDOnlyDouble:
        """LabelEncoder-style double: rejects 2-D input (exercises the
        columnwise 1-D fallback)."""

        def fit(self, X):
            a = np.asarray(X)
            if a.ndim != 1:
                raise ValueError("expected 1-D input")
            self.mx_ = float(np.nanmax(a.astype(float)))
            return self

        def transform(self, X):
            a = np.asarray(X)
            if a.ndim != 1:
                raise ValueError("expected 1-D input")
            return a.astype(float) / self.mx_

    class DimExpanderDouble:
        def fit(self, X):
            return self

        def transform(self, X):
            a = np.asarray(X, dtype=float)
            return np.hstack([a, a * a])

    class _FakeSparse:
        def __init__(self, a):
            self._a = a

        def toarray(self):
            return self._a

    class SparseOutputDouble:
        def fit(self, X):
            return self

        def transform(self, X):
            return _FakeSparse(np.asarray(X, dtype=float))

    return MeanImputerDouble, OneDOnlyDouble, DimExpanderDouble, SparseOutputDouble


MeanImputerDouble, OneDOnlyDouble, DimExpanderDouble, SparseOutputDouble = _doubles()


@pytest.fixture
def pdf():
    rng = np.random.RandomState(7)
    d = pd.DataFrame(
        {
            "id": np.arange(40),
            "x1": rng.normal(10, 5, 40),
            "x2": rng.uniform(1, 9, 40),
        }
    )
    d.loc[[3, 11, 27], "x1"] = np.nan
    return d


def test_sklearn_hatch_fit_transform(spark, pdf):
    rec = Recipe(spark.createDataFrame(pdf), predictors=["x1", "x2"]).add_step(
        StepSklearn(MeanImputerDouble(), sel=all_of(["x1", "x2"]))
    )
    got = rec.prep().orderBy("id").toPandas()
    oracle = MeanImputerDouble().fit(pdf[["x1", "x2"]]).transform(pdf[["x1", "x2"]])
    np.testing.assert_allclose(got[["x1", "x2"]].to_numpy(), oracle)
    assert not got["x1"].isna().any()


def test_sklearn_hatch_prep_equals_bake(spark, pdf):
    df = spark.createDataFrame(pdf)
    rec = Recipe(df, predictors=["x1", "x2"]).add_step(
        StepSklearn(MeanImputerDouble(), sel=all_of(["x1", "x2"]))
    )
    a = rec.prep().orderBy("id").toPandas()
    b = rec.bake(df).orderBy("id").toPandas()
    np.testing.assert_array_equal(a.to_numpy(), b.to_numpy())


def test_sklearn_hatch_columnwise_1d_fallback(spark, pdf):
    rec = Recipe(spark.createDataFrame(pdf), predictors=["x2"]).add_step(
        StepSklearn(
            OneDOnlyDouble(), sel=all_of(["x2"]), columnwise=True, in_place=False
        )
    )
    got = rec.prep().orderBy("id").toPandas()
    assert "OneDOnlyDouble_x2" in got.columns
    np.testing.assert_allclose(
        got["OneDOnlyDouble_x2"].to_numpy(),
        pdf["x2"].to_numpy() / pdf["x2"].max(),
    )


def test_sklearn_hatch_new_columns_one_indexed(spark, pdf):
    rec = Recipe(spark.createDataFrame(pdf), predictors=["x2"]).add_step(
        StepSklearn(DimExpanderDouble(), sel=all_of(["x2"]), in_place=False)
    )
    got = rec.prep().orderBy("id").toPandas()
    assert {"DimExpanderDouble_1", "DimExpanderDouble_2"} <= set(got.columns)
    np.testing.assert_allclose(
        got["DimExpanderDouble_2"].to_numpy(), pdf["x2"].to_numpy() ** 2
    )


def test_sklearn_hatch_dimensionality_error(spark, pdf):
    """in_place transform that changes arity must fail loudly
    (reference test_steps.py:442–483 misuse family)."""
    rec = Recipe(spark.createDataFrame(pdf), predictors=["x2"]).add_step(
        StepSklearn(DimExpanderDouble(), sel=all_of(["x2"]), in_place=True)
    )
    with pytest.raises(ValueError, match="dimensionality"):
        rec.prep()


def test_sklearn_hatch_sparse_rejected(spark, pdf):
    rec = Recipe(spark.createDataFrame(pdf), predictors=["x2"]).add_step(
        StepSklearn(SparseOutputDouble(), sel=all_of(["x2"]))
    )
    with pytest.raises(TypeError, match="Sparse"):
        rec.prep()


def test_sklearn_hatch_requires_fit_transform():
    with pytest.raises((TypeError, ImportError), match="fit/transform"):
        StepSklearn(object())


def test_sklearn_hatch_fit_sample_deterministic(spark, pdf):
    """The sampled fit must pick the SAME rows regardless of input
    partitioning (hash top-k, not limit)."""

    def fitted_means(n_parts):
        df = spark.createDataFrame(pdf).repartition(n_parts)
        step = StepSklearn(
            MeanImputerDouble(), sel=all_of(["x1", "x2"]), fit_sample_rows=15
        )
        Recipe(df, predictors=["x1", "x2"]).add_step(step).prep().count()
        return step.fitted.means_

    np.testing.assert_array_equal(fitted_means(1), fitted_means(13))


def test_sklearn_hatch_default_fit_is_bounded(spark, pdf):
    """VERDICT r4 #3: the DEFAULT fit plan must be a distributed
    TakeOrdered (bounded driver collect), never an unbounded
    full-table toPandas — at 10^12 rows the old default killed the
    driver. fit_sample_rows=None remains the explicit, warning opt-out
    reproducing the reference's whole-table fit (step.py:391)."""
    df = spark.createDataFrame(pdf)
    step = StepSklearn(MeanImputerDouble(), sel=all_of(["x1", "x2"]))
    assert step.fit_sample_rows == 1_000_000
    # AQE defers the physical TakeOrdered until execution; the bounded
    # collect is visible as a GlobalLimit in the optimized logical plan.
    # Use a parquet-backed frame: on a LocalRelation whose known row
    # count is under the cap the optimizer correctly ELIMINATES the
    # limit, which is fine — a scan's row count is unknown, so the
    # production path always keeps it
    scan = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = step._fit_frame(scan.select("value", "user_id"))._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit" in plan, plan
    # explicit opt-out: unbounded, but loudly
    unbounded = StepSklearn(
        MeanImputerDouble(), sel=all_of(["x1", "x2"]), fit_sample_rows=None
    )
    with pytest.warns(UserWarning, match="ENTIRE table"):
        uplan = unbounded._fit_frame(scan.select("value", "user_id"))
    assert "GlobalLimit" not in uplan._jdf.queryExecution().optimizedPlan().toString()
    # small tables: the 1M default cap is a no-op on the fitted values
    cap = Recipe(df, predictors=["x1", "x2"]).add_step(step)
    cap.prep().count()
    full_step = StepSklearn(
        MeanImputerDouble(), sel=all_of(["x1", "x2"]), fit_sample_rows=None
    )
    with pytest.warns(UserWarning):
        Recipe(df, predictors=["x1", "x2"]).add_step(full_step).prep().count()
    np.testing.assert_array_equal(step.fitted.means_, full_step.fitted.means_)
