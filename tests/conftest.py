"""Shared fixtures: one local SparkSession + the reference test frame.

The ``example`` frame ports the reference fixture verbatim
(reference tests/conftest.py:16–51): 10 rows, 2 groups (id 1×6, 2×4),
hourly timestamps, y/x1 float, x2 int, x3/x4 categorical; RandomState(42)
draw order y → x1 → x2 (FIXTURES.md F2). NaN variants inject nulls at
the reference's positions (x1 rows [1,2,4,7]; x2 rows [2,4,6]).
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest

from recipys_spark.ingredients import Ingredients
from recipys_spark.recipe import Recipe
from recipys_spark.sources.io import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(parallelism=4, app_name="recipys_spark_tests", shuffle_partitions=4)
    yield spark
    spark.stop()


def make_example_pdf(nan_x1: bool = False, nan_x2: bool = False) -> pd.DataFrame:
    rs = np.random.RandomState(42)
    y = rs.normal(size=10)
    x1 = rs.normal(loc=10, scale=5, size=10)
    x2 = rs.binomial(n=1, p=0.3, size=10).astype("float64")
    base = datetime.datetime(2020, 1, 1)
    hours = [0, 1, 2, 3, 4, 5, 0, 1, 2, 3]
    pdf = pd.DataFrame(
        {
            "id": [1] * 6 + [2] * 4,
            "time": [base + datetime.timedelta(hours=h) for h in hours],
            "y": y,
            "x1": x1,
            "x2": x2,
            "x3": list("abcacbcabc"),
            "x4": list("xyyxyyxxyx"),
        }
    )
    if nan_x1:
        pdf.loc[[1, 2, 4, 7], "x1"] = np.nan
    if nan_x2:
        pdf.loc[[2, 4, 6], "x2"] = np.nan
    return pdf


@pytest.fixture
def example_pdf() -> pd.DataFrame:
    return make_example_pdf()


@pytest.fixture
def example_df(spark):
    return spark.createDataFrame(make_example_pdf())


@pytest.fixture
def example_df_nan(spark):
    return spark.createDataFrame(make_example_pdf(nan_x1=True, nan_x2=True))


@pytest.fixture
def example_ingredients(example_df):
    return Ingredients(
        example_df,
        roles={
            "id": ["group"],
            "time": ["sequence"],
            "y": ["outcome"],
            "x1": ["predictor"],
            "x2": ["predictor"],
            "x3": ["predictor"],
            "x4": ["predictor"],
        },
    )


@pytest.fixture
def example_recipe(example_df):
    return Recipe(
        example_df,
        outcomes="y",
        predictors=["x1", "x2", "x3", "x4"],
        groups="id",
        sequences="time",
    )


@pytest.fixture
def example_recipe_nan(example_df_nan):
    return Recipe(
        example_df_nan,
        outcomes="y",
        predictors=["x1", "x2", "x3", "x4"],
        groups="id",
        sequences="time",
    )


def collect_sorted(df, keys=("id", "time")) -> pd.DataFrame:
    """Stable (group, sequence) ordering for comparisons (SURVEY.md §7)."""
    return (
        df.toPandas().sort_values(list(keys)).reset_index(drop=True)
    )
