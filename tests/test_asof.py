"""Point-in-time as-of join: correctness of both physical strategies,
tolerance handling, and the zero-leakage guarantee."""

import datetime

import numpy as np
import pandas as pd
import pytest

from recipys_spark import Recipe
from recipys_spark.operators import StepAsofJoin, asof_join


def _ts(h, m=0):
    return datetime.datetime(2020, 1, 1, h, m)


@pytest.fixture
def left_pdf():
    return pd.DataFrame(
        {
            "key": ["a", "a", "a", "b", "b"],
            "ts": [_ts(1), _ts(3), _ts(5), _ts(2), _ts(4)],
            "payload": [1, 2, 3, 4, 5],
        }
    )


@pytest.fixture
def right_pdf():
    return pd.DataFrame(
        {
            "key": ["a", "a", "b", "b", "c"],
            "fts": [_ts(0, 30), _ts(3), _ts(2, 30), _ts(3, 30), _ts(1)],
            "feat": [10.0, 20.0, 30.0, 40.0, 99.0],
        }
    )


def pandas_asof(left_pdf, right_pdf, tolerance=None):
    kw = {}
    if tolerance is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tolerance)
    return pd.merge_asof(
        left_pdf.sort_values("ts"),
        right_pdf.sort_values("fts").rename(columns={"fts": "ts"}),
        on="ts",
        by="key",
        direction="backward",
        **kw,
    ).sort_values(["key", "ts"]).reset_index(drop=True)


@pytest.mark.parametrize("strategy", ["union", "broadcast"])
def test_asof_matches_pandas(spark, left_pdf, right_pdf, strategy):
    got = (
        asof_join(
            spark.createDataFrame(left_pdf),
            spark.createDataFrame(right_pdf),
            on="key",
            left_ts="ts",
            right_ts="fts",
            strategy=strategy,
        )
        .toPandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    expected = pandas_asof(left_pdf, right_pdf)
    np.testing.assert_allclose(got["feat"].to_numpy(), expected["feat"].to_numpy(), equal_nan=True)
    assert list(got.columns) == ["key", "ts", "payload", "feat"]


@pytest.mark.parametrize("strategy", ["union", "broadcast"])
def test_asof_tolerance(spark, left_pdf, right_pdf, strategy):
    got = (
        asof_join(
            spark.createDataFrame(left_pdf),
            spark.createDataFrame(right_pdf),
            on="key",
            left_ts="ts",
            right_ts="fts",
            tolerance="1h",
            strategy=strategy,
        )
        .toPandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    expected = pandas_asof(left_pdf, right_pdf, tolerance=3600)
    np.testing.assert_allclose(got["feat"].to_numpy(), expected["feat"].to_numpy(), equal_nan=True)


def test_asof_inclusive_at_equal_ts(spark, left_pdf, right_pdf):
    """A right row AT the left ts must match (ts' <= ts)."""
    got = asof_join(
        spark.createDataFrame(left_pdf),
        spark.createDataFrame(right_pdf),
        on="key",
        left_ts="ts",
        right_ts="fts",
    ).toPandas()
    row = got[(got.key == "a") & (got.ts == _ts(3))]
    assert row["feat"].iloc[0] == 20.0


def test_asof_zero_leakage(spark, left_pdf, right_pdf):
    """No right row with ts' > ts can ever be matched: every matched
    feat must come from a right row at-or-before the left ts."""
    got = asof_join(
        spark.createDataFrame(left_pdf),
        spark.createDataFrame(right_pdf),
        on="key",
        left_ts="ts",
        right_ts="fts",
    ).toPandas()
    r = right_pdf.set_index("feat")["fts"].to_dict()
    for _, row in got.dropna(subset=["feat"]).iterrows():
        assert r[row["feat"]] <= row["ts"], f"leaked future feature: {row}"


def test_asof_no_match_is_null(spark, left_pdf, right_pdf):
    got = asof_join(
        spark.createDataFrame(left_pdf),
        spark.createDataFrame(right_pdf),
        on="key",
        left_ts="ts",
        right_ts="fts",
    ).toPandas()
    # left 'b'@2:00 precedes all right 'b' rows (first at 2:30)
    row = got[(got.key == "b") & (got.ts == _ts(2))]
    assert row["feat"].isna().all()


def test_step_asof_join(spark, left_pdf, right_pdf):
    rec = Recipe(
        spark.createDataFrame(left_pdf),
        predictors=["payload"],
        groups="key",
        sequences="ts",
    ).add_step(
        StepAsofJoin(spark.createDataFrame(right_pdf), right_ts="fts", suffix="_pit")
    )
    out = rec.prep()
    assert "feat_pit" in out.columns
    roles = rec.steps[0].new_column_roles()
    assert roles == {"feat_pit": "predictor"}
