"""range_join: bucketed interval join vs brute-force oracle."""

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from recipys_spark.operators.rangejoin import range_join

T0 = datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def points(spark):
    rs = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "pid": range(400),
            "key": rs.randint(0, 5, 400),
            "ts": [T0 + timedelta(minutes=int(m)) for m in rs.randint(0, 7 * 1440, 400)],
        }
    )
    return spark.createDataFrame(pdf).cache()


@pytest.fixture(scope="module")
def intervals(spark):
    rs = np.random.RandomState(4)
    starts = rs.randint(0, 7 * 1440, 60)
    lengths = rs.randint(1, 600, 60)  # 1 min .. 10 h — spans bucket edges
    pdf = pd.DataFrame(
        {
            "iid": range(60),
            "key": rs.randint(0, 5, 60),
            "start": [T0 + timedelta(minutes=int(s)) for s in starts],
            "end": [
                T0 + timedelta(minutes=int(s + l)) for s, l in zip(starts, lengths)
            ],
        }
    )
    return spark.createDataFrame(pdf).cache()


def _brute(points, intervals, keyed):
    p = points.toPandas()
    i = intervals.toPandas()
    out = p.merge(i, how="cross" if not keyed else "inner",
                  on=None if not keyed else "key",
                  suffixes=("", "_r"))
    out = out[(out.ts >= out.start) & (out.ts < out.end)]
    return sorted(zip(out.pid, out.iid))


@pytest.mark.parametrize("bucket", ["15m", "1h", "1d"])
def test_range_join_matches_brute(spark, points, intervals, bucket):
    got = range_join(
        points, intervals.drop("key"), left_ts="ts", bucket=bucket
    ).toPandas()
    assert sorted(zip(got.pid, got.iid)) == _brute(points, intervals, keyed=False)


def test_range_join_keyed(spark, points, intervals):
    got = range_join(points, intervals, on=["key"], bucket="1h").toPandas()
    assert sorted(zip(got.pid, got.iid)) == _brute(points, intervals, keyed=True)


def test_range_join_left_keeps_unmatched(spark, points, intervals):
    inner = range_join(points, intervals, on=["key"], bucket="1h").toPandas()
    left = range_join(points, intervals, on=["key"], bucket="1h", how="left").toPandas()
    # every point appears at least once; unmatched carry null iid
    assert set(left.pid) == set(points.toPandas().pid)
    matched = left[left.iid.notna()]
    assert sorted(zip(matched.pid, matched.iid.astype(int))) == sorted(
        zip(inner.pid, inner.iid)
    )
    assert left[left.iid.isna()].start.isna().all()


def test_range_join_end_exclusive_and_edges(spark):
    p = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [0, 1, 2],
                "ts": [
                    T0,                          # == start: included
                    T0 + timedelta(hours=2),     # == end: excluded
                    T0 + timedelta(hours=1),     # interior, bucket edge
                ],
            }
        )
    )
    i = spark.createDataFrame(
        pd.DataFrame({"iid": [0], "start": [T0], "end": [T0 + timedelta(hours=2)]})
    )
    got = range_join(p, i, bucket="1h").toPandas()
    assert sorted(got.pid) == [0, 2]


def test_range_join_plan_is_hash_join(spark, points, intervals):
    plan = range_join(points, intervals, on=["key"], bucket="1h")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_rejects_ambiguous_and_bad_args(spark, points, intervals):
    with pytest.raises(ValueError, match="ambiguous"):
        range_join(points, intervals, on=None, bucket="1h")  # 'key' on both sides
    with pytest.raises(ValueError, match="how"):
        range_join(points, intervals.drop("key"), how="outer")


def test_range_join_subsecond_end_timestamps(spark):
    """Regression: an interval ending 0.5s into a bucket must still
    match points in that bucket (unix_timestamp truncation previously
    dropped the last covering bucket)."""
    from datetime import timedelta

    p = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [0, 1],
                "ts": [
                    T0 + timedelta(minutes=60, microseconds=200_000),  # 10:00:00.2
                    T0 + timedelta(minutes=60, microseconds=700_000),  # past end
                ],
            }
        )
    )
    i = spark.createDataFrame(
        pd.DataFrame(
            {
                "iid": [0],
                "start": [T0 + timedelta(minutes=59, seconds=30)],
                "end": [T0 + timedelta(minutes=60, microseconds=500_000)],
            }
        )
    )
    got = range_join(p, i, bucket="1m").toPandas()
    assert sorted(got.pid) == [0]
