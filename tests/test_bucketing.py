"""Bucketed co-located joins: same-bucketed tables join with NO
Exchange — the pay-shuffle-once pattern for repeated big joins."""

import pytest
from pyspark.sql import functions as F

from recipys_spark.sources.io import synthetic_transcripts, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    df = synthetic_transcripts(spark, n_convs=200, skew=False, with_features=True)
    feats = df.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"), F.avg("value").alias("avg_value")
    )
    write_bucketed(df, "t_transcripts", "conv_id", n_buckets=8)
    write_bucketed(feats, "t_feats", "conv_id", n_buckets=8)

    a = spark.table("t_transcripts")
    b = spark.table("t_feats")
    joined = a.join(b, "conv_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() == df.count()

    # control: the same join from plain (unbucketed) parquet shuffles
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    df.write.parquet(p1)
    feats.write.parquet(p2)
    plain = spark.read.parquet(p1).join(spark.read.parquet(p2), "conv_id")
    plan2 = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan2

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS t_transcripts")
    spark.sql("DROP TABLE IF EXISTS t_feats")
