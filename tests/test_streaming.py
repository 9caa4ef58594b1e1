"""Structured-Streaming operators: file-source replay of the transcript
table, compared against the batch equivalents."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from recipys_spark import Accumulator, Recipe
from recipys_spark.operators import StepHistorical, StepSessionize
from recipys_spark.selector import all_of
from recipys_spark.sources.io import synthetic_transcripts
from recipys_spark.streaming.session import (
    streaming_running_features,
    streaming_session_stats,
)


@pytest.fixture(scope="module")
def transcript_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "transcripts")
    synthetic_transcripts(spark, n_convs=40, skew=False, with_features=True).write.parquet(path)
    return path


def _run_stream(spark, stream_df, name, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def test_streaming_session_stats_matches_batch(spark, transcript_dir):
    batch = spark.read.parquet(transcript_dir)
    stream = spark.readStream.schema(batch.schema).parquet(transcript_dir)
    # complete mode so the trailing sessions (not yet past the
    # watermark when input ends) are emitted too; append mode would
    # hold them in state awaiting later data — correct for live
    # streams, but here we want the full comparison
    out = _run_stream(
        spark,
        streaming_session_stats(stream, gap="30 minutes"),
        "sess_stats",
        "complete",
    ).toPandas()

    # batch oracle: ts-gap sessionize then per-session count
    rec = Recipe(batch, groups="conv_id", sequences=["turn_idx", "ts"]).add_step(
        StepSessionize(gap="30m")
    )
    oracle = (
        rec.prep()
        .groupBy("conv_id", "session_id")
        .agg(F.count("*").alias("n_turns"))
        .toPandas()
    )
    # session_window splits on the same >gap rule; compare the multiset
    # of (conv_id, n_turns) session sizes
    got = sorted(zip(out.conv_id, out.n_turns))
    exp = sorted(zip(oracle.conv_id, oracle.n_turns))
    assert got == exp


def test_streaming_running_features_matches_batch(spark, transcript_dir):
    batch = spark.read.parquet(transcript_dir)
    stream = spark.readStream.schema(batch.schema).parquet(transcript_dir).select(
        "conv_id", "turn_idx", "value"
    )
    out = (
        _run_stream(spark, streaming_running_features(stream), "run_feats", "append")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    rec = Recipe(
        batch, predictors=["value"], groups="conv_id", sequences="turn_idx"
    ).add_step(StepHistorical(sel=all_of(["value"]), fun=Accumulator.MEAN))
    rec.add_step(StepHistorical(sel=all_of(["value"]), fun=Accumulator.MAX))
    rec.add_step(StepHistorical(sel=all_of(["value"]), fun=Accumulator.COUNT))
    oracle = (
        rec.prep()
        .select("conv_id", "turn_idx", "value_mean", "value_max", "value_count")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(out) == len(oracle)
    np.testing.assert_allclose(
        out.value_mean.to_numpy(dtype=float),
        oracle.value_mean.to_numpy(dtype=float),
        equal_nan=True,
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        out.value_max.to_numpy(dtype=float),
        oracle.value_max.to_numpy(dtype=float),
        equal_nan=True,
    )
    np.testing.assert_array_equal(
        out.value_count.to_numpy(), oracle.value_count.to_numpy()
    )
