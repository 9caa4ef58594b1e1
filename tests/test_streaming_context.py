"""Streaming context assembly (streaming/context.py) vs the batch
operator: identical retention, identical NULL contract, state carried
across micro-batches, bounded state tail."""

import pytest
from pyspark.sql import functions as F

from recipys_spark.operators.transcripts import assemble_context
from recipys_spark.sources.io import synthetic_transcripts
from recipys_spark.streaming.context import streaming_assemble_context

BUDGET, MAX_TURNS = 30, 6


@pytest.fixture(scope="module")
def tr_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ctxstream") / "transcripts")
    synthetic_transcripts(spark, n_convs=40, skew=False).select(
        "conv_id", "turn_idx", "text"
    ).write.parquet(path)
    return path


def _batch_expected(spark, tr_dir):
    batch = spark.read.parquet(tr_dir)
    out = assemble_context(batch, budget=BUDGET, max_turns=MAX_TURNS)
    return sorted(
        (
            r["conv_id"],
            int(r["turn_idx"]),
            r["text"],
            r["context"],
            int(r["context_n_turns"]),
            int(r["context_n_tokens"]),
        )
        for r in out.select(
            "conv_id",
            "turn_idx",
            "text",
            "context",
            "context_n_turns",
            "context_n_tokens",
        ).collect()
    )


def _run(spark, stream, name):
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def test_stream_equals_batch_single_batch(spark, tr_dir):
    batch = spark.read.parquet(tr_dir)
    stream = spark.readStream.schema(batch.schema).parquet(tr_dir)
    out = _run(
        spark,
        streaming_assemble_context(stream, budget=BUDGET, max_turns=MAX_TURNS),
        "ctx_one",
    )
    got = sorted(map(tuple, out.collect()))
    assert got == _batch_expected(spark, tr_dir)


def test_stream_equals_batch_across_microbatches(spark, tr_dir, tmp_path):
    """State must carry the retained tail across micro-batches: turns
    0-2 arrive first, the rest later; contexts of the later turns reach
    back into the first batch's turns."""
    batch = spark.read.parquet(tr_dir)
    feed = str(tmp_path / "feed")
    batch.where(F.col("turn_idx") <= 2).write.parquet(feed)
    stream = spark.readStream.schema(batch.schema).parquet(feed)
    q = (
        streaming_assemble_context(stream, budget=BUDGET, max_turns=MAX_TURNS)
        .writeStream.format("memory")
        .queryName("ctx_inc")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        batch.where(F.col("turn_idx") > 2).write.mode("append").parquet(feed)
        q.processAllAvailable()
        got = sorted(map(tuple, spark.sql("select * from ctx_inc").collect()))
    finally:
        q.stop()
    assert got == _batch_expected(spark, tr_dir)


def test_stream_null_text_contract(spark, tmp_path):
    import pandas as pd

    feed = str(tmp_path / "nulls")
    pdf = pd.DataFrame(
        {
            "conv_id": ["n"] * 3,
            "turn_idx": [0, 1, 2],
            "text": ["alpha beta", None, "gamma"],
        }
    )
    batch = spark.createDataFrame(pdf)
    batch.write.parquet(feed)
    stream = spark.readStream.schema(batch.schema).parquet(feed)
    out = _run(
        spark,
        streaming_assemble_context(stream, budget=100, max_turns=8),
        "ctx_null",
    )
    rows = {r["turn_idx"]: r for r in out.collect()}
    assert rows[1]["context"] == "alpha beta"
    assert rows[2]["context"] == "alpha beta\n"  # NULL keeps its slot
    assert rows[2]["context_n_tokens"] == 2


def test_streaming_requires_finite_max_turns(spark, tr_dir):
    batch = spark.read.parquet(tr_dir)
    stream = spark.readStream.schema(batch.schema).parquet(tr_dir)
    with pytest.raises(ValueError, match="max_turns"):
        streaming_assemble_context(stream, budget=10, max_turns=None)
