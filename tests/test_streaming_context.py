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


def test_trailing_whitespace_token_parity(spark, tmp_path):
    """Review fix: Spark trim() strips SPACES only; Python str.strip()
    also eats \\t\\n — 'hello\\n' counts 2 batch tokens and must count 2
    in the stream too or budgets drift."""
    import pandas as pd

    feed = str(tmp_path / "trail")
    pdf = pd.DataFrame(
        {
            "conv_id": ["t"] * 3,
            "turn_idx": [0, 1, 2],
            "text": ["hello\n", "a\tb ", "end"],
        }
    )
    batch = spark.createDataFrame(pdf)
    batch.write.parquet(feed)
    stream = spark.readStream.schema(batch.schema).parquet(feed)
    out = _run(
        spark,
        streaming_assemble_context(stream, budget=100, max_turns=8),
        "ctx_trail",
    )
    got = sorted(map(tuple, out.collect()))
    exp = sorted(
        (
            r["conv_id"],
            int(r["turn_idx"]),
            r["text"],
            r["context"],
            int(r["context_n_turns"]),
            int(r["context_n_tokens"]),
        )
        for r in assemble_context(batch, budget=100, max_turns=8)
        .select(
            "conv_id", "turn_idx", "text", "context",
            "context_n_turns", "context_n_tokens",
        )
        .collect()
    )
    assert got == exp


def test_multi_chunk_group_ordering(spark, tmp_path):
    """Review fix: a group larger than the Arrow batch size arrives as
    several chunks in arbitrary row order — the assembler must concat
    and sort ONCE, not per chunk."""
    import pandas as pd

    rng = __import__("random").Random(7)
    n = 60
    order = list(range(n))
    rng.shuffle(order)
    pdf = pd.DataFrame(
        {
            "conv_id": ["big"] * n,
            "turn_idx": order,  # shuffled row order in the file
            "text": [f"turn {i} words here" for i in order],
        }
    )
    feed = str(tmp_path / "chunks")
    batch = spark.createDataFrame(pdf).coalesce(1)
    batch.write.parquet(feed)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = spark.readStream.schema(batch.schema).parquet(feed)
        out = _run(
            spark,
            streaming_assemble_context(stream, budget=12, max_turns=4),
            "ctx_chunks",
        )
        got = sorted(map(tuple, out.collect()))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    exp = sorted(
        (
            r["conv_id"],
            int(r["turn_idx"]),
            r["text"],
            r["context"],
            int(r["context_n_turns"]),
            int(r["context_n_tokens"]),
        )
        for r in assemble_context(spark.createDataFrame(pdf), budget=12, max_turns=4)
        .select(
            "conv_id", "turn_idx", "text", "context",
            "context_n_turns", "context_n_tokens",
        )
        .collect()
    )
    assert got == exp
