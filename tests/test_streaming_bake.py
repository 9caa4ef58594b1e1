"""Recipe.bake_stream: batch-fit, stream-apply with frozen state.

The Structured-Streaming extension of the prep/bake leakage rule: state
is learned once on bounded data, then replayed over an unbounded feed.
Parity contract: a file-source replay of the SAME rows through
bake_stream must equal bake() bit-for-bit (identical JVM expressions,
identical fitted literals).
"""

import pytest
from pyspark.sql import functions as F

from recipys_spark import Accumulator, Recipe
from recipys_spark.operators import (
    StepHistorical,
    StepImputeFill,
    StepLog1p,
    StepOrdinalEncode,
    StepScale,
    StepTextFeatures,
)
from recipys_spark.selector import all_of
from recipys_spark.sources.io import synthetic_transcripts


@pytest.fixture(scope="module")
def tr_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bakestream") / "transcripts")
    synthetic_transcripts(
        spark, n_convs=60, skew=False, with_features=True
    ).write.parquet(path)
    return path


def _fitted_recipe(batch):
    rec = Recipe(
        batch,
        predictors=["value", "n_chars", "role", "text"],
        groups="conv_id",
        sequences=["turn_idx"],
    )
    rec.add_step(StepImputeFill(sel=all_of(["value"]), value=0.0))
    rec.add_step(StepScale(sel=all_of(["value"])))
    rec.add_step(StepLog1p(sel=all_of(["n_chars"])))
    rec.add_step(StepOrdinalEncode(sel=all_of(["role"])))
    rec.add_step(StepTextFeatures(sel=all_of(["text"])))
    rec.prep().count()  # fit eagerly
    return rec


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def test_stream_bake_equals_batch_bake(spark, tr_dir):
    batch = spark.read.parquet(tr_dir)
    rec = _fitted_recipe(batch)
    stream = spark.readStream.schema(batch.schema).parquet(tr_dir)
    out_stream = _run_stream(spark, rec.bake_stream(stream), "baked_stream")
    out_batch = rec.bake(batch)
    assert out_stream.schema == out_batch.schema
    key = ["conv_id", "turn_idx"]
    a = sorted(map(tuple, out_stream.collect()), key=lambda r: (r[0], r[1]))
    b = sorted(map(tuple, out_batch.collect()), key=lambda r: (r[0], r[1]))
    assert a == b  # bit-exact: same expressions, same fitted literals


def test_stream_bake_incremental_files(spark, tr_dir, tmp_path):
    """New files arriving after the first micro-batch are transformed
    with the SAME frozen state — no refit, no drift."""
    batch = spark.read.parquet(tr_dir)
    rec = _fitted_recipe(batch)
    feed = str(tmp_path / "feed")
    part1 = batch.where(F.col("conv_id") < "c000030")
    part2 = batch.where(F.col("conv_id") >= "c000030")
    part1.write.parquet(feed)
    stream = spark.readStream.schema(batch.schema).parquet(feed)
    q = (
        rec.bake_stream(stream)
        .writeStream.format("memory")
        .queryName("baked_inc")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("select count(*) n from baked_inc").first()["n"]
        part2.write.mode("append").parquet(feed)
        q.processAllAvailable()
        got = spark.sql("select * from baked_inc")
        n2 = got.count()
    finally:
        q.stop()
    assert n1 == part1.count() and n2 == batch.count()
    exp = sorted(map(tuple, rec.bake(batch).collect()))
    assert sorted(map(tuple, got.collect())) == exp


def test_stream_bake_rejects_batch_frame(spark, tr_dir):
    batch = spark.read.parquet(tr_dir)
    rec = _fitted_recipe(batch)
    with pytest.raises(ValueError, match="streaming DataFrame"):
        rec.bake_stream(batch)


def test_stream_bake_requires_fit(spark, tr_dir):
    batch = spark.read.parquet(tr_dir)
    rec = Recipe(batch, predictors=["value"]).add_step(
        StepScale(sel=all_of(["value"]))
    )
    stream = spark.readStream.schema(batch.schema).parquet(tr_dir)
    with pytest.raises(RuntimeError, match="prep"):
        rec.bake_stream(stream)


def test_stream_bake_rejects_windowed_steps(spark, tr_dir):
    batch = spark.read.parquet(tr_dir)
    rec = Recipe(
        batch, predictors=["value"], groups="conv_id", sequences=["turn_idx"]
    ).add_step(StepHistorical(sel=all_of(["value"]), fun=Accumulator.MEAN))
    rec.prep().count()
    stream = spark.readStream.schema(batch.schema).parquet(tr_dir)
    with pytest.raises(ValueError, match="StepHistorical"):
        rec.bake_stream(stream)


def test_stream_safe_depends_on_fill_strategy():
    assert StepImputeFill(sel=all_of(["v"]), value=7).stream_safe()
    assert StepImputeFill(sel=all_of(["v"]), strategy="zero").stream_safe()
    assert not StepImputeFill(sel=all_of(["v"]), strategy="forward").stream_safe()
    assert not StepImputeFill(sel=all_of(["v"]), strategy="mean").stream_safe()
