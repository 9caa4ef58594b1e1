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


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """Append mode + watermark: a session is finalized once the
    watermark passes (emitted exactly once), and an event arriving
    LATER than the watermark allows is dropped — it must neither
    reopen the session nor appear as a new one."""
    import datetime
    import time as _time

    import pandas as pd

    d = str(tmp_path / "late")
    schema = "conv_id string, turn_idx int, ts timestamp"

    def ts(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    # batch 1: a 3-turn session 9:00-9:10, then a clock event at 13:00
    # that advances the watermark far past the session's close.
    # batch 2: another clock tick — Spark commits the watermark
    # computed from batch N at batch N+1 and FILTERS with it from batch
    # N+2, so the late row needs one batch in between to be dropped.
    # batch 3: a late c1 event at 9:20 — within the session gap, but
    # hours behind the committed 12:30 watermark.
    batches = [
        pd.DataFrame(
            {
                "conv_id": ["c1", "c1", "c1", "clock"],
                "turn_idx": [0, 1, 2, 0],
                "ts": [ts(9), ts(9, 5), ts(9, 10), ts(13)],
            }
        ),
        pd.DataFrame({"conv_id": ["clock"], "turn_idx": [1], "ts": [ts(13, 30)]}),
        pd.DataFrame({"conv_id": ["c1"], "turn_idx": [3], "ts": [ts(9, 20)]}),
    ]
    for f in batches:
        spark.createDataFrame(f, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        _time.sleep(1.2)  # file-source orders micro-batches by mtime

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = _run_stream(
        spark,
        streaming_session_stats(stream, gap="30 minutes", watermark="30 minutes"),
        "late_sess",
        "append",
    ).toPandas()

    c1 = out[out.conv_id == "c1"]
    # exactly one finalized c1 session, with the ON-TIME turn count
    assert len(c1) == 1, out
    assert int(c1.n_turns.iloc[0]) == 3, out


def test_streaming_running_features_with_idle_timeout(spark, transcript_dir):
    """The bounded-state mode (processing-time idle eviction) produces
    the same results for conversations active within the window."""
    batch = spark.read.parquet(transcript_dir)
    stream = spark.readStream.schema(batch.schema).parquet(transcript_dir)
    out = _run_stream(
        spark,
        streaming_running_features(
            stream.select("conv_id", "turn_idx", "value"), idle_timeout=True
        ),
        "running_feats_ttl",
        "append",
    ).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    rec = Recipe(
        batch, predictors=["value"], groups="conv_id", sequences="turn_idx"
    ).add_step(StepHistorical(sel=all_of(["value"]), fun=Accumulator.MEAN))
    oracle = (
        rec.prep()
        .select("conv_id", "turn_idx", "value_mean")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(
        out["value_mean"].to_numpy(dtype=float),
        oracle["value_mean"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_streaming_exact_dedup_matches_batch_fingerprints(spark, tmp_path_factory):
    """Streaming dedup keeps exactly one row per normalized-text
    fingerprint (within the watermark horizon), agreeing with batch
    exact_dedup on WHICH texts survive (winner row may differ: batch
    keeps min id, streaming keeps first arrival)."""
    import pandas as pd
    from datetime import datetime, timedelta

    from recipys_spark.functions.text import fingerprint as fp_expr
    from recipys_spark.operators.dedup import exact_dedup
    from recipys_spark.streaming.dedup import streaming_exact_dedup

    t0 = datetime(2024, 1, 1)
    texts = [
        "alpha beta gamma",
        "alpha  BETA gamma",      # normalized dup of 0
        "delta epsilon",
        "alpha beta gamma",       # exact dup of 0
        "zeta eta theta",
        "delta epsilon",          # dup of 2
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "ts": [t0 + timedelta(minutes=i) for i in range(len(texts))],
        }
    )
    path = str(tmp_path_factory.mktemp("sdedup") / "docs")
    batch = spark.createDataFrame(pdf)
    batch.write.parquet(path)

    stream = spark.readStream.schema(batch.schema).parquet(path)
    out = _run_stream(
        spark, streaming_exact_dedup(stream), "sdedup", "append"
    ).toPandas()

    kept_batch = exact_dedup(spark.read.parquet(path)).select(
        fp_expr(F.col("text")).alias("fp")
    ).toPandas()
    got = sorted(
        spark.createDataFrame(out[["text"]])
        .select(fp_expr(F.col("text")).alias("fp"))
        .toPandas()
        .fp
    )
    assert got == sorted(kept_batch.fp)          # same surviving texts
    assert len(out) == 3 and len(set(got)) == 3  # one row per fingerprint


def test_streaming_clean_corpus_matches_batch_filter_dedup(spark, tmp_path_factory):
    """Stream filter+dedup keeps exactly the docs batch
    clean_corpus(near_dedup=False) keeps (winner row may differ on
    arrival order; surviving fingerprint sets must coincide)."""
    import pandas as pd
    from datetime import datetime, timedelta

    from recipys_spark.functions.text import fingerprint as fp_expr
    from recipys_spark.operators.corpus import clean_corpus
    from recipys_spark.streaming.dedup import streaming_clean_corpus

    t0 = datetime(2024, 1, 1)
    texts = [
        "the quick brown fox jumps over the lazy dog",   # keeper
        "the quick  brown fox jumps over the lazy dog",  # normalized dup
        "tiny",                                          # fails min_tokens
        "pack my box with five dozen liquor jugs",       # keeper
        "!!! ??? ;;; ###",                               # punct soup, low quality
        "pack my box with five dozen liquor jugs",       # exact dup
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "ts": [t0 + timedelta(minutes=i) for i in range(len(texts))],
        }
    )
    path = str(tmp_path_factory.mktemp("sclean") / "docs")
    batch = spark.createDataFrame(pdf)
    batch.write.parquet(path)

    stream = spark.readStream.schema(batch.schema).parquet(path)
    out = _run_stream(
        spark,
        streaming_clean_corpus(stream, min_tokens=5, min_quality=0.01),
        "sclean",
        "append",
    ).toPandas()
    assert {"n_tokens", "quality", "lang_id"} <= set(out.columns)
    assert len(out) == 2  # two keepers survive filter + dedup

    kept = clean_corpus(
        spark.read.parquet(path), min_tokens=5, min_quality=0.01,
        near_dedup=False,
    )
    exp = sorted(kept.select(fp_expr(F.col("text")).alias("f")).toPandas().f)
    got = sorted(
        spark.createDataFrame(out[["text"]])
        .select(fp_expr(F.col("text")).alias("f"))
        .toPandas()
        .f
    )
    assert got == exp and len(got) == 2


def test_streaming_dedup_null_texts_all_pass(spark, tmp_path_factory):
    """NULL texts are unknown, not duplicates: every null-text row
    flows through streaming dedup (batch exact_dedup rule)."""
    import pandas as pd
    from datetime import datetime, timedelta

    from recipys_spark.streaming.dedup import streaming_exact_dedup

    t0 = datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["dup me", "dup me", None, None],
            "ts": [t0 + timedelta(minutes=i) for i in range(4)],
        }
    )
    path = str(tmp_path_factory.mktemp("snull") / "docs")
    batch = spark.createDataFrame(pdf)
    batch.write.parquet(path)
    stream = spark.readStream.schema(batch.schema).parquet(path)
    out = _run_stream(
        spark, streaming_exact_dedup(stream), "snull", "append"
    ).toPandas()
    assert len(out) == 3  # one "dup me" + both nulls
    assert out.text.isna().sum() == 2


def test_streaming_deterministic_sample_matches_batch(spark, tmp_path_factory):
    """The assembly-tier samplers are STATELESS expressions, so they
    run unchanged on a stream and pick the identical rows the batch
    path picks — hash coins, not RNG state. (pack_sequences is
    inherently batch: a global prefix sum has no streaming analog.)"""
    from recipys_spark.operators.packing import (
        deterministic_sample,
        weighted_domain_sample,
    )

    path = str(tmp_path_factory.mktemp("sample_stream") / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(
        path
    )
    batch = spark.read.parquet(path)
    stream = spark.readStream.schema(batch.schema).parquet(path)

    got = _run_stream(
        spark,
        deterministic_sample(stream, 0.3, ["doc_id"]).select("doc_id"),
        "sampled_stream",
        "append",
    )
    b = sorted(r.doc_id for r in deterministic_sample(batch, 0.3, ["doc_id"]).collect())
    s = sorted(r.doc_id for r in got.collect())
    assert s == b and len(s) > 0

    got2 = _run_stream(
        spark,
        weighted_domain_sample(
            stream, {"src1": 0.5, "src2": 2.25}, "source", ["doc_id"]
        ).select("doc_id", "sample_copy"),
        "mixed_stream",
        "append",
    )
    b2 = sorted(
        (r.doc_id, r.sample_copy)
        for r in weighted_domain_sample(
            batch, {"src1": 0.5, "src2": 2.25}, "source", ["doc_id"]
        ).select("doc_id", "sample_copy").collect()
    )
    s2 = sorted((r.doc_id, r.sample_copy) for r in got2.collect())
    assert s2 == b2 and len(s2) > 0


def test_streaming_resample_matches_batch_buckets(spark, transcript_dir):
    """VERDICT r5 #4: the watermarked tumbling-window resample must
    emit VALUE-IDENTICAL closed buckets to batch StepResampling over
    the same rows — same epoch-aligned grid, same _bucket_agg
    expressions (LAST via max_by, exact-decimal MEAN, non-null COUNT)."""
    from recipys_spark.selector import all_of
    from recipys_spark.streaming.resample import streaming_resample

    batch = spark.read.parquet(transcript_dir).select(
        "conv_id", "ts", "turn_idx", "value"
    )
    stream = spark.readStream.schema(batch.schema).parquet(transcript_dir).select(
        "conv_id", "ts", "turn_idx", "value"
    )
    out = (
        _run_stream(
            spark,
            streaming_resample(
                stream,
                new_resolution="2h",
                col_acc_map={
                    "value": Accumulator.MEAN,
                    "turn_idx": Accumulator.COUNT,
                },
            ),
            "resample_stream",
            "complete",  # emit trailing open buckets too (bounded input)
        )
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )

    from recipys_spark.operators import StepResampling

    rec = Recipe(
        batch, predictors=["value", "turn_idx"], groups="conv_id", sequences="ts"
    ).add_step(
        StepResampling(
            new_resolution="2h",
            accumulator_dict={
                all_of(["value"]): Accumulator.MEAN,
                all_of(["turn_idx"]): Accumulator.COUNT,
            },
        )
    )
    oracle = (
        rec.prep()
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    got = list(zip(out.conv_id, out.ts, out.value, out.turn_idx))
    exp = list(zip(oracle.conv_id, oracle.ts, oracle.value, oracle.turn_idx))
    assert got == exp  # bucket grid AND values bit-identical


def test_streaming_resample_rejects_non_temporal_ts(spark, transcript_dir):
    from recipys_spark.streaming.resample import streaming_resample

    batch = spark.read.parquet(transcript_dir)
    stream = spark.readStream.schema(batch.schema).parquet(transcript_dir)
    with pytest.raises(ValueError, match="temporal"):
        streaming_resample(stream, ts_col="turn_idx")


def test_bake_stream_rejection_names_streaming_resample(spark, transcript_dir):
    """The StepResampling rejection must point at the now-real analog."""
    from recipys_spark.operators import StepResampling

    batch = spark.read.parquet(transcript_dir)
    rec = Recipe(
        batch, predictors=["value"], groups="conv_id", sequences="ts"
    ).add_step(StepResampling(new_resolution="2h"))
    rec.prep()
    stream = spark.readStream.schema(batch.schema).parquet(transcript_dir)
    with pytest.raises(ValueError, match="streaming_resample"):
        rec.bake_stream(stream)


def test_streaming_resample_partial_map_defaults_unmapped_columns(
    spark, transcript_dir
):
    """Review fix: a PARTIAL col_acc_map must leave unmapped value
    columns in the output under default_accumulator (batch StepResampling
    semantics), not silently drop them; unknown columns raise."""
    from recipys_spark.streaming.resample import streaming_resample

    batch = spark.read.parquet(transcript_dir).select(
        "conv_id", "ts", "turn_idx", "value"
    )
    stream = spark.readStream.schema(batch.schema).parquet(transcript_dir).select(
        "conv_id", "ts", "turn_idx", "value"
    )
    out = streaming_resample(
        stream, new_resolution="2h", col_acc_map={"value": Accumulator.MEAN}
    )
    assert "turn_idx" in out.columns  # defaulted (LAST), not dropped
    with pytest.raises(ValueError, match="non-value columns"):
        streaming_resample(stream, col_acc_map={"nope": Accumulator.MEAN})
