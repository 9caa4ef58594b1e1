"""recommend_pipeline_config (plans/advisor.py) — the docstring's
example, executed verbatim, plus the apply-path contracts."""

from __future__ import annotations

import pytest

from recipys_spark import Accumulator, Recipe
from recipys_spark.operators import StepHistorical, StepScale, StepSessionize
from recipys_spark.plans.advisor import recommend_pipeline_config
from recipys_spark.selector import all_of
from recipys_spark.sources.io import synthetic_transcripts


@pytest.fixture(scope="module")
def turns(spark):
    return synthetic_transcripts(spark, n_convs=50, skew=False, with_features=True)


def test_docstring_example_runs_as_written(spark, turns):
    df = turns.select("conv_id", "ts", "value")
    rec = (
        Recipe(df, predictors=["value"], groups="conv_id", sequences="ts")
        .add_step(StepHistorical(sel=all_of(["value"]), fun=Accumulator.MEAN))
        .add_step(StepSessionize(gap="30m"))
    )
    cfg = recommend_pipeline_config(df, rec)
    assert cfg["stats"]["total_rows"] == df.count()
    assert cfg["stats"]["n_groups"] == 50
    # small fixture sits far below the 4M-row salt crossover
    assert cfg["steps"][0]["skew_bucket_size"] is None
    assert cfg["steps"][0]["skew_capable"] and cfg["steps"][1]["skew_capable"]
    floor = spark.sparkContext.defaultParallelism
    assert cfg["shuffle_partitions"] == floor  # rows << rows_per_partition
    assert cfg["lsh"] is None and cfg["applied"] is False


def test_apply_threads_bucket_and_shuffle_partitions(spark, turns):
    df = turns.select("conv_id", "ts", "value")
    rec = Recipe(
        df, predictors=["value"], groups="conv_id", sequences="ts"
    ).add_step(StepHistorical(sel=all_of(["value"]), fun=Accumulator.MEAN))
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # force a salt recommendation by dropping the crossover to 1 row
        old = Recipe.AUTO_SKEW_SALT_ABOVE
        Recipe.AUTO_SKEW_SALT_ABOVE = 1
        try:
            cfg = recommend_pipeline_config(
                df, rec, apply=True, target_rows_per_partition=100
            )
        finally:
            Recipe.AUTO_SKEW_SALT_ABOVE = old
        assert cfg["applied"] is True
        assert cfg["steps"][0]["skew_bucket_size"] is not None
        assert rec.steps[0].skew_bucket_size == cfg["steps"][0]["skew_bucket_size"]
        # untagged = hand-chosen: prep() must NOT reset it
        assert not getattr(rec.steps[0], "_auto_skew_assigned", False)
        rec.prep()
        assert rec.steps[0].skew_bucket_size == cfg["steps"][0]["skew_bucket_size"]
        assert (
            spark.conf.get("spark.sql.shuffle.partitions")
            == str(cfg["shuffle_partitions"])
        )
        assert cfg["shuffle_partitions"] >= spark.sparkContext.defaultParallelism
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_lsh_params_from_embedding_column(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cfg = recommend_pipeline_config(emb, emb_col="embedding")
    assert cfg["lsh"] is not None
    assert cfg["lsh"]["n_planes"] >= 4 and cfg["lsh"]["n_tables"] >= 1


def test_groupless_recipe_reports_rows_only(spark, turns):
    df = turns.select("conv_id", "value")
    rec = Recipe(df, predictors=["value"]).add_step(StepScale(sel=all_of(["value"])))
    cfg = recommend_pipeline_config(df, rec)
    assert set(cfg["stats"]) == {"total_rows"}
    assert cfg["steps"][0]["skew_capable"] is False


def test_apply_respects_hand_set_bucket_size(spark, turns):
    """ADVICE r6: apply=True must not overwrite a user's explicit
    (untagged) skew_bucket_size — it keeps the value and reports it."""
    df = turns.select("conv_id", "ts", "value")
    rec = Recipe(
        df, predictors=["value"], groups="conv_id", sequences="ts"
    ).add_step(
        StepHistorical(
            sel=all_of(["value"]), fun=Accumulator.MEAN, skew_bucket_size=777
        )
    )
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        old = Recipe.AUTO_SKEW_SALT_ABOVE
        Recipe.AUTO_SKEW_SALT_ABOVE = 1
        try:
            cfg = recommend_pipeline_config(
                df, rec, apply=True, target_rows_per_partition=100
            )
        finally:
            Recipe.AUTO_SKEW_SALT_ABOVE = old
        assert cfg["applied"] is True
        assert rec.steps[0].skew_bucket_size == 777
        assert cfg["steps"][0]["skew_bucket_kept_user_value"] == 777
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
