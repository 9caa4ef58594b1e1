"""End-to-end north-star scenario on the canonical transcript schema:
per-conversation features, string-field backfill/ffill, per-turn text
equality under stable (conv_id, turn_idx) ordering, zero leakage."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from recipys_spark import Accumulator, Recipe
from recipys_spark.operators import (
    StepHistorical,
    StepImputeFill,
    StepLag,
    StepSessionize,
)
from recipys_spark.operators.textstats import StepTextFeatures
from recipys_spark.selector import all_of
from recipys_spark.sources.io import TRANSCRIPT_COLUMNS, synthetic_transcripts


@pytest.fixture(scope="module")
def tdf(spark):
    return synthetic_transcripts(
        spark, n_convs=60, skew=True, skew_factor=10, with_features=True
    ).cache()


def test_transcript_schema(tdf):
    assert tdf.columns[:6] == TRANSCRIPT_COLUMNS
    dt = dict(tdf.dtypes)
    assert dt["conv_id"] == "string" and dt["turn_idx"] == "int"
    assert dt["ts"].startswith("timestamp")


def test_string_ffill_bfill_tool_role(spark, tdf):
    """North-star: 'backfill/forward-fill of tool and role fields'."""
    rec = Recipe(
        tdf,
        predictors=["tool", "role"],
        groups="conv_id",
        sequences=["turn_idx"],
    )
    rec.add_step(StepImputeFill(sel=all_of(["tool"]), strategy="forward"))
    rec.add_step(StepImputeFill(sel=all_of(["role"]), strategy="backward"))
    got = (
        rec.prep()
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "tool", "role")
        .toPandas()
    )
    src = tdf.orderBy("conv_id", "turn_idx").toPandas()
    exp_tool = src.groupby("conv_id")["tool"].ffill()
    exp_role = src.groupby("conv_id")["role"].bfill()
    assert got["tool"].fillna("§").tolist() == exp_tool.fillna("§").tolist()
    assert got["role"].fillna("§").tolist() == exp_role.fillna("§").tolist()


def test_per_turn_text_equality_under_stable_ordering(spark, tdf):
    """input_hint invariant: the engine must never disturb text values
    or row identity; compare text per (conv_id, turn_idx) after a full
    feature pipeline."""
    rec = (
        Recipe(
            tdf,
            predictors=["value", "n_chars"],
            groups="conv_id",
            sequences=["turn_idx", "ts"],
        )
        .add_step(StepHistorical(sel=all_of(["value"]), fun=Accumulator.MEAN))
        .add_step(StepLag(sel=all_of(["n_chars"]), lags=(1,)))
        .add_step(StepSessionize(gap="30m"))
        .add_step(StepTextFeatures(sel=all_of(["text"]), features=("n_chars", "fingerprint")))
    )
    out = rec.prep().orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").toPandas()
    src = tdf.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").toPandas()
    pd.testing.assert_frame_equal(out, src)


def test_zero_leakage_ts_truncation(spark, tdf):
    """No frame touches ts' > ts: truncating each conversation at an
    arbitrary ts must leave surviving feature rows bit-identical."""
    def features(df):
        rec = (
            Recipe(df, predictors=["value"], groups="conv_id", sequences=["turn_idx", "ts"])
            .add_step(StepHistorical(sel=all_of(["value"]), fun=Accumulator.MEAN))
            .add_step(StepHistorical(sel=all_of(["value"]), fun=Accumulator.MAX))
            .add_step(StepImputeFill(sel=all_of(["value"]), strategy="forward"))
            .add_step(StepSessionize(gap="30m"))
        )
        return (
            rec.prep()
            .orderBy("conv_id", "turn_idx")
            .select("conv_id", "turn_idx", "value", "value_mean", "value_max", "session_id")
            .toPandas()
        )

    cutoff = tdf.agg(F.percentile(F.col("ts").cast("timestamp").cast("double"), F.lit(0.5))).first()[0]
    full = features(tdf)
    trunc_df = tdf.where(F.col("ts").cast("timestamp").cast("double") <= cutoff)
    trunc = features(trunc_df)
    surviving = (
        trunc_df.select("conv_id", "turn_idx").toPandas()
        .merge(full, on=["conv_id", "turn_idx"], how="inner")
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    trunc = trunc.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for col in ["value", "value_mean", "value_max", "session_id"]:
        np.testing.assert_array_equal(
            trunc[col].to_numpy(), surviving[col].to_numpy(), err_msg=col
        )
