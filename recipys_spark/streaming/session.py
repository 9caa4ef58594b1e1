"""Structured-Streaming variants of the engine's time-series operators.

The reference is batch-only (SURVEY.md §2.3 "streaming: absent"); batch
sessionization lives in operators/timeseries.py. These streaming
counterparts cover the live-ingest path of a transcript pipeline:

- ``streaming_session_stats``: per (conv_id, session) aggregates with
  ``F.session_window`` (gap-based), watermarked for late data — state
  is bounded and the session split matches the batch ts-gap rule for
  in-order data.
- ``streaming_running_features``: per-conversation running aggregates
  via ``applyInPandasWithState`` (GroupState) — the streaming analog of
  the expanding-window StepHistorical for decomposable accumulators
  (count/sum/mean/max/min carried in state, Arrow-batched).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_session_stats(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "conv_id",
) -> DataFrame:
    """Sessionized per-conversation aggregates over a streaming frame.

    Emits one row per closed (group, session window): turn count and
    session bounds. Append-mode compatible (watermark closes windows)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(group_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count("*").alias("n_turns"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            group_col,
            F.col("session_window.start").alias("window_start"),
            "n_turns",
            "session_start",
            "session_end",
        )
    )


_RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("value_mean", T.DoubleType()),
        T.StructField("value_max", T.DoubleType()),
        T.StructField("value_count", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sum", T.DoubleType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def _running_features(key, batches: Iterator[pd.DataFrame], state: GroupState):
    """Expanding mean/max/count carried across micro-batches in
    GroupState; within a batch rows are processed in turn_idx order."""
    if state.exists:
        s, c, m = state.get
    else:
        s, c, m = 0.0, 0, None
    for pdf in batches:
        pdf = pdf.sort_values("turn_idx")
        means, maxes, counts = [], [], []
        for v in pdf["value"]:
            if pd.notna(v):
                s += float(v)
                c += 1
                m = float(v) if m is None else max(m, float(v))
                maxes.append(m)
            else:
                # cum_max semantics: null output at null input
                # (matches batch StepHistorical MAX)
                maxes.append(None)
            means.append(s / c if c else None)
            counts.append(c)
        out = pdf[["conv_id", "turn_idx", "value"]].copy()
        out["value_mean"] = means
        out["value_max"] = maxes
        out["value_count"] = counts
        yield out
    state.update((s, c, m))


def streaming_running_features(stream: DataFrame) -> DataFrame:
    """Streaming expanding accumulators per conv_id (schema: conv_id,
    turn_idx, value)."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _running_features,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
