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


def _make_running_features(idle_timeout: bool):
    def _running_features(
        key, batches: Iterator[pd.DataFrame], state: GroupState
    ):
        return _running_features_impl(key, batches, state, idle_timeout)

    return _running_features


def _running_features_impl(
    key, batches: Iterator[pd.DataFrame], state: GroupState, idle_timeout: bool
):
    """Expanding mean/max/count carried across micro-batches in
    GroupState — fully vectorized pandas (no per-row Python, per the
    input_hint mandate): prior-state (sum, count, max) combines with
    in-batch cumulative aggregates.

    A large group arrives as MULTIPLE Arrow chunks whose relative row
    order is arbitrary — concat and sort ONCE before accumulating, or
    a later chunk's earlier turns would fold into the running stats
    after later ones.

    With an idle timeout configured, a conversation whose state times
    out is evicted (bounded state at billions of conversations); its
    accumulators restart from zero if it ever reappears — the
    documented trade for unbounded-keyspace streams."""
    import numpy as np

    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        s0, c0, m0 = state.get
    else:
        s0, c0, m0 = 0.0, 0, None
    chunks = [pdf for pdf in batches if len(pdf)]
    for pdf in (
        [pd.concat(chunks, ignore_index=True).sort_values("turn_idx")]
        if chunks
        else []
    ):
        v = pdf["value"]
        notna = v.notna()
        cnt = c0 + notna.cumsum()
        csum = s0 + v.fillna(0.0).cumsum()
        mean = (csum / cnt).where(cnt > 0)
        cmax = v.cummax()
        if m0 is not None:
            cmax = np.maximum(cmax.fillna(m0), m0)
        # cum_max semantics: null output at null input rows
        # (matches batch StepHistorical MAX)
        vmax = pd.Series(cmax, index=pdf.index).where(notna)
        out = pdf[["conv_id", "turn_idx", "value"]].copy()
        out["value_mean"] = mean
        out["value_max"] = vmax
        out["value_count"] = cnt
        yield out
        if len(v):
            s0 = float(csum.iloc[-1])
            c0 = int(cnt.iloc[-1])
            batch_max = v.max()
            if pd.notna(batch_max):
                m0 = float(batch_max) if m0 is None else max(m0, float(batch_max))
    state.update((s0, c0, m0))
    if idle_timeout:
        # only when armed: a swallowed failure here would silently
        # disable the promised eviction, and calling it in NoTimeout
        # mode is an error by contract
        state.setTimeoutDuration(_IDLE_TIMEOUT_MS)


_IDLE_TIMEOUT_MS = 6 * 3600 * 1000  # eviction after 6 h idle (when enabled)


def streaming_running_features(
    stream: DataFrame, idle_timeout: bool = False
) -> DataFrame:
    """Streaming expanding accumulators per conv_id (schema: conv_id,
    turn_idx, value).

    ``idle_timeout=True`` enables processing-time state eviction
    (_IDLE_TIMEOUT_MS): without it, one GroupState row lives per
    conversation FOREVER — unbounded at billions of conversations;
    with it, state is bounded by the live-conversation working set."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy("conv_id").applyInPandasWithState(
        _make_running_features(idle_timeout),
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
