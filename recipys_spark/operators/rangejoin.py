"""Bucketed range (interval) join.

Matches point rows to interval rows: ``l.ts ∈ [r.start, r.end)`` with
optional equi-keys. Spark plans a bare inequality join as
BroadcastNestedLoopJoin — O(|L|·|R|) comparisons and a broadcast of a
side that may not fit. The bucketed strategy turns it into an
equi-join:

1. pick a bucket width ``w`` (≈ the typical interval length);
2. every interval row is exploded to the buckets it covers
   (``sequence(floor(start/w), floor((end-1)/w))`` — blow-up factor is
   ``len/w + 1``, bounded when w matches interval length);
3. every point row computes its single bucket ``floor(ts/w)``;
4. hash equi-join on (keys…, bucket) — Catalyst picks SMJ or broadcast
   per AQE stats — with the exact interval predicate as a residual
   join condition.

Each matching (point, interval) pair meets in exactly ONE bucket (the
point's), so no dedup pass is needed. At 100 TB the join shuffles on a
well-distributed (keys, bucket) composite; a hot time bucket can
additionally be salted by the caller pre-join.

The reference engine has no joins at all (SURVEY.md §2.3,
/root/reference/recipys — step/recipe/selector only); this is part of
the Spark-first superset tier alongside the as-of join
(operators/asof.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recipys_spark.operators.timeseries import parse_resolution


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Optional[Sequence[str]] = None,
    left_ts: str = "ts",
    right_start: str = "start",
    right_end: str = "end",
    bucket: str = "1h",
    how: str = "inner",
) -> DataFrame:
    """Join each left (point) row to the right (interval) rows with
    ``right_start <= left_ts < right_end``, equi-matching ``on`` keys.

    ``bucket`` is the bucketing granularity ("30m", "1h", "2d" …);
    correctness is bucket-independent, cost is not: too small explodes
    intervals into many buckets, too large packs unrelated rows into
    one bucket for the residual filter to discard. Start at the median
    interval length. ``how``: "inner" or "left" (unmatched points
    survive with null interval columns)."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    on = list(on or [])
    w = parse_resolution(bucket)

    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"ambiguous columns {sorted(overlap)}: rename before range_join"
        )

    # fractional-second epochs: unix_timestamp TRUNCATES to seconds,
    # which under-computes the last covering bucket for intervals with
    # sub-second end timestamps (a point in the first second of the
    # final bucket would silently lose its match)
    def _epoch(c):
        return F.col(c).cast("timestamp").cast("double")

    lt = left.withColumn("__bucket", F.floor(_epoch(left_ts) / w))
    # end is exclusive: an interval ending exactly on a bucket edge
    # contributes nothing to that bucket
    end_d = _epoch(right_end)
    hi_raw = F.floor(end_d / w)
    hi = F.when(end_d == hi_raw * w, hi_raw - 1).otherwise(hi_raw)
    rt = (
        right.where(F.col(right_end) > F.col(right_start))
        .withColumn(
            "__rbucket",
            F.explode(F.sequence(F.floor(_epoch(right_start) / w), hi)),
        )
    )
    for k in on:
        rt = rt.withColumnRenamed(k, f"__r_{k}")

    cond = F.col("__bucket") == F.col("__rbucket")
    for k in on:
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    cond = (
        cond
        & (F.col(left_ts) >= F.col(right_start))
        & (F.col(left_ts) < F.col(right_end))
    )
    return lt.join(rt, cond, how).drop(
        "__bucket", "__rbucket", *[f"__r_{k}" for k in on]
    )
