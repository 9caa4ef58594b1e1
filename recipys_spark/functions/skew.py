"""Salted two-phase expanding aggregates for long-conversation skew.

A plain ``Window.partitionBy(conv_id)`` sorts every turn of a
conversation in ONE task — a single 10^9-turn conversation stalls the
stage (SURVEY.md §7 hard parts; north_rule requires explicit skew
handling). For the *decomposable* accumulators (MAX/MIN/COUNT/MEAN/VAR)
the expanding aggregate splits into:

  phase 1  bucket rows by the sequence value (monotone buckets), run
           the expanding window *within* (group, bucket) — bounded
           partition size;
  phase 2  per-bucket totals (tiny table), prefix-aggregate them over
           all *prior* buckets with a second window ordered by bucket;
  phase 3  join the prefix back on (group, bucket) — AQE broadcasts the
           small side — and merge prefix ⊕ intra-bucket running state
           with null-safe combine rules.

MEDIAN is not decomposable; StepHistorical falls back to the plain
window for it (documented limitation).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from recipys_spark.operators.base import Accumulator

_BUCKET = "__skew_bucket"


def _bucket_expr(df: DataFrame, sequence: str, bucket_size: int):
    dtype = dict(df.dtypes)[sequence]
    if dtype in ("timestamp", "timestamp_ntz"):
        base = F.unix_timestamp(F.col(sequence))
    else:
        base = F.col(sequence).cast("double")
    return F.floor(base / F.lit(float(bucket_size))).cast("long")


def salted_expanding(
    df: DataFrame,
    cols: Sequence[str],
    groups: Sequence[str],
    sequence: str,
    fun: Accumulator,
    suffix: str,
    bucket_size: int,
) -> DataFrame:
    if fun is Accumulator.MEDIAN:
        raise ValueError("MEDIAN is not decomposable; use the plain window path")
    groups = list(groups)
    base_cols = list(df.columns)
    df = df.withColumn(_BUCKET, _bucket_expr(df, sequence, bucket_size))

    intra = (
        Window.partitionBy(*groups, _BUCKET)
        .orderBy(sequence)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    run_exprs, total_aggs, combine = [], [], {}
    for c in cols:
        col = F.col(c)
        if fun is Accumulator.MAX:
            run_exprs.append(F.max(col).over(intra).alias(f"__run_max_{c}"))
            total_aggs.append(F.max(col).alias(f"__tot_max_{c}"))
        elif fun is Accumulator.MIN:
            run_exprs.append(F.min(col).over(intra).alias(f"__run_min_{c}"))
            total_aggs.append(F.min(col).alias(f"__tot_min_{c}"))
        elif fun is Accumulator.COUNT:
            run_exprs.append(F.count(col).over(intra).alias(f"__run_cnt_{c}"))
            total_aggs.append(F.count(col).alias(f"__tot_cnt_{c}"))
        elif fun is Accumulator.MEAN:
            run_exprs += [
                F.sum(col).over(intra).alias(f"__run_sum_{c}"),
                F.count(col).over(intra).alias(f"__run_cnt_{c}"),
            ]
            total_aggs += [
                F.sum(col).alias(f"__tot_sum_{c}"),
                F.count(col).alias(f"__tot_cnt_{c}"),
            ]
        elif fun is Accumulator.VAR:
            sq = col.cast("double") * col.cast("double")
            run_exprs += [
                F.sum(col).over(intra).alias(f"__run_sum_{c}"),
                F.count(col).over(intra).alias(f"__run_cnt_{c}"),
                F.sum(sq).over(intra).alias(f"__run_sq_{c}"),
            ]
            total_aggs += [
                F.sum(col).alias(f"__tot_sum_{c}"),
                F.count(col).alias(f"__tot_cnt_{c}"),
                F.sum(sq).alias(f"__tot_sq_{c}"),
            ]
        else:
            raise TypeError(f"Unsupported accumulator {fun!r}")

    with_run = df.select("*", *run_exprs)

    # phase 2: per-bucket totals, then prefix over strictly-prior buckets
    totals = df.groupBy(*groups, _BUCKET).agg(*total_aggs)
    prior = (
        Window.partitionBy(*groups)
        .orderBy(_BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix_exprs = [F.col(g) for g in groups] + [F.col(_BUCKET)]
    for field in totals.columns:
        if not field.startswith("__tot_"):
            continue
        name = field.replace("__tot_", "__pre_")
        kind = field[len("__tot_"):].split("_", 1)[0]
        if kind == "max":
            prefix_exprs.append(F.max(field).over(prior).alias(name))
        elif kind == "min":
            prefix_exprs.append(F.min(field).over(prior).alias(name))
        else:  # cnt / sum / sq accumulate additively
            prefix_exprs.append(F.sum(field).over(prior).alias(name))
    prefix = totals.select(*prefix_exprs)

    joined = with_run.join(prefix, on=[*groups, _BUCKET], how="left")

    # phase 3: merge prefix ⊕ running
    out_exprs = []
    for c in cols:
        name = f"{c}_{suffix}"
        if fun is Accumulator.MAX:
            # greatest() skips nulls: correct null-safe combine.
            # cum_max semantics: output is null where the input is null.
            out_exprs.append(
                F.when(
                    F.col(c).isNotNull(),
                    F.greatest(F.col(f"__pre_max_{c}"), F.col(f"__run_max_{c}")),
                ).alias(name)
            )
        elif fun is Accumulator.MIN:
            out_exprs.append(
                F.when(
                    F.col(c).isNotNull(),
                    F.least(F.col(f"__pre_min_{c}"), F.col(f"__run_min_{c}")),
                ).alias(name)
            )
        elif fun is Accumulator.COUNT:
            out_exprs.append(
                (
                    F.coalesce(F.col(f"__pre_cnt_{c}"), F.lit(0))
                    + F.col(f"__run_cnt_{c}")
                ).alias(name)
            )
        elif fun is Accumulator.MEAN:
            n = F.coalesce(F.col(f"__pre_cnt_{c}"), F.lit(0)) + F.col(f"__run_cnt_{c}")
            s = F.coalesce(F.col(f"__pre_sum_{c}"), F.lit(0.0)) + F.coalesce(
                F.col(f"__run_sum_{c}"), F.lit(0.0)
            )
            out_exprs.append(F.when(n > 0, s / n).alias(name))
        elif fun is Accumulator.VAR:
            n = (
                F.coalesce(F.col(f"__pre_cnt_{c}"), F.lit(0))
                + F.col(f"__run_cnt_{c}")
            ).cast("double")
            s = F.coalesce(F.col(f"__pre_sum_{c}"), F.lit(0.0)) + F.coalesce(
                F.col(f"__run_sum_{c}"), F.lit(0.0)
            )
            sq = F.coalesce(F.col(f"__pre_sq_{c}"), F.lit(0.0)) + F.coalesce(
                F.col(f"__run_sq_{c}"), F.lit(0.0)
            )
            var = (sq - s * s / n) / (n - F.lit(1.0))
            out_exprs.append(F.when(n > 1, var).alias(name))

    return joined.select(*base_cols, *out_exprs)
