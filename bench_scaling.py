"""Two-parallelism scaling evidence (BASELINE.md protocol).

The north rule requires ≥0.8 throughput scaling efficiency from N to 4N
executors. No real cluster exists in this sandbox, so per the driver's
protocol we run the IDENTICAL recipe-bake job on the IDENTICAL parquet
input at local[N] and local[4N] (shuffle partitions scaled
proportionally) and report throughput at both plus efficiency
= (throughput@4N / throughput@N) / 4.

Each run is a fresh SparkSession (sequential, never concurrent — the
box has 32 cores and concurrent runs would contend). The input is
generated once, written to parquet, and reused by both runs; the
generator is deterministic, so rows are identical. Determinism of the
RESULT across parallelism is asserted too (checksum of feature
columns) — exact decimal accumulation makes it bit-identical.

Usage: python bench_scaling.py [--convs 300000] [--n 8] [--runs 3]
Writes BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import functions as F

from bench import bake_recipe, materialize
from recipys_spark.sources.io import get_spark, synthetic_transcripts


def checksum(df) -> tuple:
    """Order-independent exact checksum of the feature columns."""
    agg = df.agg(
        F.sum(F.xxhash64("conv_id", "turn_idx", "session_id")).alias("h1"),
        F.sum(
            F.xxhash64(
                F.format_number(F.col("value_mean"), 9),
                F.format_number(F.col("value_lag_1"), 9),
            )
        ).alias("h2"),
        F.count("*").alias("n"),
    ).first()
    return (agg.h1, agg.h2, agg.n)


def run_once(cores: int, tdir: str, with_checksum: bool) -> tuple[float, int, tuple]:
    spark = get_spark(
        parallelism=cores,
        app_name=f"recipys_scaling_{cores}",
        shuffle_partitions=cores * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(tdir)
    n_turns = df.count()
    baked = bake_recipe(df)
    # warm the JVM/code paths once, then measure
    materialize(baked.limit(0))
    t0 = time.time()
    materialize(baked)
    wall = time.time() - t0
    cs = checksum(bake_recipe(df)) if with_checksum else ()
    spark.stop()
    return wall, n_turns, cs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=300_000)
    ap.add_argument("--n", type=int, default=8, help="small parallelism (4N = big)")
    ap.add_argument("--runs", type=int, default=3, help="take best-of per level")
    args = ap.parse_args()

    tdir = f"/tmp/recipys_scaling_transcripts_{args.convs}"
    if not os.path.exists(tdir):
        spark = get_spark(parallelism=32, app_name="recipys_scaling_gen")
        spark.sparkContext.setLogLevel("ERROR")
        synthetic_transcripts(
            spark, n_convs=args.convs, skew=True, skew_factor=100, with_features=True
        ).repartition(64).write.mode("overwrite").parquet(tdir)
        spark.stop()

    results = {}
    checksums = {}
    for cores in (args.n, args.n * 4):
        walls = []
        for i in range(args.runs):
            wall, n_turns, cs = run_once(cores, tdir, with_checksum=(i == 0))
            walls.append(wall)
            if cs:
                checksums[cores] = cs
        best = min(walls)
        results[cores] = {
            "wall_s": [round(w, 2) for w in walls],
            "best_wall_s": round(best, 2),
            "turns_per_sec": round(n_turns / best, 1),
        }

    n, n4 = args.n, args.n * 4
    eff = (results[n4]["turns_per_sec"] / results[n]["turns_per_sec"]) / 4
    deterministic = checksums.get(n) == checksums.get(n4)
    out = {
        "metric": "recipe-bake scaling efficiency local[N] -> local[4N]",
        "n_turns": n_turns,
        "N": n,
        "4N": n4,
        "throughput": {str(k): v["turns_per_sec"] for k, v in results.items()},
        "walls": {str(k): v["wall_s"] for k, v in results.items()},
        "efficiency": round(eff, 3),
        "bit_identical_across_parallelism": deterministic,
    }
    print(json.dumps(out))

    with open("BENCH.md", "w") as f:
        f.write(
            f"""# BENCH — two-parallelism scaling evidence

Protocol per BASELINE.md: the identical recipe-bake job (expanding
mean + expanding max + forward-fill + lag + sessionization over
`Window.partitionBy(conv_id)`) on the identical parquet transcript
input, at `local[{n}]` vs `local[{n4}]`, shuffle partitions scaled
proportionally (2× cores). Best of {args.runs} runs per level.

| parallelism | walls (s) | best wall (s) | throughput (turns/s) |
|---|---|---|---|
| local[{n}] | {results[n]['wall_s']} | {results[n]['best_wall_s']} | {results[n]['turns_per_sec']:,} |
| local[{n4}] | {results[n4]['wall_s']} | {results[n4]['best_wall_s']} | {results[n4]['turns_per_sec']:,} |

- input: {n_turns:,} turns, {args.convs:,} conversations (ragged 4–11
  turns + one {100}×-median skew conversation), deterministic seed=42
- **scaling efficiency = (throughput@{n4} / throughput@{n}) / 4 =
  {eff:.3f}** (target ≥ 0.8)
- result determinism across parallelism: checksums of
  (session_id, value_mean, value_lag_1) at both levels
  {'**bit-identical**' if deterministic else 'DIFFER (investigate!)'} —
  exact decimal accumulation (recipys_spark/functions/deterministic.py)
  makes feature values independent of partitioning.

Caveats: single-JVM local mode shares one heap — at real cluster scale
the same plan shuffles over the network, but the plan shape (single
window stage per conv partition, AQE-coalesced) is what governs; see
SURVEY.md §4 for the shuffle budget analysis.
"""
        )


if __name__ == "__main__":
    main()
