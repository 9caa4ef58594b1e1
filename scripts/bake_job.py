"""spark-submit entry point: run the flagship recipe-bake, print
turns/sec. The engine arrives via --py-files (the north-rule launch
path; see scripts/spark_submit_bake.sh).

Protocol matches bench_scaling.py: pre-written parquet input
(--input; falls back to inline synthesis with --convs for smoke runs),
untimed warmup materializations, best-of-N timed noop-sink
materializations (count() would let Catalyst prune the very window
features being measured). Shuffle partitions come from the submit conf
and must be FIXED across parallelism levels when measuring scaling."""

import argparse
import time

from pyspark.sql import SparkSession

from recipys_spark import Accumulator, Recipe
from recipys_spark.operators import (
    StepHistorical,
    StepImputeFill,
    StepLag,
    StepSessionize,
)
from recipys_spark.selector import all_of
from recipys_spark.sources.io import synthetic_transcripts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=100_000)
    ap.add_argument("--input", default=None, help="pre-written transcript parquet")
    ap.add_argument("--warmups", type=int, default=1)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()
    spark = SparkSession.builder.getOrCreate()
    if args.input:
        df = spark.read.parquet(args.input)
    else:
        df = synthetic_transcripts(spark, n_convs=args.convs, with_features=True)
    rec = (
        Recipe(df, predictors=["value", "n_chars"], groups="conv_id",
               sequences=["turn_idx", "ts"])
        .add_step(StepHistorical(sel=all_of(["value"]), fun=Accumulator.MEAN))
        .add_step(StepImputeFill(sel=all_of(["value"]), strategy="forward"))
        .add_step(StepLag(sel=all_of(["value"]), lags=(1,)))
        .add_step(StepSessionize(gap="30m"))
    )
    n = df.count()  # input size, outside the timed section
    out = rec.prep()

    def materialize():
        out.write.format("noop").mode("overwrite").save()

    for _ in range(args.warmups):
        materialize()
    walls = []
    for _ in range(args.runs):
        t0 = time.time()
        materialize()
        walls.append(time.time() - t0)
    wall = min(walls)
    print(f"BAKE_RESULT turns={n} wall_s={wall:.2f} turns_per_sec={n / wall:.0f} "
          f"runs={[round(w, 2) for w in walls]}")
    spark.stop()


if __name__ == "__main__":
    main()
