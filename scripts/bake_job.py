"""spark-submit entry point: synthesize transcripts, run the flagship
recipe-bake, print turns/sec. The engine arrives via --py-files."""

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
    args = ap.parse_args()
    spark = SparkSession.builder.getOrCreate()
    df = synthetic_transcripts(spark, n_convs=args.convs, with_features=True)
    rec = (
        Recipe(df, predictors=["value", "n_chars"], groups="conv_id",
               sequences=["turn_idx", "ts"])
        .add_step(StepHistorical(sel=all_of(["value"]), fun=Accumulator.MEAN))
        .add_step(StepImputeFill(sel=all_of(["value"]), strategy="forward"))
        .add_step(StepLag(sel=all_of(["value"]), lags=(1,)))
        .add_step(StepSessionize(gap="30m"))
    )
    t0 = time.time()
    out = rec.prep()
    n = out.count()
    wall = time.time() - t0
    print(f"BAKE_RESULT turns={n} wall_s={wall:.2f} turns_per_sec={n / wall:.0f}")
    spark.stop()


if __name__ == "__main__":
    main()
