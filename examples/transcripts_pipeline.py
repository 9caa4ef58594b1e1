"""Worked end-to-end example: the full engine over real testdata.

Run:  python examples/transcripts_pipeline.py  [sf_dir]

Walks the three tiers a transcript training-data pipeline chains
together (the reference repo's examples/ analog, Spark-native):

1. FEATURE ENGINEERING (the north-rule core): a Recipe over the
   transcript-shaped events table — expanding mean, forward fill,
   lag, ts-gap sessionization — prep/bake with frozen state.
2. CORPUS CURATION: quality filter + exact dedup + MinHash near-dedup
   over the documents table, with audit columns.
3. SIMILARITY SEARCH: auto-sized hyperplane-LSH ANN over the
   embeddings table, verified against the brute tier.
"""

from __future__ import annotations

import os
import sys

# runnable from anywhere: the package lives at the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from pyspark.sql import functions as F

    from recipys_spark import Accumulator, Recipe
    from recipys_spark.operators import (
        StepHistorical,
        StepImputeFill,
        StepLag,
        StepSessionize,
    )
    from recipys_spark.operators.corpus import clean_corpus
    from recipys_spark.operators.similarity import (
        cosine_topk,
        lsh_cosine_topk,
        recommend_lsh_params,
    )
    from recipys_spark.selector import all_of
    from recipys_spark.sources.io import get_spark

    spark = get_spark(parallelism=8, app_name="transcripts_pipeline")

    # -- 1. recipe feature engineering --------------------------------
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    rec = (
        Recipe(events, predictors=["value"], groups="user_id", sequences="ts")
        .add_step(StepHistorical(sel=all_of(["value"]), fun=Accumulator.MEAN))
        .add_step(StepImputeFill(sel=all_of(["value"]), strategy="forward"))
        .add_step(StepLag(sel=all_of(["value"]), lags=(1,)))
        .add_step(StepSessionize(gap="30m"))
    )
    feats = rec.prep()
    print("== recipe features (prep) ==")
    feats.orderBy("user_id", "ts").show(5, truncate=False)
    # frozen-state apply path: bake re-uses the fitted state
    baked = rec.bake(events)
    print(f"prep rows = {feats.count()}, bake rows = {baked.count()}")

    # -- 2. corpus curation -------------------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    survivors = clean_corpus(docs, min_tokens=5, min_quality=0.2)
    n_in, n_out = docs.count(), survivors.count()
    print("== corpus curation ==")
    print(f"{n_in} docs -> {n_out} survivors "
          f"({n_in - n_out} filtered or deduped)")
    survivors.select("doc_id", "n_tokens", "quality", "lang_id").show(5)

    # -- 3. similarity search -----------------------------------------
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    params = recommend_lsh_params(emb.count(), dim)
    print("== ANN (auto-sized LSH) ==")
    print(f"advisor: {params}")
    queries = emb.where(F.col("vec_id") < 5)
    approx = lsh_cosine_topk(queries, emb, k=3, n_planes=None, dim=dim)
    exact = cosine_topk(queries, emb, k=3)
    approx.orderBy("query_id", "rank").show(15)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    print(f"recall@3 vs brute tier: {len(a & e)}/{len(e)}")

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
