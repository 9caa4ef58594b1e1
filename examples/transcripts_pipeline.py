"""Worked end-to-end example: the full engine over real testdata.

Run:  python examples/transcripts_pipeline.py  [sf_dir]

Walks the three tiers a transcript training-data pipeline chains
together (the reference repo's examples/ analog, Spark-native):

1. FEATURE ENGINEERING (the north-rule core): a Recipe over the
   transcript-shaped events table — expanding mean, forward fill,
   lag, ts-gap sessionization — prep/bake with frozen state.
2. TRAINING-ROW ASSEMBLY: point-in-time context windows over a real
   transcript table (StepAssembleContext — each turn paired with the
   prior turns that fit a token budget, zero leakage), then the same
   fitted recipe applied to a LIVE STREAM of the same turns
   (Recipe.bake_stream + streaming_assemble_context).
3. CORPUS CURATION: quality filter + exact dedup + MinHash near-dedup
   over the documents table, with audit columns.
4. SIMILARITY SEARCH: auto-sized hyperplane-LSH ANN over the
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
    # one-probe sizing report BEFORE prep: group skew, per-step salted
    # buckets (None below the measured crossovers), shuffle partitions
    # for every Exchange the baked plan will run
    from recipys_spark.plans.advisor import recommend_pipeline_config

    cfg = recommend_pipeline_config(events, rec, apply=True)
    print(
        "== pipeline sizing ==\n"
        f"rows={cfg['stats']['total_rows']}, groups={cfg['stats']['n_groups']}, "
        f"max_group_rows={cfg['stats']['max_rows']}, "
        f"shuffle_partitions={cfg['shuffle_partitions']}, "
        f"salted_steps={[s['index'] for s in cfg['steps'] if s['skew_bucket_size']]}"
    )
    feats = rec.prep()
    print("== recipe features (prep) ==")
    feats.orderBy("user_id", "ts").show(5, truncate=False)
    # frozen-state apply path: bake re-uses the fitted state
    baked = rec.bake(events)
    print(f"prep rows = {feats.count()}, bake rows = {baked.count()}")

    # -- 2. training-row assembly (batch + stream) --------------------
    import tempfile

    from recipys_spark.operators import StepAssembleContext, StepScale
    from recipys_spark.sources.io import synthetic_transcripts
    from recipys_spark.streaming.context import streaming_assemble_context

    tr_dir = tempfile.mkdtemp(prefix="transcripts_") + "/turns"
    synthetic_transcripts(spark, n_convs=200, with_features=True).write.parquet(
        tr_dir
    )
    turns = spark.read.parquet(tr_dir)
    ctx_rec = Recipe(
        turns,
        predictors=["text", "value"],
        groups="conv_id",
        sequences="turn_idx",
    )
    ctx_rec.add_step(StepImputeFill(sel=all_of(["value"]), value=0.0))
    ctx_rec.add_step(StepScale(sel=all_of(["value"])))
    ctx_rec.add_step(
        StepAssembleContext(sel=all_of(["text"]), budget=40, max_turns=8)
    )
    rows = ctx_rec.prep()
    print("== training rows (context assembly) ==")
    rows.where(F.col("turn_idx") == 3).select(
        "conv_id", "turn_idx", "context_n_turns", "context_n_tokens"
    ).show(3)
    # the SAME fitted scaler replayed over a live stream of the turns
    # (context assembly is windowed, so its streaming form is the
    # stateful operator, chained after the stream bake)
    stream = spark.readStream.schema(turns.schema).parquet(tr_dir)
    stream_rec = Recipe(
        turns, predictors=["value"], groups="conv_id", sequences="turn_idx"
    )
    stream_rec.add_step(StepImputeFill(sel=all_of(["value"]), value=0.0))
    stream_rec.add_step(StepScale(sel=all_of(["value"])))
    stream_rec.prep().count()
    scaled_stream = stream_rec.bake_stream(stream)
    live_ctx = streaming_assemble_context(
        scaled_stream.select("conv_id", "turn_idx", "text"),
        budget=40,
        max_turns=8,
    )
    q = (
        live_ctx.writeStream.format("memory")
        .queryName("live_ctx")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_live = spark.sql("select count(*) n from live_ctx").first()["n"]
    print(f"streaming bake + live context rows = {n_live} "
          f"(batch rows = {rows.count()})")

    # -- 3. corpus curation -------------------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    survivors = clean_corpus(docs, min_tokens=5, min_quality=0.2)
    n_in, n_out = docs.count(), survivors.count()
    print("== corpus curation ==")
    print(f"{n_in} docs -> {n_out} survivors "
          f"({n_in - n_out} filtered or deduped)")
    survivors.select("doc_id", "n_tokens", "quality", "lang_id").show(5)

    # -- 4. similarity search -----------------------------------------
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
