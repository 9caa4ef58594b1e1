"""Worked example #2: raw crawl archives → packed training sequences.

Run:  python examples/webcorpus_pipeline.py

The full web-corpus path, every stage engine-native:

  WARC archives → record parse → HTML→text → URL filter →
  quality/dedup curation → eval-set decontamination →
  BPE token accounting → concat-and-chunk sequence packing
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from recipys_spark.operators import (
        bpe_token_count,
        clean_corpus,
        dedup_paragraphs,
        html_to_text,
        ngram_decontaminate,
        pack_sequences,
        parse_warc_records,
        train_bpe,
        url_features,
    )
    from recipys_spark.operators.warc import synthetic_warc
    from recipys_spark.sources.io import get_spark

    spark = get_spark(parallelism=8, app_name="webcorpus_pipeline")

    # -- 1. ingest: WARC → text documents ------------------------------
    archives = synthetic_warc(spark, n_files=40, records_per_file=5)
    recs = parse_warc_records(archives)
    docs = recs.select(
        (F.col("file_id") * 1000 + F.col("record_idx")).alias("doc_id"),
        F.col("target_uri").alias("url"),
        html_to_text(F.col("body").cast("string")).alias("text"),
    )
    # sizing report before the shuffle-heavy curation tiers: total rows
    # drive the shuffle-partition count every dedup groupBy will use.
    # The advisor's probe IS the document count — don't run the
    # WARC-parse + HTML-extraction pipeline a second time just to print
    # the same number (at 100 TB that would be a duplicated full scan)
    from recipys_spark.plans.advisor import recommend_pipeline_config

    cfg = recommend_pipeline_config(docs, apply=True)
    print(
        f"== ingest == {archives.count()} archives -> "
        f"{cfg['stats']['total_rows']} documents"
    )
    print(f"== pipeline sizing == shuffle_partitions={cfg['shuffle_partitions']}")

    # -- 2. URL-level filtering ----------------------------------------
    with_urls = url_features(docs)
    kept = with_urls.where(
        (F.col("url_scheme") == "https") & (F.col("url_path_depth") <= 4)
    ).select("doc_id", "url", "text")
    print(f"== url filter == {kept.count()} kept")

    # -- 3. curation: paragraph dedup + quality/near-dup clean ----------
    para = dedup_paragraphs(kept.select("doc_id", "text"))
    survivors = clean_corpus(para, min_tokens=3, min_quality=0.0)
    print(f"== curation == {para.count()} after paragraph dedup, "
          f"{survivors.count()} after clean_corpus")

    # -- 4. decontamination against an eval set ------------------------
    # deterministic stand-in eval set (bare limit() is order-unstable
    # and re-resolved per action)
    bench = survivors.orderBy("doc_id").limit(3).select("doc_id", "text")
    train_docs = ngram_decontaminate(
        survivors.select("doc_id", "text"), bench, n=5
    )
    print(f"== decontamination == {train_docs.count()} survive "
          f"(eval set of {bench.count()})")

    # -- 5. tokenize + pack --------------------------------------------
    merges = train_bpe(train_docs, num_merges=100)
    counted = bpe_token_count(train_docs, merges)
    packed = pack_sequences(counted, seq_len=64, token_col="text_n_bpe")
    n_seqs = packed.agg(F.countDistinct("seq_id")).first()[0]
    total = packed.agg(F.sum(F.col("doc_end") - F.col("doc_start"))).first()[0]
    print(f"== packing == {total} BPE tokens into {n_seqs} sequences of 64")
    packed.orderBy("seq_id", "seq_start").show(6)

    spark.stop()


if __name__ == "__main__":
    main()
