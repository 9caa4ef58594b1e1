"""Rolling-hash document fingerprinting (winnowing) and
substring-overlap detection.

MinHash (operators/dedup.py) answers "are these documents similar as
wholes?"; winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the
MOSS algorithm) answers "do these documents share verbatim passages?"
— the right tool for benchmark-contamination and boilerplate detection
in training corpora, where a 200-char quoted test item inside a long
document never moves whole-doc Jaccard.

Algorithm, expressed relationally (every step has a DuckDB mirror):

1. normalize text (lower, collapse whitespace) and slide a character
   ``k``-gram over it — position ``pos`` → ``substr(text, pos, k)``;
2. hash each k-gram (xxhash64 production family, or the 60-bit md5
   prefix for the SQL-mirrorable ``hash_family="md5"``);
3. over every window of ``window`` consecutive k-gram hashes keep the
   MINIMUM — any shared substring of length ≥ k+window-1 guarantees at
   least one shared selected hash (the winnowing guarantee);
4. a document's fingerprint set = the DISTINCT selected hash values.
   (Textbook winnowing keeps (hash, rightmost position) pairs; the
   distinct-value set selects the same hashes, is order-free, and
   keeps the guarantee.)

Scale notes: the gram explode multiplies rows by ~doc length — but the
exploded relation is (id, pos, hash) only (24 bytes/row, never the
text), the window min is one partial-agg-friendly window per doc, and
everything downstream shuffles on the fingerprint value. Promiscuous
fingerprints (boilerplate shared by > ``max_df`` docs) are dropped
before the pair join, which bounds every join bucket — the same
hot-bucket cap rationale as star-linking in minhash_lsh_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from recipys_spark.functions.text import normalized_text


def _gram_hash(gram, hash_family: str):
    if hash_family == "xxhash64":
        return F.xxhash64(gram)
    if hash_family != "md5":
        raise ValueError("hash_family must be 'xxhash64' or 'md5'")
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, fp) rows: the winnowed fingerprint set of each document.

    Guarantee: two documents sharing a normalized substring of length
    ≥ ``k + window - 1`` share at least one fp. Documents with fewer
    than ``window`` k-grams (but ≥ 1) contribute their global minimum,
    so every document of ≥ k normalized chars has ≥ 1 fingerprint;
    shorter documents have none."""
    norm = df.select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("__t")
    )
    n_grams = F.length("__t") - k + 1
    # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — docs
    # shorter than k must produce no grams at all
    positions = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    grams = norm.select(
        id_col,
        F.posexplode(
            F.transform(
                positions,
                lambda i: F.substring(F.col("__t"), i, k),
            )
        ).alias("__pos", "__gram"),
    ).select(
        id_col,
        F.col("__pos").alias("pos"),
        _gram_hash(F.col("__gram"), hash_family).alias("h"),
    )
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    )
    doc = Window.partitionBy(id_col)
    sel = grams.select(
        id_col,
        "pos",
        F.min("h").over(frame).alias("fp"),
        F.count("*").over(frame).alias("__n"),
        F.count("*").over(doc).alias("__total"),
    )
    # full windows; docs with fewer grams than `window` contribute their
    # single whole-doc window (the pos-0 frame spans all grams)
    kept = sel.where(
        (F.col("__n") == window)
        | ((F.col("__total") < window) & (F.col("pos") == 0))
    )
    return kept.select(id_col, "fp").distinct()


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_df: int = 100,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b, n_shared) pairs of documents sharing ≥ ``min_shared``
    winnowed fingerprints — verbatim-overlap candidates.

    Fingerprints present in more than ``max_df`` documents (boilerplate,
    headers) are dropped before the pair join: they carry no signal and
    a single such value would otherwise create an O(df²) bucket."""
    fps = winnow_fingerprints(df, text_col, id_col, k, window, hash_family)
    rare = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("__df"))
        .where(F.col("__df") <= max_df)
        .select("fp")
    )
    fps = fps.join(rare, "fp")
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
