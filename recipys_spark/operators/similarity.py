"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force top-k — the exactness baseline. The dot
  product is a JVM-side ``aggregate``/``zip_with`` expression (no
  Python); the join is query×corpus, so use it when |queries| is small
  or as the verification oracle.
- ``lsh_cosine_topk``: the scale path — deterministic random-hyperplane
  signatures bucket the corpus; each query probes only its bucket
  (plus optional multi-probe neighbors at Hamming distance 1). Recall
  < 1 by construction; tested against the brute baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a, b):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank), self-matches excluded,
    deterministic tie-break by neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("__qe")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("__ce")
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("__qe"), F.col("__ce")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplane_signature(emb_col, n_planes: int, dim: int, seed: int = 42):
    """Deterministic random-hyperplane sign signature as a long.

    Plane p's weight for dimension i is ±1 derived from xxhash64(p, i,
    seed) — reproducible on any cluster size with no side data."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        weights = F.array(
            *[
                F.when(
                    F.pmod(F.xxhash64(F.lit(p), F.lit(i), F.lit(seed)), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
                for i in range(dim)
            ]
        )
        proj = F.aggregate(
            F.zip_with(emb_col, weights, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    dim: int = 64,
    multiprobe: bool = True,
    seed: int = 42,
    n_tables: int = 1,
) -> DataFrame:
    """Bucketed ANN: join queries to corpus rows sharing a hyperplane
    signature bucket (and, with multiprobe, all Hamming-1 buckets),
    then exact cosine + top-k within the candidates.

    Sizing at scale (parameter guidance, not enforced):

    - ``n_planes`` sets the bucket count (2^n_planes) and therefore the
      expected bucket size |corpus| / 2^n_planes — the quantity that
      bounds per-probe join fan-out. Pick
      ``n_planes ≈ log2(|corpus| / target_bucket_rows)`` with
      target_bucket_rows ~ 10^3–10^4: 10^6 vectors → ~8–10 planes,
      10^9 → ~17–20, 10^11 → ~24–27. More planes = smaller buckets =
      faster but lower per-table recall.
    - ``n_tables`` is the OR-construction (same banding idea as
      MinHash-LSH): each table hashes with an independent plane set
      (seed offset), a candidate needs to co-bucket in ANY table —
      recall ≈ 1-(1-p^n_planes)^n_tables per neighbor. Raise n_tables
      (2–8) to recover the recall that extra planes cost; candidate
      volume grows linearly with it, never quadratically.
    """
    if n_tables < 1:
        raise ValueError("n_tables must be >= 1")
    table_seeds = [seed + 7919 * t for t in range(n_tables)]

    def buckets(col, probe: bool):
        out = []
        for t, ts in enumerate(table_seeds):
            sig = hyperplane_signature(col, n_planes, dim, ts)
            sigs = [sig] + (
                [sig.bitwiseXOR(F.lit(1 << p).cast("long")) for p in range(n_planes)]
                if probe
                else []
            )
            # disambiguate tables by offsetting the bucket id space
            out += [s + F.lit(t << (n_planes + 1)).cast("long") for s in sigs]
        return out

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("__ce"),
        F.explode(F.array(*buckets(F.col(emb_col), probe=False))).alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("__qe"),
        F.explode(F.array(*buckets(F.col(emb_col), probe=multiprobe))).alias(
            "__bucket"
        ),
    )
    scored = (
        q.join(c, "__bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("__qe"), F.col("__ce")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
