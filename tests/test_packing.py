"""Training-data assembly tier (operators/packing.py): deterministic
sampling, domain mixing, concat-and-chunk packing, document chunking.

The scale-critical property under test: every operator is a pure
function of row content — identical output at any partitioning (the
engine's determinism rule; df.sample fails it)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from recipys_spark.functions.text import token_count
from recipys_spark.operators.packing import (
    SAMPLE_MOD,
    chunk_documents,
    deterministic_sample,
    pack_sequences,
    weighted_domain_sample,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_sample_deterministic_across_partitioning(spark):
    docs = spark.read.parquet(DOCS)
    a = sorted(r.doc_id for r in deterministic_sample(docs, 0.3, ["doc_id"]).collect())
    b = sorted(
        r.doc_id
        for r in deterministic_sample(docs.repartition(23), 0.3, ["doc_id"]).collect()
    )
    assert a == b and 0 < len(a) < 500


def test_sample_rate_concentration(spark):
    """md5 coin is uniform: the realized rate lands near the nominal
    one (binomial bound, 500 rows, ±10 points is > 4 sigma)."""
    docs = spark.read.parquet(DOCS)
    for rate in (0.1, 0.5, 0.9):
        n = deterministic_sample(docs, rate, ["doc_id"]).count()
        assert abs(n / 500 - rate) < 0.1, (rate, n)
    assert deterministic_sample(docs, 0.0, ["doc_id"]).count() == 0
    assert deterministic_sample(docs, 1.0, ["doc_id"]).count() == 500
    with pytest.raises(ValueError):
        deterministic_sample(docs, 1.5, ["doc_id"])


def test_sample_nested_rates(spark):
    """Hash coins are consistent: a 0.2 sample is a SUBSET of the 0.5
    sample under the same key/seed — the property that lets a pipeline
    carve train/calibration subsets without re-hashing."""
    docs = spark.read.parquet(DOCS)
    small = {r.doc_id for r in deterministic_sample(docs, 0.2, ["doc_id"]).collect()}
    big = {r.doc_id for r in deterministic_sample(docs, 0.5, ["doc_id"]).collect()}
    assert small <= big


def test_weighted_domain_sample_semantics(spark):
    docs = spark.read.parquet(DOCS)
    out = weighted_domain_sample(
        docs, {"src1": 0.5, "src2": 2.25}, "source", ["doc_id"]
    )
    pdf = out.groupBy("source").count().toPandas().set_index("source")["count"]
    by_src = docs.groupBy("source").count().toPandas().set_index("source")["count"]
    # src2 (rate 2.25): every doc gets >= 2 copies, ~25% get 3
    assert pdf.get("src2", 0) >= 2 * by_src["src2"]
    assert pdf.get("src2", 0) <= 3 * by_src["src2"]
    # src1 (rate 0.5): roughly half survive (25 docs → wide bound)
    assert abs(pdf.get("src1", 0) / by_src["src1"] - 0.5) < 0.3
    # unlisted domains dropped by default_rate=0
    kept_sources = set(pdf.index)
    assert kept_sources <= {"src1", "src2"}
    # sample_copy numbers each duplicate
    wiki_copies = (
        out.where(F.col("source") == "src2")
        .groupBy("doc_id")
        .agg(F.collect_set("sample_copy").alias("c"))
        .collect()
    )
    for r in wiki_copies:
        assert sorted(r.c) == list(range(1, len(r.c) + 1))
    with pytest.raises(ValueError):
        weighted_domain_sample(docs, {"src1": -1.0}, "source", ["doc_id"])


def test_pack_sequences_invariants(spark):
    docs = spark.read.parquet(DOCS).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(docs, seq_len=512)
    # 1. every token of every doc lands in exactly one slice
    cover = (
        packed.groupBy("doc_id")
        .agg(F.sum(F.col("doc_end") - F.col("doc_start")).alias("t"))
        .join(docs, "doc_id")
    )
    assert cover.where(F.col("t") != F.col("n_tokens")).count() == 0
    # 2. no sequence overflows; all but the last are exactly full
    fills = packed.groupBy("seq_id").agg(
        F.sum(F.col("doc_end") - F.col("doc_start")).alias("fill")
    )
    assert fills.where(F.col("fill") > 512).count() == 0
    mx = fills.agg(F.max("seq_id")).first()[0]
    assert fills.where((F.col("fill") != 512) & (F.col("seq_id") != mx)).count() == 0
    # 3. slice offsets are consistent: seq_start + (doc_end - doc_start)
    #    never exceeds seq_len
    assert (
        packed.where(
            F.col("seq_start") + F.col("doc_end") - F.col("doc_start") > 512
        ).count()
        == 0
    )


def test_pack_sequences_partition_invariant(spark):
    """The two-phase prefix sum gives IDENTICAL packing regardless of
    num_partitions or input partitioning — the property that makes it
    safe at cluster scale."""
    docs = spark.read.parquet(DOCS).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    a = pack_sequences(docs, 512, num_partitions=1).orderBy("doc_id", "seq_id").collect()
    b = pack_sequences(docs.repartition(13), 512, num_partitions=7).orderBy(
        "doc_id", "seq_id"
    ).collect()
    assert a == b and len(a) > 0


def test_pack_sequences_zero_token_docs_dropped(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "n_tokens": [5, 0, 7]})
    )
    out = pack_sequences(df, seq_len=4).orderBy("doc_id", "seq_id").collect()
    assert [r.doc_id for r in out] == [1, 1, 3, 3]
    # doc 1: tokens 0..5 → seqs 0 (4 tokens) and 1 (1 token)
    assert (out[0].doc_start, out[0].doc_end) == (0, 4)
    assert (out[1].doc_start, out[1].doc_end) == (4, 5)
    # doc 3 starts at global offset 5 (doc 2 occupies nothing)
    assert out[2].seq_id == 1 and out[2].seq_start == 1


def test_chunk_documents_reconstruction(spark):
    """Disjoint chunks (stride == window) concatenate back to the
    normalized document; overlapping chunks cover every token."""
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    disjoint = chunk_documents(docs, max_tokens=50)
    recon = (
        # struct-sort, not orderBy+collect_list (whose order is not
        # guaranteed through the aggregation shuffle)
        disjoint.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("joined")
        )
        .join(
            docs.select(
                "doc_id",
                F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ").alias("norm"),
            ),
            "doc_id",
        )
    )
    assert recon.where(F.col("joined") != F.col("norm")).count() == 0

    overlapped = chunk_documents(docs, max_tokens=50, stride=40)
    tok_cover = overlapped.groupBy("doc_id").agg(
        F.max(F.col("chunk_idx") * 40 + F.col("chunk_n_tokens")).alias("covered")
    )
    n = docs.select("doc_id", token_count(F.col("text")).alias("n"))
    assert tok_cover.join(n, "doc_id").where(F.col("covered") < F.col("n")).count() == 0
    # every full window has exactly max_tokens
    assert overlapped.where(F.col("chunk_n_tokens") > 50).count() == 0
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=50, stride=60)


def test_sample_hash_range(spark):
    from recipys_spark.operators.packing import sample_hash

    docs = spark.read.parquet(DOCS)
    mm = docs.select(
        F.min(sample_hash(["doc_id"])).alias("lo"),
        F.max(sample_hash(["doc_id"])).alias("hi"),
    ).first()
    assert 0 <= mm.lo and mm.hi < SAMPLE_MOD


# -- property-based: packing vs a trivial python oracle ----------------------


def _pack_oracle(tokens_by_id, seq_len):
    """Linear-scan reference: lay docs end to end in id order, cut
    every seq_len tokens."""
    rows, pos = [], 0
    for doc_id in sorted(tokens_by_id):
        n = tokens_by_id[doc_id]
        if n <= 0:
            continue
        start, end = pos, pos + n
        for seq in range(start // seq_len, (end - 1) // seq_len + 1):
            lo, hi = max(start, seq * seq_len), min(end, (seq + 1) * seq_len)
            rows.append(
                (doc_id, seq, lo - seq * seq_len, lo - start, hi - start)
            )
        pos = end
    return sorted(rows)


def test_pack_sequences_matches_python_oracle_random(spark):
    """Randomized (seeded) sweep: arbitrary token-length multisets,
    several seq_len and partition counts, compared row-for-row against
    the linear-scan oracle — guards the two-phase prefix sum's bucket
    boundaries and the first/last-sequence arithmetic."""
    rng = np.random.RandomState(20240817)
    for trial in range(6):
        n_docs = int(rng.randint(1, 40))
        lens = rng.randint(0, 25, size=n_docs)
        seq_len = int(rng.choice([1, 3, 8, 64]))
        nparts = int(rng.choice([1, 2, 5]))
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(n_docs), "n_tokens": lens})
        )
        got = sorted(
            (r.doc_id, r.seq_id, r.seq_start, r.doc_start, r.doc_end)
            for r in pack_sequences(
                df, seq_len, num_partitions=nparts
            ).collect()
        )
        expect = _pack_oracle(dict(enumerate(int(x) for x in lens)), seq_len)
        assert got == expect, (trial, seq_len, nparts, lens.tolist())


# -- round-4 review-pass regressions ----------------------------------------


def test_pack_sequences_rejects_duplicate_and_null_ids(spark):
    """Duplicate ids would all receive the same RANGE-frame running
    total (overlapping slices, silently lost tokens); NULL ids have no
    place in a total order. Both now fail loudly at fit time."""
    dup = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 1, 2], "n_tokens": [5, 5, 3]})
    )
    with pytest.raises(ValueError, match="not unique"):
        pack_sequences(dup, seq_len=4)
    nulls = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1.0, None, 2.0], "n_tokens": [5, 4, 3]})
    )
    with pytest.raises(ValueError, match="NULL"):
        pack_sequences(nulls, seq_len=4)
    # the README remedy — a derived unique id — packs the duplicates
    fixed = dup.withColumn(
        "pack_id", F.col("doc_id") * 10 + F.monotonically_increasing_id() % 10
    )
    # deterministic variant: rank within duplicates via concat
    from recipys_spark.operators.packing import pack_sequences as ps

    uniq = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["1#1", "1#2", "2#1"], "n_tokens": [5, 5, 3]})
    )
    out = ps(uniq, seq_len=4, num_partitions=2)
    assert out.count() > 0


def test_sampler_integer_thresholds_are_exact(spark):
    """rate=0.3 must threshold at exactly 300000000 (round, not a
    truncating int() of 0.29999…×10^9): a coin equal to 299999999 is
    INSIDE the sample."""
    from recipys_spark.operators.packing import sample_hash

    docs = spark.read.parquet(DOCS)
    coins = {
        r.doc_id: r.c
        for r in docs.select(
            "doc_id", sample_hash(["doc_id"], domain="sample").alias("c")
        ).collect()
    }
    kept = {r.doc_id for r in deterministic_sample(docs, 0.3, ["doc_id"]).collect()}
    for doc_id, c in coins.items():
        assert (doc_id in kept) == (c < 300_000_000), (doc_id, c)


def test_chunk_documents_empty_and_null_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1, 2, 3], "text": ["real words here", "", "   \t ", None]}
        )
    )
    out = chunk_documents(df, max_tokens=2).collect()
    assert sorted(r.doc_id for r in out) == [0, 0]


def test_split_dataset_semantics(spark):
    from recipys_spark.operators.packing import split_dataset

    docs = spark.read.parquet(DOCS)
    out = split_dataset(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"])
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert abs(counts.get("train", 0) / 500 - 0.8) < 0.08
    # partitioning-invariant assignment
    a = sorted((r.doc_id, r.split) for r in out.select("doc_id", "split").collect())
    b = sorted(
        (r.doc_id, r.split)
        for r in split_dataset(
            docs.repartition(19), {"train": 0.8, "val": 0.1, "test": 0.1},
            ["doc_id"],
        ).select("doc_id", "split").collect()
    )
    assert a == b
    # leakage safety: keying on a coarser unit puts every row of the
    # unit in the same split
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    by_user = split_dataset(ev, {"train": 0.5, "test": 0.5}, ["user_id"])
    mixed = by_user.groupBy("user_id").agg(
        F.countDistinct("split").alias("n")
    )
    assert mixed.where(F.col("n") > 1).count() == 0
    with pytest.raises(ValueError, match="sum to 1"):
        split_dataset(docs, {"train": 0.9}, ["doc_id"])
    with pytest.raises(ValueError, match="non-negative"):
        split_dataset(docs, {"a": 1.5, "b": -0.5}, ["doc_id"])


def test_write_training_shards_contiguous(spark, tmp_path):
    from recipys_spark.operators.packing import (
        pack_sequences,
        write_training_shards,
    )

    docs = spark.read.parquet(DOCS).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(docs, seq_len=256)
    path = str(tmp_path / "shards")
    manifest = write_training_shards(packed, path, num_shards=4)
    assert manifest["rows"] == packed.count()
    assert manifest["order_col"] == "seq_id"
    assert manifest["num_files"] >= 1  # ACTUAL files, not the request
    with pytest.raises(ValueError, match="local filesystem"):
        write_training_shards(packed, "s3a://bucket/shards")
    import json
    import os

    on_disk = json.load(open(os.path.join(path, "_manifest.json")))
    assert on_disk == manifest
    # shards are contiguous, non-overlapping slices of the training
    # order: per-file [min, max] seq_id intervals must not interleave
    back = spark.read.parquet(path).select(
        "seq_id", F.input_file_name().alias("f")
    )
    spans = (
        back.groupBy("f").agg(F.min("seq_id").alias("lo"), F.max("seq_id").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for a, b in zip(spans, spans[1:]):
        assert a.hi <= b.lo, (a, b)


def test_sample_then_split_is_uniform(spark):
    """ADVICE r4 (medium): sample → split chained on the SAME key must
    not correlate. Before domain-separating the md5 coin, every
    survivor of deterministic_sample(0.1) had a coin < 1e8 and
    split_dataset's first sorted-name boundary was exactly 1e8 — the
    entire sample landed in one split. With per-operation domain tags
    the chained decisions are independent: each split's share of the
    sample must be near its weight."""
    from recipys_spark.operators.packing import split_dataset

    docs = spark.read.parquet(DOCS)  # 500 docs
    sampled = deterministic_sample(docs, 0.5, ["doc_id"])
    out = split_dataset(
        sampled, {"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"]
    )
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total > 100
    # all three splits populated, and train holds the clear majority —
    # impossible under the old shared coin (one split took everything)
    assert set(counts) == {"train", "val", "test"}, counts
    assert 0.6 < counts["train"] / total < 0.95, counts
    # and sampling first must not change a unit's split assignment
    full_split = {
        r.doc_id: r.split
        for r in split_dataset(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"]
        ).collect()
    }
    for r in out.collect():
        assert full_split[r.doc_id] == r.split


def test_mix_coin_independent_of_sample_coin(spark):
    """The domain-mix coin and the sample coin on the same key must
    differ for most keys (they were identical before domain tags)."""
    from recipys_spark.operators.packing import sample_hash

    docs = spark.read.parquet(DOCS)
    pair = docs.select(
        sample_hash(["doc_id"], domain="sample").alias("a"),
        sample_hash(["doc_id"], domain="mix").alias("b"),
    )
    n_equal = pair.where(F.col("a") == F.col("b")).count()
    assert n_equal <= 1  # collisions ~ n/1e9


# -- round-5: engineered skew stress (VERDICT r4 #8) -------------------------


def _skewed_token_frame(spark, n_docs=20_000, seed=7):
    """Heavy-tailed token counts: median ~20, five docs at 100x the
    median, one mega-doc at 10_000x (200k tokens) — the web-corpus
    shape where a handful of giant documents carry most of the token
    mass. Ids are dense ints; the MASS skew is what's engineered (the
    id-quantile buckets balance ROW counts, which skew cannot move)."""
    rng = np.random.RandomState(seed)
    lens = rng.randint(5, 36, size=n_docs).astype("int64")
    for frac in (0.0008, 0.21, 0.45, 0.66, 0.99):
        lens[int(frac * (n_docs - 1))] = 20 * 100
    lens[int(0.55 * (n_docs - 1))] = 20 * 10_000
    return (
        spark.createDataFrame(pd.DataFrame({"doc_id": range(n_docs), "n_tokens": lens})),
        lens,
    )


def test_pack_sequences_token_mass_skew_buckets_stay_balanced(spark):
    """The two-phase prefix sum buckets by ID QUANTILES, so a 10_000x
    token-mass outlier cannot concentrate rows in one bucket: the
    windowed cumsum (the only per-bucket serial stage) sees ~n/nparts
    rows everywhere. Asserts the realized per-bucket row bound and
    that the giant docs' explode fan-out (mega-doc -> ~391 slices at
    seq_len=512) lands post-window, where it is embarrassingly
    parallel."""
    df, lens = _skewed_token_frame(spark)
    nparts = 16
    # replicate the operator's bucket derivation (same percentile probe)
    fracs = [i / nparts for i in range(1, nparts)]
    cuts = df.where(F.col("n_tokens") > 0).agg(
        F.percentile_approx(F.col("doc_id"), F.array(*[F.lit(f) for f in fracs]))
    ).first()[0]
    uniq = sorted(set(float(c) for c in cuts))
    bucket = F.lit(0)
    for c in uniq:
        bucket = bucket + (F.col("doc_id") > F.lit(c)).cast("int")
    per_bucket = (
        df.withColumn("__pid", bucket).groupBy("__pid").count().collect()
    )
    rows = [r["count"] for r in per_bucket]
    assert len(rows) == nparts
    # percentile_approx is near-exact here: no bucket beyond 2x the mean
    assert max(rows) <= 2 * (len(lens) / nparts), rows

    out = pack_sequences(df, seq_len=512, num_partitions=nparts, check_ids=False)
    pdf = out.toPandas()
    total = int(lens.sum())
    # token conservation: every token position is covered exactly once
    assert int((pdf.doc_end - pdf.doc_start).sum()) == total
    # every full sequence is tiled exactly (no gaps/overlaps)
    per_seq = pdf.groupby("seq_id").apply(
        lambda g: int((g.doc_end - g.doc_start).sum()), include_groups=False
    )
    n_seq = -(-total // 512)
    assert len(per_seq) == n_seq
    assert (per_seq.iloc[:-1] == 512).all() if n_seq > 1 else True
    # the mega-doc spans ~200k/512 consecutive sequences
    mega = pdf[pdf.doc_id == int(0.55 * (len(lens) - 1))]
    assert len(mega) in (391, 392)
    assert (np.diff(np.sort(mega.seq_id.values)) == 1).all()


def test_pack_sequences_skew_partition_invariant(spark):
    """Mass skew plus arbitrary physical partitioning: byte-identical
    output (the determinism rule) — the quantile cuts are literals in
    the plan, so bucket membership cannot depend on layout."""
    df, _ = _skewed_token_frame(spark, n_docs=5_000)
    a = pack_sequences(df.repartition(3), 512, num_partitions=8, check_ids=False)
    b = pack_sequences(df.repartition(37), 512, num_partitions=8, check_ids=False)
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb


def test_split_dataset_hot_key_is_shuffle_free(spark):
    """A hot key (half the corpus in one conversation) cannot skew
    split_dataset: the assignment is a stateless per-row expression —
    the plan must contain NO Exchange, and every row of the hot key
    lands in the same split (the leakage-safe unit guarantee)."""
    n = 50_000
    pdf = pd.DataFrame(
        {
            "row_id": range(n),
            "conv_id": ["hot"] * (n // 2)
            + [f"c{i}" for i in range(n - n // 2)],
        }
    )
    from recipys_spark.operators.packing import split_dataset

    df = spark.createDataFrame(pdf).repartition(16)
    out = split_dataset(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, ["conv_id"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the repartition Exchange belongs to the INPUT; the operator adds none
    base_plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == base_plan.count("Exchange"), plan
    hot = out.where(F.col("conv_id") == "hot").select("split").distinct().collect()
    assert len(hot) == 1
    # proportions over distinct cold keys track the weights
    cold = out.where(F.col("conv_id") != "hot").groupBy("split").count().collect()
    frac = {r["split"]: r["count"] / (n - n // 2) for r in cold}
    assert abs(frac.get("train", 0) - 0.8) < 0.03, frac
