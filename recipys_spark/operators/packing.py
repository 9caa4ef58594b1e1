"""Training-data assembly: deterministic sampling, domain mixing,
concat-and-chunk sequence packing, document chunking.

The tier between curation (operators/corpus.py) and the training job:
after cleaning a 100 TB corpus you (a) downsample / re-weight domains
to the target mixture, (b) chunk long documents, (c) pack everything
into fixed-length training sequences. All four operators are pure JVM
expressions (no UDF, no driver loop over data) with exact SQL mirrors.

Determinism rule (the engine's): every operator here is a pure
function of row CONTENT — hash-based sampling and id-ordered packing
give byte-identical output at any partitioning or cluster size, unlike
``df.sample`` (seeded per-partition → changes under repartition).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: modulus for the md5-based sampling hash: the first 15 hex chars
#: (60 bits) of md5, mod 10^9 — uniform to ~1e-9, and every operation
#: (md5, substring, base-16 parse, mod, compare) has an exact ANSI-SQL
#: mirror, so sampling decisions replay bit-identically in DuckDB.
SAMPLE_MOD = 1_000_000_000


def md5_long(col, seed: int = 42):
    """The portable 60-bit md5 coin: md5(value + '#seed'), first 15 hex
    chars parsed base-16 — non-negative int64 with an exact DuckDB
    mirror (CAST(concat('0x', substring(md5(...), 1, 15)) AS BIGINT)).
    The ONE shared implementation of this idiom (sampling, splits,
    hash encoding) so the cross-engine arithmetic cannot drift."""
    h = F.md5(F.concat(col.cast("string"), F.lit(f"#{seed}")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def sample_hash(cols: Sequence, seed: int = 42, domain: str = ""):
    """Uniform [0, SAMPLE_MOD) hash of the key columns — the sampling
    coin. md5 of the '|'-joined key + domain + seed (cross-engine
    mirrorable; the xxhash64 family would be JVM-only).

    ``domain`` separates the coin per OPERATION: without it,
    sample-then-split (or any chain of coin-based operators) on the
    same key reuses the identical coin, so the downstream decision is
    a deterministic function of the upstream one — e.g. every survivor
    of a 10% sample would land in whichever split owns the lowest
    boundary. Each operator passes its own domain tag
    (``sample`` / ``mix`` / ``split``), making chained decisions
    independent even at the same (key, seed)."""
    key = F.concat_ws(
        "|",
        *[
            (F.col(c) if isinstance(c, str) else c).cast("string")
            for c in cols
        ],
    )
    if domain:
        key = F.concat(key, F.lit(f"#{domain}"))
    return md5_long(key, seed) % F.lit(SAMPLE_MOD)


def deterministic_sample(
    df: DataFrame,
    rate: float,
    key_cols: Sequence[str],
    seed: int = 42,
) -> DataFrame:
    """Keep each row iff hash(key) < rate — a deterministic Bernoulli
    sample that is reproducible across cluster sizes, repartitions and
    engines (``df.sample`` is none of those: its per-partition RNG
    changes membership whenever partitioning does). Zero shuffle: a
    filter that fuses into the scan.

    ``key_cols`` must identify the sampling unit (doc id for
    per-document, conv_id for per-conversation — keying on conv_id
    keeps WHOLE conversations, the leakage-safe unit for transcript
    corpora).

    The threshold resolves to ONE integer on the driver
    (``round(rate * SAMPLE_MOD)``) and the row path compares pure
    int64 — no binary-double arithmetic near the boundary, so
    membership is bit-identical across engines (0.3 in double is
    0.2999…; a truncating int() would threshold one unit low and a
    DECIMAL-arithmetic engine would disagree on boundary coins)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.where(
        sample_hash(key_cols, seed, domain="sample")
        < F.lit(int(round(rate * SAMPLE_MOD)))
    )


def weighted_domain_sample(
    df: DataFrame,
    rates: dict,
    domain_col: str,
    key_cols: Sequence[str],
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-domain sampling rates in one pass — the domain-mixture
    reweighting every pretraining corpus build runs (e.g. {"web": 0.1,
    "code": 1.0, "wiki": 3.0} — rates > 1 mean duplication: floor(r)
    full copies plus a frac(r) coin, emitted via explode of a
    repeat-count array, still deterministic and shuffle-free).

    Unmatched domains get ``default_rate`` (0 = drop — explicit
    allowlisting, the safe default for a curated mixture).

    Each rate resolves DRIVER-side to (whole copies, integer coin
    threshold) so the row path is int compares only — same
    cross-engine boundary rationale as deterministic_sample."""
    import math

    for d, r in rates.items():
        if r < 0:
            raise ValueError(f"negative rate for domain {d!r}")
    if default_rate < 0:
        raise ValueError("default_rate must be >= 0")

    def split_rate(r):
        whole = math.floor(r)
        return whole, int(round((r - whole) * SAMPLE_MOD))

    coin = sample_hash(key_cols, seed, domain="mix")
    dw, dt = split_rate(float(default_rate))
    whole_expr, thresh_expr = F.lit(dw), F.lit(dt)
    for d, r in sorted(rates.items()):
        w_, t_ = split_rate(float(r))
        whole_expr = F.when(F.col(domain_col) == d, F.lit(w_)).otherwise(whole_expr)
        thresh_expr = F.when(F.col(domain_col) == d, F.lit(t_)).otherwise(thresh_expr)
    copies = whole_expr + (coin < thresh_expr).cast("int")
    out = df.withColumn("__copies", copies).where(F.col("__copies") > 0)
    return (
        out.withColumn(
            "sample_copy", F.explode(F.sequence(F.lit(1), F.col("__copies")))
        )
        .drop("__copies")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_partitions: Optional[int] = None,
    check_ids: bool = True,
) -> DataFrame:
    """Concat-and-chunk packing: lay all documents end to end in
    ``id_col`` order and cut every ``seq_len`` tokens — the standard
    pretraining sample-packing scheme (GPT-style). Returns one row per
    (document × training sequence) slice:

    - ``seq_id``   — which fixed-length training sequence,
    - ``seq_start``— where this doc's slice begins inside it,
    - ``doc_start``/``doc_end`` — the [start, end) token range of the
      doc contributing to this sequence (docs spanning a boundary emit
      one row per sequence they touch).

    Zero-token docs are dropped (they occupy no positions).

    Scale shape — the global running total is a textbook two-phase
    parallel prefix sum, NOT a single-partition window (which would
    serialize 10^12 tokens through one task). For numeric ids (the
    common case): one ``percentile_approx`` probe yields
    ``num_partitions - 1`` LITERAL cut points (the sketch is
    deterministic), each row's bucket is a pure expression of its own
    id, a per-bucket windowed cumsum runs in parallel, and one bounded
    collect of the per-bucket totals turns into literal offsets — the
    boundaries live in the plan, so the two jobs can never disagree.
    Non-numeric ids fall back to range partitioning pinned with a
    localCheckpoint (same algorithm, boundaries from the range
    partitioner instead of literals). Either way the result depends
    only on the id ORDER, not on where the boundaries fall.

    ``id_col`` must be a NON-NULL, UNIQUE total order — duplicates
    would make the running total ill-defined (two rows claiming the
    same positions) and NULLs have no place in the order. One fit-time
    aggregation verifies both and raises naming the violation; pass
    ``check_ids=False`` to skip the probe when uniqueness is already
    guaranteed upstream (e.g. a primary key). Rows duplicated by
    weighted_domain_sample must first get a fresh unique id, e.g.
    ``F.concat_ws('#', 'doc_id', 'sample_copy')`` or
    ``doc_id * max_copies + sample_copy``."""
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    spark = df.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    from pyspark.sql import Window, types as T

    base = df.select(id_col, F.col(token_col).cast("long").alias("__n")).where(
        F.col("__n") > 0
    )
    if check_ids:
        chk = base.agg(
            F.count("*").alias("n_all"),
            F.count(id_col).alias("n_id"),
            F.countDistinct(id_col).alias("n_dist"),
        ).first()
        if chk.n_id < chk.n_all:
            raise ValueError(
                f"pack_sequences: {chk.n_all - chk.n_id} NULL {id_col!r} "
                "values — the packing order requires non-null ids"
            )
        if chk.n_dist < chk.n_id:
            raise ValueError(
                f"pack_sequences: {id_col!r} is not unique "
                f"({chk.n_id - chk.n_dist} duplicate rows) — duplicate ids "
                "make the token layout ill-defined; derive a unique id "
                "first (e.g. concat_ws('#', id, sample_copy)) or pass "
                "check_ids=False only when uniqueness is guaranteed"
            )
    numeric_id = isinstance(base.schema[id_col].dataType, T.NumericType)
    if numeric_id and nparts > 1:
        fracs = [i / nparts for i in range(1, nparts)]
        cuts = base.agg(
            F.percentile_approx(F.col(id_col), F.array(*[F.lit(f) for f in fracs]))
        ).first()[0] or []
        # strictly increasing literal cuts; duplicates (low-cardinality
        # ids) collapse — fewer, bigger buckets, still correct
        uniq = sorted(set(float(c) for c in cuts))
        bucket = F.lit(0)
        for c in uniq:
            bucket = bucket + (F.col(id_col) > F.lit(c)).cast("int")
        staged = base.withColumn("__pid", bucket)
    else:
        staged = base.repartitionByRange(max(nparts, 1), F.col(id_col)).withColumn(
            "__pid", F.spark_partition_id()
        )
    # explicit ROWS frame: the default RANGE frame includes ORDER BY
    # peers, so duplicate ids would all receive the same running total
    # (ids are verified unique above, but the frame must still be ROWS
    # to match the oracle's ROWS BETWEEN ... semantics exactly)
    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = staged.withColumn("__local_end", F.sum("__n").over(w))
    if not (numeric_id and nparts > 1):
        # range-partitioner boundaries are re-derived per job — pin the
        # materialized frame so the totals collect below and the
        # returned plan see identical __pid assignments
        local = local.localCheckpoint(eager=True)
    # bounded driver collect: one (pid, total, min_id) triple per
    # bucket; offsets are the running totals in id (== bucket) order,
    # so the global prefix is independent of boundary placement
    totals = (
        local.groupBy("__pid")
        .agg(F.max("__local_end").alias("t"), F.min(id_col).alias("m"))
        .collect()
    )
    totals.sort(key=lambda r: r["m"])
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["__pid"]] = acc
        acc += r["t"]
    off = F.coalesce(
        *[
            F.when(F.col("__pid") == p, F.lit(o))
            for p, o in offsets.items()
        ]
    ) if offsets else F.lit(0)
    g = local.select(
        id_col,
        "__n",
        (F.col("__local_end") + off).alias("__end"),
    ).withColumn("__start", F.col("__end") - F.col("__n"))
    # integer division (div), not double `/` + cast: the double quotient
    # of offsets beyond 2^53 can round k - 1/seq_len up to k, emitting a
    # phantom slice — `div` is exact at any global token offset and
    # matches the oracle's `//`
    first = F.expr(f"__start div {int(seq_len)}")
    last = F.expr(f"(__end - 1) div {int(seq_len)}")
    return (
        g.withColumn("seq_id", F.explode(F.sequence(first, last)))
        .select(
            id_col,
            "seq_id",
            F.greatest(F.col("__start") - F.col("seq_id") * seq_len, F.lit(0))
            .cast("long")
            .alias("seq_start"),
            F.greatest(F.col("seq_id") * seq_len - F.col("__start"), F.lit(0))
            .cast("long")
            .alias("doc_start"),
            F.least(
                (F.col("seq_id") + 1) * seq_len - F.col("__start"), F.col("__n")
            )
            .cast("long")
            .alias("doc_end"),
        )
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    stride: Optional[int] = None,
    text_col: str = "text",
) -> DataFrame:
    """Split documents into token-window chunks of ``max_tokens`` with
    optional overlap (``stride`` < max_tokens ⇒ overlapping windows,
    the pre-embedding chunking every retrieval/similarity pipeline
    runs; default stride = max_tokens ⇒ disjoint). All non-text
    columns pass through; adds (chunk_idx, chunk_text,
    chunk_n_tokens). Documents shorter than one window emit exactly
    one chunk; NULL or whitespace-only documents emit none. Pure JVM
    array ops (tokens → sequence → slice → join), no UDF, fuses into
    the projection."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    stride = max_tokens if stride is None else stride
    if not 1 <= stride <= max_tokens:
        raise ValueError("stride must be in [1, max_tokens]")
    from recipys_spark.functions.text import tokens

    # drop empty fragments: tokens('') is [''] and a leading tab
    # survives the space-only trim — without the filter, empty or
    # whitespace-only docs would emit one phantom empty chunk and
    # leading-whitespace docs would count a ghost first token
    toks = F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)
    others = [c for c in df.columns if c != text_col]

    # Bind the token array as a HOF lambda variable (the
    # ngram_decontaminate pattern) so the split/lower/trim/filter chain
    # evaluates ONCE per document: the alias-then-explode-then-slice
    # form was collapsed by Catalyst into projections that re-evaluated
    # the full tokenization four times per doc (interpreted HOFs get no
    # cross-expression subexpression elimination) — measured 1.2 s vs
    # 0.3 s at sf1.0. Each chunk is a (text, n_tokens) struct; a NULL
    # or empty token array yields a NULL chunk list, and posexplode of
    # NULL drops the row — exactly the old `where(__nc > 0)` behavior.
    def chunks_of(t):
        n = F.size(t)
        # chunk starts: 0, stride, 2*stride, ... while start < n; the
        # last chunk may be short
        nc = (
            F.ceil((F.greatest(n - max_tokens, F.lit(0))) / F.lit(stride)) + 1
        )
        return F.transform(
            F.sequence(F.lit(0), (nc - 1).cast("int")),
            lambda i: F.struct(
                F.array_join(
                    F.slice(t, i * F.lit(stride) + 1, max_tokens), " "
                ).alias("chunk_text"),
                F.least(n - i * F.lit(stride), F.lit(max_tokens)).alias(
                    "chunk_n_tokens"
                ),
            ),
        )

    carr = F.get(
        F.transform(
            F.array(toks), lambda t: F.when(F.size(t) > 0, chunks_of(t))
        ),
        F.lit(0),
    )
    return df.select(
        *others, F.posexplode(carr).alias("chunk_idx", "__c")
    ).select(
        *others,
        "chunk_idx",
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.chunk_n_tokens").alias("chunk_n_tokens"),
    )


def split_dataset(
    df: DataFrame,
    weights: dict,
    key_cols: Sequence[str],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: one hash coin buckets
    each sampling unit into the named splits by weight (e.g.
    {"train": 0.98, "val": 0.01, "test": 0.01}) — reproducible at any
    partitioning/cluster size, leakage-safe when keyed on the
    conversation/document id (every row of a unit lands in the SAME
    split), and stable under re-runs (``randomSplit`` is none of
    those). Weights must sum to 1 within 1e-9; boundaries resolve to
    integer thresholds driver-side (split names sorted for
    determinism). Appends ``split_col``."""
    if not weights:
        raise ValueError("weights must be a non-empty dict")
    total = float(sum(weights.values()))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    coin = sample_hash(key_cols, seed, domain="split")
    expr = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += float(weights[name])
        upper = int(round(acc * SAMPLE_MOD))
        cond = coin < F.lit(upper)
        branch = F.lit(name)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def write_training_shards(
    df: DataFrame,
    path: str,
    order_col: str = "seq_id",
    num_shards: int = 32,
    max_records_per_file: int = 1_000_000,
) -> dict:
    """Materialize a training-ready dataset: range-partition by the
    sequence order, sort within shards, write parquet with bounded
    file sizes, and drop a ``_manifest.json`` (row count, shard count,
    order column, write options) the trainer's data loader can trust
    without listing the bucket. Returns the manifest dict.

    Range partitioning keeps each shard a CONTIGUOUS slice of the
    training order — samplers that stream shards sequentially see the
    same curriculum the packing defined; ``maxRecordsPerFile`` bounds
    memory per reader task at 10^12-token scale.

    The manifest records the ACTUAL file count (range partitioning can
    produce fewer non-empty shards than requested, and
    maxRecordsPerFile can split one shard into several files) — the
    number a loader can trust. The manifest write itself uses the
    local filesystem; for object-store paths (s3a://, hdfs://) this
    raises with instructions rather than silently dropping the file
    somewhere local."""
    import json
    import os

    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            "write_training_shards writes _manifest.json via the local "
            f"filesystem; got {path!r}. For object stores, write the "
            "parquet yourself and emit the manifest through your "
            "store's client (the parquet layout options are plain "
            "DataFrameWriter settings)."
        )
    fs_path = path[len("file://"):] if path.startswith("file://") else path
    (
        df.repartitionByRange(num_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
    back = df.sparkSession.read.parquet(path)
    # one read-back job for the whole manifest (count + distinct-file
    # count together) — two separate scans would be two extra full
    # passes over a 10^12-token dataset
    stats = (
        # input_file_name() is non-deterministic, so Spark 4 forbids it
        # directly inside an aggregate — project it first
        back.select(F.input_file_name().alias("__f"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("__f").alias("n_files"),
        )
        .first()
    )
    manifest = {
        "rows": stats["rows"],
        "order_col": order_col,
        "num_files": stats["n_files"],
        "requested_shards": num_shards,
        "max_records_per_file": max_records_per_file,
        "columns": back.columns,
    }
    with open(os.path.join(fs_path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
