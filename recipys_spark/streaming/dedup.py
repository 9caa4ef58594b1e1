"""Streaming deduplication for live ingest pipelines.

The batch tiers (operators/dedup.py) assume the corpus is at rest; a
live transcript/document feed needs dedup state that does not grow
without bound. ``streaming_exact_dedup`` uses
``dropDuplicatesWithinWatermark`` keyed on the same whitespace-
normalized md5 fingerprint as batch ``exact_dedup``: state holds only
fingerprints younger than the watermark horizon, so memory is bounded
by (ingest rate × watermark) instead of corpus size — the difference
between a 100 TB/day feed running forever and an executor OOM.

Semantics vs batch: batch keeps the min-id row per fingerprint;
streaming keeps the FIRST-ARRIVING row per fingerprint within the
watermark window, and duplicates separated by more than the watermark
are NOT collapsed (they have left state). That is the standard
streaming-dedup contract: exactness within the horizon, bounded state
beyond it. Run a periodic batch ``exact_dedup`` compaction for full
history exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recipys_spark.functions.text import fingerprint


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop exact-duplicate documents (normalized-text fingerprint)
    from a stream, with state bounded by the watermark horizon.

    NULL texts all pass through: dropDuplicates treats NULL keys as
    equal, so a null fingerprint is escaped to a per-row unique key
    (same "null means unknown, not equal" rule as batch exact_dedup)."""
    fp = fingerprint(F.col(text_col))
    key = F.coalesce(fp, F.concat(F.lit("\x00null:"), F.expr("uuid()")))
    return (
        stream.withColumn("__fp", key)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def streaming_clean_corpus(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    min_tokens: int = 5,
    max_tokens=None,
    min_quality: float = 0.0,
    langs=None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Ingest-edge corpus cleaning: the stateless annotate+filter stage
    (shared with batch ``clean_corpus`` — identical expressions, so a
    doc passes the stream filter iff it passes the batch filter)
    followed by watermark-bounded exact dedup.

    Near-dedup intentionally stays batch: MinHash banding needs
    corpus-wide buckets, which streaming state can't bound. The
    production pattern is this stream at the edge plus a periodic batch
    ``clean_corpus`` compaction over the landed data."""
    from recipys_spark.operators.corpus import annotate_filter

    filtered = annotate_filter(
        stream, text_col, min_tokens, max_tokens, min_quality, langs
    )
    return streaming_exact_dedup(filtered, text_col, ts_col, watermark)
