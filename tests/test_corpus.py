"""clean_corpus: composed filter → exact dedup → near-dedup semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from recipys_spark.operators.corpus import clean_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    base = [
        "the quick brown fox jumps over the lazy dog",       # 0 keeper
        "the quick brown fox jumps over the lazy cat",       # 1 near-dup of 0
        "pack my box with five dozen liquor jugs",           # 2 keeper
        "sphinx of black quartz judge my vow",               # 3 keeper
        "the quick brown fox jumps over the lazy dog",       # 4 exact dup of 0
        "completely different text about spark engines and shuffles",  # 5
        "pack my box with five dozen liquor jugs today",     # 6 near-dup of 2
        "  The  QUICK brown fox jumps over the lazy dog ",   # 7 normalized dup of 0
    ]
    pdf = pd.DataFrame({"doc_id": range(len(base)), "text": base})
    return spark.createDataFrame(pdf).cache()


def _ids(df):
    return set(df.toPandas().doc_id)


def test_clean_corpus_full_pipeline(spark, corpus):
    out = clean_corpus(
        corpus, min_tokens=1, bands=16, threshold=0.6, connected=True
    )
    # audit columns appended, original columns kept
    assert {"doc_id", "text", "n_tokens", "quality", "lang_id"} <= set(out.columns)
    # 4 & 7 fall to exact dedup (min-id winner 0); 1 and 6 fall to
    # near-dedup (one-token edits, jaccard 0.78 / 0.89)
    assert _ids(out) == {0, 2, 3, 5}


def test_clean_corpus_one_hop_matches_connected_on_shallow_graph(spark, corpus):
    # no chains deeper than one edge here, so both labelings agree
    a = _ids(clean_corpus(corpus, min_tokens=1, bands=16, threshold=0.6,
                          connected=True))
    b = _ids(clean_corpus(corpus, min_tokens=1, bands=16, threshold=0.6,
                          connected=False))
    assert a == b


def test_clean_corpus_filter_runs_before_dedup(spark, corpus):
    # min_tokens=9 drops doc 2 (8 tokens) in the filter stage, so its
    # near-dup 6 (9 tokens) must SURVIVE — dedup only sees survivors
    out = _ids(clean_corpus(corpus, min_tokens=9, bands=16, threshold=0.6))
    assert 6 in out and 2 not in out


def test_clean_corpus_near_dedup_off(spark, corpus):
    out = _ids(clean_corpus(corpus, min_tokens=1, near_dedup=False))
    # exact dups gone, near-dups retained
    assert out == {0, 1, 2, 3, 5, 6}


def test_clean_corpus_lang_and_quality_knobs(spark, corpus):
    # every doc here is English with stopwords; an absurd quality bar
    # empties the corpus, the lang allowlist keeps it intact
    assert _ids(clean_corpus(corpus, min_quality=2.0)) == set()
    assert 0 in _ids(clean_corpus(corpus, min_tokens=1, langs=["en"],
                                  bands=16, threshold=0.6))
    assert _ids(clean_corpus(corpus, min_tokens=1, langs=["fr"])) == set()


def test_clean_corpus_lm_filter(spark):
    """min_logprob drops statistical outliers (gibberish) that pass the
    heuristic filters; cross-scoring flags them even harder."""
    typical = [
        f"the cat sat on the mat and the dog sat there too number {i}"
        for i in range(8)
    ]
    gibberish = "zxqv kjwr qpmd vbnx wyutr plok mnbv rtyu"
    pdf = pd.DataFrame(
        {"doc_id": range(9), "text": typical + [gibberish]}
    )
    df = spark.createDataFrame(pdf)
    # without the LM tier, gibberish passes the token-count filter
    assert 8 in _ids(clean_corpus(df, min_tokens=5, near_dedup=False))
    # self-fitted LM: gibberish's every token is corpus-unique → low logp
    from recipys_spark.operators.textstats import unigram_logprob_scores

    cutoff = float(
        unigram_logprob_scores(df).toPandas().avg_logprob.sort_values().iloc[1]
    )  # above only the gibberish doc
    out = _ids(
        clean_corpus(df, min_tokens=5, min_logprob=cutoff, near_dedup=False)
    )
    assert 8 not in out and 0 in out


def test_null_texts_are_not_duplicates_of_each_other(spark):
    """A NULL text is 'unknown', not equal to other NULLs: exact_dedup
    keeps every null-text row (the null-key window-partition trap)."""
    from recipys_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1, 2, 3], "text": ["same text", "same text", None, None]}
        )
    )
    kept = _ids(exact_dedup(df))
    assert kept == {0, 2, 3}


# -- cross-document paragraph dedup ------------------------------------------


def test_dedup_paragraphs_first_occurrence_wins(spark):
    import pandas as pd

    from recipys_spark.operators.corpus import dedup_paragraphs

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "unique one\nshared footer\nunique two",
                    "other content\nshared footer",
                    "shared footer",
                    "  \nreal body\n  ",
                ],
            }
        )
    )
    out = {r.doc_id: r.text for r in dedup_paragraphs(docs).collect()}
    # doc 1 owns the footer (lowest id); later copies deleted
    assert out[1] == "unique one\nshared footer\nunique two"
    assert out[2] == "other content"
    # doc 3 was ONLY the duplicate → dropped entirely
    assert 3 not in out
    # layout-only blank paragraphs pass through untouched
    assert out[4] == "  \nreal body\n  "


def test_dedup_paragraphs_within_doc_repeats(spark):
    """A paragraph repeated INSIDE one document keeps only its first
    position too (same first-global-occurrence rule)."""
    import pandas as pd

    from recipys_spark.operators.corpus import dedup_paragraphs

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "text": ["a\nb\na\nc\na"]})
    )
    out = dedup_paragraphs(docs).collect()
    assert out[0].text == "a\nb\nc"


def test_dedup_paragraphs_partition_invariant(spark):
    import pandas as pd

    from recipys_spark.operators.corpus import dedup_paragraphs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit("\nfooter "), F.col("source")
        ).alias("text"),
    )
    a = sorted((r.doc_id, r.text) for r in dedup_paragraphs(docs).collect())
    b = sorted(
        (r.doc_id, r.text)
        for r in dedup_paragraphs(docs.repartition(17)).collect()
    )
    assert a == b and len(a) > 0


# -- benchmark decontamination ------------------------------------------------


def test_ngram_decontaminate_drop_and_flag(spark):
    import pandas as pd

    from recipys_spark.operators.corpus import ngram_decontaminate

    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11, 12],
                "text": [
                    "the quick brown fox jumps over the lazy dog today",
                    "completely unrelated text about spark pipelines here",
                    "too short",  # < n words: can never collide
                ],
            }
        )
    )
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["quick brown fox jumps over"]})
    )
    kept = sorted(r.doc_id for r in ngram_decontaminate(corpus, bench, n=5).collect())
    assert kept == [11, 12]
    flags = {
        r.doc_id: r.contaminated
        for r in ngram_decontaminate(corpus, bench, n=5, mode="flag").collect()
    }
    assert flags == {10: True, 11: False, 12: False}
    with pytest.raises(ValueError):
        ngram_decontaminate(corpus, bench, n=0)
    with pytest.raises(ValueError):
        ngram_decontaminate(corpus, bench, mode="purge")


def test_ngram_decontaminate_boundary_overlap(spark):
    """The contaminated n-gram may START anywhere — including the last
    possible shingle — and whitespace/case differences don't defeat
    the match (both sides normalize identically)."""
    import pandas as pd

    from recipys_spark.operators.corpus import ngram_decontaminate

    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "lead in words then THE  Secret\tPHRASE appears here",
                    "the secret phrase",  # only 3 words: no 4-gram match
                ],
            }
        )
    )
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["The Secret Phrase Appears"]})
    )
    flags = {
        r.doc_id: r.contaminated
        for r in ngram_decontaminate(corpus, bench, n=4, mode="flag").collect()
    }
    assert flags == {1: True, 2: False}


def test_curation_ops_validate_ids(spark):
    """NULL ids break identity joins silently (a contaminated NULL-id
    doc would pass decontamination); duplicate ids would interleave
    documents in paragraph reassembly — both now fail loudly."""
    import pandas as pd

    from recipys_spark.operators.corpus import (
        dedup_paragraphs,
        ngram_decontaminate,
    )

    nulls = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1.0, None], "text": ["a b c d e", "a b c d e"]})
    )
    dups = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 1], "text": ["p1\np2", "p3\np4"]})
    )
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["a b c d e"]})
    )
    with pytest.raises(ValueError, match="NULL"):
        dedup_paragraphs(nulls)
    with pytest.raises(ValueError, match="not unique"):
        dedup_paragraphs(dups)
    with pytest.raises(ValueError, match="NULL"):
        ngram_decontaminate(nulls, bench, n=5)
    # check_ids=False opts out (caller guarantees)
    assert dedup_paragraphs(dups.limit(1), check_ids=False).count() == 1
