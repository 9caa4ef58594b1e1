"""clean_corpus: composed filter → exact dedup → near-dedup semantics."""

import pandas as pd
import pytest

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
