"""Real BPE (operators/bpe.py): textbook merges, exact reconstruction,
determinism across parallelism, UDF ≡ driver reference."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from recipys_spark.operators.bpe import (
    END,
    _encode_word,
    bpe_encode,
    bpe_token_count,
    train_bpe,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def sennrich_df(spark):
    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame(pd.DataFrame({"text": corpus}))


def test_textbook_merges(spark, sennrich_df):
    """The classic Sennrich corpus learns the classic merges: (e,s)
    count 9 first, then (es,t), then (est,</w>), then (l,o) count 7 —
    hand-computable, pins the whole count/tie-break machinery."""
    merges = train_bpe(sennrich_df, num_merges=5)
    assert merges[:4] == [("e", "s"), ("es", "t"), ("est", END), ("l", "o")]


def test_textbook_segmentation(spark, sennrich_df):
    merges = train_bpe(sennrich_df, num_merges=10)
    seg = {
        r.text: list(r.text_bpe)
        for r in bpe_encode(sennrich_df.distinct(), merges).collect()
    }
    assert seg["low"] == ["low" + END]
    assert seg["newest"] == ["newest" + END]
    assert seg["lower"][0] == "low"  # shares the learned 'low' unit


def test_training_deterministic_across_parallelism(spark, sennrich_df):
    a = train_bpe(sennrich_df, num_merges=8)
    b = train_bpe(sennrich_df.repartition(7), num_merges=8)
    assert a == b


def test_exact_reconstruction_on_real_docs(spark):
    """Concatenating subwords and restoring word boundaries at END
    markers must reproduce the whitespace-normalized document exactly
    — BPE is a segmentation, it may never lose or alter a byte."""
    docs = spark.read.parquet(DOCS).limit(150)
    merges = train_bpe(docs, num_merges=80)
    recon = bpe_encode(docs, merges).select(
        "doc_id",
        F.rtrim(
            F.replace(F.array_join("text_bpe", ""), F.lit(END), F.lit(" "))
        ).alias("joined"),
        F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ").alias("norm"),
    )
    assert recon.where(F.col("joined") != F.col("norm")).count() == 0


def test_udf_matches_driver_reference(spark):
    """The Arrow UDF's cached greedy-rank encode equals a direct
    per-word _encode_word call (no cache, no Arrow) on every word."""
    docs = spark.read.parquet(DOCS).limit(50)
    merges = train_bpe(docs, num_merges=60)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    got = bpe_encode(docs, merges).select("doc_id", "text", "text_bpe").collect()
    for r in got:
        expect = []
        for w in r.text.lower().strip().split():
            expect.extend(_encode_word(w, ranks))
        assert list(r.text_bpe) == expect, r.doc_id


def test_token_count_bounds(spark):
    """n_bpe is bounded below by the word count (every word is >= 1
    subword) and above by characters + words (worst case: every char
    its own symbol plus END)."""
    docs = spark.read.parquet(DOCS).limit(100)
    merges = train_bpe(docs, num_merges=40)
    chk = bpe_token_count(docs, merges).select(
        "doc_id",
        "text_n_bpe",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("words"),
        F.length(F.regexp_replace(F.trim(F.lower("text")), r"\s+", "")).alias("chars"),
    )
    assert chk.where(F.col("text_n_bpe") < F.col("words")).count() == 0
    assert chk.where(F.col("text_n_bpe") > F.col("chars") + F.col("words")).count() == 0


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["hello world", None, "  "]})
    )
    merges = [("l", "l"), ("h", "e")]
    got = {r.doc_id: r.text_bpe for r in bpe_encode(df, merges).collect()}
    assert got[1] is None
    assert got[2] == []
    assert "".join(got[0]).replace(END, " ").strip() == "hello world"


def test_train_validates_args(spark, sennrich_df):
    with pytest.raises(ValueError):
        train_bpe(sennrich_df, num_merges=0)


def test_step_bpe_prep_bake_and_state_roundtrip(spark, tmp_path):
    """The recipe-step form: merges learned in prep are FROZEN for
    bake (leakage boundary), and survive save_state/load_state."""
    from recipys_spark import Recipe
    from recipys_spark.operators.bpe import StepBpeTokens
    from recipys_spark.selector import all_of

    docs = spark.read.parquet(DOCS).limit(80).select("doc_id", "text")
    step = StepBpeTokens(sel=all_of(["text"]), num_merges=40)
    rec = Recipe(docs, predictors=["text"]).add_step(step)
    train = rec.prep().orderBy("doc_id").collect()
    assert train[0].text_bpe_count >= 1
    frozen = {c: list(m) for c, m in step.merges.items()}

    # bake on DIFFERENT data must reuse the train merges, not refit
    other = spark.read.parquet(DOCS).limit(120).select("doc_id", "text")
    rec.bake(other).count()
    assert {c: list(m) for c, m in step.merges.items()} == frozen

    # state round-trip through the JSON manifest
    path = str(tmp_path / "state.json")
    rec.save_state(path)
    step2 = StepBpeTokens(sel=all_of(["text"]), num_merges=40)
    rec2 = Recipe(docs, predictors=["text"]).add_step(step2)
    rec2.load_state(path)
    assert step2.merges == step.merges
    baked = rec2.bake(docs).orderBy("doc_id").collect()
    assert [r.text_bpe_count for r in baked] == [
        r.text_bpe_count for r in train
    ]


def test_segmentation_parity_nbsp_and_tabs(spark):
    """Train (JVM ASCII \\s) and encode (Python ASCII class) must
    segment identically: NBSP stays INSIDE a word on both sides
    (Python's Unicode \\s used to split it), tabs separate, empty
    fragments are filtered on both sides."""
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["a b a b \tx  x", "plain words"]})
    )
    merges = train_bpe(df, num_merges=20)
    got = bpe_encode(df, merges).collect()
    # reconstruction through END markers proves the same word split
    import re

    asciiws = "[ \t\n\x0b\f\r]+"
    for r in got:
        # rebuild with the SAME ASCII split — str.split() is Unicode
        # and would split the NBSP word the tokenizer (correctly) kept
        rebuilt = [
            w
            for w in re.split(asciiws, "".join(r.text_bpe).replace(END, " "))
            if w
        ]
        jvm_words = [w for w in re.split(asciiws, r.text.lower()) if w]
        assert rebuilt == jvm_words, r.text
    # the NBSP word was learned whole (it repeats, so some merge
    # includes the NBSP character)
    assert any(" " in a + b for a, b in merges)


def test_incremental_trainer_handles_many_merges(spark):
    """The heap/inverted-index trainer must push far past the old
    full-recount horizon: 1000 merges over the real docs vocabulary in
    seconds, exhausting pairs gracefully if the vocab runs dry."""
    import time

    docs = spark.read.parquet(DOCS)
    t0 = time.time()
    merges = train_bpe(docs, num_merges=1000)
    assert time.time() - t0 < 60
    assert len(merges) > 100  # real corpus sustains many merges
    assert len(set(merges)) == len(merges)  # no pair merged twice
