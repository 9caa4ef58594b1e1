"""Winnowing fingerprints: parity with a direct Python implementation,
the substring-sharing guarantee, and boilerplate suppression."""

import re

import pandas as pd
import pytest

from recipys_spark.functions.xxh64 import hash_token
from recipys_spark.operators.fingerprint import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def py_winnow(text, k=8, w=4):
    t = re.sub(r"\s+", " ", text.lower()).strip()
    hs = [hash_token(t[i : i + k]) for i in range(len(t) - k + 1)]
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


@pytest.fixture(scope="module")
def docs(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog and keeps running",
        "a completely different sentence about distributed query engines",
        "short",          # fewer grams than the window
        "tiny",           # shorter than k with k=8 → zero grams... wait len 4 < 8
        "  Weird   SPACING\tand\nCase  ",
        "",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return spark.createDataFrame(pdf).cache()


def test_winnow_matches_python_reference(spark, docs):
    got = winnow_fingerprints(docs, k=8, window=4).toPandas()
    by_doc = {d: set(g.fp) for d, g in got.groupby("doc_id")}
    texts = {r.doc_id: r.text for r in docs.toPandas().itertuples()}
    for d, text in texts.items():
        assert by_doc.get(d, set()) == py_winnow(text, 8, 4), (d, text)


def test_winnow_guarantee_shared_substring(spark):
    """Two docs sharing a >= k+window-1 char passage MUST share a
    fingerprint (the winnowing guarantee), and be paired."""
    passage = "please answer question 42 of the benchmark exactly"
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "intro words then " + passage + " and a long unrelated tail here",
                "totally other framing where " + passage + " got quoted verbatim",
                "no contamination in this document at all, just original prose",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    fps = winnow_fingerprints(df).toPandas()
    s0 = set(fps[fps.doc_id == 0].fp)
    s1 = set(fps[fps.doc_id == 1].fp)
    s2 = set(fps[fps.doc_id == 2].fp)
    assert s0 & s1, "shared passage must yield a shared fingerprint"
    pairs = winnow_overlap_pairs(df, min_shared=2).toPandas()
    assert (0, 1) in set(zip(pairs.id_a, pairs.id_b))
    assert not s0 & s2 and not s1 & s2


def test_winnow_max_df_suppresses_boilerplate(spark):
    """A header shared by EVERY doc is dropped by the document-frequency
    cap, so it cannot pair everything with everything."""
    header = "standard corporate disclaimer header applies to this file"
    uniq = [
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
        "kilo lima mike november oscar papa quebec romeo sierra tango",
        "uniform victor whiskey xray yankee zulu one two three four five",
        "six seven eight nine ten eleven twelve thirteen fourteen fifteen",
    ]
    pdf = pd.DataFrame(
        {"doc_id": range(4), "text": [header + " " + u for u in uniq]}
    )
    df = spark.createDataFrame(pdf)
    pairs = winnow_overlap_pairs(df, min_shared=1, max_df=2).toPandas()
    assert len(pairs) == 0
    # without the cap the header pairs all C(4,2)=6 combinations
    pairs_nc = winnow_overlap_pairs(df, min_shared=1, max_df=100).toPandas()
    assert len(pairs_nc) == 6
