"""Replicates the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() in DuckDB over the same parquet tables,
compare row count, schema (column names), and exact values after
sorting columns by name and rows by all columns.

SF dir comes from SPARK_GRAFT_SF_DIR (default sf0.01 — the driver's
correctness scale)."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns, key=str.lower), axis=1)
    # normalize dtypes: timestamps to ns, everything comparable
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_match(a: pd.DataFrame, b: pd.DataFrame, name: str):
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    assert sorted(map(str.lower, a.columns)) == sorted(
        map(str.lower, b.columns)
    ), f"{name}: columns {sorted(a.columns)} vs {sorted(b.columns)}"
    a, b = canon(a), canon(b)
    b.columns = a.columns
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            # bit-identical across engines: the engine's deterministic
            # decimal accumulation (functions/deterministic.py) makes
            # float results exactly reproducible — hold the line at 0 ulp
            np.testing.assert_array_equal(
                av.astype(float).to_numpy(),
                bv.astype(float).to_numpy(),
                err_msg=f"{name}.{c}",
            )
        else:
            mismatch = (av.astype(str) != bv.astype(str))
            assert not mismatch.any(), (
                f"{name}.{c}: {int(mismatch.sum())} mismatches, e.g.\n"
                f"{pd.concat([av[mismatch].head(), bv[mismatch].head()], axis=1)}"
            )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    expected = ddb.sql(ORACLES[name]).df()
    assert_frames_match(got, expected, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_oracle_free_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_driver_window_covers_all_unverified_queries():
    """The external gate checks only the FIRST _DRIVER_WINDOW entries
    in insertion order (VERDICT r3 #1: 12 registered queries went
    unchecked because they sat past slot 50). Every oracled query must
    sit inside the window; only long-stable or rows-only entries may
    occupy the deferred tail."""
    names = list(QUERIES)
    window = names[: entrymod._DRIVER_WINDOW]
    tail = names[entrymod._DRIVER_WINDOW:]
    # the previously-unchecked oracled queries are now inside the window
    for q in [
        "unigram_logprob", "gopher_signals", "text_scrub",
        "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
        "dedup_neardup_lsh", "embedding_quantize",
    ]:
        assert q in window, q
    # everything deferred is either rows-only (no oracle) or on the
    # explicitly sanctioned long-stable list
    for q in tail:
        assert q in entrymod._DEFER_TO_BACK, q
    assert len(window) <= entrymod._DRIVER_WINDOW
