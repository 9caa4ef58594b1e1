"""Web-ingestion tier (operators/warc.py): WARC byte-format physics,
gzip member splitting, HTML extraction parity, URL parts."""

import gzip

import pandas as pd
import pytest
from pyspark.sql import functions as F

from recipys_spark.operators.warc import (
    html_to_text,
    html_to_text_sql,
    parse_warc_bytes,
    parse_warc_records,
    split_gzip_members,
    synthetic_warc,
    url_features,
)


def _record(uri: str, body: bytes, wtype: str = "response") -> bytes:
    return (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body + b"\r\n\r\n"


def test_parse_warc_bytes_format_physics():
    """Bodies are EXACTLY Content-Length bytes — a body containing
    \\r\\n\\r\\n (binary, or HTML with blank lines) must not truncate,
    and the parser must resync on the following record."""
    tricky = b"line1\r\n\r\nline2 <b>x</b>"
    data = _record("https://a.example/1", tricky) + _record(
        "https://a.example/2", b"second"
    )
    recs = parse_warc_bytes(data)
    assert len(recs) == 2
    assert recs[0]["body"] == tricky
    assert recs[1]["target_uri"] == "https://a.example/2"
    assert recs[0]["content_length"] == len(tricky)


def test_parse_warc_bytes_rejects_garbage():
    with pytest.raises(ValueError, match="malformed WARC"):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")


def test_gzip_member_splitting():
    """.warc.gz is a CONCATENATION of independent gzip members; the
    splitter must recover each member, and pass non-gzip data
    through."""
    a, b, c = b"alpha" * 10, b"beta" * 20, b"gamma"
    blob = gzip.compress(a) + gzip.compress(b) + gzip.compress(c)
    assert split_gzip_members(blob) == [a, b, c]
    assert split_gzip_members(b"plain bytes") == [b"plain bytes"]
    assert split_gzip_members(b"") == [b""]


def test_parse_warc_records_spark_roundtrip(spark):
    for gz in (True, False):
        recs = parse_warc_records(
            synthetic_warc(spark, n_files=4, records_per_file=3, gzipped=gz)
        )
        rows = recs.orderBy("file_id", "record_idx").collect()
        assert len(rows) == 12
        assert rows[0].warc_type == "response"
        assert rows[0].target_uri == "https://example.org/f0/r0"
        assert rows[0].content_length == len(bytes(rows[0].body))
        # record numbering restarts per file
        assert {r.record_idx for r in rows} == {0, 1, 2}


def test_html_to_text_extraction(spark):
    html = (
        "<html><head><title>T</title><style>p{x:y}</style></head>"
        "<body><h1>Head</h1><!-- hidden --><p>one &amp; two &lt;3</p>"
        "<script>ignore();</script>\n<div>  spaced   out </div></body></html>"
    )
    got = (
        spark.range(1)
        .select(html_to_text(F.lit(html)).alias("t"))
        .first()
        .t
    )
    assert got == "T Head one & two <3 spaced out"
    # script/style/comment content never leaks
    assert "ignore" not in got and "x:y" not in got and "hidden" not in got


def test_html_to_text_sql_mirror_byte_exact(spark):
    """The committed SQL chain and the Spark chain are the same
    pipeline — run both over awkward inputs and require equality."""
    import duckdb

    cases = [
        "<p>a</p><p>b</p>",
        "no tags at all",
        "<script>while(1){}</script>rest",
        "<style a=b>s</style><b>bold</b> &nbsp;&quot;q&quot;",
        "unterminated <tag",
        "&amp;amp; double-encoded",
        "",
    ]
    df = spark.createDataFrame(pd.DataFrame({"html": cases}))
    got = [r.t for r in df.select(html_to_text(F.col("html")).alias("t")).collect()]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"html": cases}))
    exp = list(con.sql(f"SELECT {html_to_text_sql('html')} AS t FROM t").df()["t"])
    assert got == exp


def test_url_features_parts(spark):
    urls = [
        "https://user:pw@www.example.co.uk:8443/a/b/c?q=1#f",
        "http://plain.org/",
        "ftp://files.example.net/pub/data.bin",
        "https://noslash.example.com",
        "not a url",
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    got = {r.url: r for r in url_features(df).collect()}
    r = got[urls[0]]
    assert (r.url_scheme, r.url_host, r.url_tld) == ("https", "www.example.co.uk", "uk")
    assert r.url_path == "/a/b/c" and r.url_path_depth == 3
    assert got[urls[1]].url_path_depth == 0
    assert got[urls[2]].url_scheme == "ftp" and got[urls[2]].url_path_depth == 2
    assert got[urls[3]].url_host == "noslash.example.com"
    assert got[urls[3]].url_path == "" and got[urls[3]].url_path_depth == 0
    assert got["not a url"].url_scheme == "" and got["not a url"].url_host == ""


def test_warc_to_documents_pipeline(spark):
    """End to end: archives → records → extracted text flows into the
    existing curation tier (text features over the extracted column)."""
    from recipys_spark.operators.textstats import gopher_signals

    recs = parse_warc_records(synthetic_warc(spark, n_files=5))
    docs = recs.select(
        (F.col("file_id") * 1000 + F.col("record_idx")).alias("doc_id"),
        html_to_text(F.col("body").cast("string")).alias("text"),
    )
    sig = gopher_signals(docs).collect()
    assert len(sig) == 25
    assert all(r.n_words > 0 for r in sig)


# -- second review-pass regressions ------------------------------------------


def test_gzip_member_splitting_is_linear_and_tolerates_padding():
    """O(bytes): feeding payload[pos:] per member was quadratic (48 s
    for 40 MB / 4k members). Also: trailing non-gzip padding after the
    last member must be ignored, and a truncated member must raise."""
    import time

    members = [(b"x%d " % i) * 200 for i in range(4000)]
    blob = b"".join(gzip.compress(m, 1) for m in members)
    t0 = time.time()
    got = split_gzip_members(blob)
    assert time.time() - t0 < 5, "member splitting must be O(bytes)"
    assert got == members
    # trailing block padding (some WARC writers / block stores)
    assert split_gzip_members(gzip.compress(b"hello") + b"\x00" * 16) == [b"hello"]
    # truncated member fails loudly
    whole = gzip.compress(b"payload" * 100)
    with pytest.raises(ValueError, match="truncated gzip member"):
        split_gzip_members(whole[: len(whole) // 2])


def test_parse_warc_truncated_record_raises():
    """Content-Length past end-of-data is the partial-download case —
    must raise, not emit a silently short body."""
    data = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 100\r\n\r\nshort"
    )
    with pytest.raises(ValueError, match="truncated WARC record"):
        parse_warc_bytes(data)


def test_parse_warc_lf_separators_tolerated():
    body = b"ok"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 2\r\n\r\n" + body
    )
    recs = parse_warc_bytes(rec + b"\n\n" + rec)
    assert len(recs) == 2 and all(r["body"] == body for r in recs)
