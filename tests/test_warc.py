"""WARC sink/source: JVM-side record building, blob concat, and the
Content-Length-driven parser — round-trip on real fixture pages plus
adversarial payloads (record delimiter INSIDE a payload, empty
payload, non-response records skipped)."""

from __future__ import annotations

import datetime as dt

from pompspark.fixtures import small_pages_df
from pompspark.warc import (
    parse_warc,
    parse_warc_blob,
    warc_record,
    write_warc_partitions,
)


def test_record_roundtrip_fixture_pages(spark):
    pages = small_pages_df(spark).select("url", "warc_ts", "html")
    blobs = write_warc_partitions(pages.repartition(3))
    back = parse_warc(blobs)
    want = {
        r.url: (r.warc_ts, bytes(r.html)) for r in pages.collect()
    }
    got = {r.url: (r.warc_ts, bytes(r.html)) for r in back.collect()}
    assert got == want
    # blob accounting: every record landed in exactly one partition blob
    n = sum(r.n_records for r in blobs.collect())
    assert n == len(want)


def test_parser_splits_by_content_length_not_delimiter(spark):
    """A payload embedding '\\r\\n\\r\\nWARC/1.0' (the record delimiter +
    magic) must NOT split the record — only Content-Length decides."""
    evil = b"<html>\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\n</html>"
    ts = dt.datetime(2026, 1, 2, 3, 4, 5)
    df = spark.createDataFrame(
        [("http://a.example/evil", ts, evil), ("http://a.example/empty", ts, b"")],
        "url string, warc_ts timestamp, html binary",
    )
    blobs = write_warc_partitions(df.coalesce(1))
    rows = {r.url: bytes(r.html) for r in parse_warc(blobs).collect()}
    assert rows["http://a.example/evil"] == evil
    assert rows["http://a.example/empty"] == b""


def test_non_response_records_skipped():
    rec = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: http://x/\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"Content-Length: 3\r\n\r\nGET\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    out = parse_warc_blob(rec)
    assert out == [("http://x/", "2026-01-01T00:00:00Z", b"hi")]


def test_trailing_garbage_tolerated():
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
        b"\x00\x00junk"
    )
    assert parse_warc_blob(rec) == [
        ("http://x/", "2026-01-01T00:00:00Z", b"hi")
    ]


def test_gzip_member_roundtrip_and_determinism():
    from pompspark.warc import gzip_member, split_gzip_members

    a, b = b"first record bytes", b"second \x00\xff record"
    blob = gzip_member(a) + gzip_member(b)
    assert list(split_gzip_members(blob)) == [a, b]
    # deterministic: no clock in the gzip header
    assert gzip_member(a) == gzip_member(a)
    # stdlib gzip reads our members (interop sanity)
    import gzip as _gzip

    assert _gzip.decompress(blob) == a + b


def test_compressed_warc_roundtrip(spark):
    pages = small_pages_df(spark).select("url", "warc_ts", "html")
    blobs = write_warc_partitions(pages.repartition(2), compress=True)
    back = parse_warc(blobs, compressed=True)
    want = {r.url: bytes(r.html) for r in pages.collect()}
    got = {r.url: bytes(r.html) for r in back.collect()}
    assert got == want


def test_record_build_is_jvm_only(spark):
    """The sink projection compiles to pure JVM expressions — no
    Python/Arrow eval nodes and no shuffle in the plan."""
    pages = small_pages_df(spark).select("url", "warc_ts", "html")
    plan = (
        warc_record(pages)._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("Exchange", "ArrowEval", "BatchEval", "FlatMapsInPandas"):
        assert bad not in plan, plan
