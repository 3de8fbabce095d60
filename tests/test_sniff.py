"""Magic-byte content-type sniffing over binary payloads."""

from __future__ import annotations

from pyspark.sql import functions as F

from pompspark.media import html_only_middleware, sniff_content_type
from pompspark.warc import gzip_member

CASES = [
    (b"<!DOCTYPE html><p>hi</p>", "text/html"),
    (b"<!doctype html>", "text/html"),
    (b"<html><body>x</body></html>", "text/html"),
    (b"<HTML>X</HTML>", "text/html"),
    (b'<?xml version="1.0"?><rss/>', "application/xml"),
    (b"\x89PNG\r\n\x1a\nrest", "image/png"),
    (b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
    (b"GIF89a....", "image/gif"),
    (b"%PDF-1.4 obj", "application/pdf"),
    (b"PK\x03\x04zipdata", "application/zip"),
    (gzip_member(b"payload"), "application/gzip"),
    (b"BM\x00\x00bitmap", "image/bmp"),
    (b"RIFF0000WAVEfmt ", "audio/wav"),
    (b"RIFF0000AVI LIST", "video/avi"),
    (b"RIFF0000XXXX", "application/octet-stream"),
    (b"just some plain text", "application/octet-stream"),
    (b"", "application/octet-stream"),
    (None, "application/octet-stream"),
]


def test_sniff_cases(spark):
    df = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(CASES)], "i int, payload binary"
    )
    got = {
        r.i: r.ct
        for r in df.select(
            "i", sniff_content_type(F.col("payload")).alias("ct")
        ).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {got[i]} != {want}"


def test_sniff_is_map_side(spark):
    df = spark.createDataFrame([(b"x",)], "payload binary")
    plan = (
        df.select(sniff_content_type(F.col("payload")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "InPandas" not in plan, plan


def test_html_only_middleware(spark):
    df = spark.createDataFrame(
        [(b"<html>ok</html>",), (b"\x89PNGnope",), (b"%PDF nope",)],
        "html binary",
    )
    out = html_only_middleware()(df).collect()
    assert len(out) == 1 and bytes(out[0].html).startswith(b"<html>")
