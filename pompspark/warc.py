"""WARC (ISO 28500 / WARC/1.0) source and sink for the pages table.

Common Crawl publishes the web as WARC files; a crawl engine that
wants to interoperate must write its fetches as WARC response records
and read existing WARC blobs back into `pages(url, warc_ts, html,
...)` rows. Two paths, both distributed:

- **sink** (`warc_record`): the record is BUILT JVM-SIDE — header
  text via concat/date_format, payload appended with binary concat,
  Content-Length from octet_length — so serializing 10^10 fetches is
  one codegen'd projection, no Python. `write_warc_partitions`
  concatenates each partition's records into one WARC blob (what a
  real deployment streams to object storage as `part-N.warc`).
- **source** (`parse_warc`): a real WARC parser over binary blobs —
  mapInPandas walks each blob record by record using the declared
  Content-Length (the only correct way to split WARC: payloads may
  contain the record delimiter), yielding one pages-shaped row per
  response record. Arrow-batched; each blob parses independently so
  a directory of WARC files scales with the file count.

Record layout written (and accepted) here — the WARC/1.0 subset
Common Crawl uses for response records:

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: <ISO8601 Z>\r\n
    Content-Length: <len(payload)>\r\n
    \r\n
    <payload bytes>\r\n\r\n

pomp parity: pomp has no serialization at all (responses live and
die in memory, SURVEY §2.1); this is a north-rule [A] source/sink
addition shaped by the public WARC spec.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CRLF = "\r\n"
WARC_VERSION = "WARC/1.0"

# header block of one response record; {} = url, date, length
_HEADER_FMT = (
    f"{WARC_VERSION}{_CRLF}"
    f"WARC-Type: response{_CRLF}"
    f"WARC-Target-URI: {{url}}{_CRLF}"
    f"WARC-Date: {{date}}{_CRLF}"
    f"Content-Length: {{length}}{_CRLF}"
    f"{_CRLF}"
)

_HEADER_RE = re.compile(
    rb"WARC/1\.0\r\n"
    rb"WARC-Type: (?P<type>[^\r]+)\r\n"
    rb"WARC-Target-URI: (?P<uri>[^\r]+)\r\n"
    rb"WARC-Date: (?P<date>[^\r]+)\r\n"
    rb"Content-Length: (?P<len>\d+)\r\n"
    rb"\r\n"
)


def warc_header_col(
    url: Column, warc_ts: Column, payload: Column
) -> Column:
    """The record's header block as a string column (JVM concat)."""
    date = F.date_format(warc_ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return F.concat(
        F.lit(f"{WARC_VERSION}{_CRLF}WARC-Type: response{_CRLF}"),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "), date, F.lit(_CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"), F.lit(_CRLF),
        F.lit(_CRLF),
    )


def warc_record(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    out_col: str = "warc",
) -> DataFrame:
    """Append each row's full WARC response record as a binary column.

    Header string -> utf-8 binary, payload appended with binary
    concat, trailing CRLFCRLF closes the record. Entirely JVM."""
    header = warc_header_col(
        F.col(url_col), F.col(ts_col), F.col(payload_col)
    )
    rec = F.concat(
        F.encode(header, "UTF-8"),
        F.col(payload_col),
        F.encode(F.lit(_CRLF + _CRLF), "UTF-8"),
    )
    return df.withColumn(out_col, rec)


def gzip_member(data: bytes) -> bytes:
    """One complete gzip member (Common Crawl compresses each WARC
    record as its OWN member so readers can seek to any record).
    mtime pinned to 0 so output is byte-deterministic across runs."""
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    # wbits=16+MAX_WBITS emits a gzip header with mtime=0 (zlib never
    # stamps the clock), unlike the gzip module which does
    return co.compress(data) + co.flush()


def split_gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a
    time (zlib.decompressobj + unused_data — the standard multi-member
    walk). Yields each member's decompressed bytes."""
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = d.decompress(blob[pos:])
        yield out
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:  # corrupt tail — stop rather than spin
            break
        pos += consumed


def write_warc_partitions(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    compress: bool = False,
) -> DataFrame:
    """One WARC blob per partition: (part_id, n_records, warc binary).

    The concat runs executor-side inside mapInPandas; the result is a
    blob-per-partition DataFrame the caller sinks wherever binary
    blobs live (parquet here; `part-N.warc` objects on a cluster).
    Records are ordered by url within a blob so re-runs are
    byte-identical. ``compress=True`` gzips each record as its own
    member (the `.warc.gz` convention — readers can seek to any
    record) with mtime pinned, so compressed blobs are deterministic
    too."""
    recs = warc_record(df, url_col, ts_col, payload_col).select(
        F.col(url_col).alias("url"), "warc"
    )

    def concat_blob(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = pd.concat(parts).sort_values("url")
        if compress:
            blob = b"".join(gzip_member(bytes(x)) for x in pdf["warc"])
        else:
            blob = b"".join(bytes(x) for x in pdf["warc"])
        yield pd.DataFrame(
            {"part_id": [pid], "n_records": [len(pdf)], "warc": [blob]}
        )

    return recs.mapInPandas(
        concat_blob, "part_id int, n_records long, warc binary"
    )


def parse_warc_blob(blob: bytes) -> list[tuple[str, str, bytes]]:
    """Walk one WARC blob: (target_uri, date, payload) per response
    record. Pure function so tests can hit it directly; splits by the
    DECLARED Content-Length, never by searching for the delimiter."""
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        m = _HEADER_RE.match(blob, pos)
        if not m:
            # tolerate trailing garbage / padding after the last record
            break
        length = int(m.group("len"))
        start = m.end()
        payload = blob[start : start + length]
        if m.group("type") == b"response":
            out.append(
                (
                    m.group("uri").decode("utf-8"),
                    m.group("date").decode("ascii"),
                    payload,
                )
            )
        pos = start + length + len(_CRLF + _CRLF)
    return out


def parse_warc(
    blobs: DataFrame, blob_col: str = "warc", compressed: bool = False
) -> DataFrame:
    """WARC blobs -> pages-shaped rows (url, warc_ts, html).

    mapInPandas: each incoming blob row parses independently
    executor-side; a directory of WARC files becomes the pages table
    in one distributed pass. ``compressed=True`` walks gzip members
    first (`.warc.gz` blobs)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for blob in b[blob_col]:
                raw = bytes(blob)
                if compressed:
                    raw = b"".join(split_gzip_members(raw))
                for uri, date, payload in parse_warc_blob(raw):
                    rows.append((uri, date, payload))
            if rows:
                pdf = pd.DataFrame(
                    rows, columns=["url", "warc_date", "html"]
                )
                pdf["warc_ts"] = pd.to_datetime(
                    pdf["warc_date"], format="%Y-%m-%dT%H:%M:%SZ"
                )
                yield pdf[["url", "warc_ts", "html"]]

    return blobs.mapInPandas(gen, "url string, warc_ts timestamp, html binary")
