"""Frontier URL filtering: drop non-content and crawler-trap URLs
before they enter (or leave) the frontier.

Every production crawler front-ends its frontier with URL rules —
static-asset extensions, length caps, path-depth caps, query blowup,
repeated-segment traps (the classic calendar/session-id loops). pomp
exposes this as the `process_request -> None` middleware drop hook
(SURVEY §2.1 O4); this module supplies the standard rule set as ONE
map-side JVM projection so dropping 90% of a 10^10-link batch costs a
single scan and never shuffles.

Everything is regexp/array expressions shared byte-for-byte with the
DuckDB oracle — note the trap detector deliberately avoids regex
backreferences (Java has them, RE2/DuckDB does not) and instead
compares consecutive path segments with an indexed array transform.

``url_filter`` annotates (keep + first-failing-rule reason, so
pipelines can log WHY a url died); ``url_filter_middleware`` adapts it
to the engine's request-middleware contract (filter = pomp's None
drop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# static assets / binary payloads a text crawl never fetches
BLOCKED_EXTENSIONS = (
    "jpg|jpeg|png|gif|webp|svg|ico|bmp|tif|tiff|css|js|mjs|map|"
    "woff|woff2|ttf|eot|otf|mp3|mp4|m4a|m4v|avi|mov|wmv|webm|mkv|"
    "flac|ogg|wav|zip|gz|tgz|tar|bz2|7z|rar|xz|exe|msi|dmg|iso|apk|"
    "swf|class|jar|rpm|deb"
)

MAX_URL_LEN = 2048
MAX_PATH_DEPTH = 16
MAX_QUERY_PARAMS = 8

# scheme://authority(path)  — path = group 1, query/fragment excluded
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _path(url: Column) -> Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def _rules(
    url: Column,
    max_len: int,
    max_depth: int,
    max_params: int,
) -> list[tuple[str, Column]]:
    """Ordered (reason, violated?) rule list. First hit names the kill."""
    path = _path(url)
    # "/a/b/c" splits to ["", a, b, c] — depth = segments after the root
    depth = F.greatest(F.size(F.split(path, "/")) - 1, F.lit(0))
    query = F.regexp_extract(url, _QUERY_RE, 1)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    segs = F.split(path, "/")
    # consecutive triple-repeated segment = trap (no backreferences:
    # RE2-safe). F.get is NULL off the end; coalesce keeps flags boolean.
    trap_flags = F.transform(
        segs,
        lambda x, i: F.coalesce(
            (x != F.lit(""))
            & (x == F.get(segs, i + 1))
            & (x == F.get(segs, i + 2)),
            F.lit(False),
        ),
    )
    return [
        ("too_long", F.length(url) > max_len),
        (
            "blocked_ext",
            F.lower(path).rlike(r"\.(" + BLOCKED_EXTENSIONS + r")$"),
        ),
        ("too_deep", depth > max_depth),
        ("query_blowup", n_params > max_params),
        ("trap_segments", F.array_contains(trap_flags, True)),
    ]


def url_filter(
    df: DataFrame,
    url_col: str = "url",
    max_len: int = MAX_URL_LEN,
    max_depth: int = MAX_PATH_DEPTH,
    max_params: int = MAX_QUERY_PARAMS,
) -> DataFrame:
    """Append `keep` (boolean) and `reason` (first violated rule name,
    NULL when kept). One projection, no shuffle, no Python."""
    rules = _rules(F.col(url_col), max_len, max_depth, max_params)
    reason = F.lit(None).cast("string")
    for name, bad in reversed(rules):
        reason = F.when(bad, F.lit(name)).otherwise(reason)
    return df.withColumn("reason", reason).withColumn(
        "keep", F.col("reason").isNull()
    )


def url_filter_middleware(
    url_col: str = "url",
    max_len: int = MAX_URL_LEN,
    max_depth: int = MAX_PATH_DEPTH,
    max_params: int = MAX_QUERY_PARAMS,
):
    """Engine request-middleware: drop filtered urls (pomp's
    process_request->None). Plug into CrawlEngine(request_middlewares=
    [...]) — dropped rows are marked consumed by the engine."""

    def mw(df: DataFrame) -> DataFrame:
        out = url_filter(df, url_col, max_len, max_depth, max_params)
        return out.filter("keep").drop("keep", "reason")

    return mw
