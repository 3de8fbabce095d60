"""Page-level robots directives: <meta name="robots"> noindex /
nofollow flags as JVM expressions over raw html bytes.

The Robots Exclusion Protocol has two halves: robots.txt
(pompspark.robots — pre-fetch gating) and per-page meta directives —
"noindex" (don't keep this page's content) and "nofollow" (don't
follow its links). A training-data pipeline MUST honor noindex when
exporting a corpus; a polite crawler honors nofollow when growing the
frontier.

Everything here is one map-side projection: binary html casts to
string LENIENTLY (Spark's binary->string cast wraps the raw bytes —
unlike `decode`, which throws MALFORMED_CHARACTER_CODING on invalid
utf-8, exactly what crawled bytes will contain), then a
case-insensitive regexp pulls the content attribute of the robots
meta tag. `none` means `noindex, nofollow` per the spec.

Engine seam: the fetch stage intentionally drops raw html after
extract (fetch.py RESPONSE_COLS note), so these operators run over
the PAGES table (corpus curation: filter noindex before export) or as
a pre-fetch analysis pass; wiring nofollow into the live link flow
would extend the extract struct — documented as future work, not
silently half-done.

pomp parity: none (pomp has no robots support at all); north-rule [A]
addition alongside robots.txt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# content attr of a robots meta tag, either attribute order
_META_FWD = (
    r"<meta[^>]*name\s*=\s*[\"']?robots[\"']?[^>]*"
    r"content\s*=\s*[\"']?([a-z,\- ]*)"
)
_META_REV = (
    r"<meta[^>]*content\s*=\s*[\"']?([a-z,\- ]*)[\"']?[^>]*"
    r"name\s*=\s*[\"']?robots[\"']?"
)


def robots_meta_content(html_col: Column) -> Column:
    """Lowercased content of the page's robots meta tag ('' if none)."""
    s = F.lower(html_col.cast("string"))
    fwd = F.regexp_extract(s, _META_FWD, 1)
    return F.when(fwd != "", fwd).otherwise(
        F.regexp_extract(s, _META_REV, 1)
    )


def _has_token(content: Column, token: str) -> Column:
    # token match within the comma-separated list; 'none' implies both
    return content.rlike(rf"(^|[, ]){token}([, ]|$)") | content.rlike(
        r"(^|[, ])none([, ]|$)"
    )


def meta_robots_flags(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Append `noindex` and `nofollow` boolean columns."""
    c = robots_meta_content(F.col(html_col))
    return df.withColumns(
        {
            "noindex": F.coalesce(_has_token(c, "noindex"), F.lit(False)),
            "nofollow": F.coalesce(_has_token(c, "nofollow"), F.lit(False)),
        }
    )


def filter_noindex(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Corpus-export gate: drop pages whose meta robots says noindex.
    One scan, no shuffle — run it before any dedup/quality stage so
    excluded pages never cost downstream work."""
    return (
        meta_robots_flags(df, html_col)
        .filter(~F.col("noindex"))
        .drop("noindex", "nofollow")
    )
