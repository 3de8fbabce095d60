"""Sitemap ingestion: robots.txt `Sitemap:` discovery and sitemap-XML
URL extraction, all JVM-side (regexp over body strings — no Python in
the hot path), plus the bulk frontier-seeding story they feed.

Real crawls do not start from a hand-typed seed list: they read
`Sitemap:` directives out of robots.txt (RFC 9309 §2.3 allows them at
any position, case-insensitive), fetch the sitemap XML
(sitemaps.org protocol: <urlset><url><loc>...</loc></url></urlset>,
or a <sitemapindex> of further sitemaps), and enqueue the <loc> urls.
At web scale a single host's sitemap index can carry 50k sitemaps x
50k urls = 2.5x10^9 locs — which is why extraction is a DataFrame op
(one scan, explode) and why CrawlEngine.seed_frontier accepts a
DataFrame instead of a driver-side list.

pomp analog: none (pomp leaves seed generation to the caller);
north-rule [A] addition like robots/politeness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# <loc> content per sitemaps.org. Sitemap XML escapes &<>'" in urls;
# the regexp takes the raw span (no entity decode — urls containing
# raw & are passed through as-is, matching a streaming extractor).
_LOC_RE = r"<loc>\s*([^<]*?)\s*</loc>"

# RFC 9309: "Sitemap:" lines are case-insensitive, value to line end.
_SITEMAP_LINE_RE = r"(?i)sitemap:\s*(\S+)"


def sitemap_locs(
    pages: DataFrame, body_col: str = "body", url_col: str = "url"
) -> DataFrame:
    """Explode sitemap XML bodies into (sitemap_url, loc, is_index).

    ``is_index`` marks rows whose source document is a
    <sitemapindex> — their locs are FURTHER SITEMAPS to fetch, not
    page urls; callers loop (fetch -> sitemap_locs) until no index
    rows remain (sitemaps.org caps nesting in practice at one level).
    One JVM regexp pass + explode; no shuffle.
    """
    is_index = F.col(body_col).contains("<sitemapindex")
    return (
        pages.select(
            F.col(url_col).alias("sitemap_url"),
            is_index.alias("is_index"),
            F.explode(
                F.regexp_extract_all(F.col(body_col), F.lit(_LOC_RE), F.lit(1))
            ).alias("loc"),
        )
        .filter(F.length("loc") > 0)
    )


def robots_sitemaps(
    robots: DataFrame, txt_col: str = "robots_txt", host_col: str = "host"
) -> DataFrame:
    """Extract `Sitemap:` directives from robots.txt bodies ->
    (host, sitemap_url). Case-insensitive, any position in the file
    (RFC 9309 §2.3: sitemap lines live outside user-agent groups).
    Map-side regexp + explode."""
    return (
        robots.select(
            F.col(host_col).alias("host"),
            F.explode(
                F.regexp_extract_all(F.col(txt_col), F.lit(_SITEMAP_LINE_RE), F.lit(1))
            ).alias("sitemap_url"),
        )
        .filter(F.length("sitemap_url") > 0)
    )
