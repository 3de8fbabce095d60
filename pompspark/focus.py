"""Focused (topical) crawling: score URLs and anchors against a
keyword set and steer the dequeue toward on-topic pages.

Classic focused-crawl designs (Chakrabarti et al. 1999's focused
crawler; fish/shark-search) rank the frontier by topical evidence
available BEFORE fetching: the URL string itself and the anchor text
of the links that discovered it. Spark-first shape:

- ``topic_score_col``: keyword-occurrence count as a pure JVM
  expression (the length-difference-after-replace trick per keyword,
  summed) — scoring 10^10 urls is map-side, no Python, no shuffle.
- ``extract_anchors`` / ``anchors_frame``: (href, anchor text) pairs
  from html — the SAME href regex family as the pinned extractor
  (extract.py `_HREF_RE`) so link sets agree, plus the anchor's inner
  text cleaned with the same tag-strip/entity/ws rules. Runs as
  mapInPandas off the hot path (anchor harvesting is an analysis
  stage, not part of the byte-identity contract).
- ``anchor_topic_scores``: per-target-url topical evidence = max
  keyword score over all anchors pointing at it (max, not sum, so
  link farms repeating an anchor don't inflate a target).
- ``focus_priority_transform``: CrawlEngine ``frontier_transform``
  factory boosting `priority` by scale*score(url) — same seam as
  graph.tier_priority_transform, so the visited SET is untouched and
  only intra-class dequeue ORDER shifts (boost < seed/child gap).

pomp parity: pomp exposes request rewriting via middleware
(SURVEY §2.1 O4) but has no scoring; this is a north-rule [A]
prioritizer addition.
"""

from __future__ import annotations

import re
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pompspark.extract import _HREF_RE, ref_extract

# <a ...href=...>inner</a> — the href part is _HREF_RE's pattern so a
# page's anchor list lines up 1:1 with the engine's link list for
# well-formed anchors (links without a closing </a> yield no anchor).
_ANCHOR_RE = re.compile(
    rb"<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))"
    rb"[^>]*>(.*?)</a\s*>",
    re.IGNORECASE | re.DOTALL,
)


def topic_score_col(col: Column, keywords: Sequence[str]) -> Column:
    """Total occurrence count of ``keywords`` in lower(col), one JVM
    expression: sum_k (len(s) - len(replace(s, k))) / len(k)."""
    s = F.lower(col)
    score = F.lit(0)
    for kw in keywords:
        k = kw.lower()
        score = score + (
            (F.length(s) - F.length(F.replace(s, F.lit(k), F.lit(""))))
            / F.lit(len(k))
        ).cast("int")
    return score


def extract_anchors(html: bytes) -> list[tuple[str, str]]:
    """(href, anchor text) pairs in document order. Anchor text goes
    through the pinned extractor's cleaning (tags/entities/ws) so
    'anchor text' means the same thing everywhere in this engine."""
    if html is None:
        return []
    if isinstance(html, str):
        html = html.encode("utf-8")
    out = []
    for m in _ANCHOR_RE.finditer(html):
        raw = m.group(1) if m.group(1) is not None else (
            m.group(2) if m.group(2) is not None else m.group(3)
        )
        text, _ = ref_extract(m.group(4))
        out.append((raw.decode("utf-8", errors="replace"), text))
    return out


def anchors_frame(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages -> (page_url, href, anchor) rows via mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for u, h in zip(b[url_col], b[html_col]):
                for href, anchor in extract_anchors(
                    bytes(h) if h is not None else None
                ):
                    rows.append((u, href, anchor))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["page_url", "href", "anchor"]
                )

    return pages.mapInPandas(gen, "page_url string, href string, anchor string")


def anchor_topic_scores(
    pages: DataFrame, keywords: Sequence[str]
) -> DataFrame:
    """Per-target evidence: (href, score) where score = MAX keyword
    score over every anchor pointing at href (anchor text + the href
    string both count). One groupBy on href — the shuffle carries
    (href, int) pairs only."""
    a = anchors_frame(pages)
    scored = a.withColumn(
        "s",
        topic_score_col(F.concat_ws(" ", "anchor", "href"), keywords),
    )
    return scored.groupBy("href").agg(F.max("s").alias("score"))


def focus_priority_transform(
    keywords: Sequence[str], scale: float = 0.001, max_boost: int = 9
):
    """CrawlEngine frontier_transform: priority += scale * min(score,
    max_boost) from the URL string alone — zero joins, zero Python.
    Default scale keeps every boost strictly inside the child-priority
    class (cf. graph.tier_priority_transform's contract)."""

    def _transform(rows: DataFrame) -> DataFrame:
        s = F.least(
            topic_score_col(F.col("url"), keywords), F.lit(max_boost)
        )
        return rows.withColumn(
            "priority", F.col("priority") + s * F.lit(scale)
        )

    return _transform
