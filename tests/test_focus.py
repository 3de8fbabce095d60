"""Focused-crawl scoring: JVM keyword scores, anchor extraction, and
the engine-steering transform (order shifts, visited set identical)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pompspark.engine import simulated_engine
from pompspark.fixtures import SMALL_SEED, small_pages_df
from pompspark.focus import (
    anchor_topic_scores,
    extract_anchors,
    focus_priority_transform,
    topic_score_col,
)


def test_topic_score_matches_python_count(spark):
    cases = [
        "sports news and more sports",
        "SPORTS in caps",
        "nothing topical here",
        "football football football",
        "",
    ]
    kws = ["sports", "football", "ball"]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [
        r.s
        for r in df.select(topic_score_col(F.col("t"), kws).alias("s")).collect()
    ]
    # str.count is non-overlapping, as is the length-replace trick;
    # note 'football' also contains 'ball' — both sides count it
    want = [sum(c.lower().count(k) for k in kws) for c in cases]
    assert got == want


def test_extract_anchors():
    html = (
        b'<html><body>'
        b'<a href="http://x/1">Great <b>sports</b> news</a>'
        b"<a href='http://x/2'>plain</a>"
        b'<a href=http://x/3>unquoted &amp; entity</a>'
        b'<a href="http://x/4">no close tag'
        b"</body></html>"
    )
    got = extract_anchors(html)
    assert got == [
        ("http://x/1", "Great sports news"),
        ("http://x/2", "plain"),
        ("http://x/3", "unquoted & entity"),
    ]
    assert extract_anchors(None) == []


def test_anchor_topic_scores_max_not_sum(spark):
    rows = [
        ("http://p/a", b'<a href="http://t/1">sports sports</a>'),
        ("http://p/b", b'<a href="http://t/1">sports</a>'
                       b'<a href="http://t/2">weather</a>'),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r.href: r.score
        for r in anchor_topic_scores(pages, ["sports"]).collect()
    }
    # t/1 is referenced twice (scores 2 and 1) -> max 2, never 3
    assert got == {"http://t/1": 2, "http://t/2": 0}


def test_engine_focus_reorders_but_visits_same_set(spark, tmp_path):
    def crawl(transform, d):
        eng = simulated_engine(
            spark, str(tmp_path / d), small_pages_df(spark),
            ordering="bfs", per_round_budget=1, per_host_budget=1,
            frontier_transform=transform,
        )
        eng.seed([SMALL_SEED])
        eng.run(max_rounds=50)
        rows = eng.trace().collect()
        return [r.url for r in sorted(rows, key=lambda r: (r.round, r.seq))]

    base = crawl(None, "plain")
    focused = crawl(focus_priority_transform(["/p2"]), "focused")
    assert set(base) == set(focused)          # same closure
    assert base != focused                    # order actually shifted
    # the boosted url jumps ahead of its sibling class
    assert focused.index("http://a.example/p2") < focused.index(
        "http://a.example/p1"
    )
