"""URL frontier filter rules + engine middleware integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pompspark.engine import simulated_engine
from pompspark.fixtures import SMALL_SEED, small_pages_df
from pompspark.urlfilter import url_filter, url_filter_middleware

CASES = [
    ("http://a.example/article/42", None),
    ("http://a.example/", None),
    ("http://a.example/a/b.JPG", "blocked_ext"),       # case-insensitive
    ("http://a.example/site.css", "blocked_ext"),
    ("http://a.example/pkg.tar.gz", "blocked_ext"),
    ("http://a.example/jpg", None),                    # no dot — not an ext
    ("http://a.example/x.jpg?s=1", "blocked_ext"),     # ext is on the PATH
    ("http://a.example/" + "d/" * 20, "too_deep"),
    ("http://a.example/p?" + "&".join(f"k{i}=v" for i in range(9)),
     "query_blowup"),
    ("http://a.example/p?a=1&b=2", None),
    ("http://a.example/cal/cal/cal/2026", "trap_segments"),
    ("http://a.example/cal/cal/2026", None),           # only twice — fine
    ("http://a.example/x/y/x/y/x", None),              # alternating — fine
    ("http://a.example/long" + "a" * 3000, "too_long"),
    # too_long wins over blocked_ext (rule order = reason order)
    ("http://a.example/" + "a" * 3000 + ".jpg", "too_long"),
]


@pytest.fixture(scope="module")
def results(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    out = url_filter(df)
    return {r["url"]: (r["keep"], r["reason"]) for r in out.collect()}


@pytest.mark.parametrize("url,reason", CASES)
def test_rule(results, url, reason):
    keep, got = results[url]
    assert got == reason, f"{url}: reason {got!r} != {reason!r}"
    assert keep is (reason is None)


def test_no_shuffle(spark):
    df = spark.createDataFrame([("http://a.example/x",)], "url string")
    plan = url_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_engine_middleware_drops_and_crawl_continues(spark, tmp_path):
    """Wire url_filter_middleware into the engine: c.example pages are
    made to look like a deep trap by a tiny max_depth, get dropped as
    requests (pomp None-drop), and the rest of the crawl is unaffected."""
    eng = simulated_engine(
        spark, str(tmp_path / "s"), small_pages_df(spark),
        ordering="bfs", per_round_budget=5, per_host_budget=5,
        request_middlewares=[
            lambda df: df.filter(F.col("host") != "c.example"),
            url_filter_middleware(max_depth=16),
        ],
    )
    eng.seed([SMALL_SEED])
    eng.run(max_rounds=50)
    hosts = {r.host for r in eng.trace().collect()}
    assert "c.example" not in hosts
    assert {"a.example", "b.example"} <= hosts
