"""Middleware/pipeline chain semantics — the pomp extension contract
(SURVEY §2.4.2): request middlewares run in declaration order and drop
by filtering (pomp: process_request returning None); response
middlewares run in REVERSE order; pipelines transform items before the
sink and can stop propagation (pomp: BasePipeline.process -> None)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pompspark.engine import simulated_engine
from pompspark.fixtures import SMALL_SEED, SMALL_SITEMAP, small_pages_df
from tests.oracle_sim import OracleCrawl


def test_request_middleware_drop(spark, tmp_path):
    """A request middleware that filters out c.example mirrors pomp
    middleware returning None: those urls are dequeued but never
    fetched this round... here: never even fetched (dropped pre-fetch),
    and the crawl continues."""
    drop_c = lambda df: df.filter(F.col("host") != "c.example")  # noqa: E731
    eng = simulated_engine(
        spark, str(tmp_path / "s"), small_pages_df(spark),
        ordering="bfs", per_round_budget=5, per_host_budget=5,
        request_middlewares=[drop_c],
    )
    eng.seed([SMALL_SEED])
    eng.run(max_rounds=50)
    hosts = {r.host for r in eng.trace().collect()}
    assert "c.example" not in hosts
    assert {"a.example", "b.example"} <= hosts


def test_middleware_order_and_response_reverse(spark, tmp_path):
    """Order contract: request middlewares apply in declaration order,
    response middlewares in reverse declaration order (pomp engine
    applies reversed(middlewares) on responses)."""
    calls: list[str] = []

    def req_a(df):
        calls.append("req_a")
        return df

    def req_b(df):
        calls.append("req_b")
        return df

    def resp_a(df):
        calls.append("resp_a")
        return df

    def resp_b(df):
        calls.append("resp_b")
        return df

    eng = simulated_engine(
        spark, str(tmp_path / "s"), small_pages_df(spark),
        ordering="bfs", per_round_budget=50, per_host_budget=50,
        request_middlewares=[req_a, req_b],
        response_middlewares=[resp_a, resp_b],
    )
    eng.seed([SMALL_SEED])
    eng.run_round()
    assert calls == ["req_a", "req_b", "resp_b", "resp_a"]


def test_pipeline_transforms_items(spark, tmp_path):
    """Pipelines transform items before the fetch_log sink; a filter
    stops an item's propagation (pomp: pipe.process -> None)."""
    upper = lambda df: df.withColumn("text", F.upper("text"))  # noqa: E731
    only_a = lambda df: df.filter(F.col("host") == "a.example")  # noqa: E731
    eng = simulated_engine(
        spark, str(tmp_path / "s"), small_pages_df(spark),
        ordering="bfs", per_round_budget=50, per_host_budget=50,
        pipelines=[upper, only_a],
    )
    eng.seed([SMALL_SEED])
    eng.run(max_rounds=50)
    log = eng.fetch_log().collect()
    assert all(r.url.startswith("http://a.example") for r in log)
    assert all(r.text == r.text.upper() for r in log if r.text)
    # pipelines affect only the item sink, never the crawl itself
    assert {t.host for t in eng.trace().collect()} == {"a.example", "b.example", "c.example"}


def test_dropped_requests_still_marked_not_refetched(spark, tmp_path):
    """pomp drop semantics: a dropped request vanishes silently; the
    engine must not loop forever re-dequeuing it."""
    drop_all_c = lambda df: df.filter(F.col("host") != "c.example")  # noqa: E731
    eng = simulated_engine(
        spark, str(tmp_path / "s"), small_pages_df(spark),
        ordering="bfs", per_round_budget=5, per_host_budget=5,
        request_middlewares=[drop_all_c],
    )
    eng.seed([SMALL_SEED])
    eng.run(max_rounds=30)
    assert eng.round < 30  # terminated
    # oracle over the sitemap minus c-host pages gives the same visit set
    sim = OracleCrawl(
        sitemap={u: k for u, k in SMALL_SITEMAP.items()},
        ordering="bfs", per_round_budget=5, per_host_budget=5,
        robots={"c.example": {"disallow": ["/"]}},
    )
    sim.seed([SMALL_SEED])
    sim.run()
    assert {t[2] for t in sim.trace_tuples()} == {r.url for r in eng.trace().collect()}
