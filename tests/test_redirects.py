"""3xx redirect handling: a Location header is a discovery edge.

Contract (mirrored by OracleCrawl.redirects):
- fetching a redirecting url records status 301, terminal state
  'redirect' (never retried, never extracted);
- the Location value — absolute OR relative — resolves against the
  request url through the SAME canonicalization as an anchor href
  (canon.resolve_discoveries) and is enqueued depth+1, CHILD_PRIORITY;
- frontier dedup (O2 anti-join) terminates redirect cycles; depth
  accrual bounds redirect chains exactly like link chains.

pomp analog: pomp leaves redirects to the downloader (urllib follows
them inline); a batch engine must surface them as frontier edges so
the seen-set and politeness budgets see the TARGET url.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pompspark.engine import simulated_engine
from pompspark.fixtures import SMALL_SEED, SMALL_SITEMAP, pages_rows
from tests.oracle_sim import OracleCrawl


def _pages_schema():
    # fresh copy per call: StructType.add MUTATES in place, and PAGES
    # is the shared module-level schema
    from pyspark.sql import types as T

    from pompspark.schemas import PAGES

    return T.StructType(
        list(PAGES.fields) + [T.StructField("redirect_to", T.StringType())]
    )


def _engine_trace(spark, workdir, sitemap, redirects, ordering="bfs",
                  per_round=3, per_host=2, **kw):
    from pompspark.frontier import S_RANK, S_ROUND

    pdf = pages_rows(sitemap, redirects=redirects)
    schema = _pages_schema()
    eng = simulated_engine(
        spark, workdir, spark.createDataFrame(pdf, schema=schema),
        ordering=ordering, per_round_budget=per_round,
        per_host_budget=per_host, compact_every=2, **kw,
    )
    eng.seed([SMALL_SEED])
    eng.run(max_rounds=60)
    got = [
        (r.round, (int(r.seq) % S_ROUND) // S_RANK, r.url, r.depth, r.host)
        for r in eng.trace().collect()
    ]
    return got, eng


def _oracle_trace(sitemap, redirects, ordering="bfs", per_round=3,
                  per_host=2, **kw):
    sim = OracleCrawl(
        sitemap=sitemap, ordering=ordering, per_round_budget=per_round,
        per_host_budget=per_host, redirects=redirects, **kw,
    )
    sim.seed([SMALL_SEED])
    sim.run()
    return sim.trace_tuples(), sim


REDIRECTS = {
    # chain hop into a NEW host (absolute Location)
    "http://b.example/p2": "http://d.example/landing",
    # relative Location: resolves against the request url's directory
    "http://c.example/p1": "moved/here",
    # path-absolute Location on the same host
    "http://c.example/p3": "/rooted",
}

SITEMAP = dict(
    SMALL_SITEMAP,
    **{
        "http://d.example/landing": ["http://d.example/leaf"],
        "http://d.example/leaf": [],
        "http://c.example/moved/here": [],
        "http://c.example/rooted": [],
    },
)


@pytest.mark.parametrize("ordering,per_round,per_host", [
    ("bfs", 3, 2), ("bfs", 5, 5), ("dfs", 3, 2), ("dfs", 4, 3),
])
def test_redirect_trace_equivalence(spark, tmp_path, ordering, per_round,
                                    per_host):
    got, eng = _engine_trace(
        spark, str(tmp_path / f"r-{ordering}-{per_round}-{per_host}"),
        SITEMAP, REDIRECTS, ordering, per_round, per_host,
    )
    want, sim = _oracle_trace(SITEMAP, REDIRECTS, ordering, per_round,
                              per_host)
    assert got == want, (ordering, per_round, per_host)
    # redirect targets were actually crawled (incl. the relative ones)
    visited = {u for (_r, _k, u, _d, _h) in got}
    assert {"http://d.example/landing", "http://c.example/moved/here",
            "http://c.example/rooted"} <= visited
    # fetch_log parity: sources logged as 301, no text, never retried
    log = sorted((r.url, r.round, r.status)
                 for r in eng.fetch_log().collect())
    assert log == sorted((d["url"], d["round"], d["status"])
                         for d in sim.fetch_log)
    for r in eng.fetch_log().filter("status = 301").collect():
        assert r.text is None and r.error is None and r.n_links == 0


def test_redirect_cycle_terminates(spark, tmp_path):
    """a <-> b redirect cycle: both fetched exactly once (frontier
    dedup kills the second admission), crawl stops on its own."""
    sitemap = {SMALL_SEED: ["http://a.example/r1"]}
    redirects = {
        "http://a.example/r1": "http://a.example/r2",
        "http://a.example/r2": "http://a.example/r1",
    }
    got, eng = _engine_trace(
        spark, str(tmp_path / "cycle"), sitemap, redirects, "bfs", 5, 5,
    )
    want, _sim = _oracle_trace(sitemap, redirects, "bfs", 5, 5)
    assert got == want
    urls = [u for (_r, _k, u, _d, _h) in got]
    assert urls.count("http://a.example/r1") == 1
    assert urls.count("http://a.example/r2") == 1
    # effective state: frontier rows (compaction folds terminal
    # transitions into them) overlaid by any not-yet-compacted
    # transitions (latest round wins)
    states = {r.url: r.state for r in eng.cat.read("frontier").collect()}
    for r in sorted(eng.cat.read("frontier_state").collect(),
                    key=lambda r: r.round):
        states[r.url] = r.state
    assert states["http://a.example/r1"] == "redirect"
    assert states["http://a.example/r2"] == "redirect"


def test_redirect_to_seen_url_not_requeued(spark, tmp_path):
    """Location pointing at an already-crawled url adds nothing."""
    sitemap = {
        SMALL_SEED: ["http://a.example/p1"],
        "http://a.example/p1": ["http://a.example/back"],
    }
    redirects = {"http://a.example/back": SMALL_SEED}
    got, _eng = _engine_trace(
        spark, str(tmp_path / "seen"), sitemap, redirects, "bfs", 5, 5,
    )
    want, _sim = _oracle_trace(sitemap, redirects, "bfs", 5, 5)
    assert got == want
    assert [u for (_r, _k, u, _d, _h) in got].count(SMALL_SEED) == 1


def test_redirect_target_depth_increments(spark, tmp_path):
    """Each hop consumes a depth level (bounds redirect traps)."""
    sitemap = {SMALL_SEED: ["http://a.example/h0"],
               "http://a.example/h2": []}
    redirects = {"http://a.example/h0": "http://a.example/h1",
                 "http://a.example/h1": "http://a.example/h2"}
    got, _eng = _engine_trace(
        spark, str(tmp_path / "depth"), sitemap, redirects, "bfs", 5, 5,
    )
    want, _sim = _oracle_trace(sitemap, redirects, "bfs", 5, 5)
    assert got == want
    depth = {u: d for (_r, _k, u, d, _h) in got}
    assert depth["http://a.example/h0"] == 1
    assert depth["http://a.example/h1"] == 2
    assert depth["http://a.example/h2"] == 3


def test_redirect_missing_target_404s(spark, tmp_path):
    """The target is fetched like any discovery — absent from pages
    it 404s without stopping the crawl (O7 error isolation)."""
    sitemap = {SMALL_SEED: ["http://a.example/gone"]}
    redirects = {"http://a.example/gone": "http://nowhere.example/x"}
    got, eng = _engine_trace(
        spark, str(tmp_path / "missing"), sitemap, redirects, "bfs", 5, 5,
    )
    want, _sim = _oracle_trace(sitemap, redirects, "bfs", 5, 5)
    assert got == want
    log = {r.url: r.status for r in eng.fetch_log().collect()}
    assert log["http://nowhere.example/x"] == 404


def test_http_fetcher_location_plumbing(spark):
    """HttpFetcher surfaces a transport 'location' column; a transport
    without one yields all-null (back-compat)."""
    from pompspark.fetch import HttpFetcher

    def transport(urls: pd.Series) -> pd.DataFrame:
        status = urls.map(lambda u: 301 if "redir" in u else 200)
        return pd.DataFrame({
            "status": status,
            "warc_ts": pd.Series([pd.Timestamp("2024-01-01")] * len(urls),
                                 index=urls.index),
            "html": urls.map(
                lambda u: None if "redir" in u
                else b"<html><body>ok</body></html>"),
            "location": urls.map(
                lambda u: "/target" if "redir" in u else None),
        })

    batch = spark.createDataFrame(
        [("http://x.example/redir",), ("http://x.example/page",)],
        ["url"],
    )
    out = {r.url: r for r in HttpFetcher(transport).fetch(batch).collect()}
    assert out["http://x.example/redir"].status == 301
    assert out["http://x.example/redir"].location == "/target"
    assert out["http://x.example/redir"].text is None
    assert out["http://x.example/page"].location is None
    assert out["http://x.example/page"].text == "ok"

    def transport_legacy(urls: pd.Series) -> pd.DataFrame:
        return pd.DataFrame({
            "status": [200] * len(urls),
            "warc_ts": pd.Series([pd.Timestamp("2024-01-01")] * len(urls),
                                 index=urls.index),
            "html": [b"<html><body>ok</body></html>"] * len(urls),
        })

    out2 = HttpFetcher(transport_legacy).fetch(batch).collect()
    assert all(r.location is None for r in out2)


def test_random_web_with_redirects_trace_equivalence(spark, tmp_path):
    """Knuth-hash random web where ~1 in 6 pages is a redirect to a
    deterministic target (some fresh, some already-linked): engine
    trace == oracle, BFS and DFS."""
    def h(s: str) -> int:
        v = 0
        for ch in s:
            v = (v * 6364136223846793005 + ord(ch) + 1442695040888963407) % (1 << 63)
        return v

    hosts = [f"h{i}.example" for i in range(6)]
    sitemap: dict[str, list[str]] = {}
    redirects: dict[str, str] = {}
    urls = [f"http://{hosts[i % 6]}/p{i}" for i in range(60)]
    for u in urls:
        hv = h(u)
        if hv % 6 == 0 and u != urls[0]:
            redirects[u] = urls[h(u + "t") % len(urls)]
        else:
            sitemap[u] = [urls[h(u + str(k)) % len(urls)]
                          for k in range(3)]
    for ordering in ("bfs", "dfs"):
        from pompspark.frontier import S_RANK, S_ROUND

        pdf = pages_rows(sitemap, redirects=redirects)
        eng = simulated_engine(
            spark, str(tmp_path / f"rand-{ordering}"),
            spark.createDataFrame(pdf, schema=_pages_schema()),
            ordering=ordering, per_round_budget=7, per_host_budget=3,
            compact_every=3,
        )
        eng.seed([urls[0]])
        eng.run(max_rounds=80)
        got = [
            (r.round, (int(r.seq) % S_ROUND) // S_RANK, r.url, r.depth,
             r.host)
            for r in eng.trace().collect()
        ]
        sim = OracleCrawl(sitemap=sitemap, ordering=ordering,
                          per_round_budget=7, per_host_budget=3,
                          redirects=redirects)
        sim.seed([urls[0]])
        sim.run()
        assert got == sim.trace_tuples(), ordering
