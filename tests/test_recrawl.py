"""pompspark.recrawl: adaptive revisit intervals (halve on change,
double on stability) + the epoch handoff into seed_frontier."""

from __future__ import annotations

from pompspark.recrawl import due_seeds, revisit_schedule


def _hist(spark, rows):
    return spark.createDataFrame(rows, "url string, round int, text string")


def test_revisit_schedule_policy_matrix(spark):
    h = _hist(spark, [
        ("u_changed", 1, "version one"), ("u_changed", 5, "version two"),
        ("u_static", 1, "same text"),    ("u_static", 5, "same text"),
        ("u_single", 3, "only fetch"),
        # three fetches: only the last two count (5 vs 9: changed)
        ("u_multi", 1, "a"), ("u_multi", 5, "a"), ("u_multi", 9, "b"),
    ])
    got = {
        r.url: (r.last_round, r.changed, r.interval, r.due)
        for r in revisit_schedule(h, current_round=12, base_interval=8).collect()
    }
    assert got == {
        "u_changed": (5, 1, 4, 1),    # halved to 4; 12-5 >= 4 -> due
        "u_static": (5, 0, 16, 0),    # doubled to 16; not due
        "u_single": (3, 0, 8, 1),     # base 8; 12-3 >= 8 -> due
        "u_multi": (9, 1, 4, 0),      # changed, but 12-9 < 4
    }


def test_revisit_interval_bounds(spark):
    h = _hist(spark, [
        ("chg", 1, "x"), ("chg", 2, "y"),
        ("sta", 1, "x"), ("sta", 2, "x"),
    ])
    got = {
        r.url: r.interval
        for r in revisit_schedule(
            h, current_round=10, base_interval=8, min_interval=6, max_interval=10
        ).collect()
    }
    assert got == {"chg": 6, "sta": 10}  # clamped both ways


def test_due_seeds_feed_next_epoch(spark, tmp_path):
    """The epoch loop: schedule -> due urls -> seed_frontier of a
    FRESH epoch workdir crawls exactly those pages again."""
    from pompspark.engine import simulated_engine
    from pompspark.fixtures import small_pages_df

    h = _hist(spark, [
        ("http://a.example/p0", 1, "v1"), ("http://a.example/p0", 5, "v2"),
        ("http://b.example/p0", 1, "s"), ("http://b.example/p0", 5, "s"),
    ])
    seeds = due_seeds(revisit_schedule(h, current_round=12))
    assert [r.url for r in seeds.collect()] == ["http://a.example/p0"]

    e = simulated_engine(spark, str(tmp_path / "epoch2"), small_pages_df(spark),
                         per_round_budget=1, per_host_budget=1)
    assert e.seed_frontier(seeds) == 1
    e.run(max_rounds=1)
    assert [r.url for r in e.trace().collect()] == ["http://a.example/p0"]


# ------------------------------------------------------- conditional GET / 304


def _pages_with_ts(spark, rows):
    """rows: (url, warc_ts_seconds, kids) -> pages df (F1 shape)."""
    import pandas as pd

    from pompspark.extract import ref_extract
    from pompspark.fixtures import EPOCH, page_html
    from pompspark.schemas import PAGES

    recs = []
    for url, sec, kids in rows:
        import datetime as dt

        html = page_html(url, f"body of {url}", kids)
        text, _ = ref_extract(html)
        recs.append({"url": url, "warc_ts": EPOCH + dt.timedelta(seconds=sec),
                     "html": html, "text": text, "lang": "en"})
    return spark.createDataFrame(pd.DataFrame(recs), schema=PAGES)


def test_simulated_fetcher_conditional_304(spark):
    """304 iff the page is not newer than the validator; newer -> 200
    with a body; urls without a validator always 200; missing -> 404."""
    import datetime as dt

    from pompspark.fetch import SimulatedFetcher
    from pompspark.fixtures import EPOCH

    pages = _pages_with_ts(spark, [
        ("http://a.example/old", 10, []),
        ("http://a.example/new", 50, []),
        ("http://a.example/novalid", 10, []),
    ])
    validators = spark.createDataFrame(
        [("http://a.example/old", EPOCH + dt.timedelta(seconds=30)),
         ("http://a.example/new", EPOCH + dt.timedelta(seconds=30)),
         ("http://a.example/gone", EPOCH + dt.timedelta(seconds=30))],
        "url string, if_modified_since timestamp",
    )
    batch = spark.createDataFrame(
        [(u,) for u in ("http://a.example/old", "http://a.example/new",
                        "http://a.example/novalid", "http://a.example/gone")],
        ["url"],
    )
    out = {r.url: r for r in
           SimulatedFetcher(pages, validators=validators).fetch(batch).collect()}
    assert out["http://a.example/old"].status == 304
    assert out["http://a.example/old"].text is None
    assert out["http://a.example/old"].error is None
    assert out["http://a.example/old"].n_bytes == 0
    assert out["http://a.example/old"].links == []
    assert out["http://a.example/new"].status == 200
    assert out["http://a.example/new"].text is not None
    assert out["http://a.example/novalid"].status == 200
    assert out["http://a.example/gone"].status == 404


def test_conditional_epoch_flow(spark, tmp_path):
    """Two-epoch re-crawl: epoch-1 fetch_log -> conditional_validators
    -> epoch-2 over a partially-updated web answers 304 for unchanged pages
    and 200 (fresh text) for updated ones; trace order matches the
    oracle with the same not_modified set."""
    from pompspark.engine import CrawlEngine
    from pompspark.fetch import SimulatedFetcher
    from pompspark.frontier import S_RANK, S_ROUND
    from pompspark.recrawl import conditional_validators
    from tests.oracle_sim import OracleCrawl

    sitemap = {
        "http://a.example/p0": ["http://a.example/p1", "http://b.example/p0"],
        "http://a.example/p1": [],
        "http://b.example/p0": [],
    }
    pages1 = _pages_with_ts(
        spark, [(u, 10, kids) for u, kids in sitemap.items()])
    e1 = CrawlEngine(spark, str(tmp_path / "epoch1"),
                     SimulatedFetcher(pages1),
                     per_round_budget=5, per_host_budget=5)
    e1.seed(["http://a.example/p0"])
    e1.run(max_rounds=10)
    vals = conditional_validators(e1.fetch_log())
    assert vals.count() == 3

    # epoch 2: only a/p1 changed (newer warc_ts)
    pages2 = _pages_with_ts(spark, [
        ("http://a.example/p0", 10, sitemap["http://a.example/p0"]),
        ("http://a.example/p1", 99, []),
        ("http://b.example/p0", 10, []),
    ])
    e2 = CrawlEngine(spark, str(tmp_path / "epoch2"),
                     SimulatedFetcher(pages2, validators=vals),
                     per_round_budget=5, per_host_budget=5)
    e2.seed_frontier(spark.createDataFrame(
        [(u,) for u in sitemap], ["url"]))
    e2.run(max_rounds=10)
    log = {r.url: r for r in e2.fetch_log().collect()}
    assert log["http://a.example/p0"].status == 304
    assert log["http://b.example/p0"].status == 304
    assert log["http://a.example/p1"].status == 200
    assert log["http://a.example/p1"].text is not None
    # 304 is a completed visit: nothing re-queued, crawl stopped
    got = [(r.round, (int(r.seq) % S_ROUND) // S_RANK, r.url)
           for r in e2.trace().collect()]
    assert len(got) == 3

    sim = OracleCrawl(
        sitemap=sitemap, per_round_budget=5, per_host_budget=5,
        not_modified={"http://a.example/p0", "http://b.example/p0"},
    )
    sim.seed(list(sitemap))
    sim.run()
    want_log = sorted((d["url"], d["status"]) for d in sim.fetch_log)
    assert sorted((u, r.status) for u, r in log.items()) == want_log


def test_revisit_schedule_304_aware(spark):
    """status mode: a 304 inherits the newest earlier fingerprint —
    304-after-200 reads unchanged; a changed 200 after a 304 chain
    still reads changed."""
    rows = [
        # u1: 200(v1) then 304 -> unchanged -> interval doubles
        ("u1", 1, "v1", 200), ("u1", 5, None, 304),
        # u2: 200(v1), 304, then 200(v2): last two = (304->v1, v2) -> changed
        ("u2", 1, "v1", 200), ("u2", 3, None, 304), ("u2", 5, "v2", 200),
        # u3: two 304s in a row -> unchanged
        ("u3", 1, "v1", 200), ("u3", 3, None, 304), ("u3", 5, None, 304),
        # u4: a 5xx row is ignored entirely
        ("u4", 1, "v1", 200), ("u4", 3, None, 503), ("u4", 5, "v1", 200),
    ]
    h = spark.createDataFrame(
        rows, "url string, round int, text string, status int")
    got = {
        r.url: (r.last_round, r.changed, r.interval, r.due)
        for r in revisit_schedule(
            h, current_round=12, base_interval=8, status_col="status"
        ).collect()
    }
    assert got == {
        "u1": (5, 0, 16, 0),
        "u2": (5, 1, 4, 1),
        "u3": (5, 0, 16, 0),
        "u4": (5, 0, 16, 0),
    }
