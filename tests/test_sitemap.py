"""pompspark.sitemap: robots `Sitemap:` discovery + sitemap-XML loc
extraction (JVM regexp), and the bulk DataFrame seeding path
(CrawlEngine.seed_frontier) they feed — including the full bootstrap:
robots -> sitemap page -> locs -> seed_frontier -> crawl."""

from __future__ import annotations

from pyspark.sql import functions as F

from pompspark.sitemap import robots_sitemaps, sitemap_locs


def test_sitemap_locs_urlset_and_index(spark):
    urlset = (
        "<?xml version='1.0'?><urlset>"
        "<url><loc>http://a.example/p1</loc></url>"
        "<url><loc>\n  http://a.example/p2 </loc><priority>0.5</priority></url>"
        "<url><lastmod>2026-01-01</lastmod></url>"  # no loc: ignored
        "</urlset>"
    )
    index = (
        "<sitemapindex>"
        "<sitemap><loc>http://a.example/sitemap-1.xml</loc></sitemap>"
        "<sitemap><loc></loc></sitemap>"  # empty loc: dropped
        "</sitemapindex>"
    )
    pages = spark.createDataFrame(
        [("http://a.example/sitemap.xml", urlset),
         ("http://a.example/sitemap_index.xml", index)],
        "url string, body string",
    )
    rows = sorted(
        (r.sitemap_url, r.loc, r.is_index) for r in sitemap_locs(pages).collect()
    )
    assert rows == [
        ("http://a.example/sitemap.xml", "http://a.example/p1", False),
        ("http://a.example/sitemap.xml", "http://a.example/p2", False),
        ("http://a.example/sitemap_index.xml", "http://a.example/sitemap-1.xml", True),
    ]


def test_robots_sitemaps_case_insensitive_any_position(spark):
    txt = (
        "User-agent: *\nDisallow: /private\n"
        "SITEMAP: http://a.example/s1.xml\n"
        "sitemap:http://a.example/s2.xml\n"
    )
    robots = spark.createDataFrame(
        [("a.example", txt), ("b.example", "User-agent: *\nAllow: /\n")],
        "host string, robots_txt string",
    )
    got = sorted((r.host, r.sitemap_url) for r in robots_sitemaps(robots).collect())
    assert got == [
        ("a.example", "http://a.example/s1.xml"),
        ("a.example", "http://a.example/s2.xml"),
    ]


def test_seed_frontier_bulk_df_matches_list_seeding(spark, tmp_path):
    """DataFrame seeding crawls the same SET as list seeding (order
    within the seed priority class is hash order, not list order), and
    re-seeding the same urls enqueues nothing (identity anti-join)."""
    from pompspark.engine import simulated_engine
    from pompspark.fixtures import small_pages_df

    pages = small_pages_df(spark)
    seeds = ["http://a.example/p0", "http://b.example/p0"]

    e1 = simulated_engine(spark, str(tmp_path / "list"), pages,
                          per_round_budget=100, per_host_budget=100)
    e1.seed(seeds)
    e1.run(max_rounds=50)

    e2 = simulated_engine(spark, str(tmp_path / "df"), pages,
                          per_round_budget=100, per_host_budget=100)
    seed_df = spark.createDataFrame([(u,) for u in seeds], "url string")
    n = e2.seed_frontier(seed_df)
    assert n == 2
    assert e2.seed_frontier(seed_df) == 0  # dedup vs existing frontier
    e2.run(max_rounds=50)

    visited = lambda e: {r.url for r in e.trace().collect()}  # noqa: E731
    assert visited(e2) == visited(e1)


def test_seed_frontier_canonicalizes_and_dedups(spark, tmp_path):
    """Non-canonical urls go through the same canonicalizer as the
    link merge: scheme/host case, default port, fragment; dupes that
    canonicalize together collapse to one frontier row."""
    from pompspark.engine import simulated_engine
    from pompspark.fixtures import small_pages_df

    e = simulated_engine(spark, str(tmp_path / "canon"), small_pages_df(spark),
                         per_round_budget=100, per_host_budget=100)
    raw = spark.createDataFrame(
        [("HTTP://A.example:80/p0#frag",), ("http://a.example/p0",),
         ("mailto:x@y",)],
        "url string",
    )
    assert e.seed_frontier(raw) == 1
    e.run(max_rounds=50)
    assert "http://a.example/p0" in {r.url for r in e.trace().collect()}


def test_sitemap_bootstrap_end_to_end(spark, tmp_path):
    """The full cold-start path: robots rows carry Sitemap directives
    -> sitemap XML page bodies -> sitemap_locs -> seed_frontier ->
    the crawl fetches exactly the advertised pages (plus discovery)."""
    from pompspark.engine import simulated_engine
    from pompspark.fixtures import small_pages_df

    robots = spark.createDataFrame(
        [("a.example",
          "User-agent: *\nSitemap: http://a.example/sitemap.xml\n")],
        "host string, robots_txt string",
    )
    sm = robots_sitemaps(robots).collect()
    assert [(r.host, r.sitemap_url) for r in sm] == [
        ("a.example", "http://a.example/sitemap.xml")
    ]
    # the "fetched" sitemap body for that url
    body = (
        "<urlset><url><loc>http://a.example/p2</loc></url>"
        "<url><loc>http://c.example/p0</loc></url></urlset>"
    )
    sm_pages = spark.createDataFrame(
        [(sm[0].sitemap_url, body)], "url string, body string"
    )
    locs = sitemap_locs(sm_pages).select(F.col("loc").alias("url"))
    e = simulated_engine(spark, str(tmp_path / "boot"), small_pages_df(spark),
                         per_round_budget=100, per_host_budget=100)
    assert e.seed_frontier(locs) == 2
    e.run(max_rounds=50)
    visited = {r.url for r in e.trace().collect()}
    # both advertised pages fetched; their outlinks followed
    assert {"http://a.example/p2", "http://c.example/p0"} <= visited
    assert "http://c.example/p1" in visited  # discovered via c/p0
