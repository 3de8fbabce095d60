"""Physical-plan shape assertions: the scale-critical properties the
docs claim must be visible in `explain` output — broadcasts actually
broadcast, pruning actually prunes, the global top-k never full-sorts."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fetch_broadcasts_batch_not_pages(spark):
    from pompspark.fetch import SimulatedFetcher
    from pompspark.fixtures import small_pages_df
    from pompspark.frontier import FRONTIER_COLS  # noqa: F401

    pages = small_pages_df(spark)
    batch = pages.select("url").limit(3).withColumn("fetch_rank", F.lit(0))
    plan = _plan(SimulatedFetcher(pages).fetch(batch))
    assert "BroadcastHashJoin" in plan
    # pages side must stream: no sort-merge join anywhere in the fetch
    assert "SortMergeJoin" not in plan


def test_dequeue_no_global_sort(spark):
    """Global top-k must plan as TakeOrderedAndProject, not a full
    Sort+Exchange of the frontier."""
    from pompspark import schemas
    from pompspark.frontier import dequeue

    f = spark.createDataFrame([], schemas.FRONTIER)
    robots = spark.createDataFrame([], schemas.ROBOTS_CACHE)
    plan = _plan(dequeue(f, robots, per_round_budget=10))
    assert "TakeOrderedAndProject" in plan


def test_robots_join_is_broadcast(spark):
    from pompspark.fixtures import small_robots_df
    from pompspark.robots import with_robots

    df = spark.createDataFrame([("http://a.example/p1", "a.example")], ["url", "host"])
    plan = _plan(with_robots(df, small_robots_df(spark)))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_fetch_log_read_prunes_working_columns(spark, tmp_path):
    """fetch_log data files carry links/text/rank; a trace read must
    push a ReadSchema without them (column pruning through the
    zero-copy alias)."""
    from pompspark.engine import simulated_engine
    from pompspark.fixtures import SMALL_SEED, small_pages_df

    eng = simulated_engine(
        spark, str(tmp_path / "s"), small_pages_df(spark),
        ordering="bfs", per_round_budget=5, per_host_budget=5,
    )
    eng.seed([SMALL_SEED])
    eng.run_round()
    trace_plan = _plan(eng.cat.read("trace"))
    assert "text" not in trace_plan.split("ReadSchema")[-1]
    assert "links" not in trace_plan.split("ReadSchema")[-1]


def test_frontier_state_partition_pruning(spark, tmp_path):
    """frontier data dirs are hive-partitioned by state; a queued scan
    must show a partition filter, not a post-scan filter only."""
    from pompspark.engine import simulated_engine
    from pompspark.fixtures import SMALL_SEED, small_pages_df, small_robots_df

    eng = simulated_engine(
        spark, str(tmp_path / "s"), small_pages_df(spark),
        robots_df=small_robots_df(spark),
        ordering="bfs", per_round_budget=5, per_host_budget=5,
    )
    eng.seed([SMALL_SEED])
    eng.run_round()
    plan = _plan(eng.cat.read("frontier").filter(F.col("state") == "queued"))
    assert "PartitionFilters" in plan and "state" in plan.split("PartitionFilters")[-1].split("]")[0]


def test_merge_anti_join_no_frontier_exchange(spark, tmp_path):
    """The 10^10-scale property: the merge anti-join must read the
    frontier identity set from the BUCKETED frontier_index without an
    Exchange — only the O(batch) discovery side may shuffle. (Without
    the index, every round re-shuffles the entire frontier.)"""
    from pompspark import schemas
    from pompspark.frontier import FrontierStore, new_frontier_rows
    from pompspark.tables import Catalog

    cat = Catalog(spark, str(tmp_path / "idx"))
    store = FrontierStore(cat, index_buckets=4)
    rows = spark.range(0, 5000).selectExpr(
        "concat('http://h', cast(id % 7 as string), '.example/p', cast(id as string)) as url",
        "xxhash64(concat('http://h', cast(id % 7 as string), '.example/p', cast(id as string))) as url_hash",
        "hash(concat('http://h', cast(id % 7 as string), '.example/p', cast(id as string))) as url_murmur3",
        "concat('h', cast(id % 7 as string), '.example') as host",
        "cast(0 as int) as depth", "cast(1.0 as double) as priority",
        "cast(0 as int) as discovered_round", "cast(id as long) as seq",
        "cast(id % 16 as int) as salt", "'queued' as state",
    )
    store.append(rows)
    store.index_rebuild()

    disc = spark.range(4000, 6000).selectExpr(
        "concat('http://h', cast(id % 7 as string), '.example/p', cast(id as string)) as url",
        "concat('h', cast(id % 7 as string), '.example') as host",
        "cast(1 as int) as depth", "cast(0 as long) as fetch_rank",
        "cast(id as int) as pos",
    )
    robots = spark.createDataFrame([], schemas.ROBOTS_CACHE)
    # force the non-broadcast join path so the bucketed-scan property
    # is what's actually under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = new_frontier_rows(disc, store.identity_rows(), robots, 1)
        plan = _plan(out)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # the frontier_index scan must be bucketed and feed the join with
    # no Exchange between scan and join on that side
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
    import re
    scan_side = plan[plan.index("frontier_index"):] if "frontier_index" in plan else plan
    # walk upward: between the bucketed scan and the join there must be
    # no Exchange operator. Heuristic on the tree text: the subtree
    # printed after the join's second child marker should not contain
    # "Exchange" before the scan line.
    join_pos = plan.find("SortMergeJoin")
    assert join_pos >= 0, plan
    # count Exchanges in the whole plan: exactly ONE (the discovery
    # side); the frontier side contributes none.
    n_exchange = len(re.findall(r"\bExchange hashpartitioning\(url_hash", plan))
    assert n_exchange == 1, f"expected 1 url_hash exchange, got {n_exchange}:\n{plan}"
    # and the result is still exact
    got = sorted(r.url for r in out.collect())
    want = sorted(
        f"http://h{i % 7}.example/p{i}" for i in range(5000, 6000)
    )
    assert got == want


def test_robots_join_host_pruned_past_gate(spark):
    """Past the broadcast row gate, with_robots must NOT broadcast the
    whole cache: the robots side is LEFT-SEMI pruned to df's distinct
    hosts first (the only broadcast-able subtree is then the pruned
    slice, built by AQE at runtime), and the df side carries no
    host-key Exchange introduced by the pruning."""
    from pompspark.fixtures import small_robots_df
    from pompspark.robots import with_robots

    df = spark.createDataFrame(
        [("http://a.example/p1", "a.example")], ["url", "host"]
    )
    robots = small_robots_df(spark)
    out = with_robots(df, robots, robots_rows=10_000_000,
                      broadcast_row_gate=4_000_000)
    plan = _plan(out)
    assert "LeftSemi" in plan
    # results identical to the broadcast path
    base = with_robots(df, robots).select("url", "disallowed", "crawl_delay")
    got = out.select("url", "disallowed", "crawl_delay")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, base.collect()))


def test_robots_join_broadcast_under_gate(spark):
    from pompspark.fixtures import small_robots_df
    from pompspark.robots import with_robots

    df = spark.createDataFrame(
        [("http://a.example/p1", "a.example")], ["url", "host"]
    )
    plan = _plan(with_robots(df, small_robots_df(spark), robots_rows=100))
    assert "LeftSemi" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_index_compact_one_file_per_bucket(spark, tmp_path):
    """After many appends the bucketed index accretes one file-set per
    round (r2 verdict: 10^4 rounds = 10^4 files/bucket); index_compact
    must rewrite it to ONE file per bucket, preserve the identity set
    exactly, and keep the no-Exchange bucketed-scan property of the
    merge anti-join."""
    from pompspark import schemas
    from pompspark.frontier import FrontierStore, new_frontier_rows
    from pompspark.tables import Catalog

    cat = Catalog(spark, str(tmp_path / "idxc"))
    store = FrontierStore(cat, index_buckets=4)
    for i in range(20):
        rows = spark.range(i * 50, i * 50 + 50).selectExpr(
            "concat('http://h', cast(id % 5 as string), '.example/p', cast(id as string)) as url",
        ).selectExpr("xxhash64(url) as url_hash", "url")
        store.index_append(rows)
    assert store.index_file_count() > 20  # accreted
    before = sorted(r.url for r in store.identity_rows().collect())
    store.index_compact()
    assert store.index_file_count() == 4  # one per bucket
    after = sorted(r.url for r in store.identity_rows().collect())
    assert after == before and len(after) == 1000

    disc = spark.range(900, 1100).selectExpr(
        "concat('http://h', cast(id % 5 as string), '.example/p', cast(id as string)) as url",
        "concat('h', cast(id % 5 as string), '.example') as host",
        "cast(1 as int) as depth", "cast(0 as long) as fetch_rank",
        "cast(id as int) as pos",
    )
    robots = spark.createDataFrame([], schemas.ROBOTS_CACHE)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = new_frontier_rows(disc, store.identity_rows(), robots, 1)
        plan = _plan(out)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # the index side scans bucketed with no Exchange: exactly one
    # url_hash Exchange in the anti-join plan (the O(batch) discovery
    # side) — same assertion as test_merge_anti_join_no_frontier_exchange
    import re
    n_exchange = len(re.findall(r"\bExchange hashpartitioning\(url_hash", plan))
    assert n_exchange == 1, f"expected 1 url_hash exchange, got {n_exchange}:\n{plan}"
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
    assert new_frontier_rows(disc, store.identity_rows(), robots, 1).count() == 100


def test_hash_sample_is_map_side_no_shuffle(spark, tmp_path):
    """curation.hash_sample / stratified_sample compile to a filter in
    the scan stage: no Exchange anywhere (the whole point — a 100 TB
    subset selection that costs one pass and no shuffle), and the
    filter is visible in the parquet scan's data filters."""
    from pompspark.curation import hash_sample, stratified_sample

    p = str(tmp_path / "docs")
    spark.range(100).selectExpr(
        "id as doc_id", "cast(id % 3 as string) as lang"
    ).write.parquet(p)
    docs = spark.read.parquet(p)

    plan = _plan(hash_sample(docs, "doc_id", 0.25))
    assert "Exchange" not in plan, plan
    assert "Filter" in plan

    plan2 = _plan(stratified_sample(docs, "lang", {"0": 0.25}, key_col="doc_id"))
    assert "Exchange" not in plan2, plan2


def test_quota_sample_single_exchange_on_quota_key(spark, tmp_path):
    """quota_sample costs exactly one shuffle (hash-partition on the
    quota key for the rank window) — never a global sort."""
    import re

    from pompspark.curation import quota_sample

    p = str(tmp_path / "docs_q")
    spark.range(100).selectExpr(
        "id as doc_id", "cast(id % 3 as string) as source"
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    plan = _plan(quota_sample(docs, "source", 5, F.col("doc_id").asc()))
    assert len(re.findall(r"\bExchange hashpartitioning\(source", plan)) == 1, plan
    assert "rangepartitioning" not in plan, plan
