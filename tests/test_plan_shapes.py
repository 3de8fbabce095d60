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
