"""Parallel exact top-k equivalence: same rows, same ranks as
ORDER BY + LIMIT, for both orderings — and engine trace parity when
the parallel path is forced."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pompspark.frontier import exact_ranked_topk, sort_keys


def _frontier_like(spark, n=5000):
    return spark.range(n).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") * 37 % 97).cast("double").alias("priority"),
        (F.col("id") % 5).cast("int").alias("depth"),
        F.col("id").alias("seq"),
    )


@pytest.mark.parametrize("ordering", ["bfs", "dfs"])
@pytest.mark.parametrize("k", [1, 100, 4999, 10000])
def test_topk_matches_order_by_limit(spark, ordering, k):
    df = _frontier_like(spark)
    keys = sort_keys(ordering)
    want = [
        (r.url, i)
        for i, r in enumerate(df.orderBy(*keys).limit(k).collect())
    ]
    got = sorted(
        ((r.url, r.fetch_rank) for r in exact_ranked_topk(df, keys, k).collect()),
        key=lambda t: t[1],
    )
    assert got == want


def test_engine_trace_identical_with_parallel_topk(spark, tmp_path):
    """Forcing the parallel top-k path must not change the trace."""
    from pompspark.engine import simulated_engine
    from pompspark.fixtures import SMALL_SEED, small_pages_df
    import pompspark.frontier as fr

    def run(threshold):
        import functools

        orig = fr.dequeue
        eng = simulated_engine(
            spark, str(tmp_path / f"t{threshold}"), small_pages_df(spark),
            ordering="bfs", per_round_budget=3, per_host_budget=2,
        )
        # route through the requested threshold
        import pompspark.engine as em

        em.dequeue = functools.partial(orig, parallel_topk_threshold=threshold)
        try:
            eng.seed([SMALL_SEED])
            eng.run(max_rounds=50)
        finally:
            em.dequeue = orig
        return [(r.round, r.seq, r.url) for r in eng.trace().collect()]

    assert run(threshold=1) == run(threshold=10**9)
