#!/usr/bin/env python
"""Link-graph operator benchmark: connected components + PageRank at
millions of edges on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line.

Input is synthesized deterministically (no external data, per
BASELINE.json): a seed-42-free hash graph —

- ``random`` part: N nodes, out-degree 4 via the Knuth multiplicative
  hash (i*2654435761 + c) % N — one giant low-diameter component that
  stresses SHUFFLE WIDTH (every star round touches all edges);
- ``chain`` part: a C-node path appended at ids N..N+C — the
  adversarial DEPTH case (min-label propagation would need C rounds;
  the alternating-star algorithm must close it in O(log C)).

Claims measured, mirroring the operators' scale story in
pompspark/graph.py:

- connected_components converges in O(log n) star rounds on the mixed
  graph (rounds reported), wall flat per round (lineage truncation);
- pagerank wall is linear in iters x edges (per-iteration seconds
  reported) with the ranks side of the join at node cardinality.

Env: SPARK_GRAFT_CPUS (32), GRAPH_BENCH_NODES (500000),
GRAPH_BENCH_CHAIN (100000), GRAPH_BENCH_PR_ITERS (5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = int(os.environ.get("GRAPH_BENCH_NODES", "500000"))
    chain = int(os.environ.get("GRAPH_BENCH_CHAIN", "100000"))
    pr_iters = int(os.environ.get("GRAPH_BENCH_PR_ITERS", "5"))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("graph-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pompspark.graph import connected_components, pagerank

    rnd = (
        spark.range(n)
        .select(
            F.col("id").alias("src"),
            F.explode(F.array(*[F.lit(c) for c in range(1, 5)])).alias("c"),
        )
        .select("src", ((F.col("src") * F.lit(2654435761) + F.col("c")) % F.lit(n)).alias("dst"))
    )
    chain_e = spark.range(n, n + chain - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    edges = rnd.unionByName(chain_e).filter(F.col("src") != F.col("dst"))
    n_edges = edges.count()  # materialize input cost outside the timers

    out: dict = {
        "metric": "graph_cc_pagerank_sec",
        "unit": "sec",
        "cpus": cpus,
        "nodes": n + chain,
        "edges": n_edges,
        "queries": {},
    }

    if os.environ.get("GRAPH_BENCH_SKIP_CC") != "1":
        t0 = time.monotonic()
        cc_stats: dict = {}
        cc = connected_components(edges, max_iters=50, stats=cc_stats)
        comp_count = cc.select("component").distinct().count()
        cc_wall = time.monotonic() - t0
        out["queries"]["connected_components"] = round(cc_wall, 3)
        out["cc_components"] = comp_count
        out["cc_rounds"] = cc_stats.get("rounds")
        # correctness spot-check at scale: the chain is ONE component
        # and every chain node got the chain minimum (= n) as its label
        chain_ok = (
            cc.filter((F.col("id") >= n) & (F.col("component") != n)).limit(1).count() == 0
        )
        out["cc_chain_collapsed"] = bool(chain_ok)
    else:
        cc_wall = 0.0

    t0 = time.monotonic()
    pr = pagerank(edges, iters=pr_iters)
    pr_rows = pr.count()
    pr_wall = time.monotonic() - t0
    out["queries"][f"pagerank_{pr_iters}it"] = round(pr_wall, 3)
    out["pagerank_rows"] = pr_rows
    out["pagerank_sec_per_iter"] = round(pr_wall / pr_iters, 3)
    out["pagerank_edge_iters_per_sec"] = int(n_edges * pr_iters / pr_wall)

    out["value"] = round(cc_wall + pr_wall, 3)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
