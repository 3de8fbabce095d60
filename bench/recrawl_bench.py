#!/usr/bin/env python
"""Conditional re-crawl bench: epoch-2 with If-Modified-Since
validators (304 Not Modified, no bodies) vs an unconditional refetch
of the same url set over an unchanged web. Prints ONE JSON line.

The 10^10 story this measures: a mature crawl's epochs are dominated
by REVISITS (Common Crawl re-fetches ~3x10^9 urls monthly, most
unchanged). The conditional path skips body transfer AND the extract
UDF for every unchanged page — this script quantifies both on the same
synthetic corpus bench.py uses.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, RB_PAGES, RB_BUDGET,
RB_ROUNDS, RB_WORKDIR.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("RB_PAGES", "200000"))
    budget = int(os.environ.get("RB_BUDGET", "60000"))
    rounds = int(os.environ.get("RB_ROUNDS", "3"))
    workdir = os.environ.get(
        "RB_WORKDIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_recrawl"),
    )

    from pyspark.sql import functions as F

    from pompspark.benchgen import (bench_robots, bench_seed_urls,
                                    build_bench_pages)
    from pompspark.engine import CrawlEngine
    from pompspark.fetch import SimulatedFetcher
    from pompspark.recrawl import conditional_validators
    from pompspark.session import build_spark

    spark = build_spark(
        f"local[{cpus}]", app_name="pompspark-recrawl-bench",
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pages_path = os.path.join(workdir, "pages")
    build_bench_pages(spark, docs, n_pages=n_pages).repartition(128)\
        .write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    robots = bench_robots(spark).persist()
    robots.count()
    seeds = bench_seed_urls(spark, n_pages, n_hosts=1000, n_seeds=10000)

    out: dict = {"metric": "recrawl_epoch2_sec", "unit": "sec",
                 "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                 "config": {"cpus": cpus, "n_pages": n_pages,
                            "budget": budget, "rounds": rounds}}

    # ---------------- epoch 1: discover + fetch ----------------------
    t0 = time.monotonic()
    e1 = CrawlEngine(
        spark, os.path.join(workdir, "epoch1"), SimulatedFetcher(pages),
        robots_df=robots, per_round_budget=budget,
        per_host_budget=10**9, ordering="bfs",
    )
    e1.seed(seeds)  # bench_seed_urls returns a driver list
    for _ in range(rounds):
        if e1.run_round() == 0:
            break
    out["epoch1_s"] = round(time.monotonic() - t0, 3)
    log1 = e1.fetch_log().filter("status = 200")
    revisit = log1.select("url").persist()
    n_urls = revisit.count()
    out["urls_per_epoch"] = n_urls
    vals = conditional_validators(e1.fetch_log()).persist()
    vals.count()

    def epoch2(name: str, fetcher) -> dict:
        t = time.monotonic()
        e2 = CrawlEngine(
            spark, os.path.join(workdir, name), fetcher,
            robots_df=robots, per_round_budget=budget,
            per_host_budget=10**9, ordering="bfs",
        )
        e2.seed_frontier(revisit)
        # fetch EXACTLY the revisit set in both legs: seeds (priority
        # 1.0) outrank discovered children (0.5), and capping the last
        # round at the remainder keeps children out of the budget — the
        # unconditional leg still PAYS for its discoveries in the merge
        # stage (that cost is real: unchanged pages produce none).
        left = n_urls
        while left > 0:
            got = e2.run_round(round_budget=min(budget, left))
            if got == 0:
                break
            left -= got
        wall = round(time.monotonic() - t, 3)
        agg = e2.fetch_log().agg(
            F.sum(F.when(F.col("status") == 304, 1).otherwise(0))
            .alias("n304"),
            F.count("*").alias("n"),
        ).head()
        # transfer bytes: the per-round metrics rows already carry the
        # 200-body byte sum (parquet-footer lineage, no extra scan)
        bytes_ = e2.metrics().agg(F.sum("bytes").alias("b")).head().b
        return {"wall_s": wall, "n_fetched": int(agg.n),
                "n_304": int(agg.n304 or 0),
                "body_bytes": int(bytes_ or 0)}

    # unconditional first (cold-ish page cache parity is imperfect on
    # a shared box; run order noted in BASELINE.md)
    out["uncond"] = epoch2("epoch2_uncond", SimulatedFetcher(pages))
    out["cond"] = epoch2("epoch2_cond",
                         SimulatedFetcher(pages, validators=vals))
    out["speedup"] = round(
        out["uncond"]["wall_s"] / out["cond"]["wall_s"], 3)
    out["value"] = out["cond"]["wall_s"]
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
