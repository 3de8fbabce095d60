#!/usr/bin/env python
"""Crawl-engine benchmark. Prints ONE JSON line:
  {"metric": ..., "value": <total timed sec>, "unit": "sec",
   "queries": {<stage>: sec, ...}, "sf": ..., "urls_per_sec": ...}

Protocol (BASELINE.md): synthetic Common-Crawl-style pages derived
deterministically from $SPARK_GRAFT_SF_DIR documents (seed-42 hash
graph, zipf hosts, ~30 KB html bodies), 1 warm-up round + >=3 timed
rounds of the full engine (dequeue -> fetch/extract -> sinks -> merge
-> checkpoint). Headline = URLs fetched+extracted per second.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_PAGES,
BENCH_BUDGET, BENCH_ROUNDS, BENCH_WORKDIR.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Crash tolerance: BENCH_r03 was a zero record because a host flake
# (one crashed Python worker) burned the driver's timeout and nothing
# was printed. Every completed stage/round now lands in _PARTIAL, and
# any exception OR SIGTERM (what `timeout` sends) emits it as a JSON
# line with an "error" field — a flake degrades the record, never
# zeroes it.
_PARTIAL: dict = {
    "metric": "crawl_fetch_extract_merge_total_sec",
    "value": None,
    "unit": "sec",
    "queries": {},
    "partial": True,
}


def _emit_partial(reason: str) -> None:
    out = dict(_PARTIAL)
    out["error"] = reason
    print(json.dumps(out), flush=True)


def _sigterm(_signo, _frame):
    _emit_partial("sigterm_timeout")
    os._exit(143)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BENCH_PAGES", "400000"))
    budget = int(os.environ.get("BENCH_BUDGET", "120000"))
    timed_rounds = int(os.environ.get("BENCH_ROUNDS", "3"))
    workdir = os.environ.get(
        "BENCH_WORKDIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench")
    )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    _PARTIAL["sf"] = sf
    _PARTIAL["config"] = {"cpus": cpus, "n_pages": n_pages, "budget": budget}

    from pompspark.benchgen import bench_robots, bench_seed_urls, build_bench_pages
    from pompspark.engine import simulated_engine
    from pompspark.session import build_spark

    spark = build_spark(
        f"local[{cpus}]",
        app_name="pompspark-bench",
        shuffle_partitions=cpus,
        # html-heavy rows: small splits so the pages scan (the fetch's
        # stream side) fans out to >= cores tasks, not ~14 fat ones.
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )

    timings: dict[str, float] = _PARTIAL["queries"]

    # ---------------- untimed setup: generate + persist the web ---------
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.monotonic()
    pages_path = os.path.join(workdir, "pages")
    # Many small files: snappy compresses the synthetic bodies ~10x, and
    # split planning sees COMPRESSED bytes — without enough files the
    # extract stage (the round's dominant CPU) can't fan out to all
    # threads. 256 files => >=256 scan tasks at any parallelism level.
    build_bench_pages(spark, docs, n_pages=n_pages).repartition(256).write.mode(
        "overwrite"
    ).parquet(pages_path)
    timings["gen_pages"] = round(time.monotonic() - t0, 3)
    pages = spark.read.parquet(pages_path)
    if os.environ.get("BENCH_CACHE_PAGES", "0") == "1":
        # measured and rejected as the default: caching the ~12 GB
        # html corpus on-heap doubles round times at local[32] (GC
        # pressure beats the saved parquet decode); kept as a knob for
        # smaller corpora / bigger heaps.
        pages = pages.persist()
        pages.count()

    seeds = bench_seed_urls(spark, n_pages, n_hosts=1000, n_seeds=int(os.environ.get("BENCH_SEEDS", "10000")))
    robots = bench_robots(spark).persist()
    robots.count()
    use_seen = os.environ.get("BENCH_SEEN", "0") == "1"
    seen_mode = os.environ.get("BENCH_SEEN_MODE", "exact") if use_seen else "exact"
    seen_shards = int(os.environ.get("BENCH_SEEN_SHARDS", "32"))
    # BENCH_PRESEED=N simulates a MATURE crawl: N already-seen urls
    # inflate the merge's exact-anti-join side (frontier_index) and the
    # bloom contents before the timed rounds — the regime where the
    # per-round index scan dominates and the approx seen filter's
    # O(batch) merge wins (BENCH/BASELINE.md crossover table).
    preseed = int(os.environ.get("BENCH_PRESEED", "0"))
    # BENCH_BANDED=1: band-pruned dequeue (the 10^10-frontier dequeue
    # story — read sort-key-prefix bands until the budget fills instead
    # of scanning the whole queued frontier). Needs a banded compacted
    # layout to prune, so pair with BENCH_COMPACT_EVERY (compaction
    # during warm-up builds the bands the timed rounds then skip).
    banded = os.environ.get("BENCH_BANDED", "0") == "1"
    compact_every = int(os.environ.get("BENCH_COMPACT_EVERY", "0"))
    eng = simulated_engine(
        spark,
        os.path.join(workdir, "state"),
        pages,
        robots_df=robots,
        ordering="bfs",
        per_round_budget=budget,
        per_host_budget=int(os.environ.get("BENCH_HOST_BUDGET", "5000")),
        compact_every=compact_every,
        banded_dequeue=banded,
        use_seen_filter=use_seen,
        seen_mode=seen_mode,
        # approx mode never reads the identity index — skip maintaining it
        use_bucketed_index=seen_mode != "approx",
        seen_shards=seen_shards,
        seen_capacity_per_shard=max(
            100_000, n_pages // 16, preseed * 2 // seen_shards
        ),
    )
    t0 = time.monotonic()
    eng.seed(seeds)
    timings["seed"] = round(time.monotonic() - t0, 3)
    if preseed:
        from pyspark.sql import functions as F

        t0 = time.monotonic()
        pre = spark.range(preseed).select(
            F.concat(F.lit("http://pre.example/x"),
                     F.col("id").cast("string")).alias("url")
        ).select(F.xxhash64("url").alias("url_hash"), "url")
        if eng.store.use_index:
            eng.store.index_append(pre)
        if eng.seen_filter is not None:
            eng.seen_filter.add(pre.select("url_hash"))
            eng.seen_filter.compact()
        timings["preseed"] = round(time.monotonic() - t0, 3)

    # ---------------- warm-up -------------------------------------------
    # two rounds: spawn+warm all python workers, JIT the codegen, and
    # reach steady-state frontier mix; then flush writeback so earlier
    # writes can't stall the timed window.
    n_warmup = int(os.environ.get("BENCH_WARMUP", "2"))
    warmup_budget = int(os.environ.get("BENCH_WARMUP_BUDGET", str(max(budget // 3, 1))))
    for w in range(n_warmup):
        t0 = time.monotonic()
        eng.run_round(warmup_budget)
        timings[f"warmup_round_{w + 1}"] = round(time.monotonic() - t0, 3)
    os.sync()

    # ---------------- timed rounds --------------------------------------
    sync_each = os.environ.get("BENCH_SYNC_ROUNDS", "1") == "1"
    fetched = 0
    round_fetches: list[int] = []
    stage_timings: dict[str, dict] = {}
    t_start = time.monotonic()
    for i in range(timed_rounds):
        r0 = time.monotonic()
        n = eng.run_round()
        stage_timings[f"round_{i + 1}"] = dict(eng.last_round_timings)
        if banded:
            stage_timings[f"round_{i + 1}"]["bands_read"] = eng.last_bands_read
        if sync_each:
            # flush INSIDE the timed window: each round writes ~GBs of
            # parquet; letting dirty pages pile up produces a single
            # multi-10s kernel writeback stall in a later round (a
            # measured 78 s round among 40 s rounds). Paying the flush
            # per round is the same total work without the cliff.
            os.sync()
        timings[f"round_{i + 1}"] = round(time.monotonic() - r0, 3)
        fetched += n
        round_fetches.append(n)
        _PARTIAL["urls_fetched"] = fetched
        _PARTIAL["rounds_completed"] = i + 1
        if n == 0:
            break
    total = time.monotonic() - t_start
    urls_per_sec = fetched / total if total > 0 else 0.0
    # per-round throughput + median: this host's run-to-run noise is
    # real (shared VM — a single straggler round can halve the total-
    # based headline); the median round is the robust steady-state
    # number. Headline semantics unchanged (urls_per_sec stays
    # fetched/total for r1/r2 comparability).
    round_rates = [
        round(n / timings[f"round_{i + 1}"], 1)
        for i, n in enumerate(round_fetches)
        if timings.get(f"round_{i + 1}", 0) > 0
    ]
    med = round(statistics.median(round_rates), 1) if round_rates else 0.0

    spark.stop()
    print(json.dumps({
        "metric": "crawl_fetch_extract_merge_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "urls_fetched": fetched,
        "urls_per_sec": round(urls_per_sec, 1),
        "round_urls_per_sec": round_rates,
        "urls_per_sec_median_round": med,
        "stage_timings": stage_timings,
        "config": {
            "cpus": cpus, "n_pages": n_pages, "budget": budget,
            "timed_rounds": timed_rounds, "seen_filter": use_seen,
            "seen_mode": seen_mode, "preseed": preseed,
            "banded": banded, "compact_every": compact_every,
        },
    }))


def run() -> None:
    """Crash-tolerant entry: partial JSON on any exception or SIGTERM.
    Shared by `python bench.py` and bench/run_crawl.py (spark-submit)."""
    signal.signal(signal.SIGTERM, _sigterm)
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — partial record on ANY crash
        _emit_partial(f"{type(e).__name__}: {e}")
        raise


if __name__ == "__main__":
    run()
