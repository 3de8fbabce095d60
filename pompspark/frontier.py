"""Frontier operators: seed (O1), merge (O2), dequeue (O3).

pomp analog: the engine queue — ``BaseQueue.put_requests/get_requests``
(pomp/core/base.py) and the default in-memory ``SimpleQueue``
(pomp/core/engine.py). LIFO (depth-first) is pomp's default; FIFO via
``breadth_first=True``. Here the queue is the ``frontier`` table and
dequeue is rank-over-window per host + global top-k.

Scale design (10^10-URL frontier):
- the frontier is append-only; state transitions are appended to a slim
  ``frontier_state`` side table and folded in by periodic compaction,
  so a round writes O(batch) not O(frontier) (Iceberg MERGE analog).
- data dirs are partitioned by ``state`` → a dequeue scans only
  ``state=queued`` files (partition pruning).
- hot-host skew: explicit ``salt = pmod(murmur3, SALT_N)`` column; the
  dequeue ranks per (host, salt) first — 10^8 urls of one host spread
  over SALT_N window partitions — then re-ranks the tiny survivor set
  per host. Exact: the true top-k per host is a subset of the per-salt
  top-k union.
- global top-k is ``ORDER BY ... LIMIT`` → Spark's TakeOrderedAndProject
  (per-partition heap + driver merge), never a full sort shuffle.
- ``seq`` (discovery order, the queue tie-breaker) is assigned
  WITHOUT a global row_number: ``seq = round<<45 | fetch_rank<<21 | pos``
  is deterministic, collision-free (budget < 2^24 ranks — enforced in
  dequeue(); outdegree < 2^21 links per page — enforced in
  new_frontier_rows()), and order-isomorphic to a global counter — so
  traces match the oracle while seq assignment stays embarrassingly
  parallel. Field widths cover the advertised crawl scale: 2^24 =
  16.7M-url round budgets (the parallel top-k path's territory),
  2^21 = 2M outlinks/page, 2^18 = 262k rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pompspark import schemas
from pompspark.canon import register_udfs
from pompspark.robots import politeness_cap_col, with_robots
from pompspark.tables import Catalog

SALT_N = 16
S_ROUND = 1 << 45
S_RANK = 1 << 21
MAX_RANK = S_ROUND // S_RANK  # 2^24 ranks per round
MAX_POS = S_RANK              # 2^21 outlinks per page

CHILD_PRIORITY = 0.5  # pinned contract — see tests/oracle_sim.py
SEED_PRIORITY = 1.0

FRONTIER_COLS = [f.name for f in schemas.FRONTIER.fields]


def sort_keys(ordering: str):
    """bfs = FIFO within a priority class; dfs = strict LIFO.
    pomp cite: Pomp(breadth_first=...) flag, pomp/core/engine.py."""
    if ordering == "bfs":
        return [F.col("priority").desc(), F.col("depth").asc(), F.col("seq").asc()]
    if ordering == "dfs":
        return [F.col("priority").desc(), F.col("seq").desc()]
    raise ValueError(f"ordering must be bfs|dfs, got {ordering!r}")


def _identity_cols(url_col):
    return [
        F.xxhash64(url_col).alias("url_hash"),
        F.hash(url_col).alias("url_murmur3"),
        F.pmod(F.hash(url_col), F.lit(SALT_N)).cast("int").alias("salt"),
    ]


def _state_col(robots_df):
    return F.when(F.col("disallowed"), F.lit("excluded")).otherwise(F.lit("queued"))


def normalize_seeds(spark, seeds, robots_df, round_: int = 0) -> DataFrame:
    """seeds: list[str | (url, priority)] -> FRONTIER-shaped rows.
    pomp analog: ENTRY_REQUESTS consumed at pump start
    (pomp/core/base.py BaseCrawler.ENTRY_REQUESTS -> Pomp.prepare)."""
    import pandas as pd

    rows = []
    for i, s in enumerate(seeds):
        url, pri = (s, SEED_PRIORITY) if isinstance(s, str) else s
        rows.append({"url": url, "priority": float(pri), "seed_idx": i})
    pdf = pd.DataFrame(rows, columns=["url", "priority", "seed_idx"])
    raw = spark.createDataFrame(pdf)

    canon_udf, _, host_udf = register_udfs()
    df = (
        raw.withColumn("url", canon_udf("url"))
        .filter(F.col("url").isNotNull())
        .withColumn("host", host_udf("url"))
        .filter(F.col("host").isNotNull())
    )
    # first occurrence wins (seed lists are small: global windows are fine)
    w_dup = Window.partitionBy("url").orderBy("seed_idx")
    w_seq = Window.orderBy("seed_idx")
    df = (
        df.withColumn("rn", F.row_number().over(w_dup))
        .filter(F.col("rn") == 1)
        .withColumn("seq", (F.row_number().over(w_seq) - 1).cast("long"))
    )
    df = with_robots(df, robots_df)
    return df.select(
        "url", *_identity_cols(F.col("url"))[:2], "host",
        F.lit(0).alias("depth"), "priority",
        F.lit(round_).alias("discovered_round"), "seq",
        _identity_cols(F.col("url"))[2],
        _state_col(robots_df).alias("state"),
    ).select(*FRONTIER_COLS)


def exact_ranked_topk(df: DataFrame, keys, k: int, partitions: int | None = None) -> DataFrame:
    """Exact global top-k WITH dense 0-based rank, fully parallel.

    ORDER BY + LIMIT k plans as TakeOrderedAndProject: fine for small
    k, but its driver-side merge of per-partition heaps (and the
    single-partition row_number window for the rank) serializes at
    k ~ 10^5-10^7 — the crawl-scale budgets. This is the classic
    parallel top-k instead:

      1. range-partition by the sort keys (order-preserving across
         partition ids) + sort within partitions,
      2. per-partition counts -> driver prefix sums (P integers),
      3. mapInPandas assigns rank = partition offset + local index,
         filtering rows past k.

    Exact and deterministic for a total-order key (ours ends in the
    unique seq). Three parallel jobs, zero driver merges.
    """
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    s = (
        df.repartitionByRange(p, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    counts = dict(
        (r["__pid"], r["cnt"])
        for r in s.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        [f for f in s.schema.fields if f.name != "__pid"]
        + [T.StructField("fetch_rank", T.LongType())]
    )
    cols = [f.name for f in s.schema.fields if f.name != "__pid"]

    def assign(batches):
        local = {}
        for b in batches:
            if len(b) == 0:
                continue
            pid = int(b["__pid"].iloc[0])
            start = offsets.get(pid, 0) + local.get(pid, 0)
            local[pid] = local.get(pid, 0) + len(b)
            ranks = pd.RangeIndex(start, start + len(b)).to_numpy()
            keep = ranks < k
            if keep.any():
                out = b.loc[keep, cols].copy()
                out["fetch_rank"] = ranks[keep]
                yield out

    result = s.mapInPandas(assign, schema=out_schema)
    # caller materializes once; the persist above backs both the counts
    # job and the final pass (unpersisted lazily by Spark's LRU).
    return result


def dequeue(
    queued: DataFrame,
    robots_df: DataFrame,
    ordering: str = "bfs",
    per_round_budget: int = 1000,
    per_host_budget: int = 10,
    round_seconds: float = 1.0,
    parallel_topk_threshold: int = 2_000_000,
) -> DataFrame:
    """O3: the politeness-budgeted top-k. Returns the fetch batch with
    ``fetch_rank`` (0-based fetch order within the round).

    pomp analog: BaseQueue.get_requests(count=workers) — count here is
    per_round_budget; politeness caps are the [A] addition."""
    if per_round_budget > MAX_RANK:
        raise ValueError(
            f"per_round_budget {per_round_budget} exceeds the seq "
            f"rank-field width ({MAX_RANK}); widen S_RANK packing"
        )
    keys = sort_keys(ordering)
    df = with_robots(queued, robots_df)
    cap = politeness_cap_col(per_host_budget, round_seconds)

    # level 1: per-(host, salt) — defuses hot-host window skew.
    w1 = Window.partitionBy("host", "salt").orderBy(*keys)
    survivors = (
        df.withColumn("cap", cap)
        .withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= F.col("cap"))
    )
    # level 2: exact per-host cap over the small survivor set.
    w2 = Window.partitionBy("host").orderBy(*keys)
    capped = (
        survivors.withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") <= F.col("cap"))
    )
    if per_round_budget >= parallel_topk_threshold:
        # crawl-scale budgets: parallel exact top-k + rank (no driver
        # heap merge, no single-partition rank window).
        batch = exact_ranked_topk(
            capped.select(*FRONTIER_COLS), keys, per_round_budget
        )
        return batch.select(*FRONTIER_COLS, "fetch_rank")
    # small budgets: TakeOrderedAndProject (one job), rank over the
    # ≤budget-row batch in a single small partition.
    batch = capped.orderBy(*keys).limit(per_round_budget)
    batch = batch.withColumn(
        "fetch_rank", (F.row_number().over(Window.orderBy(*keys)) - 1).cast("long")
    )
    return batch.select(*FRONTIER_COLS, "fetch_rank")


def dedup_discoveries(discoveries: DataFrame) -> DataFrame:
    """First occurrence (by fetch_rank, pos) wins within one round's
    link batch — matches the oracle's in-order _admit."""
    w = Window.partitionBy("url").orderBy("fetch_rank", "pos")
    return (
        discoveries.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def new_frontier_rows(
    discoveries: DataFrame,
    frontier_all: DataFrame,
    robots_df: DataFrame,
    round_: int,
    seen_filter=None,
) -> DataFrame:
    """O2 merge: discoveries (url, host, depth, fetch_rank, pos) ->
    FRONTIER rows not already present. Anti-join keys on url_hash (the
    shuffle key — 8 bytes, co-partitionable) with an url equality guard
    so xxhash64 collisions can never drop a distinct url.

    With a ``seen_filter`` (pompspark.seen.SeenFilter), bloom-miss rows
    ("definitely new" — blooms have no false negatives) BYPASS the
    exact anti-join; only maybe-seen rows (true dupes + the small FP
    fraction) pay it. Exactness is preserved (SURVEY §7.4) while the
    anti-join input shrinks by the dup fraction — the dominant cost at
    10^10-frontier scale, where link batches are overwhelmingly dupes.

    pomp analog: put_requests after middleware dedup (None -> drop)."""
    d = dedup_discoveries(discoveries)
    d = d.withColumn("url_hash", F.xxhash64("url"))
    existing = frontier_all.select("url_hash", F.col("url").alias("__e_url"))
    if seen_filter is not None:
        d = seen_filter.maybe_seen_col(d, "url_hash")
        definitely_new = d.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = d.filter(F.col("maybe_seen")).drop("maybe_seen")
        survivors = maybe.join(
            existing,
            (maybe["url_hash"] == existing["url_hash"])
            & (maybe["url"] == existing["__e_url"]),
            "left_anti",
        )
        fresh = definitely_new.unionByName(survivors)
    else:
        fresh = d.join(
            existing,
            (d["url_hash"] == existing["url_hash"])
            & (d["url"] == existing["__e_url"]),
            "left_anti",
        )
    fresh = with_robots(fresh, robots_df)
    # pos-field width guard: a page with >= 2^21 outlinks would make
    # seq collide with the next rank — raise instead of silently
    # corrupting the queue order (physically impossible for real pages,
    # but the invariant is load-bearing).
    pos_checked = F.when(
        F.col("pos") < F.lit(MAX_POS), F.col("pos").cast("long")
    ).otherwise(
        F.raise_error(
            F.lit(f"outdegree exceeds seq pos-field width ({MAX_POS})")
        ).cast("long")
    )
    seq = (
        F.lit(round_).cast("long") * F.lit(S_ROUND)
        + F.col("fetch_rank").cast("long") * F.lit(S_RANK)
        + pos_checked
    )
    return fresh.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        F.hash("url").alias("url_murmur3"),
        "host",
        F.col("depth").cast("int").alias("depth"),
        F.lit(CHILD_PRIORITY).alias("priority"),
        F.lit(round_).alias("discovered_round"),
        seq.alias("seq"),
        F.pmod(F.hash("url"), F.lit(SALT_N)).cast("int").alias("salt"),
        _state_col(robots_df).alias("state"),
    )


class FrontierStore:
    """Catalog-backed frontier with append-only state transitions.

    Tables: ``frontier`` (discovery rows, partitioned by state),
    ``frontier_state`` (slim per-round transition rows). ``queued()``
    = frontier[state=queued] ANTI JOIN transitions. ``compact()``
    folds transitions in (every K rounds from the engine)."""

    STATE_SCHEMA = "url_hash long, url string, state string, round int"

    def __init__(self, cat: Catalog):
        self.cat = cat
        from pyspark.sql import types as T

        self._state_schema = T.StructType([
            T.StructField("url_hash", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("state", T.StringType()),
            T.StructField("round", T.IntegerType()),
        ])
        cat.create("frontier", schemas.FRONTIER)
        cat.create("frontier_state", self._state_schema)

    def all_rows(self) -> DataFrame:
        return self.cat.read("frontier")

    def queued(self) -> DataFrame:
        f = self.cat.read("frontier").filter(F.col("state") == "queued")
        s = self.cat.read("frontier_state").select("url_hash", F.col("url").alias("__s_url"))
        return f.join(
            s,
            (f["url_hash"] == s["url_hash"]) & (f["url"] == s["__s_url"]),
            "left_anti",
        )

    def append(self, rows: DataFrame) -> int:
        return self.cat.append("frontier", rows, partition_by=["state"])

    def mark(self, batch: DataFrame, state_col, round_: int) -> int:
        """Record state transitions for a fetched batch (url_hash, url)."""
        upd = batch.select(
            "url_hash", "url", state_col.alias("state"),
            F.lit(round_).alias("round"),
        )
        return self.cat.append("frontier_state", upd)

    def compact(self) -> None:
        f = self.cat.read("frontier")
        s = (
            self.cat.read("frontier_state")
            .select(
                F.col("url_hash").alias("__s_hash"),
                F.col("url").alias("__s_url"),
                F.col("state").alias("__new_state"),
            )
            .dropDuplicates(["__s_hash", "__s_url"])
        )
        folded = (
            f.join(
                s,
                (f["url_hash"] == s["__s_hash"]) & (f["url"] == s["__s_url"]),
                "left",
            )
            .withColumn("state", F.coalesce("__new_state", "state"))
            .select(*FRONTIER_COLS)
        )
        self.cat.overwrite("frontier", folded, partition_by=["state"])
        self.cat.overwrite(
            "frontier_state",
            self.cat.spark.createDataFrame([], self._state_schema),
        )
