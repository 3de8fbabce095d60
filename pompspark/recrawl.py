"""Re-crawl scheduling: adaptive revisit intervals from fetch history.

A frontier is never fetched once: pages change, and a crawler must
decide WHICH of the 10^10 urls it already has deserve a refetch this
epoch. The classic policy (cf. Cho & Garcia-Molina, "Effective Page
Refresh Policies for Web Crawlers", TODS 2003) adapts per-url: halve
the revisit interval when the last two fetches differ, grow it when
they are identical — hot pages get crawled often, static pages decay
to the maximum interval.

Batch engines re-crawl by EPOCHS (Common Crawl's monthly runs): this
module computes the due set from fetch history; the caller starts the
next epoch and bulk-seeds it (``CrawlEngine.seed_frontier(due_seeds)``)
— no engine state surgery, no conflict with the frontier's
exactly-once dedup semantics inside an epoch.

Scale: one shuffle on url (the history window); fingerprints are
xxhash64 of the page text, so change detection never compares or
shuffles text — 8 bytes per fetch record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def revisit_schedule(
    history: DataFrame,
    current_round: int,
    base_interval: int = 8,
    min_interval: int = 2,
    max_interval: int = 64,
    url_col: str = "url",
    round_col: str = "round",
    text_col: str = "text",
    status_col: str | None = None,
) -> DataFrame:
    """Per-url revisit decision from fetch history rows
    (url, round, text).

    Returns (url, last_round, changed, interval, due):

    - one fetch on record        -> interval = base_interval
    - last two fetches differ    -> interval = max(min, base // 2)
    - last two fetches identical -> interval = min(max, base * 2)
    - due = (current_round - last_round) >= interval

    Only the two most recent fetches per url participate (row_number
    window, one shuffle on url); texts are compared as xxhash64
    fingerprints so the shuffle carries 8-byte values.

    ``status_col``: conditional-GET-aware mode. History rows then mean
    - 200: a body was transferred — fingerprint = xxhash64(text);
    - 304: the server confirmed "identical to what you last saw" —
      the row INHERITS the newest earlier fingerprint (a forward fill
      over the same url partition: one extra sort, zero extra
      shuffles), so a 304-after-200 reads as unchanged instead of
      comparing a null body against real text;
    - anything else (3xx/4xx/5xx): no content observation — excluded.
    - a 200 following a 304 chain with NO earlier 200 in the supplied
      history reads as CHANGED (an If-Modified-Since 200 answer means
      modified-since-validator); a latest 304 always reads unchanged.
      ``changed`` is always 0/1, never null.
    """
    halved = max(min_interval, base_interval // 2)
    doubled = min(max_interval, base_interval * 2)
    if status_col is not None:
        src = history.filter(F.col(status_col).isin(200, 304)).select(
            F.col(url_col).alias("url"),
            F.col(round_col).alias("round"),
            F.when(F.col(status_col) == 304, F.lit(None).cast("long"))
            .otherwise(F.xxhash64(F.col(text_col))).alias("__fp_raw"),
        )
        ffill = (
            Window.partitionBy("url")
            .orderBy(F.col("round").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        src = src.withColumn(
            "__is304", F.col("__fp_raw").isNull()
        ).withColumn(
            "__fp", F.last("__fp_raw", ignorenulls=True).over(ffill)
        ).drop("__fp_raw")
    else:
        src = history.select(
            F.col(url_col).alias("url"),
            F.col(round_col).alias("round"),
            F.xxhash64(F.col(text_col)).alias("__fp"),
        ).withColumn("__is304", F.lit(False))
    w = Window.partitionBy("url").orderBy(F.col("round").desc())
    ranked = (
        src
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 2)
    )
    agg = ranked.groupBy("url").agg(
        F.max(F.when(F.col("__rn") == 1, F.col("round"))).alias("last_round"),
        F.max(F.when(F.col("__rn") == 1, F.col("__fp"))).alias("__fp1"),
        F.max(F.when(F.col("__rn") == 2, F.col("__fp"))).alias("__fp2"),
        F.max(F.when(F.col("__rn") == 1, F.col("__is304").cast("int")))
        .alias("__latest304"),
        F.count("*").alias("__n"),
    )
    # Null-safe change rule: a latest 304 is the server ASSERTING
    # unchanged; a latest 200 compares fingerprints null-safely — so a
    # 200 whose predecessor is a 304 chain with no earlier 200 in the
    # supplied history (fp2 NULL) reads as CHANGED (an If-Modified-
    # Since 200 answer means modified-since-validator), never NULL.
    changed = (
        (F.col("__n") >= 2)
        & (F.col("__latest304") == 0)
        & ~F.col("__fp1").eqNullSafe(F.col("__fp2"))
    )
    interval = (
        F.when(F.col("__n") < 2, F.lit(base_interval))
        .when(changed, F.lit(halved))
        .otherwise(F.lit(doubled))
    )
    return agg.select(
        "url",
        "last_round",
        changed.cast("int").alias("changed"),
        interval.cast("int").alias("interval"),
        ((F.lit(current_round) - F.col("last_round")) >= interval)
        .cast("int")
        .alias("due"),
    )


def conditional_validators(
    fetch_log: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    status_col: str = "status",
) -> DataFrame:
    """(url, if_modified_since) for the next epoch's conditional GETs
    (SimulatedFetcher(validators=...) / an If-Modified-Since header on
    a real transport): the newest validated timestamp per url — both a
    200 body and a 304 confirmation refresh it. One groupBy on url
    over two pruned columns; text never participates."""
    return (
        fetch_log.filter(F.col(status_col).isin(200, 304))
        .groupBy(F.col(url_col).alias("url"))
        .agg(F.max(ts_col).alias("if_modified_since"))
    )


def due_seeds(schedule: DataFrame) -> DataFrame:
    """The next epoch's seed DataFrame: due urls, changed pages first
    (priority rides into seed_frontier via its ``priority`` arg per
    tier, or callers join their own tiering)."""
    return schedule.filter(F.col("due") == 1).select("url")
