"""Structured Streaming surface: live rollups over the crawl's output
tables while the batch rounds append to them.

pomp has no streaming analog (its loop IS the stream); this is the
Spark-native bonus a long-running crawl wants: the fetch_log directory
is a file-stream source (each round appends new parquet files), so
dashboards/monitors consume it incrementally with exactly-once file
tracking — no re-reads of old rounds.

- ``stream_fetch_counts``: windowed per-host fetch counts with a
  watermark on warc_ts (late pages beyond the watermark are dropped,
  the standard late-data policy).
- ``stream_round_progress``: running urls/bytes per round via
  availableNow micro-batches — the "tail -f" of the crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pompspark import schemas


def fetch_log_stream(spark: SparkSession, fetch_log_data_dir: str) -> DataFrame:
    """File-source stream over a fetch_log data directory tree.
    Each engine round adds files; the stream picks up exactly the new
    ones (checkpointed file index)."""
    return (
        spark.readStream.schema(schemas.FETCH_LOG)
        .option("recursiveFileLookup", "true")
        .parquet(fetch_log_data_dir)
    )


def stream_fetch_counts(
    stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-(window, host-ish url prefix) fetch counts with late-data
    watermarking. Grouping key derives from the url JVM-side."""
    host = F.parse_url(F.col("url"), F.lit("HOST")).alias("host")
    return (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), host)
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum(F.when(F.col("status") != 200, 1).otherwise(0)).alias("n_errors"),
        )
        .select("w.start", "w.end", "host", "n_fetched", "n_errors")
    )


def stream_round_progress(stream: DataFrame) -> DataFrame:
    """Running per-round totals (complete-mode aggregate)."""
    return stream.groupBy("round").agg(
        F.count("*").alias("urls"),
        F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("ok"),
    )


def stream_host_totals_stateful(stream: DataFrame) -> DataFrame:
    """Custom STATEFUL operator (applyInPandasWithState): running
    per-host totals that survive across micro-batches via the state
    store — the pattern for any cross-batch crawl monitor (per-host
    error budgets, adaptive politeness, kill-switches). Arrow-batched;
    state is one small tuple per host."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        total, errors = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            total += len(pdf)
            errors += int((pdf["status"] != 200).sum())
        state.update((total, errors))
        yield pd.DataFrame(
            {"host": [key[0]], "total": [total], "errors": [errors]}
        )

    host = F.parse_url(F.col("url"), F.lit("HOST")).alias("host")
    return (
        stream.withColumn("host", host)
        .groupBy("host")
        .applyInPandasWithState(
            update,
            outputStructType="host string, total long, errors long",
            stateStructType="total long, errors long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_event_rollup(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Deterministic end-to-end streaming rollup over a bounded file
    source: readStream(events) -> watermark -> windowed groupBy ->
    availableNow drain into a memory sink -> the final table. On a
    bounded input with complete-mode output this equals the batch
    GROUP BY over the same rows, which makes it the one streaming
    operator a DuckDB oracle can check exactly (__spark_entry__
    ``streaming_windowed_rollup``). Integral aggregates only (counts +
    floor-scaled value sums) so the comparison is exact, not
    float-luck."""
    import os
    import tempfile

    from pyspark.sql import types as T

    if os.path.isfile(events_path):
        # the file stream source requires a DIRECTORY (basePath rule);
        # single-file tables (driver testdata) get a symlink dir
        d = tempfile.mkdtemp(prefix="pompstream-src-")
        # abspath: a RELATIVE symlink target resolves relative to the
        # symlink's own directory (the tempdir), i.e. dangles -> an
        # empty/failed stream source.
        os.symlink(
            os.path.abspath(events_path),
            os.path.join(d, os.path.basename(events_path)),
        )
        events_path = d

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    stream = spark.readStream.schema(schema).parquet(events_path)
    rolled = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("value_mills"),
        )
        .select(
            F.col("w.start").alias("w_start"), "event_type",
            "n_events", "value_mills",
        )
    )
    cp = checkpoint_dir or tempfile.mkdtemp(prefix="pompstream-cp-")
    name = run_available_now(rolled, cp)
    return spark.table(name)


def run_available_now(result: DataFrame, checkpoint_dir: str):
    """Drain everything currently available into an in-memory sink and
    stop — the batch-friendly way to tail the crawl in tests/monitors."""
    import uuid

    name = f"pompstream_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name
