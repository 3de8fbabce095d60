"""Per-host politeness scheduling (north_star: "per-host
politeness-delay enforcement via grouped pandas/Arrow UDFs").

Two layers:
- the per-round CAP (how many urls a host may contribute to a round)
  is JVM-side — ``pompspark.robots.politeness_cap_col`` inside the
  dequeue window; no Python in that path.
- the intra-round SCHEDULE (when each url may be fetched, for a real
  HTTP fetcher) is this module: a grouped pandas UDF (applyInPandas
  over groupBy(host)) that spaces each host's fetches crawl_delay
  seconds apart, preserving fetch_rank order. The simulated fetcher
  ignores slots (no wall-clock in tests); HttpFetcher can sleep-until
  per batch on a real cluster.

pomp analog: none — pomp fetches as fast as the downloader allows;
politeness is an [A] addition mandated by the north rule.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def schedule_slots(batch: DataFrame, round_start_s: float = 0.0) -> DataFrame:
    """Adds ``slot_s``: seconds-offset (from round start) at which each
    url may be fetched. Within a host: i-th url (by fetch_rank) gets
    i * crawl_delay (0 when no delay). Grouped pandas UDF — each host
    group fits a pandas frame (per-host rows ≤ per_host_budget)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(batch.schema.fields) + [T.StructField("slot_s", T.DoubleType())]
    )

    def per_host(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("fetch_rank").reset_index(drop=True)
        delay = pdf["crawl_delay"].iloc[0] if "crawl_delay" in pdf else None
        d = float(delay) if delay is not None and not pd.isna(delay) else 0.0
        pdf["slot_s"] = round_start_s + d * pd.RangeIndex(len(pdf)).astype(float)
        return pdf

    return batch.groupBy("host").applyInPandas(per_host, schema=out_schema)
