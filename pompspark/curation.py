"""Corpus-curation sampling operators for training-data pipelines.

A 100 TB web corpus is never used whole: pipelines cap documents per
source (hot hosts would otherwise dominate the mix), carve
deterministic holdout/subset splits, and rebalance strata (downsample
the dominant language). These are the three primitives; each is a
single declarative DataFrame op that Catalyst executes with at most
one shuffle, and each is reproducible bit-for-bit across engines —
the sampling predicates are pure functions of row content (md5 hex),
not RNG state, so the DuckDB oracles in __spark_entry__ match them
exactly and re-runs of a pipeline select the same rows.

pomp has no analog (it is a crawler, not a corpus tool); these are
north-rule [A] training-data additions like pompspark.textops.

Scale notes:

- ``hash_sample`` / ``stratified_sample`` are map-side filters on a
  hash of the key column: no shuffle, pushed into the scan stage, and
  the selectivity is visible to AQE for downstream planning.
- ``quota_sample`` is one shuffle on the quota key + a per-key sort
  bounded by the key's row count. Hot keys (the reason the op exists)
  make that sort wide; the rank window never materializes more than
  ``cap`` survivors per key downstream, and the shuffle carries only
  the columns the caller kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hex_threshold(fraction: float) -> str:
    """fraction in [0,1] -> 4-hex-digit lexicographic threshold.

    Keep a row iff substring(md5(key),1,4) < threshold: md5 hex is
    uniform, lowercase in both Spark and DuckDB, and lexicographic
    order on fixed-width lowercase hex == numeric order, so the kept
    fraction is round(fraction * 65536) / 65536 exactly.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    n = int(round(fraction * 65536))
    if n >= 65536:
        # 'g' sorts above every hex string ('10000' would NOT: '1'<'f')
        return "g"
    return format(n, "04x")


def sample_key(key_col, salt: str = "") -> F.Column:
    """The deterministic sampling key: first 4 hex chars of
    md5(salt || cast(key as string)). A different ``salt`` gives an
    independent sample (holdout vs train split from one pass)."""
    return F.substring(F.md5(F.concat(F.lit(salt), key_col.cast("string"))), 1, 4)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``key_col``.

    Map-side filter (no shuffle, no RNG): the same rows survive on
    every engine and every re-run, and all rows sharing a key travel
    together (sample by document id, by url, by host...). Unlike
    df.sample(), reproducibility does not depend on partitioning or
    a seed's task-order semantics.
    """
    thr = _hex_threshold(fraction)
    return df.filter(sample_key(F.col(key_col), salt) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ``fractions[stratum]``
    of each stratum (e.g. downsample English to 10%, keep the rest).

    The per-stratum threshold is a CASE expression over hex-string
    literals — still a pure map-side filter; the strata map is compiled
    into the plan, not joined.
    """
    expr = None
    col = F.col(strata_col)
    for stratum, frac in sorted(fractions.items()):
        thr = F.lit(_hex_threshold(frac))
        expr = F.when(col == stratum, thr) if expr is None else expr.when(col == stratum, thr)
    thr_col = F.lit(_hex_threshold(default_fraction)) if expr is None else expr.otherwise(
        F.lit(_hex_threshold(default_fraction))
    )
    return df.filter(sample_key(F.col(key_col), salt) < thr_col)


def quota_sample(
    df: DataFrame,
    quota_col: str,
    cap: int,
    order_by,
    keep_rank: bool = False,
) -> DataFrame:
    """Keep at most ``cap`` rows per ``quota_col`` value — the per-host
    (or per-source/domain) document cap every web-corpus recipe
    applies so hot hosts cannot dominate the training mix.

    ``order_by`` (a Column or list of Columns) decides WHICH rows
    survive — it must be a total order per key (include a unique id)
    for the result to be deterministic. One shuffle on the quota key;
    row_number is rank-only (no full-key materialization on any single
    task beyond the per-key sort).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    order = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    w = Window.partitionBy(quota_col).orderBy(*order)
    out = df.withColumn("__qrank", F.row_number().over(w)).filter(
        F.col("__qrank") <= cap
    )
    if keep_rank:
        return out.withColumnRenamed("__qrank", "quota_rank")
    return out.drop("__qrank")
