"""IcebergCatalog: the real-Iceberg binding of the Catalog surface.

pompspark.tables.Catalog is an Iceberg-SHAPED snapshot catalog over
plain parquet dirs (runs anywhere, zero jars). Its docstring claims the
engine can swap to real Apache Iceberg "config-only"; this module makes
that claim concrete: the SAME public method surface, implemented over
Spark's Iceberg integration (``df.writeTo(...)``, ``spark.table``,
time-travel ``VERSION AS OF``, and the ``system.*`` stored procedures).

Run requirements (a real cluster, not this sandbox): the
iceberg-spark-runtime jar on the classpath and a catalog conf, e.g.::

    spark.sql.catalog.pomp               org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.pomp.type          hadoop        # or hive / rest
    spark.sql.catalog.pomp.warehouse     s3://bucket/warehouse

then ``CrawlEngine(..., catalog=IcebergCatalog(spark, "pomp.crawl"))``.
tests/test_iceberg.py pins the surface parity in-sandbox and the
functional round-trip under ``skipif`` (runs wherever the jar exists).

Semantics mapping (Catalog -> Iceberg):

- version            -> snapshot_id (monotone per table but NOT dense;
                        callers must treat it as an opaque ordered id —
                        the engine only ever stores/compares/rolls back
                        to ids it previously read, which holds).
- append             -> ``writeTo(t).append()`` (atomic snapshot commit)
- overwrite          -> ``writeTo(t).overwritePartitions()`` on a fresh
                        table / full replace
- replace_partition  -> dynamic partition overwrite — Iceberg does this
                        NATIVELY and atomically, no dir_filters
                        bookkeeping needed (that machinery exists only
                        because parquet dirs are immutable appends).
- read(version=v)    -> ``VERSION AS OF v`` time travel
- row_count          -> snapshot summary ``total-records`` (manifest
                        metadata, zero Spark jobs — same cost model as
                        the parquet footer count)
- rollback           -> ``CALL <cat>.system.rollback_to_snapshot``
- compact            -> ``CALL <cat>.system.rewrite_data_files``

Not carried over (parquet-layout-specific, raise with guidance):

- append_dir / append_with: zero-copy dir adoption. Iceberg's analog is
  the ``add_files`` procedure; append() covers the engine's need.
- The FrontierStore band-marker fast path reads hive subdir names via
  the filesystem; on Iceberg the same pruning comes for free from
  partition stats on (priority, band) — ``banded_source`` falls back to
  a metadata-pruned filter read.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def has_iceberg(spark: SparkSession) -> bool:
    """True when the Iceberg Spark extension classes are loadable."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _ident_ok(name: str) -> str:
    if not re.fullmatch(r"[A-Za-z0-9_.]+", name):
        raise ValueError(f"unsafe identifier: {name!r}")
    return name


class IcebergCatalog:
    """Catalog-surface adapter over a real Iceberg catalog.

    ``namespace`` is ``<spark_catalog>.<database>``, e.g. "pomp.crawl";
    table names from the engine map to ``<namespace>.<table>``.
    """

    # No posix data dirs: callers must use the snapshot-based delta
    # equivalents below instead of footer counts / dir re-reads (see
    # Catalog.SUPPORTS_DIR_LAYOUT).
    SUPPORTS_DIR_LAYOUT = False

    def __init__(self, spark: SparkSession, namespace: str):
        self.spark = spark
        self.namespace = _ident_ok(namespace)
        self.catalog_name = namespace.split(".", 1)[0]
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.namespace}")

    # ------------------------------------------------------------ naming
    def _qual(self, table: str) -> str:
        return f"{self.namespace}.{_ident_ok(table)}"

    # ------------------------------------------------------------ state
    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._qual(table))

    def current_version(self, table: str) -> int:
        """Current snapshot id (opaque ordered id; -1 for an empty
        table that has no snapshot yet)."""
        row = (
            self.spark.sql(
                f"SELECT snapshot_id FROM {self._qual(table)}.snapshots "
                f"ORDER BY committed_at DESC, snapshot_id DESC LIMIT 1"
            ).head()
        )
        return int(row[0]) if row is not None else -1

    # ------------------------------------------------------------ ops
    def create(self, table: str, schema: T.StructType) -> None:
        if self.exists(table):
            return
        empty = self.spark.createDataFrame([], schema)
        empty.writeTo(self._qual(table)).create()

    def evolve_schema(self, table: str, schema: T.StructType) -> bool:
        """Widen with appended nullable columns (Iceberg native schema
        evolution: ALTER TABLE ... ADD COLUMNS). Returns True if any
        column was added; refuses retypes like the parquet Catalog."""
        current = {
            f.name: f.dataType
            for f in self.spark.table(self._qual(table)).schema.fields
        }
        missing = [f for f in schema.fields if f.name not in current]
        for f in schema.fields:
            if f.name in current and current[f.name] != f.dataType:
                raise ValueError(
                    f"evolve_schema({table}): field {f.name} exists with "
                    f"type {current[f.name]}, requested {f.dataType}"
                )
        if not missing:
            return False
        cols = ", ".join(
            f"{_ident_ok(f.name)} {f.dataType.simpleString()}"
            for f in missing
        )
        self.spark.sql(
            f"ALTER TABLE {self._qual(table)} ADD COLUMNS ({cols})"
        )
        return True

    def append(self, table: str, df: DataFrame,
               partition_by: list[str] | None = None) -> int:
        # Iceberg partitioning is a table property fixed at creation;
        # per-append partition_by is honored by evolving the spec once.
        if partition_by:
            self._ensure_partition_spec(table, partition_by)
        df.writeTo(self._qual(table)).append()
        return self.current_version(table)

    def overwrite(self, table: str, df: DataFrame,
                  partition_by: list[str] | None = None) -> int:
        if partition_by:
            self._ensure_partition_spec(table, partition_by)
        df.writeTo(self._qual(table)).overwritePartitions()
        return self.current_version(table)

    def append_rows(self, table: str, rows: list[dict]) -> int:
        snap = self.spark.table(self._qual(table)).schema
        df = self.spark.createDataFrame(rows, schema=snap)
        return self.append(table, df)

    def replace_partition(self, table: str, df: DataFrame,
                          exclude_col: str, exclude_val: str,
                          partition_by: list[str] | None = None) -> int:
        """Dynamic partition overwrite: partitions present in ``df``
        are replaced atomically; others untouched. Iceberg does the
        parquet catalog's dir_filters dance natively, so
        ``exclude_col``/``exclude_val`` (manifest-level bookkeeping in
        the parquet Catalog) need no action here beyond ensuring the
        partition spec covers the column being superseded."""
        self._ensure_partition_spec(table, partition_by or [exclude_col])
        df.writeTo(self._qual(table)).overwritePartitions()
        return self.current_version(table)

    def read(self, table: str, version: int | None = None) -> DataFrame:
        q = self._qual(table)
        if version is None or version == -1:
            return self.spark.table(q)
        return self.spark.sql(f"SELECT * FROM {q} VERSION AS OF {int(version)}")

    def row_count(self, table: str, version: int | None = None) -> int:
        """Manifest-metadata count (summary['total-records']) — the
        Iceberg analog of the parquet footer count: zero data IO."""
        q = self._qual(table)
        if version is None:
            version = self.current_version(table)
        if version == -1:
            return 0
        row = self.spark.sql(
            f"SELECT summary['total-records'] FROM {q}.snapshots "
            f"WHERE snapshot_id = {int(version)}"
        ).head()
        if row is None or row[0] is None:
            return self.read(table, version).count()
        return int(row[0])

    def appended_row_count(self, table: str, from_version: int,
                           to_version: int) -> int:
        """Rows added by the commits in (from_version, to_version] —
        the Iceberg analog of the parquet footer count on a fresh data
        dir: summed ``added-records`` from snapshot summaries, zero
        data IO. (Engine appends are pure inserts, so added-records IS
        the delta row count.)"""
        q = self._qual(table)
        rows = self.spark.sql(
            f"SELECT snapshot_id, summary['added-records'] AS n "
            f"FROM {q}.snapshots ORDER BY committed_at, snapshot_id"
        ).collect()
        started = from_version == -1
        total = 0
        for r in rows:
            if started and r.n is not None:
                total += int(r.n)
            if int(r.snapshot_id) == int(from_version):
                started = True
                total = 0
            if int(r.snapshot_id) == int(to_version):
                break
        return total

    def read_appended(self, table: str, from_version: int,
                      to_version: int) -> DataFrame:
        """Incremental append scan: only the rows committed in
        (from_version, to_version] — the zero-copy analog of
        ``spark.read.parquet(new_dir)`` on the parquet catalog."""
        reader = self.spark.read.format("iceberg")
        if from_version != -1:
            reader = reader.option("start-snapshot-id", int(from_version))
        return reader.option("end-snapshot-id", int(to_version)).load(
            self._qual(table)
        )

    def rollback(self, table: str, version: int) -> None:
        self.spark.sql(
            f"CALL {self.catalog_name}.system.rollback_to_snapshot"
            f"('{self._qual(table)}', {int(version)})"
        )

    def snapshot_ids(self, tables: list[str]) -> dict[str, int]:
        return {t: self.current_version(t) for t in tables if self.exists(t)}

    def compact(self, table: str, partition_by: list[str] | None = None) -> int:
        self.spark.sql(
            f"CALL {self.catalog_name}.system.rewrite_data_files"
            f"(table => '{self._qual(table)}')"
        )
        return self.current_version(table)

    # ------------------------------------------------- unsupported extras
    def append_dir(self, table: str, src_dir: str) -> int:
        raise NotImplementedError(
            "zero-copy dir adoption is parquet-catalog-specific; on "
            "Iceberg use the system.add_files procedure or append()"
        )

    def append_with(self, table: str, writer) -> tuple[int, str]:
        raise NotImplementedError(
            "append_with exposes a raw data-dir path, which Iceberg "
            "does not; use append() (single atomic snapshot commit)"
        )

    # ------------------------------------------------------------ helpers
    def _ensure_partition_spec(self, table: str, partition_by: list[str]) -> None:
        q = self._qual(table)
        current: set[str] = set()
        try:
            part = self.spark.sql(f"DESCRIBE TABLE {q}").collect()
            in_part = False
            for r in part:
                if r.col_name.startswith("# Partition"):
                    in_part = True
                    continue
                if in_part and r.col_name and not r.col_name.startswith("#"):
                    current.add(r.col_name)
        except Exception:
            pass
        for col in partition_by:
            if _ident_ok(col) not in current:
                self.spark.sql(
                    f"ALTER TABLE {q} ADD PARTITION FIELD {col}"
                )


_CATALOG_SURFACE: tuple[str, ...] = (
    # the methods the engine + FrontierStore call on a catalog; pinned
    # by tests/test_iceberg.py::test_surface_parity against BOTH classes
    "exists", "create", "current_version", "append", "overwrite",
    "append_rows", "replace_partition", "read", "row_count",
    "rollback", "snapshot_ids", "compact", "append_dir", "append_with",
    "evolve_schema",
)


def surface() -> tuple[str, ...]:
    return _CATALOG_SURFACE


def delta_surface() -> tuple[str, ...]:
    """Extra methods a SUPPORTS_DIR_LAYOUT=False catalog must provide:
    the snapshot-based equivalents of the parquet layout fast paths
    (footer counts / zero-copy dir re-reads). The engine only calls
    them on the non-dir branch."""
    return ("appended_row_count", "read_appended")
