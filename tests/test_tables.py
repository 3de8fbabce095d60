"""Snapshot catalog contract: atomic commit, append-only, time travel,
rollback, compaction."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from pompspark.tables import Catalog

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _df(spark, rows):
    return spark.createDataFrame(rows, schema=SCHEMA)


def test_create_append_read(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.create("t", SCHEMA)
    assert cat.read("t").count() == 0
    v2 = cat.append("t", _df(spark, [(1, "a"), (2, "b")]))
    v3 = cat.append("t", _df(spark, [(3, "c")]))
    assert (v2, v3) == (2, 3)
    assert cat.read("t").count() == 3
    # time travel
    assert cat.read("t", version=2).count() == 2
    assert cat.read("t", version=1).count() == 0


def test_append_does_not_rewrite(spark, tmp_path):
    """Iceberg property: appending N rows writes only the new data dir."""
    cat = Catalog(spark, str(tmp_path))
    cat.create("t", SCHEMA)
    cat.append("t", _df(spark, [(1, "a")]))
    d2 = os.path.join(str(tmp_path), "t", "data", "d-00000002")
    mtime_before = max(
        os.path.getmtime(os.path.join(d2, f)) for f in os.listdir(d2)
    )
    cat.append("t", _df(spark, [(2, "b")]))
    mtime_after = max(
        os.path.getmtime(os.path.join(d2, f)) for f in os.listdir(d2)
    )
    assert mtime_before == mtime_after  # old files untouched


def test_overwrite_and_rollback(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.create("t", SCHEMA)
    cat.append("t", _df(spark, [(1, "a")]))
    cat.overwrite("t", _df(spark, [(9, "z")]))
    assert [r.k for r in cat.read("t").collect()] == [9]
    cat.rollback("t", 2)
    assert [r.k for r in cat.read("t").collect()] == [1]
    assert cat.current_version("t") == 2


def test_compact(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.create("t", SCHEMA)
    for i in range(4):
        cat.append("t", _df(spark, [(i, str(i))]))
    import json
    with open(cat._snap_path("t", cat.current_version("t"))) as f:
        assert len(json.load(f)["dirs"]) == 4
    cat.compact("t")
    with open(cat._snap_path("t", cat.current_version("t"))) as f:
        assert len(json.load(f)["dirs"]) == 1
    assert cat.read("t").count() == 4


def test_snapshot_ids(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    cat.create("a", SCHEMA)
    cat.create("b", SCHEMA)
    cat.append("a", _df(spark, [(1, "x")]))
    assert cat.snapshot_ids(["a", "b", "missing"]) == {"a": 2, "b": 1}
