"""pompspark.domains: registrable-domain (eTLD+1) extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from pompspark.domains import domain_stats, registrable_domain_col

CASES = [
    # (host, expected eTLD+1)
    ("www.example.com", "example.com"),
    ("a.b.c.example.org", "example.org"),
    ("shop.example.co.uk", "example.co.uk"),
    ("example.co.uk", "example.co.uk"),
    ("co.uk", "co.uk"),                      # bare suffix: unchanged
    ("school.nsw.edu.au", "school.nsw.edu.au"),  # 3-label suffix + 1
    ("x.school.nsw.edu.au", "school.nsw.edu.au"),
    ("example.com", "example.com"),
    ("com", "com"),                          # bare TLD: unchanged
    ("localhost", "localhost"),
    ("192.168.3.4", "192.168.3.4"),          # IP literal: unchanged
    ("WWW.Example.COM", "example.com"),      # lowercased
    ("blog.example.com.au", "example.com.au"),
    ("deep.sub.example.gov.uk", "example.gov.uk"),
]


def test_registrable_domain_grid(spark):
    df = spark.createDataFrame([(h,) for h, _ in CASES], ["host"])
    got = {
        r.host: r.domain
        for r in df.withColumn(
            "domain", registrable_domain_col(F.col("host"))
        ).collect()
    }
    for host, want in CASES:
        assert got[host] == want, host


def test_extra_suffixes(spark):
    df = spark.createDataFrame([("x.example.github.io",)], ["host"])
    base = df.select(
        registrable_domain_col(F.col("host")).alias("d")).head().d
    assert base == "github.io"  # shortlist miss: PSL default rule
    ext = df.select(
        registrable_domain_col(
            F.col("host"), extra_suffixes_2=["github.io"]
        ).alias("d")
    ).head().d
    assert ext == "example.github.io"


def test_domain_stats_rollup(spark):
    rows = [("www.example.com",), ("api.example.com",),
            ("example.com",), ("shop.other.co.uk",)]
    got = {
        r.domain: (r.n_hosts, r.n_rows)
        for r in domain_stats(
            spark.createDataFrame(rows, ["host"])).collect()
    }
    assert got == {"example.com": (3, 3), "other.co.uk": (1, 1)}


def test_plan_is_codegen_only(spark):
    """No UDF, no shuffle before the aggregate: the domain key is a
    map-side projection (BatchEvalPython/ArrowEval must not appear)."""
    df = spark.createDataFrame([("www.example.com",)], ["host"])
    plan = df.withColumn(
        "domain", registrable_domain_col(F.col("host"))
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
