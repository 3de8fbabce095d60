"""Meta-robots directive extraction over raw (possibly garbage) html
bytes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pompspark.metarobots import filter_noindex, meta_robots_flags

CASES = [
    (b"<html><meta name=\"robots\" content=\"noindex\"><body>x", True, False),
    (b"<meta name='robots' content='nofollow'>", False, True),
    (b"<meta name=ROBOTS content='NOINDEX, NOFOLLOW'>", True, True),
    (b"<META NAME=robots CONTENT=none>", True, True),
    # reversed attribute order
    (b"<meta content=\"noindex\" name=\"robots\">", True, False),
    # index,follow is an explicit allow
    (b"<meta name=robots content=\"index, follow\">", False, False),
    # other meta tags don't trigger
    (b"<meta name=viewport content=\"width=device-width\">", False, False),
    # description containing the words is NOT a robots tag
    (b"<meta name=description content=\"noindex nofollow talk\">", False, False),
    (b"plain page no meta", False, False),
    # invalid utf-8 around a valid tag must not throw (lenient cast)
    (b"\xff\xfe\x00garbage<meta name=robots content=noindex>more\xff", True, False),
    (b"", False, False),
    (None, False, False),
]


@pytest.fixture(scope="module")
def flags(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _, _) in enumerate(CASES)], "i int, html binary"
    )
    return {
        r.i: (r.noindex, r.nofollow)
        for r in meta_robots_flags(df).collect()
    }


@pytest.mark.parametrize("i", range(len(CASES)))
def test_flags(flags, i):
    _, noindex, nofollow = CASES[i]
    assert flags[i] == (noindex, nofollow), f"case {i}"


def test_filter_noindex_and_no_shuffle(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _, _) in enumerate(CASES)], "i int, html binary"
    )
    kept = filter_noindex(df)
    want = {i for i, (_, noindex, _) in enumerate(CASES) if not noindex}
    assert {r.i for r in kept.collect()} == want
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "InPandas" not in plan, plan
