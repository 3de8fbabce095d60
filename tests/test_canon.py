"""Canonicalizer contract tests (FIXTURES F6): hand-written cases +
idempotence property on fuzzed urls."""

from __future__ import annotations

import json
import os
import random
import string

import pytest

from pompspark.canon import canonicalize, host_of

CASES_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "canon_cases.json")


def test_cases_file():
    with open(CASES_PATH) as f:
        cases = json.load(f)
    assert len(cases) >= 30
    for c in cases:
        got = canonicalize(c["raw"], c.get("base"))
        assert got == c["canonical"], f"raw={c['raw']!r} base={c.get('base')!r}: {got!r} != {c['canonical']!r}"


def test_idempotence_fuzz():
    rng = random.Random(42)
    alphabet = string.ascii_letters + string.digits + "/?&=%#.:~ -_+"
    for _ in range(10_000):
        host = "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 8)))
        tail = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 25)))
        u = f"http://{host}.example/{tail}"
        c = canonicalize(u)
        if c is None:
            continue
        assert canonicalize(c) == c, f"not idempotent: {u!r} -> {c!r} -> {canonicalize(c)!r}"


def test_drops_pseudo_schemes():
    for u in ("javascript:void(0)", "mailto:x@y.z", "#frag", "", "  "):
        assert canonicalize(u) is None


def test_relative_resolution():
    base = "http://a.example/dir/page.html"
    assert canonicalize("../p2", base) == "http://a.example/p2"
    assert canonicalize("sub/x", base) == "http://a.example/dir/sub/x"
    assert canonicalize("/root", base) == "http://a.example/root"
    assert canonicalize("//b.example/y", base) == "http://b.example/y"


def test_host_of():
    assert host_of("http://A.Example:80/p") == "a.example"
    assert host_of(None) is None


def test_canonicalize_udf(spark):
    from pyspark.sql import functions as F

    from pompspark.canon import register_udfs, url_hash_col

    canon_udf, canon_base_udf, host_udf = register_udfs()
    df = spark.createDataFrame(
        [("HTTP://A.Example:80/p?b=2&a=1#f",), ("javascript:void(0)",)], ["url"]
    )
    out = df.select(
        canon_udf("url").alias("c"),
        host_udf(canon_udf("url")).alias("h"),
    ).collect()
    assert out[0].c == "http://a.example/p?a=1&b=2"
    assert out[0].h == "a.example"
    assert out[1].c is None

    hashed = df.limit(1).select(url_hash_col(F.col("url"))).collect()
    assert isinstance(hashed[0].url_hash, int)


def test_canonical_pattern_implies_fixed_point():
    """Soundness of the JVM fast path (engine.py merge): any url
    matching CANONICAL_PATTERN must be a canonicalize() fixed point,
    since such urls skip the UDF entirely."""
    import re

    from hypothesis import given, settings, strategies as st

    from pompspark.canon import CANONICAL_PATTERN, canonicalize

    pat = re.compile(CANONICAL_PATTERN)

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(
            alphabet="abcz09-._~/%?#ABC:@ ", min_size=0, max_size=30
        ).map(lambda s: "http://h0.example/" + s),
        st.sampled_from([
            "http://h0042.example/p17",
            "https://a-b.c-d.example/x/y_z-~",
            "http://a.b/",
            "HTTP://A.b/p",           # must NOT match (uppercase scheme)
            "http://a.b/p?q=1",        # must NOT match (query)
            "http://a.b/p%41",         # must NOT match (pct)
            "http://a.b/./p",          # must NOT match ('.' excluded)
            "http://a.b:80/p",         # must NOT match (port)
        ]),
    )
    def check(fuzzed, fixed):
        for u in (fuzzed, fixed):
            if pat.match(u):
                assert canonicalize(u) == u, u

    check()
