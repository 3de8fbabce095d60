"""pompspark.curation: deterministic corpus sampling — hash sample
(md5-keyed map-side filter), stratified per-language sampling, and
per-source quota caps. Determinism and exact-fraction properties are
pinned here; engine parity is pinned by the __spark_entry__ oracles."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pompspark.curation import (
    _hex_threshold,
    hash_sample,
    quota_sample,
    stratified_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("src"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def _py_keep(key, fraction, salt=""):
    thr = _hex_threshold(fraction)
    return hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:4] < thr


def test_hex_threshold_bounds():
    assert _hex_threshold(0.0) == "0000"
    assert _hex_threshold(0.25) == "4000"
    assert _hex_threshold(1.0) == "g"  # sorts above every hex string
    assert "ffff" < "g"
    with pytest.raises(ValueError):
        _hex_threshold(1.5)


def test_hash_sample_matches_python_oracle_exactly(spark):
    got = {r.doc_id for r in hash_sample(_docs(spark), "doc_id", 0.25).collect()}
    want = {i for i in range(2000) if _py_keep(i, 0.25)}
    assert got == want
    # uniformity sanity: within 5 points of the target fraction
    assert abs(len(got) / 2000 - 0.25) < 0.05


def test_hash_sample_edge_fractions(spark):
    d = _docs(spark, 200)
    assert hash_sample(d, "doc_id", 0.0).count() == 0
    assert hash_sample(d, "doc_id", 1.0).count() == 200


def test_hash_sample_salt_gives_independent_split(spark):
    d = _docs(spark, 2000)
    a = {r.doc_id for r in hash_sample(d, "doc_id", 0.5, salt="train/").collect()}
    b = {r.doc_id for r in hash_sample(d, "doc_id", 0.5, salt="test/").collect()}
    assert a != b
    # independent halves overlap ~25% of the corpus, not 0% or 50%
    assert 0.15 < len(a & b) / 2000 < 0.35
    assert a == {r.doc_id for r in hash_sample(d, "doc_id", 0.5, salt="train/").collect()}


def test_stratified_sample_downsamples_only_named_strata(spark):
    d = _docs(spark, 2000)
    out = stratified_sample(d, "lang", {"en": 0.25}, key_col="doc_id")
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_de = d.filter(F.col("lang") == "de").count()
    assert by_lang["de"] == n_de  # default fraction 1.0 keeps all
    # the en slice equals hash_sample applied to it (same key, salt)
    en_direct = {
        r.doc_id
        for r in hash_sample(d.filter(F.col("lang") == "en"), "doc_id", 0.25).collect()
    }
    en_got = {r.doc_id for r in out.filter(F.col("lang") == "en").collect()}
    assert en_got == en_direct


def test_quota_sample_caps_per_key_deterministically(spark):
    d = _docs(spark, 2000)
    out = quota_sample(d, "src", cap=10, order_by=F.col("doc_id").asc(), keep_rank=True)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["src"], []).append(r["doc_id"])
    assert all(len(v) == 10 for v in per.values())
    # survivors are exactly the cap lowest doc_ids of each key
    for s, ids in per.items():
        assert sorted(ids) == sorted(
            i for i in range(2000) if i % 7 == int(s)
        )[:10]
    assert {r["quota_rank"] for r in rows} == set(range(1, 11))
    with pytest.raises(ValueError):
        quota_sample(d, "src", cap=0, order_by=F.col("doc_id"))
