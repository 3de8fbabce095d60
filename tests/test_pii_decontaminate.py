"""PII scrubbing and benchmark decontamination."""

from __future__ import annotations

from pompspark.pii import scrub_pii
from pompspark.textclean import decontaminate

PII_CASES = [
    # (input, scrubbed, n_emails, n_ips, n_phones)
    ("mail me at john.doe+spam@sub.example.org thanks",
     "mail me at <EMAIL> thanks", 1, 0, 0),
    ("server at 192.168.0.1 and 10.0.0.255 up",
     "server at <IP> and <IP> up", 0, 2, 0),
    ("call +1 (555) 123-4567 now",
     "call <PHONE> now", 0, 0, 1),
    ("a@b.co or 1.2.3.4 or 555-123-9876 mixed",
     "<EMAIL> or <IP> or <PHONE> mixed", 1, 1, 1),
    # an IP must not be double-eaten by the phone pass; prices/years stay
    ("price 1234 in 2026 at 8.8.8.8", "price 1234 in 2026 at <IP>",
     0, 1, 0),
    ("nothing sensitive here", "nothing sensitive here", 0, 0, 0),
    ("", "", 0, 0, 0),
]


def test_scrub_pii(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_ ) in enumerate(PII_CASES)],
        "i int, text string",
    )
    got = {r.i: r for r in scrub_pii(df).collect()}
    for i, (_, want, ne, ni, np_) in enumerate(PII_CASES):
        r = got[i]
        assert r.text == want, f"case {i}: {r.text!r}"
        assert (r.n_emails, r.n_ips, r.n_phones) == (ne, ni, np_), f"case {i}"


def test_scrub_is_map_side(spark):
    df = spark.createDataFrame([("x",)], "text string")
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "InPandas" not in plan, plan


BENCH = ["the quick brown fox jumps over the lazy dog tonight"]
DOCS = {
    0: "intro words then the quick brown fox jumps over the lazy dog tonight and more",
    1: "the quick brown fox jumps over a DIFFERENT dog entirely today ok",  # <8 shared
    2: "completely unrelated training document with plenty of its own words here",
    3: "short doc",
}


def test_decontaminate_flag_and_drop(spark):
    docs = spark.createDataFrame(list(DOCS.items()), "doc_id int, text string")
    bench = spark.createDataFrame([(t,) for t in BENCH], "text string")
    flags = {
        r.doc_id: r.contaminated
        for r in decontaminate(docs, bench, n=8).collect()
    }
    assert flags == {0: True, 1: False, 2: False, 3: False}
    kept = decontaminate(docs, bench, n=8, mode="drop")
    assert {r.doc_id for r in kept.collect()} == {1, 2, 3}
    assert "contaminated" not in kept.columns


def test_benchmark_side_is_broadcast(spark):
    docs = spark.createDataFrame(list(DOCS.items()), "doc_id int, text string")
    bench = spark.createDataFrame([(t,) for t in BENCH], "text string")
    plan = (
        decontaminate(docs, bench, n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
