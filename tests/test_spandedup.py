"""Duplicated-span removal (textclean.dedup_spans) vs an independent
Counter-based Python oracle."""

from __future__ import annotations

from collections import Counter

from pompspark.textclean import dedup_spans

N = 5


def py_span_dedup(docs: dict[int, str], n: int, min_count: int) -> dict[int, str]:
    toks = {d: t.split() for d, t in docs.items()}
    c: Counter = Counter()
    for ts in toks.values():
        for i in range(len(ts) - n + 1):
            c[" ".join(ts[i : i + n])] += 1
    out = {}
    for d, ts in toks.items():
        cov = [False] * len(ts)
        for i in range(len(ts) - n + 1):
            if c[" ".join(ts[i : i + n])] >= min_count:
                for j in range(i, i + n):
                    cov[j] = True
        out[d] = " ".join(t for t, cv in zip(ts, cov) if not cv)
    return out


FOOTER = "all rights reserved contact us today"  # 6 tokens -> 2 windows
DOCS = {
    0: "unique words alpha beta gamma delta " + FOOTER,
    1: "other opening phrase here epsilon zeta " + FOOTER,
    2: "completely unrelated document with its own content only",
    3: "tiny doc",  # < n tokens: untouched
    4: "loop loop loop loop loop loop loop loop",  # self-repetition
    5: "",  # empty
    6: "prefix stays " + FOOTER + " suffix also stays here fine",
}


def test_matches_python_oracle(spark):
    df = spark.createDataFrame(
        list(DOCS.items()), "doc_id int, text string"
    )
    got = {
        r.doc_id: r.text
        for r in dedup_spans(df, n=N, min_count=2).collect()
    }
    want = py_span_dedup(DOCS, N, 2)
    assert got == want
    # the shared footer vanished everywhere, flanks survived
    assert FOOTER not in got[0] and got[0].startswith("unique words")
    # doc 6: footer sits mid-doc; its unique flanks survive
    assert "suffix also stays here fine" in got[6]
    assert FOOTER not in got[6]
    # self-repeating doc collapses to empty (every window duplicated)
    assert got[4] == ""
    # unique and tiny docs untouched
    assert got[2] == DOCS[2]
    assert got[3] == DOCS[3]


def test_min_count_threshold(spark):
    """min_count above the footer's 3 occurrences: the footer
    survives; only the self-repeating doc (4+ window copies) loses."""
    df = spark.createDataFrame(
        list(DOCS.items()), "doc_id int, text string"
    )
    got = {
        r.doc_id: r.text
        for r in dedup_spans(df, n=N, min_count=4).collect()
    }
    want = py_span_dedup(DOCS, N, 4)
    assert got == want
    assert FOOTER in got[0]
