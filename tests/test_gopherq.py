"""Gopher repetition/quality filters vs a pure-Python metric oracle.

The Spark implementation is one map-side JVM projection
(pompspark/gopherq.py); the oracle here recomputes every metric with
plain Python dict/Counter logic — a genuinely independent derivation
of the Gopher A1.1 definitions."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from pompspark import gopherq

BULLET = re.compile(r"^\s*([•‣▪●⁃\-\*])\s")
ELLIPSIS = re.compile(r"(\.\.\.|…)\s*$")


def py_metrics(text: str) -> dict:
    lines = [l for l in text.split("\n") if l.strip() != ""]  # \S test
    n_lines = len(lines)
    counts = Counter(lines)
    dup_lines = sum(1 for l in lines if counts[l] > 1)
    dup_chars = sum(len(l) for l in lines if counts[l] > 1)
    line_chars = sum(len(l) for l in lines)
    words = [w for w in text.lower().split() if w != ""]
    n_words = len(words)
    word_chars = len(" ".join(words))
    grams = Counter(
        f"{words[i]} {words[i + 1]}" for i in range(len(words) - 1)
    )
    top2 = max((c * len(g) for g, c in grams.items()), default=0)

    def mills(num: int, den: int) -> int:
        return math.floor(1000.0 * num / den) if den > 0 else 0

    return {
        "n_lines": n_lines,
        "n_words": n_words,
        "dup_line_frac_mills": mills(dup_lines, n_lines),
        "dup_line_char_frac_mills": mills(dup_chars, line_chars),
        "bullet_line_frac_mills": mills(
            sum(1 for l in lines if BULLET.search(l)), n_lines
        ),
        "ellipsis_line_frac_mills": mills(
            sum(1 for l in lines if ELLIPSIS.search(l)), n_lines
        ),
        "top2gram_char_frac_mills": mills(top2, word_chars),
    }


DOCS = [
    # clean prose
    "The quick brown fox jumps over the lazy dog.\n"
    "A second sentence follows with more useful words here.",
    # heavy line repetition (cookie banner pattern)
    "Accept all cookies\nAccept all cookies\nAccept all cookies\n"
    "Some real content sits between the banners today.",
    # bullets
    "- item one here\n- item two here\n- item three here\nIntro line.",
    # ellipsis teasers
    "Read more about this story...\nAnother teaser follows here…\n"
    "Real sentence at last, with an actual ending.",
    # 2-gram loop ("click here click here ...")
    "click here click here click here click here click here",
    # degenerate cases
    "",
    "word",
    "\n\n\n",
    "• spaced bullet line\n* star bullet here\nnormal line.",
    "tab\tseparated words only no newline at all",
    # tab-only and space-only lines are blank (rlike \S, not trim)
    "\t\n   \nreal line here today.\n\t \t",
]


@pytest.fixture(scope="module")
def stats_rows(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id int, text string"
    )
    out = gopherq.gopher_filter(df, min_words=3, max_words=100)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


@pytest.mark.parametrize("doc_id", range(len(DOCS)))
def test_metrics_match_python_oracle(stats_rows, doc_id):
    got = stats_rows[doc_id]
    want = py_metrics(DOCS[doc_id])
    for k, v in want.items():
        assert got[k] == v, f"doc {doc_id} metric {k}: {got[k]} != {v}"


def test_keep_decisions(stats_rows):
    # clean prose survives; banner-repetition, bullet-lists and the
    # 2-gram loop die; degenerate docs die on word count
    assert stats_rows[0]["keep"] is True
    assert stats_rows[1]["keep"] is False  # dup lines
    assert stats_rows[2]["keep"] is False  # bullets
    assert stats_rows[4]["keep"] is False  # top-2gram loop
    assert stats_rows[5]["keep"] is False  # empty
    assert stats_rows[6]["keep"] is False  # one word


def test_single_projection_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c.\nd e f.")], "doc_id int, text string")
    plan = gopherq.repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
