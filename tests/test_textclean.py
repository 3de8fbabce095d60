"""pompspark.textclean: C4-style line filter + corpus-wide duplicate
line removal, pinned against hand-computed expectations (incl. order
preservation, all-boilerplate docs, and the no-terminal variant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pompspark.textclean import clean_lines, dedup_lines


def test_clean_lines_keeps_sentences_only(spark):
    text = "\n".join([
        "This is a proper sentence.",       # kept
        "Menu",                             # too short
        "Home About Contact",               # 3 words but no terminal punct
        "Is this kept too?",                # kept (?)
        'He said "stop".',                  # kept (.)
        "",                                 # empty
        "one two three four five",          # no terminal punct
    ])
    out = clean_lines(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).head()
    assert out.text == "This is a proper sentence.\nIs this kept too?\nHe said \"stop\"."


def test_clean_lines_no_terminal_requirement(spark):
    text = "Home About Contact\nMenu\nreal words here now"
    out = clean_lines(
        spark.createDataFrame([(1, text)], "doc_id long, text string"),
        require_terminal=False,
    ).head()
    assert out.text == "Home About Contact\nreal words here now"


def test_dedup_lines_removes_corpus_repeats_keeps_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique one\nCOMMON FOOTER\nanother unique"),
            (2, "COMMON FOOTER\nsecond doc line"),
            (3, "third doc line\nCOMMON FOOTER"),
            (4, "COMMON FOOTER"),  # all boilerplate -> empty, not dropped
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in dedup_lines(docs).collect()}
    assert out == {
        1: "unique one\nanother unique",
        2: "second doc line",
        3: "third doc line",
        4: "",
    }


def test_dedup_lines_threshold(spark):
    docs = spark.createDataFrame(
        [(i, "twice\nthrice" if i < 2 else "thrice") for i in range(3)],
        "doc_id long, text string",
    )
    # 'twice' x2, 'thrice' x3: with max_occurrences=2 only 'thrice' goes
    out = {r.doc_id: r.text for r in dedup_lines(docs, max_occurrences=2).collect()}
    assert out == {0: "twice", 1: "twice", 2: ""}


def test_dedup_lines_preserves_other_columns(spark):
    docs = spark.createDataFrame(
        [(1, "a b c.", "en"), (2, "a b c.", "de")],
        "doc_id long, text string, lang string",
    )
    rows = dedup_lines(docs).orderBy("doc_id").collect()
    assert [(r.doc_id, r.lang, r.text) for r in rows] == [
        (1, "en", ""), (2, "de", ""),
    ]


def test_clean_then_dedup_compose(spark):
    """The C4 order: line filter first, then corpus dedup."""
    docs = spark.createDataFrame(
        [
            (1, "A real sentence here.\nMenu\nSubscribe to our newsletter now."),
            (2, "Another real sentence lives here.\nSubscribe to our newsletter now."),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in dedup_lines(clean_lines(docs)).collect()}
    assert out == {
        1: "A real sentence here.",
        2: "Another real sentence lives here.",
    }
