"""Gopher-style repetition and quality filters for web-extracted text.

The Gopher corpus rules (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", appendix A1.1 —
public paper) drop documents that are internally repetitive or
structurally un-prose-like. This module re-expresses the per-document
metrics as ONE map-side JVM projection — split / array_sort /
higher-order fold inside a single `withColumns`, no shuffle, no
Python — so the filter costs exactly one pass over the corpus at any
scale (the corpus-WIDE boilerplate pass is `textclean.dedup_lines`;
this module is the within-document family).

Metrics (per document):

- ``dup_line_frac``       lines occurring more than once / lines
- ``dup_line_char_frac``  chars inside those duplicated lines / chars
- ``bullet_line_frac``    lines starting with a bullet glyph
- ``ellipsis_line_frac``  lines ending with an ellipsis
- ``top2gram_char_frac``  chars covered by the single most frequent
                          word 2-gram (count x gram length / chars)

Duplicate detection sorts the per-doc line array once and compares
neighbors — O(L log L) per document instead of the naive O(L^2)
count-each-line scan, and Gopher's word-count ceiling bounds L.
The top-2-gram count is a linear fold over the SORTED gram array
(equal grams are adjacent, so a (prev, run, best) accumulator finds
the max run without building a map).

All fractions are emitted as floor'd integral milli-units
(``*_mills``) — the repo-standard trick that makes the DuckDB oracle
hash-identical (cf. quality_lang_id) — alongside the raw counters.

pomp parity note: pomp has no text analytics at all (SURVEY §2.3);
this is a north-rule [A] training-data-pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher A1.1 thresholds (fractions in milli-units). Word-count
# bounds are parameters of gopher_filter: the paper's 50..100k is
# tuned for full web pages; tests use the fixture-sized default.
DUP_LINE_FRAC_MAX = 300
DUP_LINE_CHAR_FRAC_MAX = 200
BULLET_LINE_FRAC_MAX = 900
ELLIPSIS_LINE_FRAC_MAX = 300
TOP2GRAM_CHAR_FRAC_MAX = 200

_BULLET_RE = r"^\s*([•‣▪●⁃\-\*])\s"
_ELLIPSIS_RE = r"(\.\.\.|…)\s*$"


def _mills(num: Column, den: Column) -> Column:
    """floor(1000 * num / den) as long; 0 when the denominator is 0.

    Both engines evaluate this as one IEEE-double divide + floor, so
    the result is bit-identical (the quality_lang_id precedent)."""
    return F.when(
        den > 0, F.floor(F.lit(1000.0) * num / den)
    ).otherwise(F.lit(0)).cast("long")


def repetition_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Append the Gopher repetition/structure metric columns.

    One JVM projection per row; nothing leaves the map side. The
    neighbor-compare on the sorted line array marks a line duplicated
    iff it equals the previous OR next sorted element (blank lines are
    dropped first, as Gopher counts content lines).
    """
    text = F.col(text_col)
    # content lines only — rlike(\S) rather than trim() because both
    # Spark's and DuckDB's trim strip spaces only, not tabs
    lines = F.filter(F.split(text, "\n"), lambda x: x.rlike(r"\S"))
    slines = F.array_sort(lines)
    n_lines = F.size(lines)

    # duplicated-line flags via sorted-neighbor equality. F.get is
    # 0-based and NULL (never an ANSI error) off either array end.
    def dup_flag(x: Column, i: Column) -> Column:
        same_prev = F.coalesce(x == F.get(slines, i - 1), F.lit(False))
        same_next = F.coalesce(x == F.get(slines, i + 1), F.lit(False))
        return (same_prev | same_next).cast("int")

    dup_flags = F.transform(slines, dup_flag)
    dup_lines = F.aggregate(dup_flags, F.lit(0), lambda a, x: a + x)
    dup_chars = F.aggregate(
        F.zip_with(slines, dup_flags, lambda l, f: F.length(l) * f),
        F.lit(0), lambda a, x: a + x,
    )
    line_chars = F.aggregate(
        F.transform(lines, F.length), F.lit(0), lambda a, x: a + x
    )

    count_matching = lambda pat: F.size(  # noqa: E731
        F.filter(lines, lambda x: x.rlike(pat))
    )

    words = F.filter(
        F.split(F.lower(text), r"\s+"), lambda w: w != F.lit("")
    )
    n_words = F.size(words)
    word_chars = F.length(F.array_join(words, " "))

    # word 2-grams, sorted so equal grams are adjacent; fold keeps
    # (prev gram, current run, best run*len) and emits the best
    grams = F.array_sort(
        F.transform(
            F.slice(words, 1, F.greatest(n_words - 1, F.lit(0))),
            lambda w, i: F.concat_ws(
                " ", w, F.element_at(words, i + 2)
            ),
        )
    )
    top2 = F.aggregate(
        grams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1)
                )
                * F.length(x),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )

    return df.withColumns(
        {
            "n_lines": n_lines.cast("long"),
            "n_words": n_words.cast("long"),
            "dup_line_frac_mills": _mills(dup_lines, n_lines),
            "dup_line_char_frac_mills": _mills(dup_chars, line_chars),
            "bullet_line_frac_mills": _mills(
                count_matching(_BULLET_RE), n_lines
            ),
            "ellipsis_line_frac_mills": _mills(
                count_matching(_ELLIPSIS_RE), n_lines
            ),
            "top2gram_char_frac_mills": _mills(top2, word_chars),
        }
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100_000,
) -> DataFrame:
    """repetition_stats + the Gopher keep decision as a `keep` column.

    Callers drop with ``.filter("keep")``; the column form keeps the
    operator oracle-able and lets pipelines log WHY a doc died.
    """
    out = repetition_stats(df, text_col)
    keep = (
        F.col("n_words").between(min_words, max_words)
        & (F.col("dup_line_frac_mills") <= DUP_LINE_FRAC_MAX)
        & (F.col("dup_line_char_frac_mills") <= DUP_LINE_CHAR_FRAC_MAX)
        & (F.col("bullet_line_frac_mills") <= BULLET_LINE_FRAC_MAX)
        & (F.col("ellipsis_line_frac_mills") <= ELLIPSIS_LINE_FRAC_MAX)
        & (F.col("top2gram_char_frac_mills") <= TOP2GRAM_CHAR_FRAC_MAX)
    )
    return out.withColumn("keep", keep)
