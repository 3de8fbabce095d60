"""C4-style text cleaning: per-line quality filtering and corpus-wide
duplicate-line removal.

Web-extracted text is full of boilerplate (nav labels, cookie
banners, footers). The C4 recipe (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning", appendix on the Colossal Clean Crawled
Corpus) cleans it with two passes this module re-expresses as
DataFrame ops:

- ``clean_lines``: keep only lines that look like sentences — at
  least ``min_words`` words and terminal punctuation. Pure map-side
  (split -> higher-order filter -> join), one pass, no shuffle, no
  Python.
- ``dedup_lines``: drop every line whose occurrence count across the
  WHOLE corpus exceeds ``max_occurrences`` — boilerplate is exactly
  the text that repeats across pages. Two shuffles: line-hash counts
  (8-byte xxhash64 keys, never the line text), then doc reassembly
  keyed by doc id with per-doc position order restored
  deterministically (sort_array over (pos, line) structs — never a
  bare collect_list, whose order is shuffle-dependent).

Scale: the count shuffle carries (hash, partial count) thanks to
map-side combine; the reassembly shuffle carries each KEPT line once.
At 100 TB the optional win is replacing the anti-join with a
broadcast of the over-limit hash set when it is small (usually true:
boilerplate is heavy-tailed), which AQE already does when the bad
side fits the broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# line "looks like a sentence": ends in . ! ? " or ' (C4 keeps lines
# ending in terminal punctuation only)
TERMINAL_RE = "[.!?\"']\\s*$"


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    require_terminal: bool = True,
) -> DataFrame:
    """Keep only sentence-like lines of each document (C4 line filter).

    Replaces ``text_col`` with the newline-join of surviving lines
    (empty string when nothing survives). All JVM: split +
    higher-order filter + array_join inside one projection.
    """
    line = lambda l: (  # noqa: E731
        F.size(F.split(F.trim(l), r"\s+")) >= min_words
    ) & (l.rlike(TERMINAL_RE) if require_terminal else F.lit(True))
    cleaned = F.array_join(
        F.filter(F.split(F.col(text_col), "\n"), line), "\n"
    )
    return df.withColumn(text_col, cleaned)


def dedup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Corpus-wide duplicated-SPAN removal (the distributed shape of
    Lee et al. 2022's exact-substring dedup): any run of ``n`` tokens
    occurring ``min_count``+ times across the corpus is removed from
    every document (all occurrences go — removal is a pure function of
    corpus content, so re-runs and re-partitions agree; keep-one would
    need an owner election). A token is dropped iff ANY n-gram window
    covering it is duplicated, so maximal duplicated runs vanish while
    their unique flanks survive.

    Plan: per-doc token n-grams explode to (xxhash64(gram), doc, pos)
    — the count shuffle carries 8-byte keys with map-side combine
    (never gram text, cf. dedup_lines); dup keys join back (AQE
    broadcasts the usually-tiny dup side); per-doc dup positions
    collect to ONE array row and token coverage is a map-side
    array-exists pass. Shuffle volume ~ tokens * 16 bytes, the same
    order as the MinHash signature stage.
    """
    toks = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
        ).alias("toks"),
    )
    grams = toks.select(
        id_col,
        F.posexplode(
            F.transform(
                F.slice(
                    "toks", 1,
                    F.greatest(F.size("toks") - (n - 1), F.lit(0)),
                ),
                lambda _, i: F.xxhash64(
                    F.array_join(F.slice("toks", i + 1, n), " ")
                ),
            )
        ).alias("pos", "gh"),
    )
    dup = (
        grams.groupBy("gh")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
        .select("gh")
    )
    dup_pos = (
        grams.join(dup, "gh")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("dps"))
    )
    joined = toks.join(dup_pos, id_col, "left").withColumn(
        "dps", F.coalesce("dps", F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.transform(
            "toks",
            lambda w, i: F.struct(
                w.alias("w"),
                F.exists(
                    "dps", lambda p: (i >= p) & (i <= p + (n - 1))
                ).alias("cov"),
            ),
        ),
        lambda s: ~s["cov"],
    )
    rebuilt = joined.select(
        id_col,
        F.array_join(F.transform(kept, lambda s: s["w"]), " ").alias(
            "__clean"
        ),
    )
    return (
        df.drop(text_col)
        .join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce(F.col("__clean"), F.lit("")))
        .drop("__clean")
    )


def decontaminate(
    docs: DataFrame,
    benchmarks: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    mode: str = "flag",
) -> DataFrame:
    """Benchmark decontamination: mark (or drop) training docs sharing
    any ``n``-token window with a benchmark/test-set text — the
    standard n-gram overlap rule public LM corpora apply (e.g. the
    GPT-2/GPT-3 papers decontaminate by 8-gram collision).

    Plan: benchmark windows hash to a DISTINCT xxhash64 set — test
    sets are tiny next to the corpus, so it broadcasts; each doc's
    windows stream through that broadcast semi-join map-side, and only
    the contaminated doc ids (one row each) reach the final join.
    Corpus text never shuffles.

    mode='flag' appends boolean `contaminated`; mode='drop' removes
    the offenders.
    """

    def grams(df: DataFrame, ident, txt: str) -> DataFrame:
        toks = F.filter(
            F.split(F.col(txt), r"\s+"), lambda w: w != F.lit("")
        )
        return df.select(
            *ident,
            F.explode(
                F.transform(
                    F.slice(
                        toks, 1,
                        F.greatest(F.size(toks) - (n - 1), F.lit(0)),
                    ),
                    lambda _, i: F.xxhash64(
                        F.array_join(F.slice(toks, i + 1, n), " ")
                    ),
                )
            ).alias("gh"),
        )

    bench = F.broadcast(
        grams(benchmarks, [], bench_text_col).distinct()
    )
    contaminated = (
        grams(docs, [F.col(id_col)], text_col)
        .join(bench, "gh", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__cont", F.lit(True))
    )
    out = docs.join(contaminated, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("__cont"), F.lit(False))
    ).drop("__cont")
    if mode == "drop":
        return out.filter(~F.col("contaminated")).drop("contaminated")
    return out


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int = 1,
) -> DataFrame:
    """Remove lines occurring more than ``max_occurrences`` times
    across the corpus (C4 boilerplate removal), preserving each doc's
    remaining line order. Docs whose every line is boilerplate come
    back with empty text (never dropped — downstream length filters
    decide).

    Counting groups on xxhash64(line) so the count shuffle moves
    8-byte keys, not line text (collisions can only over-delete a
    line pair at ~2^-64 odds — the standard trade this engine makes
    for hashes, cf. frontier dedup).
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    bad = (
        lines.groupBy(F.xxhash64("line").alias("lh"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > max_occurrences)
        .select("lh")
    )
    kept = lines.join(bad, F.xxhash64(lines["line"]) == bad["lh"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("__clean")
    )
    return (
        df.drop(text_col)
        .join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce(F.col("__clean"), F.lit("")))
        .drop("__clean")
    )
