"""PII scrubbing for web-text corpora: emails, IPv4 addresses and
phone numbers replaced with typed placeholder tokens.

Public corpus pipelines (C4's final release, FineWeb, the BigScience
ROOTS cleaning stack) redact obvious PII before training. This module
is the JVM expression form: an ordered regexp_replace chain — one
map-side projection, no Python, no shuffle — plus per-doc counters so
curation can report HOW MUCH was scrubbed without a second scan.

Pattern discipline: every regex is RE2-compatible (no backreferences,
no lookarounds) so the DuckDB oracle — and any RE2-class scan engine a
deployment pairs with Spark — matches the exact same spans. Order
matters and is fixed: emails first (an email would otherwise leak its
digits to the phone pass), then IPv4 (dotted quads would match the
phone pattern), then phones.

pomp parity: none (no text processing in pomp); north-rule [A]
training-data addition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# + or digit start, then 7+ of digits/separators, digit end — long
# enough to skip prices/years, no lookarounds
PHONE_RE = r"\+?\d[\d\-() ]{7,}\d"

# (pattern, placeholder) in REPLACEMENT ORDER
PII_RULES: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def scrub_col(col: Column) -> Column:
    """The scrubbed text as one chained JVM expression."""
    out = col
    for pat, token in PII_RULES:
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_pii(
    df: DataFrame, text_col: str = "text", with_counts: bool = True
) -> DataFrame:
    """Replace ``text_col`` with its scrubbed form; with_counts adds
    `n_emails`/`n_ips`/`n_phones` (counted on the SAME intermediate
    the replacement saw, so counts always equal replacements made)."""
    cols = {}
    if with_counts:
        stage = F.col(text_col)
        for (pat, _), name in zip(
            PII_RULES, ("n_emails", "n_ips", "n_phones")
        ):
            cols[name] = F.regexp_count(stage, F.lit(pat)).cast("long")
            stage = F.regexp_replace(stage, pat, "<X>")
    cols[text_col] = scrub_col(F.col(text_col))
    return df.withColumns(cols)
