"""Registrable-domain (eTLD+1) extraction: the grouping key above host.

A 10^10-url crawl needs THREE aggregation levels: url (seen set),
host (robots + politeness), and registrable domain (rate limits,
ownership stats, per-site quotas — "crawl at most N pages per SITE"
means per eTLD+1, not per subdomain, or a single site with wildcard
subdomains eats the whole budget).

Public-suffix semantics (publicsuffix.org algorithm): the registrable
domain is the public suffix plus one label. This module implements the
lookup as pure JVM column expressions — split / slice / array_join /
isin — entirely whole-stage-codegen'd, no UDF, no join, no shuffle:

- a built-in shortlist of common MULTI-LABEL suffixes (the structural
  cases: co.uk, com.au, co.jp, ...) is embedded as literal isin sets;
- every single-label TLD is handled by the default rule (suffix = the
  last label), which the PSL algorithm also prescribes for unknown
  TLDs.

At a real deployment the full PSL (~9k rules incl. wildcards and
exceptions) should ride a broadcast join against (suffix, label_count)
rows instead of literal isin sets — same plan shape, the lookup side
is a few hundred KB. The literal form keeps the operator
oracle-expressible (DuckDB recomputes the same CASE/IN) and dependency
free; ``extra_suffixes`` lets callers extend it without editing code.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# common 2-label public suffixes (ICP-style country second-levels).
# Deliberately a SHORTLIST: unknown TLDs fall back to the PSL default
# rule (last label), so misses degrade to "one label short", never to
# garbage.
SUFFIXES_2 = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "gov.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "ne.kr", "or.kr", "go.kr", "re.kr",
    "com.mx", "org.mx", "gob.mx", "net.mx",
    "co.za", "org.za", "net.za", "gov.za", "ac.za",
    "com.tr", "net.tr", "org.tr", "gov.tr",
    "com.tw", "org.tw", "gov.tw",
    "com.sg", "org.sg", "gov.sg", "edu.sg",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "com.ar", "net.ar", "org.ar", "gob.ar",
    "co.il", "org.il", "net.il", "gov.il", "ac.il",
    "com.hk", "org.hk", "net.hk", "gov.hk", "edu.hk",
    "co.id", "or.id", "ac.id", "go.id", "web.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "com.ua", "net.ua", "org.ua", "gov.ua", "in.ua",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn",
    "co.th", "or.th", "ac.th", "go.th", "in.th",
]

# 3-label public suffixes (a structural sample so the depth-3 branch
# is exercised; the full set rides the broadcast-join path on a real
# cluster)
SUFFIXES_3 = [
    "act.edu.au", "nsw.edu.au", "qld.edu.au", "vic.edu.au",
    "k12.ma.us", "cc.ca.us", "lib.ny.us",
]


def registrable_domain_col(
    host_col,
    extra_suffixes_2: list[str] | None = None,
    extra_suffixes_3: list[str] | None = None,
) -> Column:
    """eTLD+1 of a lowercase hostname column. Pure codegen (split /
    slice / array_join / isin); hosts with fewer labels than suffix+1
    (e.g. ``co.uk`` itself, bare TLDs, ``localhost``) return the host
    unchanged. IP literals are returned unchanged (a dotted-quad's
    labels are all-numeric; grouped by themselves, which is correct
    for rate-limiting purposes)."""
    host = F.lower(host_col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last = lambda k: F.array_join(F.slice(parts, -k, k), ".")  # noqa: E731
    suf2 = sorted(set(SUFFIXES_2) | set(extra_suffixes_2 or ()))
    suf3 = sorted(set(SUFFIXES_3) | set(extra_suffixes_3 or ()))
    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    expr = F.when(is_ip, host)
    if suf3:
        expr = expr.when((n >= 4) & last(3).isin(suf3), last(4))
    expr = (
        expr.when((n >= 3) & last(2).isin(suf2), last(3))
        .when(n >= 2, last(2))
        .otherwise(host)
    )
    return expr


def domain_stats(df, host_col: str = "host"):
    """Per-registrable-domain rollup: hosts seen, row count. The
    grouping key is computed map-side (no UDF); the shuffle carries
    (domain, host) pairs once per input partition thanks to partial
    aggregation."""
    d = df.withColumn("domain", registrable_domain_col(F.col(host_col)))
    return d.groupBy("domain").agg(
        F.countDistinct(host_col).alias("n_hosts"),
        F.count("*").alias("n_rows"),
    )
