"""URL canonicalization — the single normalization used engine-wide.

The canonical form pins the URL-seen identity (north_rule:
"canonicalized URL murmur3 hashes"). Rules (deterministic, locale-free):

1. relative hrefs resolved against the base URL (RFC 3986 merge)
2. scheme + host lowercased
3. default ports stripped (http:80, https:443)
4. fragment dropped
5. dot-segments removed from the path; empty path -> "/"
6. percent-encoding normalized: unreserved chars decoded, hex uppercased
7. query params parsed and sorted by (key, value); blank values kept
8. userinfo preserved as-is (rare; kept for fidelity)

pomp itself performs no canonicalization — dedup is left to user
middleware returning None (pomp/core/base.py:process_request). The
north rule mandates it, so the rules above are OUR pinned contract;
``tests/fixtures/canon_cases.json`` + the idempotence property test
(c(c(u)) == c(u)) freeze them.

Spark surface: ``canonicalize_udf`` — an Arrow-batched pandas UDF
(never a per-row Python UDF). Hashing: ``url_hash_col`` uses the
JVM-side ``F.hash`` (murmur3_32) paired with ``F.xxhash64`` when 64
bits are needed for the seen-set at 10^10 scale.
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urljoin, urlsplit, urlunsplit

import pandas as pd

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21, "ws": 80, "wss": 443}

# RFC 3986 unreserved + sub-delims we keep literal in paths/queries.
_PATH_SAFE = "/:@!$&'()*+,;=~-._"
_QUERY_SAFE = ":@!$&'()*+,;/?~-._"

_PCT_RE = re.compile(r"%[0-9a-fA-F]{2}")


def _norm_pct(component: str, safe: str) -> str:
    """Decode then re-encode: unreserved chars come out literal, everything
    else re-encodes with uppercase hex. Idempotent by construction."""
    return quote(unquote(component), safe=safe)


def _norm_path(path: str) -> str:
    if not path:
        return "/"
    # percent-normalize FIRST (decode unreserved chars — '.' is
    # unreserved), THEN remove dot segments: an encoded '%2e%2e' must
    # resolve like a literal '..' or c(c(u)) != c(u) — the first pass
    # would emit a literal '..' the second pass then collapses
    # (idempotence contract; caught in round-1 advice).
    path = _norm_pct(path, _PATH_SAFE)
    # remove dot segments (RFC 3986 §5.2.4)
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
            continue
        out.append(seg)
    p = "/".join(out)
    if not p.startswith("/"):
        p = "/" + p
    return p


def _norm_query(query: str) -> str:
    if not query:
        return ""
    pairs: list[tuple[str, bool, str]] = []  # (key, had_eq, value)
    for part in query.split("&"):
        if not part:
            continue
        k, sep, v = part.partition("=")
        pairs.append((
            _norm_pct(unquote_plus_safe(k), "~-._"),
            bool(sep),
            _norm_pct(unquote_plus_safe(v), "~-._") if sep else "",
        ))
    pairs.sort(key=lambda p: (p[0], p[2]))
    return "&".join(f"{k}={v}" if had_eq else k for k, had_eq, v in pairs)


def unquote_plus_safe(s: str) -> str:
    # '+' means space in form-encoded queries; normalize to %20 via space.
    return unquote(s.replace("+", " "))


def canonicalize(url: str, base: str | None = None) -> str | None:
    """Canonicalize one URL. Returns None for unusable inputs (empty,
    javascript:/mailto:/data: pseudo-schemes, fragment-only hrefs)."""
    if url is None:
        return None
    url = url.strip()
    if not url or url.startswith("#"):
        return None
    if base:
        url = urljoin(base, url)
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme in ("javascript", "mailto", "data", "tel", "about"):
        return None
    if not scheme:
        scheme = "http"
    host = (parts.hostname or "").lower()
    if not host:
        return None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if parts.username:
        userinfo = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{userinfo}@{host}"
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{netloc}:{port}"
    path = _norm_path(parts.path)
    query = _norm_query(parts.query)
    return urlunsplit((scheme, netloc, path, query, ""))


# Fast path: a url matching this is PROVABLY a canonicalize() fixed
# point — lowercase http(s) scheme, lowercase reg-name host with no
# port/userinfo, absolute path of unreserved chars (no '.', so no dot
# segments; no '%', so no pct-normalization; no '?'/'#'). For such u,
# canonicalize(u) == u, so the slow urllib path can be skipped. The
# idempotence property test fuzzes this equivalence.
CANONICAL_PATTERN = r"^https?://[a-z0-9-]+(?:\.[a-z0-9-]+)+/[a-z0-9/_\-~]*$"
_CANONICAL_RE = re.compile(CANONICAL_PATTERN)


def canonicalize_series(urls: pd.Series, bases: pd.Series | None = None) -> pd.Series:
    """Vectorized (Arrow-batch) canonicalization for pandas UDFs.
    Already-canonical urls (the overwhelming majority of crawl links
    after the first normalization) take a vectorized regex fast path;
    only the remainder pays the per-string urllib cost."""
    if not urls.notna().any():
        # all-null batch: the engine's JVM rlike gate nulled every
        # already-canonical href before the UDF call — on all-fast
        # link batches EVERY batch lands here, so skip the str.match
        # machinery entirely (r6; output identical: null in, null out)
        return pd.Series(None, index=urls.index, dtype=object)
    fast = urls.str.match(_CANONICAL_RE, na=False)
    # nulls skip the per-string loop entirely: the engine's JVM-side
    # fast path nulls out already-canonical hrefs before the UDF call,
    # so most batch rows arrive null — looping over them would undo
    # the saving.
    if bases is None:
        out = urls.where(fast, None)
        slow_idx = urls.index[~fast & urls.notna()]
        if len(slow_idx):
            out.loc[slow_idx] = [canonicalize(u) for u in urls.loc[slow_idx]]
        return out
    # relative resolution never applies to absolute canonical urls
    out = urls.where(fast, None)
    slow_idx = urls.index[~fast & urls.notna()]
    if len(slow_idx):
        out.loc[slow_idx] = [
            canonicalize(u, b)
            for u, b in zip(urls.loc[slow_idx], bases.loc[slow_idx])
        ]
    return out


def host_of(url: str | None) -> str | None:
    if not url:
        return None
    try:
        return (urlsplit(url).hostname or "").lower() or None
    except ValueError:
        return None


def host_series(urls: pd.Series) -> pd.Series:
    out = pd.Series(None, index=urls.index, dtype=object)
    nn = urls.notna()
    if nn.any():
        out.loc[nn] = urls.loc[nn].map(host_of)
    return out


# ---------------------------------------------------------------- Spark side

def register_udfs():
    """Build the pandas UDFs lazily (keeps this module importable without
    a SparkSession for the pure-python oracle tests)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def canonicalize_udf(urls: pd.Series) -> pd.Series:
        return canonicalize_series(urls)

    @F.pandas_udf(T.StringType())
    def canonicalize_with_base_udf(urls: pd.Series, bases: pd.Series) -> pd.Series:
        return canonicalize_series(urls, bases)

    @F.pandas_udf(T.StringType())
    def host_udf(urls: pd.Series) -> pd.Series:
        return host_series(urls)

    return canonicalize_udf, canonicalize_with_base_udf, host_udf


def resolve_discoveries(src, href_col: str = "href", base_col: str = "url"):
    """Resolve ``href_col`` against ``base_col`` -> (child, child_host)
    columns appended; rows whose href does not canonicalize (mailto:,
    javascript:, garbage) are dropped. One shared implementation for
    the two discovery flows (anchor links O9 and 3xx Location headers)
    so their semantics can never drift.

    Plan shape: hrefs matching CANONICAL_PATTERN are provably
    canonicalize() fixed points — the rlike gate + regexp_extract run
    in whole-stage codegen and the pandas UDF receives NULL for them
    (canonicalize_series skips nulls), so Arrow ships only the slow
    minority. On real crawl batches the fast fraction dominates after
    the first normalization pass.
    """
    from pyspark.sql import functions as F

    _, canon_base_udf, host_udf = register_udfs()
    # r6 (guide §4.4): the callers filter on these UDFs' outputs
    # (child/child_host isNotNull), and the optimizer duplicates a
    # deterministic UDF below each pushed filter — the before-plan
    # (plans/r06/bench_links_merge_before.txt) shows FOUR
    # ArrowEvalPython nodes over the exploded link stream, i.e. every
    # row paid both UDFs twice. Marking them non-deterministic forbids
    # the duplication (they are pure functions — results unchanged)
    # and the plan drops to one evaluation of each.
    canon_base_udf = canon_base_udf.asNondeterministic()
    host_udf = host_udf.asNondeterministic()
    is_fast = F.col(href_col).rlike(CANONICAL_PATTERN)
    slow_href = F.when(is_fast, F.lit(None).cast("string")).otherwise(
        F.col(href_col)
    )
    # fast rows ship NULL for the base too: canonicalize_series never
    # reads the base of a null href, and nulling it keeps the Arrow
    # transfer to the Python worker at O(slow rows) instead of shipping
    # every parent url of the (dominant) fast majority (guide §4.1:
    # pass only the columns/bytes the function needs).
    slow_base = F.when(is_fast, F.lit(None).cast("string")).otherwise(
        F.col(base_col)
    )
    child = F.coalesce(
        F.when(is_fast, F.col(href_col)),
        canon_base_udf(slow_href, slow_base),
    )
    return (
        src.withColumn("__fast", is_fast)
        .withColumn("child", child)
        .filter(F.col("child").isNotNull())
        .withColumn(
            "child_host",
            F.when(
                F.col("__fast"),
                F.regexp_extract("child", r"^https?://([^/]+)", 1),
            ).otherwise(
                host_udf(
                    F.when(F.col("__fast"), F.lit(None).cast("string"))
                    .otherwise(F.col("child"))
                )
            ),
        )
        .filter(F.col("child_host").isNotNull())
        .drop("__fast")
    )


def url_hash_col(col):
    """murmur3_32 of the canonical url, widened with xxhash64 so the
    10^10-frontier seen-set has a 64-bit identity (32-bit murmur alone
    collides at ~2^16 urls; see SURVEY §1.3). JVM-side, codegen'd."""
    from pyspark.sql import functions as F

    return F.xxhash64(col).alias("url_hash")


def murmur3_col(col):
    from pyspark.sql import functions as F

    return F.hash(col).alias("url_murmur3")
