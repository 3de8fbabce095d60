"""robots.txt parsing + enforcement. [A] — not in pomp (pomp leaves
politeness to user middleware returning None from process_request,
pomp/core/base.py); mandated by the north rule.

Parsing is a pure function (+ Arrow-batched pandas UDF); enforcement
is JVM-side column expressions so the dequeue/merge hot path stays in
whole-stage codegen: path-prefix match via F.exists over the broadcast
robots_cache join — no Python in the 10^10-row path.
"""

from __future__ import annotations

import pandas as pd


def parse_robots(
    txt: str | None, agent: str = "*"
) -> tuple[float | None, list[str], list[str]]:
    """Minimal deterministic robots.txt parser: honors User-agent
    groups for ``agent`` (and ``*``), Disallow AND Allow prefixes,
    Crawl-delay. Empty Disallow/Allow lines are ignored. Returns
    (crawl_delay|None, disallow_prefixes, allow_prefixes); precedence
    between the two lists is decided at MATCH time (longest matching
    rule wins, tie -> allow — RFC 9309 §2.2.2), not at parse time."""
    if not txt:
        return None, [], []
    # collect groups: consecutive User-agent lines share the rules that
    # follow; the MOST SPECIFIC matching group applies (named beats *,
    # never the union — RFC 9309 §2.2.1).
    groups: list[tuple[list[str], float | None, list[str], list[str]]] = []
    agents: list[str] = []
    delay: float | None = None
    disallow: list[str] = []
    allow: list[str] = []
    in_rules = False

    def flush():
        nonlocal agents, delay, disallow, allow, in_rules
        if agents:
            groups.append((agents, delay, disallow, allow))
        agents, delay, disallow, allow, in_rules = [], None, [], [], False

    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                flush()
            agents.append(val.lower())
        elif key == "disallow":
            in_rules = True
            if val:
                disallow.append(val)
        elif key == "allow":
            in_rules = True
            if val:
                allow.append(val)
        elif key == "crawl-delay":
            in_rules = True
            try:
                delay = float(val)
            except ValueError:
                pass
        else:
            # RFC 9309: ANY rule line (Sitemap, unknown extensions)
            # ends the current group's agent list — without this,
            # 'User-agent: a\nSitemap: x\nUser-agent: *\n...' would
            # wrongly merge '*' rules into agent a (round-1 advice).
            in_rules = True
    flush()

    named = [g for g in groups if agent.lower() in g[0]]
    star = [g for g in groups if "*" in g[0]]
    chosen = named or star
    if not chosen:
        return None, [], []
    # multiple groups for the same agent merge (RFC 9309 §2.2.1)
    out_delay = next((g[1] for g in chosen if g[1] is not None), None)
    out_dis = [p for g in chosen for p in g[2]]
    out_alw = [p for g in chosen for p in g[3]]
    return out_delay, out_dis, out_alw


def parse_robots_frame(txts: pd.Series) -> pd.DataFrame:
    delays, dis, alw = [], [], []
    for t in txts:
        d, pre, a = parse_robots(t)
        delays.append(d)
        dis.append(pre)
        alw.append(a)
    return pd.DataFrame(
        {"crawl_delay": delays, "disallow": dis, "allow": alw},
        index=txts.index,
    )


def register_parse_robots_udf():
    from pyspark.sql import functions as F

    @F.pandas_udf(
        "crawl_delay double, disallow array<string>, allow array<string>"
    )
    def parse_robots_udf(txts: pd.Series) -> pd.DataFrame:
        return parse_robots_frame(txts)

    return parse_robots_udf


def build_robots_cache(robots_df):
    """(host, robots_txt, fetched_ts) -> full ROBOTS_CACHE shape by
    parsing the txt column (fills crawl_delay + disallow)."""
    from pyspark.sql import functions as F

    udf = register_parse_robots_udf()
    return robots_df.withColumn("p", udf("robots_txt")).select(
        "host", "robots_txt", "fetched_ts",
        F.col("p.crawl_delay").alias("crawl_delay"),
        F.col("p.disallow").alias("disallow"),
        F.col("p.allow").alias("allow"),
    )


def refresh_robots_cache(robots_df, transport, now, ttl_s: float = 86400.0):
    """TTL expiry + refetch: rows older than ``now - ttl_s`` are
    re-fetched through ``transport(hosts: pd.Series) -> pd.DataFrame
    [host, robots_txt, fetched_ts]`` (injectable — no network in this
    sandbox; a real cluster passes an HTTP pool), re-parsed, and merged
    over the stale rows. Fresh rows pass through untouched. Returns the
    updated ROBOTS_CACHE-shaped DataFrame.

    Without this a long crawl serves stale rules forever; RFC 9309
    suggests caching up to 24h (the default ttl)."""
    import datetime as _dt

    from pyspark.sql import functions as F

    cutoff = now - _dt.timedelta(seconds=ttl_s)
    fresh = robots_df.filter(
        F.col("fetched_ts").isNull() | (F.col("fetched_ts") >= F.lit(cutoff))
    )
    stale = robots_df.filter(
        F.col("fetched_ts").isNotNull() & (F.col("fetched_ts") < F.lit(cutoff))
    )
    # footer-count the stale slice? cheaper: run the refetch
    # executor-side via mapInPandas — at 10^8 hosts a driver collect of
    # the stale host list is O(hosts) driver memory (r2 verdict); this
    # keeps every host on executors and fans the refetch out across the
    # cluster. transport must be picklable (it is an injected seam).
    def _refetch(batches):
        for pdf in batches:
            if len(pdf):
                out = transport(pdf["host"].reset_index(drop=True))
                yield out[["host", "robots_txt", "fetched_ts"]]

    if stale.isEmpty():
        # identity return signals noop to the caller (no table rewrite)
        return robots_df
    raw = stale.select("host").mapInPandas(
        _refetch, schema="host string, robots_txt string, fetched_ts timestamp"
    )
    # allowMissingColumns: a cache checkpointed before the Allow column
    # existed unions cleanly (allow = null -> allow-nothing extra)
    return fresh.unionByName(build_robots_cache(raw),
                             allowMissingColumns=True)


# ------------------------------------------------------------- enforcement

def path_col(url_col):
    """URL path, '/' default — JVM-side (F.parse_url)."""
    from pyspark.sql import functions as F

    return F.coalesce(
        F.nullif(F.parse_url(url_col, F.lit("PATH")), F.lit("")), F.lit("/")
    )


def with_robots(df, robots_df, url_col: str = "url", host_col: str = "host",
                robots_rows: int | None = None,
                broadcast_row_gate: int = 4_000_000):
    """Join robots onto df; adds ``disallowed`` (bool) and
    ``crawl_delay`` (double, null = none). Hosts with no robots row
    default to allow-all (FIXTURES F4).

    Strategy (SCALE.md: "per-round broadcast of the ACTIVE hosts
    only"): when the cache is known small (``robots_rows`` from table
    footers <= gate, or unknown) it is broadcast whole — one tiny
    build, df never shuffles. Past the gate (10^8 hosts ~ 100 GB: a
    whole-cache broadcast is a scale-killer) the cache is first
    LEFT-SEMI pruned to df's distinct hosts — the semi-join shuffles
    only the cache and the (map-side-combined) host list, never df —
    and AQE broadcast-converts the pruned cache into the final join
    when the active-host slice is small, which is the steady state of
    any crawl round (batch hosts << all hosts ever seen)."""
    from pyspark.sql import functions as F

    # older caches/callers may predate the Allow column
    allow_col = (
        F.col("allow") if "allow" in robots_df.columns
        else F.lit(None).cast("array<string>").alias("allow")
    )
    r = robots_df.select(
        F.col("host").alias("__r_host"), "crawl_delay", "disallow",
        allow_col,
    )
    if robots_rows is not None and robots_rows > broadcast_row_gate:
        hosts = df.select(F.col(host_col).alias("__r_host")).distinct()
        r = r.join(hosts, "__r_host", "left_semi")
        joined = df.join(
            r, F.col(host_col) == F.col("__r_host"), "left"
        ).drop("__r_host")
    else:
        joined = df.join(
            F.broadcast(r), F.col(host_col) == F.col("__r_host"), "left"
        ).drop("__r_host")
    p = path_col(F.col(url_col))

    def rule_matches(rule):
        # RFC 9309 §2.2.3 special characters: '*' matches any char
        # sequence, a TRAILING '$' anchors the rule at path end.
        # Wildcard-free rules (the overwhelming majority) stay on the
        # literal startswith fast path; wildcard rules translate to an
        # anchored regex EXECUTOR-SIDE (rules are per-host data, not
        # literals): escape Java-regex metachars, then '\*' -> '.*'
        # and a trailing '\$' -> '$'. All codegen, no UDF.
        has_wild = rule.contains("*") | rule.endswith("$")
        esc = F.regexp_replace(
            rule, r"([\\.\[\]\{\}\(\)\*\+\?\^\$\|])", r"\\$1"
        )
        re_rule = F.regexp_replace(esc, r"\\\*", ".*")
        # replacement-side '$' needs escaping in Java replacement syntax
        re_rule = F.regexp_replace(re_rule, r"\\\$$", r"\$")
        return F.when(
            has_wild, F.rlike(p, F.concat(F.lit("^"), re_rule))
        ).otherwise(p.startswith(rule))

    def longest_match(col):
        # length of the longest matching RULE (0 = no match; RFC:
        # specificity = rule octet length, wildcards count as-is);
        # pure codegen: filter + aggregate over a tiny array
        return F.aggregate(
            F.filter(
                F.coalesce(col, F.array().cast("array<string>")),
                rule_matches,
            ),
            F.lit(0),
            lambda acc, x: F.greatest(acc, F.length(x)),
        )

    # RFC 9309 §2.2.2: the most specific (longest) matching rule wins;
    # on a tie the least restrictive (Allow) wins — hence strict >.
    disallowed = longest_match(F.col("disallow")) > longest_match(
        F.col("allow")
    )
    return joined.withColumn("disallowed", disallowed)


def politeness_cap_col(per_host_budget: int, round_seconds: float):
    """Per-host per-round fetch cap: crawl_delay shrinks the cap
    (contract in tests/oracle_sim.py docstring)."""
    from pyspark.sql import functions as F

    from_delay = F.greatest(
        F.lit(1),
        F.floor(F.lit(float(round_seconds)) / F.col("crawl_delay")).cast("int"),
    )
    return F.when(
        F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") > 0),
        F.least(F.lit(per_host_budget), from_delay),
    ).otherwise(F.lit(per_host_budget))
