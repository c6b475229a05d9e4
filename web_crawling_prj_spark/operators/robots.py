"""robots.txt parsing + gating — RFC 9309 (Robots Exclusion Protocol) semantics.

Split by cost, as the scale demands:
- **Parse** (once per host, tiny data): raw robots.txt text → rules via an
  Arrow-vectorized pandas UDF (north-rule requirement: robots evaluated via
  vectorized UDFs; reference analog = the credential/config refresh gate,
  services/credential_refresh_service.py:118-169).
- **Gate** (once per frontier row, billions of rows): NATIVE expressions after
  a broadcast join on host — no Python on the big side.

RFC 9309 semantics supported:
- groups of consecutive ``User-agent`` lines sharing one rule block; rules
  from EVERY matching group combine;
- group selection: exact product-token match for the crawler's agent,
  falling back to the ``*`` group when no specific group matches;
- ``Allow`` and ``Disallow`` with LONGEST-MATCH precedence (most specific
  pattern wins; ``Allow`` wins length ties);
- ``*`` wildcards and the ``$`` end anchor in patterns;
- ``Crawl-delay`` (not in the RFC, universal in practice — feeds host budgets).

Two-tier gate, chosen PER HOST at parse time:
- a group containing only wildcard-free ``Disallow`` prefixes (the
  overwhelmingly common case — and the only case the synthetic fixture
  generates, keeping the ``robots_gate`` DuckDB oracle exact) evaluates as
  ``exists(prefixes, p -> startswith(path, p))`` — whole-stage codegen,
  zero regex;
- anything needing RFC precedence (an ``Allow`` rule, a wildcard, an anchor)
  compiles each pattern ONCE per host to an anchored regex at parse time;
  the gate filters matching rules with ``regexp_like`` (JVM), then
  ``array_max(struct(plen, allow))`` implements longest-match-wins with
  allow-beats-disallow on ties in one expression.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

RULE_STRUCT = StructType(
    [
        StructField("rx", StringType()),
        StructField("plen", IntegerType()),
        StructField("allow", BooleanType()),
    ]
)

ROBOTS_RULES_SCHEMA = StructType(
    [
        StructField("disallow_prefixes", ArrayType(StringType())),
        StructField("rules", ArrayType(RULE_STRUCT)),
        StructField("crawl_delay_ms", IntegerType()),
    ]
)


def _pattern_to_regex(pattern: str) -> str:
    """RFC 9309 pattern → anchored Java/ICU-safe regex: ``*`` is a greedy
    wildcard, a trailing ``$`` anchors the end, everything else is literal."""
    anchor_end = pattern.endswith("$")
    body = pattern[:-1] if anchor_end else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return "^" + rx + ("$" if anchor_end else "")


def parse_robots_txt(
    txt: str | None, agent: str = "*"
) -> tuple[list[str], list[tuple[str, int, bool]], int | None]:
    """Pure parser → ``(disallow_prefixes, rules, crawl_delay_ms)``.

    Exactly one of the first two is populated: ``disallow_prefixes`` when the
    matched groups contain only wildcard-free Disallows (fast codegen gate),
    else ``rules`` = ``[(regex, pattern_octet_len, allow)]`` for the RFC
    longest-match gate. ``agent``: this crawler's product token; groups are
    selected per RFC 9309 (exact token match, else the ``*`` groups).
    """
    if not txt:
        return [], [], None
    # group parse: consecutive User-agent lines accumulate until the first
    # rule line closes the agent list; the next User-agent starts a new group
    groups: list[dict] = []
    cur: dict | None = None
    in_agents = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents:
                cur = {"agents": [], "rules": [], "delay": None}
                groups.append(cur)
                in_agents = True
            cur["agents"].append(val.lower())
        elif cur is not None:
            in_agents = False
            if key in ("allow", "disallow") and val:
                cur["rules"].append((val, key == "allow"))
            elif key == "crawl-delay":
                try:
                    cur["delay"] = int(float(val) * 1000)
                except ValueError:
                    pass
    al = agent.lower()
    chosen = [g for g in groups if al != "*" and al in g["agents"]]
    if not chosen:
        chosen = [g for g in groups if "*" in g["agents"]]
    pats: list[tuple[str, bool]] = []
    delay_ms: int | None = None
    for g in chosen:  # rules from every matching group combine (RFC 9309 §2.2.1)
        pats.extend(g["rules"])
        if delay_ms is None:
            delay_ms = g["delay"]
    simple = all((not allow) and "*" not in p and not p.endswith("$") for p, allow in pats)
    if simple:
        return [p for p, _ in pats], [], delay_ms
    rules = [(_pattern_to_regex(p), len(p.encode("utf-8")), allow) for p, allow in pats]
    return [], rules, delay_ms


@F.pandas_udf(ROBOTS_RULES_SCHEMA)
def parse_robots_udf(txt: pd.Series) -> pd.DataFrame:
    parsed = [parse_robots_txt(t) for t in txt]
    return pd.DataFrame(
        {
            "disallow_prefixes": [p[0] for p in parsed],
            "rules": [p[1] for p in parsed],
            "crawl_delay_ms": [p[2] for p in parsed],
        }
    )


def path_of(url_canon: Column | str) -> Column:
    c = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    return F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit("/"))


def robots_allows(
    path: Column, disallow_prefixes: Column, rules: Column | None = None
) -> Column:
    """Native gate. Prefix tier: allowed iff no disallow prefix matches.
    RFC tier (when ``rules`` is non-empty for the host): among matching
    patterns the LONGEST wins, ``Allow`` wins ties
    (``array_max(struct(plen, allow))`` — struct ordering is exactly that
    precedence); no match → allowed."""
    no_prefixes = disallow_prefixes.isNull() | (F.size(disallow_prefixes) == 0)
    prefix_allowed = no_prefixes | ~F.exists(
        disallow_prefixes, lambda p: path.startswith(p)
    )
    if rules is None:
        return prefix_allowed
    matched = F.filter(rules, lambda r: F.regexp_like(path, r["rx"]))
    best = F.array_max(
        F.transform(matched, lambda r: F.struct(r["plen"].alias("plen"), r["allow"].alias("allow")))
    )
    rfc_allowed = F.when(F.size(matched) == 0, F.lit(True)).otherwise(best["allow"])
    have_rules = rules.isNotNull() & (F.size(rules) > 0)
    return F.when(have_rules, rfc_allowed).otherwise(prefix_allowed)


def parse_robots_table(raw_robots: DataFrame) -> DataFrame:
    """(host, robots_txt) → (host, disallow_prefixes, rules, crawl_delay_ms).

    The production shape: fetch /robots.txt per host into a raw table, parse
    once per host with the Arrow UDF, broadcast the result to every gate."""
    return raw_robots.select("host", parse_robots_udf("robots_txt").alias("_r")).select(
        "host", "_r.disallow_prefixes", "_r.rules", "_r.crawl_delay_ms"
    )


def sitemap_records(raw_robots: DataFrame, txt_col: str = "robots_txt") -> DataFrame:
    """``Sitemap:`` records from raw robots.txt → (host, sitemap_url) rows.

    Per the sitemaps.org protocol (and RFC 9309 §2.2.4 "other records"),
    ``Sitemap:`` lines are GLOBAL — valid anywhere in the file, outside any
    User-agent group — and carry absolute URLs, so extraction needs no group
    machinery: one native multiline regexp over the raw text (key
    case-insensitive, value stops at whitespace or an inline comment).
    Fully codegen — unlike rule parsing, this never leaves the JVM.
    Feeds sources.sitemaps.sitemap_entries → seeds_from_sitemap_entries:
    the standard seed-discovery loop (robots → sitemap → frontier)."""
    urls = F.expr(
        f"regexp_extract_all({txt_col}, '(?im)^[ \\\\t]*sitemap[ \\\\t]*:[ \\\\t]*([^#\\\\s]+)', 1)"
    )
    return raw_robots.select("host", F.explode(urls).alias("sitemap_url"))


def _rules_col(robots: DataFrame) -> Column:
    """The RFC rule column, tolerating pre-RFC robots tables (fixtures and
    stores that carry only ``disallow_prefixes``)."""
    if "rules" in robots.columns:
        return F.col("rules")
    return F.lit(None).cast(ArrayType(RULE_STRUCT))


def _gate_join(frontier: DataFrame, robots: DataFrame) -> tuple[DataFrame, Column]:
    sel = robots.select(
        "host", "disallow_prefixes", _rules_col(robots).alias("_rfc_rules")
    )
    joined = frontier.join(F.broadcast(sel), "host", "left")
    allowed = robots_allows(
        path_of("url_canon"), F.col("disallow_prefixes"), F.col("_rfc_rules")
    )
    return joined, allowed


def gate_frontier(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Filter frontier rows disallowed by their host's rules.

    `robots` is one row per host → broadcast join; the per-row predicate is
    native (no UDF on the big side).
    """
    joined, allowed = _gate_join(frontier, robots)
    return joined.filter(allowed).drop("disallow_prefixes", "_rfc_rules")


def gate_frontier_flagged(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """:func:`gate_frontier` keeping BOTH outcomes: same broadcast join and
    native predicate, but rows carry a ``robots_allowed`` flag instead of
    being dropped — the delta-committing crawl needs the disallowed keys too
    (they become frontier tombstones), and one cached flagged frame is
    cheaper than running the gate twice."""
    joined, allowed = _gate_join(frontier, robots)
    return joined.withColumn("robots_allowed", allowed).drop(
        "disallow_prefixes", "_rfc_rules"
    )
