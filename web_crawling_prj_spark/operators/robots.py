"""robots.txt parsing + gating.

Split by cost, as the scale demands:
- **Parse** (once per host, tiny data): raw robots.txt text → (disallow_prefixes,
  crawl_delay_ms) via an Arrow-vectorized pandas UDF (north-rule requirement:
  robots evaluated via vectorized UDFs; reference analog = the credential/config
  refresh gate, services/credential_refresh_service.py:118-169).
- **Gate** (once per frontier row, billions of rows): native higher-order
  function ``exists(disallow_prefixes, p -> startswith(path, p))`` after a
  broadcast join on host — stays inside whole-stage codegen, no Python.

Only a restricted robots dialect is supported (User-agent: * blocks, Disallow
prefixes, Crawl-delay) — enough for Common-Crawl-style politeness.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

ROBOTS_RULES_SCHEMA = StructType(
    [
        StructField("disallow_prefixes", ArrayType(StringType())),
        StructField("crawl_delay_ms", IntegerType()),
    ]
)


def parse_robots_txt(txt: str | None) -> tuple[list[str], int | None]:
    """Pure parser: User-agent:* section → (disallow prefixes, crawl delay ms)."""
    if not txt:
        return [], None
    disallow: list[str] = []
    delay_ms: int | None = None
    applies = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif applies and key == "disallow" and val:
            disallow.append(val)
        elif applies and key == "crawl-delay":
            try:
                delay_ms = int(float(val) * 1000)
            except ValueError:
                pass
    return disallow, delay_ms


@F.pandas_udf(ROBOTS_RULES_SCHEMA)
def parse_robots_udf(txt: pd.Series) -> pd.DataFrame:
    parsed = [parse_robots_txt(t) for t in txt]
    return pd.DataFrame(
        {"disallow_prefixes": [p[0] for p in parsed], "crawl_delay_ms": [p[1] for p in parsed]}
    )


def path_of(url_canon: Column | str) -> Column:
    c = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    return F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit("/"))


def robots_allows(path: Column, disallow_prefixes: Column) -> Column:
    """Native gate: allowed iff no disallow prefix matches the path."""
    no_rules = disallow_prefixes.isNull() | (F.size(disallow_prefixes) == 0)
    blocked = F.exists(disallow_prefixes, lambda p: path.startswith(p))
    return no_rules | ~blocked


def parse_robots_table(raw_robots: DataFrame) -> DataFrame:
    """(host, robots_txt) → (host, disallow_prefixes, crawl_delay_ms).

    The production shape: fetch /robots.txt per host into a raw table, parse
    once per host with the Arrow UDF, broadcast the result to every gate."""
    return raw_robots.select("host", parse_robots_udf("robots_txt").alias("_r")).select(
        "host", "_r.disallow_prefixes", "_r.crawl_delay_ms"
    )


def gate_frontier(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Filter frontier rows disallowed by their host's rules.

    `robots` is one row per host → broadcast join; the per-row predicate is
    codegen'd (no UDF on the big side).
    """
    joined = frontier.join(
        F.broadcast(robots.select("host", "disallow_prefixes")), "host", "left"
    )
    allowed = robots_allows(path_of("url_canon"), F.col("disallow_prefixes"))
    return joined.filter(allowed).drop("disallow_prefixes")


def gate_frontier_flagged(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """:func:`gate_frontier` keeping BOTH outcomes: same broadcast join and
    codegen'd predicate, but rows carry a ``robots_allowed`` flag instead of
    being dropped — the delta-committing crawl needs the disallowed keys too
    (they become frontier tombstones), and one cached flagged frame is
    cheaper than running the gate twice."""
    joined = frontier.join(
        F.broadcast(robots.select("host", "disallow_prefixes")), "host", "left"
    )
    allowed = robots_allows(path_of("url_canon"), F.col("disallow_prefixes"))
    return joined.withColumn("robots_allowed", allowed).drop("disallow_prefixes")
