"""Crawl-trap detection: URL-template explosion control.

Real crawls die in infinite URL spaces — calendars, session ids, faceted
search, pagination products — where one generator mints unbounded URLs that
are all "new" to the seen-set. The standard defense (used by every production
crawler; public writeups: Heritrix's path-depth/repeat rules, IRLbot's
budgeting by spam-resistant reputation, Mercator's per-host quotas) is to
bucket URLs by TEMPLATE — the URL with its volatile tokens collapsed — and
budget each template.

Everything here is native column math (stays in whole-stage codegen):

- :func:`url_template`: host + lowercased path?query with uuid-ish tokens,
  long hex runs, then digit runs collapsed to placeholder atoms. Two URLs
  from the same generator collapse to the same template.
- :func:`detect_trap_templates`: per (host, template) frontier counts — one
  partial-aggregable groupBy (count is map-side combinable, so the hot trap
  template is exactly the key that combines best); a template is flagged when
  its URL count exceeds ``max_per_template``.
- :func:`cap_trapped_frontier`: keep the best ``max_per_template`` URLs per
  template (priority desc, url asc — deterministic) and pass every URL of
  non-trapped templates through untouched. The rank runs ONLY over rows of
  flagged templates (a broadcast semi-join routes the rest around the sort),
  and uses the same two-level salted window as the politeness scheduler so a
  10^8-URL trap template never lands in one task.

Reference analog: none — the reference crawls a fixed catalog of seed URLs
(dags/wayfair) and cannot hit open-ended URL spaces; this operator is part of
the frontier engine's own scale story (10^10 synthetic Common-Crawl frontier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from web_crawling_prj_spark.functions.urls import host_of

#: volatile-token collapse rules, applied in order (uuid before hex before
#: digits — a uuid contains hex runs, a hex run contains digits).
_UUID_RE = r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
_HEX_RE = r"[0-9a-f]{16,}"
_DIGITS_RE = r"[0-9]+"


def url_template(url: Column | str) -> Column:
    """host + templated path?query: lowercase, fragment dropped, uuids →
    ``«u»``, ≥16-char hex runs → ``«x»``, digit runs → ``«d»``."""
    c = F.col(url) if isinstance(url, str) else url
    path = F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit("/"))
    query = F.parse_url(c, F.lit("QUERY"))
    pq = F.concat(
        path, F.when(query.isNotNull(), F.concat(F.lit("?"), query)).otherwise(F.lit(""))
    )
    t = F.lower(pq)
    t = F.regexp_replace(t, _UUID_RE, "«u»")
    t = F.regexp_replace(t, _HEX_RE, "«x»")
    t = F.regexp_replace(t, _DIGITS_RE, "«d»")
    return F.concat(host_of(c), t)


def detect_trap_templates(
    frontier: DataFrame, url_col: str = "url", max_per_template: int = 1000
) -> DataFrame:
    """Per-template URL counts + trap flag. One groupBy, count-only (fully
    map-side combinable — the hot template costs no skewed reduce)."""
    return (
        frontier.select(
            host_of(url_col).alias("host"), url_template(url_col).alias("template")
        )
        .groupBy("host", "template")
        .agg(F.count("*").alias("n_urls"))
        .withColumn("is_trap", F.col("n_urls") > max_per_template)
    )


def cap_trapped_frontier(
    frontier: DataFrame,
    url_col: str = "url",
    priority_col: str = "priority",
    max_per_template: int = 1000,
    n_salts: int = 16,
    traps: DataFrame | None = None,
) -> DataFrame:
    """Budget each trapped template to its best ``max_per_template`` URLs.

    Non-trapped templates bypass the rank entirely: the flagged-template list
    is aggregated (small by construction — it is the count of DISTINCT
    templates over budget, not of URLs) and broadcast; only matching rows
    enter the two-level salted top-k (salt level bounds any single task at
    ~max_per_template rows per salt, exactly the politeness scheduler's
    skew defense). Deterministic: priority desc, url asc."""
    tpl = frontier.withColumn("_tpl", url_template(url_col))
    if traps is None:
        traps = detect_trap_templates(frontier, url_col, max_per_template)
    trapped_tpls = traps.where("is_trap").select(F.col("template").alias("_tpl"))
    clean = tpl.join(F.broadcast(trapped_tpls), "_tpl", "left_anti")
    risky = tpl.join(F.broadcast(trapped_tpls), "_tpl", "left_semi")

    order = [F.desc(priority_col), F.asc(url_col)]
    salt = F.pmod(F.xxhash64(url_col), F.lit(n_salts))
    w1 = Window.partitionBy("_tpl", salt).orderBy(*order)
    pre = risky.withColumn("_r1", F.row_number().over(w1)).where(
        F.col("_r1") <= max_per_template
    )
    w2 = Window.partitionBy("_tpl").orderBy(*order)
    kept = (
        pre.withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= max_per_template)
        .drop("_r1", "_r2")
    )
    return clean.unionByName(kept).drop("_tpl")
