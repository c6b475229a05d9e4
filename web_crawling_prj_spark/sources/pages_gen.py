"""Deterministic synthetic Common-Crawl-style page store (FIXTURES.md `pages`).

Input-hint shape: ``url:string, warc_ts:timestamp, html:binary, text:string,
lang:string``. Text content is seeded from the driver's read-only
``documents.parquet`` (doc_id → text/lang) so content is realistic while staying
a pure function of (SEED, sf_dir). Host assignment is Zipf-skewed so per-host
scheduling skew is exercised from the start (SURVEY.md §7 hard parts).

Everything is generated ON-CLUSTER as a DataFrame program (no driver-side row
loops): url/host/priority columns are native expressions over ``documents``;
``html`` is rendered by an Arrow-vectorized pandas UDF. At 100 TB the same plan
runs unchanged — the generator is itself an example of the engine's UDF surface.

Reference analogs: seed lists from SharePoint/Postgres
(``dags/wayfair/wayfair.dag_get_all_data.py:25-49``), date-partitioned page
store (``dags/common/base_source_dag.py:72-84``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from web_crawling_prj_spark.functions.text import render_html

SEED = 42
N_HOSTS = 97  # prime → clean modular mixing
HOT_HOST_PCT = 25  # % of pages funneled to host-0000 (deliberate skew)


@F.pandas_udf(BinaryType())
def _render_html_udf(text: pd.Series, lang: pd.Series, url: pd.Series) -> pd.Series:
    out = [
        None if t is None else render_html(t, la or "", u or "")
        for t, la, u in zip(text, lang, url)
    ]
    return pd.Series(out, dtype=object)


def _mix(col, k: int):
    """Cheap deterministic integer mixer (Knuth multiplicative).

    Input is reduced mod a prime first so the multiply can't overflow a long
    under ANSI mode even for full-range hash inputs.
    """
    c = F.pmod(col.cast("long"), F.lit(1_000_003))
    return F.pmod(c * F.lit(2654435761) + F.lit(SEED * k), F.lit(2**31 - 1))


def host_for_doc(doc_col):
    """The authoritative doc→host assignment (shared with the synthetic link
    graph so outlinks resolve to real pages)."""
    host_id = F.when(_mix(doc_col, 1) % 100 < HOT_HOST_PCT, F.lit(0)).otherwise(
        _mix(doc_col, 2) % N_HOSTS
    )
    return F.format_string("host-%04d.example", host_id)


def pages_df(spark: SparkSession, sf_dir: str, with_html: bool = True) -> DataFrame:
    """Build the `pages` table from documents.parquet — deterministic, columnar.

    ~2% of rows are emitted twice under a NON-canonical alias url (uppercase
    host, unsorted query, fragment) so canonicalization-dedup has real work.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # a single-file documents parquet is ONE scan split, and every per-row
    # stage upstream of the crawl plan's first exchange (html render, url
    # canonicalization, the extract hot path) inherits it — spread across
    # the cluster only when below parallelism (identity at real scale)
    from web_crawling_prj_spark.operators.textdedup import spread_if_narrow

    docs = spread_if_narrow(docs)
    base = docs.select(
        "doc_id",
        host_for_doc(F.col("doc_id")).alias("host"),
        (_mix(F.col("doc_id"), 3) % 1000 / 1000.0).alias("priority"),
        "text",
        F.coalesce("lang", F.lit("und")).alias("lang"),
    )
    canon_url = F.format_string(
        "https://%s/doc/%d?id=%d&ref=seed", F.col("host"), F.col("doc_id"), F.col("doc_id")
    )
    pages = base.withColumn("url", canon_url)

    # ~2% duplicate-equivalent aliases: same page, messier URL.
    aliases = (
        base.where(_mix(F.col("doc_id"), 4) % 100 < 2)
        .withColumn(
            "url",
            F.format_string(
                "HTTPS://%s:443/doc/../doc/%d?ref=seed&id=%d#frag",
                F.upper(F.col("host")),
                F.col("doc_id"),
                F.col("doc_id"),
            ),
        )
    )
    out = pages.unionByName(aliases).select(
        "url",
        (F.to_timestamp(F.lit("2025-01-01 00:00:00")) + F.make_interval(mins=_mix(F.col("doc_id"), 5) % 525600)).alias("warc_ts"),
        "text",
        "lang",
        "doc_id",
        "host",
        "priority",
    )
    if with_html:
        out = out.withColumn("html", _render_html_udf("text", "lang", "url"))
    return out.select("url", "warc_ts", *(["html"] if with_html else []), "text", "lang", "doc_id", "host", "priority")


def seeds_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl seed list: ~20% of pages (by mixed doc_id) + a few unknown urls +
    deliberate duplicate seeds (reference dedups its seed list,
    ``dags/wayfair/wayfair.dag_get_all_data.py:35``)."""
    p = pages_df(spark, sf_dir, with_html=False)
    seeds = (
        p.where(_mix(F.col("doc_id"), 6) % 100 < 20)
        .select("url", "priority", F.lit(0).alias("depth"))
    )
    dupes = seeds.where(_mix(F.xxhash64("url"), 7) % 10 < 2)  # re-submitted seeds
    unknown = (
        spark.range(25)
        .select(
            F.format_string("https://host-9999.example/missing/%d", F.col("id")).alias("url"),
            F.lit(0.5).alias("priority"),
            F.lit(0).alias("depth"),
        )
    )
    return seeds.unionByName(dupes).unionByName(unknown)


def robots_txt_df(spark: SparkSession) -> DataFrame:
    """Raw robots.txt text per host (host, robots_txt) — rendered from the same
    seeded rules as :func:`robots_df`, so
    ``parse_robots_udf(robots_txt_df(...)) == robots_df(...)`` is a tested
    roundtrip and crawls can consume either form. The production path is:
    fetch /robots.txt per host → this table → Arrow-UDF parse → broadcast gate.
    """
    rules = robots_df(spark)
    delay_line = F.when(
        F.col("crawl_delay_ms") > 0,
        F.concat(F.lit("Crawl-delay: "), (F.col("crawl_delay_ms") / 1000.0).cast("string"), F.lit("\n")),
    ).otherwise(F.lit(""))
    disallow_lines = F.aggregate(
        F.col("disallow_prefixes"),
        F.lit(""),
        lambda acc, p: F.concat(acc, F.lit("Disallow: "), p, F.lit("\n")),
    )
    txt = F.concat(
        F.lit("# synthetic robots\nUser-agent: *\n"), disallow_lines, delay_line
    )
    return rules.select("host", txt.alias("robots_txt"))


def robots_df(spark: SparkSession) -> DataFrame:
    """Per-host robots rules: ~20% of hosts disallow a prefix; ~2% disallow all;
    crawl_delay_ms seeded from {0,250,500,1000,5000} (reference default 500 ms =
    2 rps, services/request_client.py:67)."""
    hosts = spark.range(N_HOSTS).select(
        F.format_string("host-%04d.example", F.col("id")).alias("host"), F.col("id").alias("hid")
    )
    m = _mix(F.col("hid"), 8) % 100
    delays = F.element_at(
        F.array(F.lit(0), F.lit(250), F.lit(500), F.lit(1000), F.lit(5000)),
        (_mix(F.col("hid"), 9) % 5 + 1).cast("int"),
    )
    return hosts.select(
        "host",
        F.when(m < 2, F.array(F.lit("/")))
        .when(m < 20, F.array(F.lit("/private"), F.format_string("/doc/%d", _mix(F.col("hid"), 10) % 50)))
        .otherwise(F.array().cast("array<string>"))
        .alias("disallow_prefixes"),
        delays.alias("crawl_delay_ms"),
    )
