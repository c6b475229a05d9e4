"""Focused crawling: topic-relevance-weighted frontier prioritization
(Chakrabarti, van den Berg, Dom — "Focused crawling: a new approach to
topic-specific Web resource discovery", WWW'99).

The classic soft-focus rule: score each FETCHED page's text against the
topic's term set, and blend that parent relevance into the priority of the
links it discovers — children of on-topic parents are crawled first,
children of off-topic or text-less parents sink.

Spark-first shape: the relevance scorer is the BM25 operator
(operators/relevance.py — corpus stats over THIS round's fetch log only, so
the whole step is delta-sized O(pages fetched this round), never
O(history)); the blend is one left join on the lineage key the discovery
step already carries (src_url_hash) plus pure column math. Nothing here
adds a scan of the frontier or the seen-set.

Determinism: BM25 sums are rounded to 6 decimals (groupBy float-summation
order is partition-dependent), and the saturation + blend are pure
arithmetic — so crawl ordering under a focus config is reproducible under
any parallelism, preserving the engine's resume/equality invariants.

Reference scope: the reference crawler is list-driven (crawls exactly its
seed spreadsheets) and has no relevance scoring; this is the standard
public-literature extension for open-web crawls (SURVEY.md §2 C-family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.relevance import bm25_scores

#: BM25-score saturation midpoint: rel = score / (score + SAT). Maps the
#: unbounded BM25 sum onto [0, 1) monotonically without a global-max pass
#: (a max would add an agg + broadcast and make priorities depend on the
#: whole round's best page — saturation keeps the score per-page-local).
SATURATION = 2.0


def page_relevance(
    pages: DataFrame,
    terms: list[str],
    key: str = "url_hash",
    text_col: str = "extracted_text",
) -> DataFrame:
    """(key, relevance) for every page whose text matches ≥1 term.

    relevance = round(bm25, 6) / (round(bm25, 6) + SAT) ∈ (0, 1); pages with
    no term hits (or NULL text) are simply absent — the blend treats absent
    as 0, the WWW'99 "unknown parent is off-topic" default."""
    scored = bm25_scores(
        pages.where(F.col(text_col).isNotNull()), key, text_col, terms
    )
    s = F.round(F.col("score"), 6)
    return scored.select(key, (s / (s + F.lit(SATURATION))).alias("relevance"))


def blend_child_priority(
    discovered: DataFrame,
    parent_rel: DataFrame,
    weight: float,
    src_col: str = "src_url_hash",
    rel_key: str = "url_hash",
    priority_col: str = "priority",
) -> DataFrame:
    """priority' = (1 − w)·priority + w·relevance(parent), rounded to 6.

    One left join on the lineage key (parent_rel is per-round-small →
    broadcast); rows whose parent is unknown/off-topic blend relevance 0.
    Column set is preserved."""
    rel = F.broadcast(
        parent_rel.select(
            F.col(rel_key).alias(src_col), F.col("relevance").alias("_rel")
        )
    )
    blended = F.round(
        (1.0 - weight) * F.col(priority_col)
        + weight * F.coalesce(F.col("_rel"), F.lit(0.0)),
        6,
    )
    return (
        discovered.join(rel, src_col, "left")
        .withColumn(priority_col, blended)
        .drop("_rel")
    )
