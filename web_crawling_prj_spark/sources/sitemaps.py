"""Sitemap (sitemaps.org XML) render + parse — the crawl's OTHER seed source.

Real crawlers bootstrap frontiers from two places: outlinks (operators.fetch)
and per-host sitemaps. The reference seeds from SharePoint/Postgres lists
(``dags/wayfair/wayfair.dag_get_all_data.py:25-49``); the web-scale analog is
``/sitemap.xml`` per host. This module is fully NATIVE — render and parse are
column expressions (whole-stage codegen), no Python anywhere:

- **render**: :func:`urlset_xml` packs per-host url rows into one
  spec-shaped ``<urlset>`` document (entity-escaped ``<loc>``, optional
  ``<lastmod>``/``<priority>``), deterministic order under any partitioning
  (same array_sort trick as the WARC packer).
- **parse**: :func:`sitemap_entries` splits a document on ``</url>`` and
  regex-extracts each entry's fields — per-ENTRY extraction, so optional
  fields can never positionally misalign (the classic xpath-zip bug: two
  ``<loc>`` and one ``<lastmod>`` zip off by one). ``<sitemapindex>``
  documents list child sitemaps; :func:`sitemap_index_entries` parses those.
- **seed**: :func:`seeds_from_sitemap_entries` → the seeds shape
  ``frontier_from_seeds`` consumes.

Dialect: standard sitemaps.org ``urlset``/``sitemapindex`` with the five XML
entities escaped; CDATA and exotic embedded XML inside entries are out of
scope (no real sitemap generator emits them — the spec REQUIRES entity
escaping for URLs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the order matters on UNescape: &amp; last, else "&amp;lt;" double-decodes
_XML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ("'", "&apos;"), ('"', "&quot;")]


def xml_escape(c: Column) -> Column:
    for raw, ent in _XML_ESCAPES:
        c = F.replace(c, F.lit(raw), F.lit(ent))
    return c


def xml_unescape(c: Column) -> Column:
    for raw, ent in reversed(_XML_ESCAPES):
        c = F.replace(c, F.lit(ent), F.lit(raw))
    return c


_URLSET_OPEN = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
)


def urlset_xml(
    rows: DataFrame,
    host: Column,
    loc: Column,
    order_key: Column,
    lastmod: Column | None = None,
    priority: Column | None = None,
) -> DataFrame:
    """Pack url rows into one ``<urlset>`` XML document per host:
    ``(host, sitemap_xml)``. Entirely native: entry strings concat per row,
    aggregate to a sorted array, join — one shuffle on the host key (the
    sink's natural write unit, one sitemap per host)."""
    entry = F.concat(
        F.lit("<url><loc>"), xml_escape(loc), F.lit("</loc>"),
        F.lit("") if lastmod is None else F.when(
            lastmod.isNotNull(), F.concat(F.lit("<lastmod>"), lastmod.cast("string"), F.lit("</lastmod>"))
        ).otherwise(F.lit("")),
        F.lit("") if priority is None else F.when(
            priority.isNotNull(),
            F.concat(F.lit("<priority>"), F.format_number(priority, 1), F.lit("</priority>")),
        ).otherwise(F.lit("")),
        F.lit("</url>\n"),
    )
    packed = rows.select(
        host.alias("host"), F.struct(order_key.alias("k"), entry.alias("e")).alias("ke")
    )
    return (
        packed.groupBy("host")
        .agg(F.array_sort(F.collect_list("ke")).alias("kes"))
        .select(
            "host",
            F.concat(
                F.lit(_URLSET_OPEN),
                F.array_join(F.transform("kes", lambda s: s["e"]), ""),
                F.lit("</urlset>\n"),
            ).alias("sitemap_xml"),
        )
    )


def _entry_field(frag: Column, tag: str) -> Column:
    """``<tag>…</tag>`` body within one entry fragment, NULL when absent."""
    got = F.regexp_extract(frag, f"<{tag}>([^<]*)</{tag}>", 1)
    return F.when(got != "", got)


def sitemap_entries(sitemaps: DataFrame, xml_col: str = "sitemap_xml") -> DataFrame:
    """One row per ``<url>`` entry: ``(…carry-over cols, loc, lastmod:date,
    changefreq, priority:double)``. Split on ``</url>`` then per-fragment
    regex — each entry's optional fields stay WITH their own ``<loc>``."""
    frag = F.explode(F.split(F.col(xml_col), "</url>")).alias("_frag")
    carry = [c for c in sitemaps.columns if c != xml_col]
    return (
        sitemaps.select(*carry, frag)
        .where(F.col("_frag").contains("<loc>"))
        .select(
            *carry,
            xml_unescape(_entry_field(F.col("_frag"), "loc")).alias("loc"),
            F.try_to_timestamp(_entry_field(F.col("_frag"), "lastmod"))
            .cast("date")
            .alias("lastmod"),
            _entry_field(F.col("_frag"), "changefreq").alias("changefreq"),
            _entry_field(F.col("_frag"), "priority").cast("double").alias("priority"),
        )
    )


def sitemap_index_entries(indexes: DataFrame, xml_col: str = "sitemap_xml") -> DataFrame:
    """One row per child sitemap of a ``<sitemapindex>``: ``(…, loc,
    lastmod:date)`` — feed each ``loc`` back through fetch + parse (the
    driver loop is the caller's: index depth is spec-capped at one level)."""
    frag = F.explode(F.split(F.col(xml_col), "</sitemap>")).alias("_frag")
    carry = [c for c in indexes.columns if c != xml_col]
    return (
        indexes.select(*carry, frag)
        .where(F.col("_frag").contains("<loc>"))
        .select(
            *carry,
            xml_unescape(_entry_field(F.col("_frag"), "loc")).alias("loc"),
            F.try_to_timestamp(_entry_field(F.col("_frag"), "lastmod"))
            .cast("date")
            .alias("lastmod"),
        )
    )


def seeds_from_sitemap_entries(entries: DataFrame, default_priority: float = 0.5) -> DataFrame:
    """Sitemap entries → the seed shape ``frontier_from_seeds`` consumes
    (url, priority, depth): sitemap ``<priority>`` carries into the
    frontier's scheduling priority, absent → ``default_priority``."""
    return entries.select(
        F.col("loc").alias("url"),
        F.coalesce("priority", F.lit(default_priority)).alias("priority"),
        F.lit(0).alias("depth"),
    )
