"""Sitemap render+parse: entity-escape round-trip, per-entry field alignment
(the xpath-zip bug this design avoids), sitemapindex, and seeding a frontier."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawling_prj_spark.sources.sitemaps import (
    seeds_from_sitemap_entries,
    sitemap_entries,
    sitemap_index_entries,
    urlset_xml,
    xml_escape,
    xml_unescape,
)


def test_entity_escape_roundtrip_all_five(spark):
    nasty = "https://h.example/p?a=1&b=<x>&c='q'&d=\"z\""
    df = spark.createDataFrame([(nasty,)], "s string")
    out = df.select(xml_unescape(xml_escape(F.col("s"))).alias("r")).first()["r"]
    assert out == nasty
    escaped = df.select(xml_escape(F.col("s")).alias("e")).first()["e"]
    assert "&amp;" in escaped and "&lt;x&gt;" in escaped and "<x>" not in escaped
    # pre-escaped input survives: &amp;lt; must NOT double-decode to "<"
    tricky = spark.createDataFrame([("&amp;lt;",)], "s string")
    assert tricky.select(xml_unescape(F.col("s")).alias("r")).first()["r"] == "&lt;"


def test_optional_fields_never_misalign(spark):
    """Two urls, only the FIRST has lastmod, only the SECOND has priority —
    a positional zip of xpath arrays gets this wrong; per-entry extraction
    cannot."""
    rows = spark.createDataFrame(
        [("h", "https://h/1", "2026-01-02", None),
         ("h", "https://h/2", None, 0.8)],
        "host string, loc string, mod string, pri double",
    )
    sm = urlset_xml(
        rows,
        host=F.col("host"),
        loc=F.col("loc"),
        order_key=F.col("loc"),
        lastmod=F.col("mod").cast("date"),
        priority=F.col("pri"),
    )
    got = {r["loc"]: (str(r["lastmod"]), r["priority"]) for r in sitemap_entries(sm).collect()}
    assert got == {
        "https://h/1": ("2026-01-02", None),
        "https://h/2": ("None", 0.8),
    }


def test_sitemap_index_and_frontier_seeding(spark):
    idx_xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<sitemap><loc>https://h.example/sitemap-a.xml</loc>"
        "<lastmod>2026-02-01</lastmod></sitemap>\n"
        "<sitemap><loc>https://h.example/sitemap-b.xml</loc></sitemap>\n"
        "</sitemapindex>\n"
    )
    idx = spark.createDataFrame([("h.example", idx_xml)], "host string, sitemap_xml string")
    kids = sitemap_index_entries(idx).orderBy("loc").collect()
    assert [k["loc"] for k in kids] == [
        "https://h.example/sitemap-a.xml",
        "https://h.example/sitemap-b.xml",
    ]
    assert str(kids[0]["lastmod"]) == "2026-02-01" and kids[1]["lastmod"] is None

    # entries → seeds → frontier: canonicalized, hashed, deduped
    from web_crawling_prj_spark.plans.crawl_round import frontier_from_seeds

    rows = spark.createDataFrame(
        [("h", "https://H.example/x?b=2&a=1", None, 0.9),
         ("h", "https://h.example/x?a=1&b=2", None, 0.9)],  # same after canon
        "host string, loc string, mod string, pri double",
    )
    sm = urlset_xml(rows, host=F.col("host"), loc=F.col("loc"), order_key=F.col("loc"),
                    priority=F.col("pri"))
    seeds = seeds_from_sitemap_entries(sitemap_entries(sm))
    fr = frontier_from_seeds(seeds)
    assert fr.count() == 1  # canonical dedup collapsed the pair
    row = fr.first()
    assert row["url_canon"] == "https://h.example/x?a=1&b=2"
    assert row["priority"] == 0.9 and row["depth"] == 0


def test_sitemap_records_from_robots(spark):
    """robots.txt Sitemap: discovery — global records, case-insensitive key,
    inline comments and surrounding rules ignored."""
    from web_crawling_prj_spark.operators.robots import sitemap_records

    txt_a = (
        "# crawler policy\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "Sitemap: https://a.example/sitemap.xml\n"
        "\tSITEMAP:\thttps://a.example/news.xml  # news index\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
    )
    txt_b = "User-agent: *\nAllow: /\n"  # no sitemap records
    raw = spark.createDataFrame(
        [("a.example", txt_a), ("b.example", txt_b)], "host string, robots_txt string"
    )
    got = sorted((r.host, r.sitemap_url) for r in sitemap_records(raw).collect())
    assert got == [
        ("a.example", "https://a.example/news.xml"),
        ("a.example", "https://a.example/sitemap.xml"),
    ]


def test_robots_to_frontier_discovery_loop(spark):
    """The full seed-discovery loop: robots → Sitemap records → (stub fetch =
    rendered urlset) → entries → seeds → frontier."""
    from web_crawling_prj_spark.operators.robots import sitemap_records
    from web_crawling_prj_spark.plans.crawl_round import frontier_from_seeds

    raw = spark.createDataFrame(
        [("h.example", "User-agent: *\nSitemap: https://h.example/sm.xml\n")],
        "host string, robots_txt string",
    )
    discovered = sitemap_records(raw)
    assert discovered.count() == 1
    # stub fetch: the discovered sitemap URL resolves to a rendered urlset
    rows = spark.createDataFrame(
        [("h.example", "https://h.example/page/1", 0.8),
         ("h.example", "https://h.example/page/2", 0.6)],
        "host string, loc string, pri double",
    )
    sm = urlset_xml(rows, host=F.col("host"), loc=F.col("loc"),
                    order_key=F.col("loc"), priority=F.col("pri"))
    fetched = discovered.join(sm, "host").select("host", "sitemap_xml")
    seeds = seeds_from_sitemap_entries(sitemap_entries(fetched))
    fr = frontier_from_seeds(seeds)
    assert fr.count() == 2
    assert {r.priority for r in fr.collect()} == {0.8, 0.6}
