"""Anchor-text extraction, href resolution, per-target rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.anchors import (
    anchor_text_rollup,
    extract_anchors,
    is_path_relative,
    resolve_href,
)


def test_extract_anchors_from_rendered_page(spark):
    """Against the real synthetic renderer: nav carries home/about/self, the
    self href is entity-escaped (&amp;) and must come back unescaped."""
    from web_crawling_prj_spark.functions.text import render_html

    url = "https://h.example/doc/7?id=7&ref=seed"
    html = render_html("some body text", "en", url)
    pages = spark.createDataFrame([(url, bytearray(html))], "url string, html binary")
    got = {(r.href, r.anchor_text) for r in extract_anchors(pages).collect()}
    assert got == {("/", "home"), ("/about", "about"), (url, "self")}


def test_extract_strips_inner_markup_and_squashes(spark):
    html = (
        '<p><a href="/x"><b>Bold</b>\n  link</a>'
        "<a href='/y'>plain</a>"
        '<a href="/z">a &amp; b</a></p>'
    )
    pages = spark.createDataFrame([("https://h.example/", html)], "url string, html string")
    got = {(r.href, r.anchor_text) for r in extract_anchors(pages).collect()}
    assert got == {("/x", "Bold link"), ("/y", "plain"), ("/z", "a & b")}


def test_resolve_href_forms(spark):
    base = "https://h.example/dir/page?q=1"
    rows = [
        ("https://other.example/abs", "https://other.example/abs"),
        ("//cdn.example/js", "https://cdn.example/js"),
        ("/rooted/path", "https://h.example/rooted/path"),
        ("#frag", "https://h.example/dir/page?q=1"),
        ("relative/leaf", "https://h.example/relative/leaf"),  # documented fallback
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "href string").withColumn(
        "t", resolve_href("href", F.lit(base))
    )
    got = {r.href: r.t for r in df.collect()}
    assert got == dict(rows)
    flags = {
        r.href: r.f
        for r in spark.createDataFrame([(h,) for h, _ in rows], "href string")
        .withColumn("f", is_path_relative("href"))
        .collect()
    }
    assert flags == {
        "https://other.example/abs": False,
        "//cdn.example/js": False,  # protocol-relative resolves exactly, not flagged
        "/rooted/path": False,
        "#frag": False,
        "relative/leaf": True,
    }


def test_rollup_counts_per_target(spark):
    anchors = spark.createDataFrame(
        [
            ("https://t.example/a", "click here"),
            ("https://t.example/a", "click here"),
            ("https://t.example/a", "the a page"),
            ("https://t.example/b", "b"),
        ],
        "target_url string, anchor_text string",
    )
    got = {
        (r.target_url, r.anchor_text): r.n for r in anchor_text_rollup(anchors).collect()
    }
    assert got == {
        ("https://t.example/a", "click here"): 2,
        ("https://t.example/a", "the a page"): 1,
        ("https://t.example/b", "b"): 1,
    }


def test_discover_links_nofollow_gate(spark):
    from web_crawling_prj_spark.functions.text import render_html
    from web_crawling_prj_spark.operators.anchors import discover_links

    u1 = "https://h.example/doc/1?id=1&ref=seed"
    u2 = "https://h.example/doc/2?id=2&ref=seed"
    h1 = render_html("page one body", "en", u1).decode()
    h2 = render_html("page two body", "en", u2).decode() + '<meta name="robots" content="noindex, nofollow">'
    pages = spark.createDataFrame([(u1, h1), (u2, h2)], "url string, html string")
    links = discover_links(pages).collect()
    # page 2 is nofollow → contributes nothing; page 1 → home + about (self dropped)
    assert {(r.src_url, r.target_url, r.anchor_text) for r in links} == {
        (u1, "https://h.example/", "home"),
        (u1, "https://h.example/about", "about"),
    }


def test_reputation_budgets_diversity_not_volume(spark):
    from web_crawling_prj_spark.operators.politeness import reputation_budgets

    edges = spark.createDataFrame(
        # dst 1: three distinct srcs (one duplicated — volume must not count);
        # dst 2: one src; dst 3: self-loop only (never counts)
        [(2, 1), (2, 1), (3, 1), (4, 1), (5, 2), (3, 3)],
        "src long, dst long",
    )
    got = {r.node: (r.in_hosts, r.max_per_round) for r in reputation_budgets(edges).collect()}
    assert got == {1: (3, 120), 2: (1, 80)}  # 40*len(bin(4))=120, 40*len(bin(2))=80


def test_reputation_budget_cap(spark):
    from web_crawling_prj_spark.operators.politeness import reputation_budgets

    edges = spark.range(5000).selectExpr("id AS src", "CAST(0 AS LONG) AS dst")
    row = reputation_budgets(edges, cap=400).first()
    assert row.in_hosts == 4999 and row.max_per_round == 400
