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
