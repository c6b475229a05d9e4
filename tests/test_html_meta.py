"""HTML metadata extraction: title, meta charset, robots meta directives."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawling_prj_spark.functions.text import (
    html_title,
    meta_charset,
    meta_content,
    meta_robots_directives,
    render_html,
)


def _df(spark, html):
    data = [(bytearray(html) if isinstance(html, bytes) else html,)]
    typ = "binary" if isinstance(html, bytes) else "string"
    return spark.createDataFrame(data, f"html {typ}")


def test_title_and_charset_from_rendered_page(spark):
    html = render_html("some body text for the page", "en", "https://h.example/x")
    row = (
        _df(spark, html)
        .select(html_title("html").alias("t"), meta_charset("html").alias("c"))
        .first()
    )
    assert row.t == "some body text for the page"  # first 40 chars, unescaped
    assert row.c == "utf-8"


def test_title_unescapes_and_squashes(spark):
    row = (
        _df(spark, "<html><head><title>  A &amp; B\n  story </title></head></html>")
        .select(html_title("html").alias("t"))
        .first()
    )
    assert row.t == "A & B story"
    assert _df(spark, "<html><body>no title</body></html>").select(
        html_title("html").alias("t")
    ).first().t is None


def test_meta_content_both_attribute_orders(spark):
    a = '<meta name="description" content="hello world">'
    b = '<meta content="hello world" name="description">'
    for h in (a, b):
        assert (
            _df(spark, f"<html><head>{h}</head></html>")
            .select(meta_content("html", "description").alias("d"))
            .first()
            .d
            == "hello world"
        )


def test_meta_charset_legacy_form(spark):
    h = '<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">'
    assert (
        _df(spark, f"<html><head>{h}</head></html>")
        .select(meta_charset("html").alias("c"))
        .first()
        .c
        == "iso-8859-1"
    )


def test_robots_directives_parse_absent_and_null(spark):
    rows = [
        ('<meta name="robots" content="NOINDEX, nofollow ">', ["noindex", "nofollow"]),
        ('<meta name="ROBOTS" content="none">', ["none"]),
        ("<html><head></head></html>", []),  # absent tag → empty (defaults allowed)
    ]
    for h, want in rows:
        got = (
            _df(spark, f"<html><head>{h}</head></html>" if "<html" not in h else h)
            .select(meta_robots_directives("html").alias("d"))
            .first()
            .d
        )
        assert got == want, (h, got)
    # NULL html → NULL (unknown), not empty
    null_row = spark.createDataFrame([(None,)], "html string").select(
        meta_robots_directives("html").alias("d")
    ).first()
    assert null_row.d is None


def test_soft404_flag(spark):
    from web_crawling_prj_spark.functions.text import soft404_flag

    rows = [
        (1, "Page Not Found — the page you requested does not exist.", 200, True),
        (2, "perfectly normal article " * 5, 200, False),
        (3, "page not found", 404, False),  # real 404 is not a SOFT 404
        (4, "a very long editorial about how 'page not found' errors feel "
            + "word " * 100, 200, False),  # long body → real content
        (5, None, 200, False),
    ]
    df = spark.createDataFrame(
        [(i, t, c) for i, t, c, _ in rows], "doc_id long, text string, http_code int"
    ).withColumn("flag", soft404_flag("text", "http_code"))
    got = {r.doc_id: r.flag for r in df.collect()}
    assert got == {i: want for i, _, _, want in rows}
