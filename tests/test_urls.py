from __future__ import annotations

import pytest

from web_crawling_prj_spark.functions.urls import canonicalize_url, canonicalize_url_udf, host_of, url_depth

CASES = [
    # scheme/host case, default port
    ("HTTPS://Host-0001.Example:443/doc/5?id=5", "https://host-0001.example/doc/5?id=5"),
    ("http://a.example:80/x", "http://a.example/x"),
    ("http://a.example:8080/x", "http://a.example:8080/x"),
    # fragment stripped
    ("https://a.example/p#frag", "https://a.example/p"),
    # dot segments
    ("https://a.example/doc/../doc/5", "https://a.example/doc/5"),
    ("https://a.example/a/./b/../c", "https://a.example/a/c"),
    ("https://a.example/../x", "https://a.example/x"),
    # empty path
    ("https://a.example", "https://a.example/"),
    ("https://a.example?q=1", "https://a.example/?q=1"),
    # query sorting + empty pair handling
    ("https://a.example/p?b=2&a=1", "https://a.example/p?a=1&b=2"),
    ("https://a.example/p?b=2&&a=1", "https://a.example/p?a=1&b=2"),
    ("https://a.example/p?flag&a=1", "https://a.example/p?a=1&flag"),
    ("https://a.example/p?a=", "https://a.example/p?a="),
    # percent normalization: uppercase hex, decode unreserved
    ("https://a.example/p%61th?x=%7e", "https://a.example/path?x=~"),
    ("https://a.example/%2Fkeep?x=%2f", "https://a.example/%2Fkeep?x=%2F"),
    # trailing host dot
    ("https://a.example./p", "https://a.example/p"),
    # idempotence guard inputs
    ("https://host-0000.example/doc/1?id=1&ref=seed", "https://host-0000.example/doc/1?id=1&ref=seed"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_canonicalize_cases(raw, expected):
    assert canonicalize_url(raw) == expected


def test_canonicalize_idempotent():
    for raw, _ in CASES:
        c = canonicalize_url(raw)
        assert canonicalize_url(c) == c


def test_canonicalize_none_empty():
    assert canonicalize_url(None) is None
    assert canonicalize_url("") == ""


def test_udf_matches_python(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = [r.c for r in df.select(canonicalize_url_udf("url").alias("c")).collect()]
    assert got == [e for _, e in CASES]


def test_host_and_depth(spark):
    df = spark.createDataFrame(
        [("https://host-0001.example/a/b/c?x=1",), ("https://h.example/",)], ["url"]
    )
    rows = df.select(host_of("url").alias("h"), url_depth("url").alias("d")).collect()
    assert rows[0].h == "host-0001.example" and rows[0].d == 3
    assert rows[1].h == "h.example" and rows[1].d == 0


@pytest.mark.parametrize(
    "host, want",
    [
        ("www.example.com", "example.com"),
        ("a.b.shop.example.co.uk", "example.co.uk"),
        ("EXAMPLE.co.uk.", "example.co.uk"),  # case + trailing-dot FQDN
        ("example.com", "example.com"),
        ("co.uk", "co.uk"),            # bare public suffix passes through
        ("localhost", "localhost"),    # single label (ANSI-safe: F.get, not element_at)
        ("deep.sub.host.com.au", "host.com.au"),
        ("x.co.jp", "x.co.jp"),        # already exactly eTLD+1
    ],
)
def test_registrable_domain(spark, host, want):
    from pyspark.sql import functions as F

    from web_crawling_prj_spark.functions.urls import registrable_domain

    df = spark.createDataFrame([(host,)], "h string")
    assert df.select(registrable_domain("h").alias("d")).first()["d"] == want
