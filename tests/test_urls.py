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


# --- native canonical fast-path ---

_ADVERSARIAL_URLS = [
    "HTTPS://A.example/x",                # uppercase scheme+host
    "https://a.example:443/x",            # default port
    "https://a.example",                  # empty path (canon adds /)
    "https://a.example/a/../b",           # dot segments
    "https://a.example/%2e%2e/x",         # percent-encoded dot segments
    "https://a.example/x?b=1&a=2",        # unsorted query
    "https://a.example/x?a1=5&a=3",       # string-sort trap: tuple order differs
    "https://a.example/x?a=3&a1=5",       # tuple-sorted (identity) version of the trap
    "https://a.example/x#f",              # fragment
    "https://a.example./x",               # trailing-dot host
    "https://user@a.example/x",           # userinfo
    "https://a.example/x?a=%41",          # percent-escape (unreserved: decodes)
    "https://a.example/x?a=&a",           # has_eq tie, canon-stable order first
    "https://a.example/x?a&a=",           # has_eq tie, sorted order
    " https://a.example/x",               # leading whitespace
    "https://a.example/x?",               # empty query
    "https://a.example/x?a=1&&b=2",       # stray &&
    "https://a.example/doc/5?id=5&ref=seed",  # the canonical common shape
    "https://a.example/UPPER/Path?x=Y",   # uppercase path/values are canonical
]


def test_fast_predicate_never_wrong(spark):
    """THE safety law: is_canonical_fast ⟹ canonicalize_url(url) == url.
    (False negatives are allowed — they just take the slow path.)"""
    from web_crawling_prj_spark.functions.urls import canonicalize_url, is_canonical_fast

    df = spark.createDataFrame([(u,) for u in _ADVERSARIAL_URLS], "url string")
    rows = df.withColumn("fast", is_canonical_fast("url")).collect()
    for r in rows:
        if r.fast:
            assert canonicalize_url(r.url) == r.url, f"fast-path lied for {r.url!r}"
    # and it actually fires on the common canonical shapes
    fast_set = {r.url for r in rows if r.fast}
    assert "https://a.example/doc/5?id=5&ref=seed" in fast_set
    assert "https://a.example/x?a=3&a1=5" in fast_set
    assert "https://a.example/UPPER/Path?x=Y" in fast_set
    # and rejects every transforming case
    assert "https://a.example/x?a1=5&a=3" not in fast_set
    assert "HTTPS://A.example/x" not in fast_set


def test_hybrid_equals_pure_udf(spark, sf_dir):
    """Routing equality on adversarial cases AND the full synthetic page-store
    url mix (canonical + messy aliases), plus full fast coverage on the
    canonical synthetic urls."""
    from web_crawling_prj_spark.functions.urls import (
        canonicalize_url_udf,
        canonicalize_urls_hybrid,
        is_canonical_fast,
    )
    from web_crawling_prj_spark.sources.pages_gen import pages_df

    adv = spark.createDataFrame([(u,) for u in _ADVERSARIAL_URLS], "url string")
    pages = pages_df(spark, sf_dir, with_html=False).select("url")
    for df in (adv, pages):
        want = {
            (r.url, r.c)
            for r in df.withColumn("c", canonicalize_url_udf("url")).collect()
        }
        got = {
            (r.url, r.url_canon)
            for r in canonicalize_urls_hybrid(df, "url").collect()
        }
        assert got == want
    # every canonical synthetic url takes the fast path; every alias doesn't
    flagged = pages.withColumn("f", is_canonical_fast("url")).collect()
    for r in flagged:
        assert r.f == r.url.startswith("https://"), r.url


def test_strip_tracking_params(spark):
    from web_crawling_prj_spark.functions.urls import strip_tracking_params

    cases = [
        ("https://a.example/x?utm_source=nl&id=5&utm_campaign=q3", "https://a.example/x?id=5"),
        ("https://a.example/x?UTM_SOURCE=nl", "https://a.example/x"),  # case-insensitive
        ("https://a.example/x?gclid=abc&fbclid=def", "https://a.example/x"),
        ("https://a.example/x?id=5", "https://a.example/x?id=5"),  # untouched
        ("https://a.example/x", "https://a.example/x"),  # no query
        ("https://a.example/x?utm_x=1&a=2#frag", "https://a.example/x?a=2#frag"),
        ("https://a.example/x?utmost=1", "https://a.example/x?utmost=1"),  # not utm_*
        ("https://a.example/x?b=2&mc_eid=7&a=1", "https://a.example/x?b=2&a=1"),  # order kept
        # '?' inside the fragment is NOT a query (SPA hash routes) — untouched
        ("https://a.example/app#/search?q=x", "https://a.example/app#/search?q=x"),
        # real query + fragment that itself contains '?': only the query is cleaned
        ("https://a.example/x?utm_x=1&a=2#/r?utm_y=2", "https://a.example/x?a=2#/r?utm_y=2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string").withColumn(
        "s", strip_tracking_params("url")
    )
    got = {r.url: r.s for r in df.collect()}
    assert got == dict(cases)
