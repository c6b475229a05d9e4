"""Anchor-text extraction + aggregation — the link-description signal.

Per-target anchor text is a classic web-corpus artifact (search engines index
it; link-graph datasets like Common Crawl's host graph ship it): the text
INSIDE ``<a href=...>`` on the linking page describes the TARGET page, so the
rollup groups by resolved target URL, not by source.

All native column math (one regexp pass per page, no UDF): extraction pulls
(href, inner-text) from the SAME regex match via two ``regexp_extract_all``
calls over one pattern (identical match order ⇒ ``arrays_zip`` is positional-
safe), inner text is tag-stripped / entity-unescaped / whitespace-squashed,
hrefs resolve against the source URL for the absolute, protocol-relative,
root-relative and fragment cases (the full RFC 3986 relative-path merge lives
in functions.urls.canonicalize_url — path-relative hrefs here fall back to
root-relative and are flagged, so callers can route them through the
canonicalizer if they carry them).

Reference analog: none (the reference fetches known catalog URLs and never
mines links); this is frontier-discovery surface for the Common-Crawl-style
engine — the same edges the WAT export carries, plus their text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from web_crawling_prj_spark.functions.urls import host_of
from web_crawling_prj_spark.sources.sitemaps import xml_unescape

_ANCHOR_RE = "(?s)<a[^>]*href=[\"']([^\"']*)[\"'][^>]*>(.*?)</a>"


def _squash(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def extract_anchors(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, href, anchor_text) — one row per ``<a>`` element.

    ``html_col`` may be binary (UTF-8 decoded) or string. Inner markup is
    stripped (``<b>x</b> y`` → ``x y``), entities unescaped, whitespace
    squashed; href is entity-unescaped (attribute values escape ``&``)."""
    s = F.col(html_col).cast("string")  # binary → UTF-8 string (no-op on string)
    hrefs = F.regexp_extract_all(s, F.lit(_ANCHOR_RE), 1)
    texts = F.regexp_extract_all(s, F.lit(_ANCHOR_RE), 2)
    z = F.explode(F.arrays_zip(hrefs.alias("h"), texts.alias("t"))).alias("a")
    out = pages.select(F.col(url_col).alias("url"), z)
    inner = F.col("a.t")
    return out.select(
        "url",
        xml_unescape(F.col("a.h")).alias("href"),
        _squash(xml_unescape(F.regexp_replace(inner, "<[^>]*>", " "))).alias("anchor_text"),
    )


def resolve_href(href: Column | str, base_url: Column | str) -> Column:
    """Absolute target URL for the common href forms:

    - absolute (``scheme://...``): unchanged;
    - protocol-relative (``//host/...``): base scheme + href;
    - root-relative (``/path``): base scheme://host + href;
    - fragment-only (``#x``): the base URL sans fragment;
    - anything else (path-relative): root-relative FALLBACK — full dot-segment
      merge is canonicalize_url's job; see is_path_relative to route these.
    """
    h = F.col(href) if isinstance(href, str) else href
    b = F.col(base_url) if isinstance(base_url, str) else base_url
    scheme = F.lower(F.regexp_extract(b, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    origin = F.concat(scheme, F.lit("://"), host_of(b))
    return (
        F.when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .when(h.startswith("#"), F.regexp_replace(b, "#.*$", ""))
        .otherwise(F.concat(origin, F.lit("/"), h))
    )


def is_path_relative(href: Column | str) -> Column:
    h = F.col(href) if isinstance(href, str) else href
    return ~(
        h.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
        | h.startswith("/")
        | h.startswith("#")
    )


def discover_links(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Frontier candidates from REAL html: (src_url, target_url, anchor_text).

    The REP-compliant discovery path a non-synthetic crawl plugs into the
    round loop: pages whose robots META carries ``nofollow`` (or ``none``)
    contribute NO links at all; hrefs resolve against the source URL;
    self-loops and fragment-only self references drop. Canonicalization and
    seen-dedup stay downstream (frontier_from_seeds / anti_join_seen)."""
    from web_crawling_prj_spark.functions.text import meta_robots_directives

    d = meta_robots_directives(html_col)
    nofollow = F.coalesce(
        F.array_contains(d, "nofollow") | F.array_contains(d, "none"), F.lit(False)
    )
    followable = pages.where(~nofollow)
    anchors = extract_anchors(followable, html_col=html_col, url_col=url_col)
    resolved = anchors.withColumn("target_url", resolve_href("href", "url"))
    return (
        resolved.where(F.col("target_url") != F.col("url"))
        .select(F.col("url").alias("src_url"), "target_url", "anchor_text")
    )


def anchor_text_rollup(
    anchors: DataFrame, target_col: str = "target_url", text_col: str = "anchor_text"
) -> DataFrame:
    """(target_url, anchor_text, n) — per-target description corpus. One
    count-only groupBy (map-side combinable; a hot target is the best-
    combining key, same argument as the trap-template counter)."""
    return (
        anchors.groupBy(F.col(target_col), F.col(text_col))
        .agg(F.count("*").cast("long").alias("n"))
    )
