"""Text plane: byte-deterministic HTML→text extraction + text-analysis columns.

Extraction is the engine's per-row invariant (BASELINE.json input_hint): for every
page, ``extract_text(html) == text`` byte-for-byte. The reference's analog is its
deterministic JSON extraction (``dags/data_warehouse/wayfair.init_dag_iload_wayfair.py:80-145``);
here the payload is HTML. The extractor is a pure bytes→str function wrapped in an
Arrow-vectorized pandas UDF — never row-at-a-time Python UDFs.

HTML container format (produced by sources.pages_gen, consumed here):
boilerplate head/nav/header + ``<main>`` holding one ``<p>`` per text line
(HTML-escaped) + footer/script noise. Extraction = unescape(<p> bodies) joined
with "\\n". ``unescape(escape(s)) == s`` and ``"\\n".join(s.split("\\n")) == s``
make the round trip byte-identical.

Text-analysis columns (token count, quality, language ID) are native Column
expressions so they run JVM-side and have exact DuckDB-SQL oracle equivalents.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_MAIN_RE = re.compile(rb"<main>(.*?)</main>", re.DOTALL)
_P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)


def extract_text_bytes(html: bytes | None) -> str | None:
    """Pure extractor: html bytes → body text (byte-identical to the source text)."""
    if html is None:
        return None
    m = _MAIN_RE.search(html)
    if not m:
        return ""
    body = m.group(1).decode("utf-8")
    paras = _P_RE.findall(body)
    return "\n".join(_html.unescape(p) for p in paras)


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_bytes, na_action="ignore")


def render_html(text: str, lang: str, url: str) -> bytes:
    """Deterministic inverse of the extractor (used by the synthetic page store).

    Wraps ``text`` in realistic boilerplate (nav/header/footer/script/style noise)
    so extraction is a non-trivial byte-identity check.
    """
    title = _html.escape(text[:40]) if text else "untitled"
    paras = "".join(f"<p>{_html.escape(line)}</p>" for line in text.split("\n")) if text else ""
    return (
        '<!DOCTYPE html><html lang="{lang}"><head><meta charset="utf-8"/>'
        "<title>{title}</title>"
        '<style>nav a{{color:#345;padding:2px}} footer{{font-size:10px}}</style>'
        '<script>window.__t=[];function trk(x){{window.__t.push(x)}}</script>'
        "</head><body>"
        '<nav><a href="/">home</a><a href="/about">about</a><a href="{url}">self</a></nav>'
        "<header><h1>{title}</h1></header>"
        "<main>{paras}</main>"
        "<footer>&copy; synthetic example corp</footer>"
        '<script>trk("pv")</script>'
        "</body></html>"
    ).format(lang=_html.escape(lang or ""), title=title, url=_html.escape(url), paras=paras).encode("utf-8")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- text analysis (native expressions; oracle-parity SQL in __spark_entry__) ---

def token_count(text: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank."""
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, single punct.

    A cheap proxy for BPE token counts in training-data budgeting.
    """
    return F.regexp_count(_c(text), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


_STOPWORDS = {
    "en": r"(?i)\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"(?i)\b(der|die|das|und|ist|nicht|mit|ein|zu|den)\b",
    "vi": r"(?i)\b(của|và|là|không|người|trong|được|có|cho|này)\b",
    "fr": r"(?i)\b(le|la|les|et|est|une|des|dans|pour|que)\b",
}
_CJK = r"[一-鿿]"


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts (n-gram/stopword heuristic)."""
    t = _c(text)
    scores = {k: F.regexp_count(t, F.lit(pat)) for k, pat in _STOPWORDS.items()}
    scores["zh"] = F.regexp_count(t, F.lit(_CJK))
    return scores


def lang_id(text: Column | str) -> Column:
    """argmax language over marker scores; 'und' when nothing matches.

    Ties break by fixed language order (en, de, vi, fr, zh) — deterministic.
    """
    s = lang_scores(text)
    order = ["en", "de", "vi", "fr", "zh"]
    best = F.greatest(*[s[k] for k in order])
    out = F.lit("und")
    for k in reversed(order):
        out = F.when((best > 0) & (s[k] == best), F.lit(k)).otherwise(out)
    # earlier langs in `order` win ties because later whens wrap earlier ones
    return out


def quality_score(text: Column | str) -> Column:
    """[0,1] doc-quality heuristic: length band + alpha ratio + stopword density.

    Mirrors common webtext-pipeline filters (length, symbol ratio, stopword ratio).
    Pure arithmetic over native regexp counts — exactly reproducible in SQL.
    """
    t = _c(text)
    n = F.length(t)
    alpha = F.regexp_count(t, F.lit(r"[A-Za-z]"))
    stop = F.regexp_count(t, F.lit(_STOPWORDS["en"]))
    toks = token_count(t)
    len_band = F.when((n >= 200) & (n <= 20000), F.lit(1.0)).when(n > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(toks > 0, F.least(F.lit(1.0), stop * 5.0 / toks)).otherwise(F.lit(0.0))
    return F.round((len_band + alpha_ratio + stop_ratio) / 3.0, 6)


def word_bigram_repetition(text: Column | str) -> Column:
    """Gopher/C4-style repetition score: fraction of duplicate word 2-grams,
    ``1 − distinct_bigrams / total_bigrams`` (0 for docs under two tokens).
    High values flag boilerplate/spam for training-data filtering. Native
    HOFs with the token array bound as a lambda variable (text.py HOF cost
    model — captures re-evaluate per element)."""
    toks = F.lower(F.regexp_replace(_c(text), r"[^\p{L}\p{N}]+", " "))
    toks = F.filter(F.split(F.trim(toks), " "), lambda s: s != F.lit(""))

    def rep(t: Column) -> Column:
        n = F.size(t) - 1  # bigram count
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        )
        ratio = F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams).cast("double")
        return F.when(n >= 1, F.round(ratio, 6)).otherwise(F.lit(0.0))

    return F.element_at(F.transform(F.array(toks), rep), 1)


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9() -]{7,}[0-9]"


def count_pii(text: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) — regex counts for the two classic PII families."""
    t = _c(text)
    return (
        F.regexp_count(t, F.lit(PII_EMAIL_RE)),
        F.regexp_count(t, F.lit(PII_PHONE_RE)),
    )


def redact_pii(text: Column | str) -> Column:
    """Replace emails then phone-like spans with typed placeholders — the
    standard pre-training scrub. Pure native regexp_replace (no UDF)."""
    t = F.regexp_replace(_c(text), PII_EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(t, PII_PHONE_RE, "[PHONE]")


def terminal_punct_ratio(text: Column | str) -> Column:
    """C4 line filter signal: fraction of non-blank lines ending in terminal
    punctuation (., !, ?). 0 for documents with no non-blank lines."""
    lines = F.split(_c(text), "\n")
    nonblank = F.filter(lines, lambda x: F.trim(x) != F.lit(""))
    ended = F.filter(nonblank, lambda x: F.trim(x).rlike(r"[.!?]$"))
    return F.round(
        F.when(F.size(nonblank) > 0, F.size(ended) / F.size(nonblank).cast("double")).otherwise(
            F.lit(0.0)
        ),
        6,
    )


#: Gopher rule-7 required stop words (Rae et al. 2021, Appendix A1.1).
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_metrics(text: Column | str) -> dict[str, Column]:
    """The Gopher quality-filter signals (Rae et al. 2021, A1.1), all native
    array/regexp expressions — no Python on the data plane, SQL-replayable.

    Keys: n_words, mean_word_len, symbol_word_ratio, bullet_line_ratio,
    ellipsis_line_ratio, alpha_word_ratio, n_stop_hits. Ratios rounded to 6.
    """
    t = _c(text)
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words).cast("long")
    safe = F.when(n_words > 0, n_words.cast("double"))  # NULL-div guard
    total_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    symbols = F.regexp_count(t, F.lit(r"#|\.\.\.|…")).cast("long")
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != F.lit(""))
    n_lines = F.size(lines)
    safe_lines = F.when(n_lines > 0, n_lines.cast("double"))
    bullets = F.filter(lines, lambda x: F.trim(x).rlike(r"^[•‣▪\-\*]"))
    ellipsis_end = F.filter(lines, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$"))
    alpha_words = F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
            lambda s: F.array_contains(F.transform(words, F.lower), s),
        )
    ).cast("long")
    r6 = lambda c: F.round(F.coalesce(c, F.lit(0.0)), 6)
    return {
        "n_words": n_words,
        "mean_word_len": r6(total_chars / safe),
        "symbol_word_ratio": r6(symbols / safe),
        "bullet_line_ratio": r6(F.size(bullets) / safe_lines),
        "ellipsis_line_ratio": r6(F.size(ellipsis_end) / safe_lines),
        "alpha_word_ratio": r6(F.size(alpha_words) / safe),
        "n_stop_hits": stop_hits,
    }


def gopher_pass(m: dict[str, Column]) -> Column:
    """The conjunctive Gopher gate over gopher_metrics(): word count in
    [50, 100000], mean word length in [3, 10], symbol/word ≤ 0.1, ≤ 90%
    bullet lines, ≤ 30% ellipsis-ended lines, ≥ 80% alphabetic words, and
    ≥ 2 distinct required stop words."""
    return (
        m["n_words"].between(50, 100_000)
        & m["mean_word_len"].between(3.0, 10.0)
        & (m["symbol_word_ratio"] <= 0.1)
        & (m["bullet_line_ratio"] <= 0.9)
        & (m["ellipsis_line_ratio"] <= 0.3)
        & (m["alpha_word_ratio"] >= 0.8)
        & (m["n_stop_hits"] >= 2)
    )


def doc_fingerprint(text: Column | str) -> Column:
    """Exact-duplicate fingerprint: xxhash64 of the raw text (native, 64-bit)."""
    return F.xxhash64(_c(text))


def normalized_fingerprint(text: Column | str) -> Column:
    """Fingerprint robust to case/whitespace: hash of lower+space-collapsed text."""
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(_c(text))), r"\s+", " "))


def winnowing_fingerprints(text: Column | str, k: int = 8, window: int = 4) -> Column:
    """Document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken —
    SIGMOD'03 "local algorithms for document fingerprinting"): hash every
    k-char gram of the whitespace-normalized lowercase text, keep the MINIMUM
    hash of each sliding window of `window` grams, dedupe. Two docs sharing a
    run of ≥ k+window-1 chars are guaranteed to share a fingerprint, so shared
    fingerprints detect PARTIAL overlap (quotes, boilerplate, plagiarism) that
    whole-doc hashing misses, at ~2/(window+1) of the gram count.

    All native expressions (sequence → substring → md5 → slice/min). The gram
    hash is the md5 hex string (lexicographic min ≡ min over any total order),
    chosen over xxhash64 so the DuckDB oracle can reproduce values exactly.

    HOF cost model, engineered around twice: lambda BODIES re-evaluate any
    captured outer expression once per ELEMENT, while HOF arguments and lambda
    variables evaluate once per row. So (a) the normalized text is bound as a
    lambda variable (via a 1-element array transform) before the per-gram
    substring lambda touches it — capturing the regexp_replace expression
    directly would re-normalize the whole doc once per gram, O(len²)/doc; and
    (b) the window-min is a fold of `window` shifted slices of a bound `grams`
    variable, never a per-position lambda slicing a captured gram array.
    """

    def _mins(grams: Column, m: Column) -> Column:
        nwin = F.greatest(m - (window - 1), F.lit(1))
        mins = F.slice(grams, 1, nwin)
        for j in range(1, window):
            # trailing slices may run past the array end; zip_with null-pads and
            # least() ignores nulls, so short docs still get their single window
            mins = F.zip_with(mins, F.slice(grams, j + 1, nwin), lambda a, b: F.least(a, b))
        return F.array_distinct(mins)

    def _fps(t: Column) -> Column:
        m = F.greatest(F.length(t) - (k - 1), F.lit(1))
        grams = F.transform(F.sequence(F.lit(1), m), lambda i: F.md5(F.substring(t, i, F.lit(k))))
        # bind the gram array too: it feeds window+1 slice arguments
        return F.element_at(F.transform(F.array(grams), lambda g: _mins(g, m)), 1)

    norm = F.regexp_replace(F.lower(_c(text)), r"\s+", " ")
    return F.element_at(F.transform(F.array(norm), _fps), 1)


#: phrases that mark an error page served with HTTP 200 (soft 404 — studied
#: in Bar-Yossef et al., "Sic transit gloria telae", WWW 2004). Conservative
#: core set; real deployments learn site-specific templates on top.
_SOFT404_RE = (
    r"(?i)\b(page not found|404 not found|no longer available|"
    r"does not exist|page you requested|nothing was found)\b"
)


def soft404_flag(
    text: Column | str, http_code: Column | str, max_tokens: int = 60
) -> Column:
    """TRUE for pages that return 200 but whose CONTENT is an error page:
    a not-found phrase AND a short body (real articles mentioning the phrase
    are long). NULL text → false. Native regexp + token count."""
    t = _c(text)
    code = F.col(http_code) if isinstance(http_code, str) else http_code
    hit = F.coalesce(t.rlike(_SOFT404_RE), F.lit(False))
    short = F.coalesce(token_count(t) <= max_tokens, F.lit(False))
    return (code == 200) & hit & short


def html_title(html: Column | str) -> Column:
    """``<title>…</title>`` text — entity-unescaped, inner whitespace
    squashed; NULL when the document has no title element. Native."""
    from web_crawling_prj_spark.sources.sitemaps import xml_unescape

    s = _c(html).cast("string")
    raw = F.regexp_extract(s, "(?is)<title[^>]*>(.*?)</title>", 1)
    got = F.trim(F.regexp_replace(xml_unescape(raw), r"\s+", " "))
    return F.when(got != "", got)


def meta_content(html: Column | str, name: str) -> Column:
    """``<meta name="{name}" content="…">`` value (both attribute orders,
    case-insensitive name match) — NULL when absent. Native."""
    s = _c(html).cast("string")
    n = name.lower()
    name_then_content = F.regexp_extract(
        s, f"(?i)<meta[^>]*name=[\"']{n}[\"'][^>]*content=[\"']([^\"']*)[\"']", 1
    )
    content_then_name = F.regexp_extract(
        s, f"(?i)<meta[^>]*content=[\"']([^\"']*)[\"'][^>]*name=[\"']{n}[\"']", 1
    )
    got = F.when(name_then_content != "", name_then_content).otherwise(
        F.when(content_then_name != "", content_then_name)
    )
    return got


def meta_charset(html: Column | str) -> Column:
    """Declared charset: ``<meta charset=…>`` or the legacy http-equiv
    Content-Type form — lowercased, NULL when neither is present."""
    s = _c(html).cast("string")
    direct = F.regexp_extract(s, "(?i)<meta[^>]*charset=[\"']?([A-Za-z0-9_-]+)", 1)
    legacy = F.regexp_extract(
        s,
        "(?i)<meta[^>]*http-equiv=[\"']content-type[\"'][^>]*charset=([A-Za-z0-9_-]+)",
        1,
    )
    got = F.when(direct != "", direct).otherwise(F.when(legacy != "", legacy))
    return F.lower(got)


def meta_robots_directives(html: Column | str) -> Column:
    """The HTML half of the Robots Exclusion Protocol (Google's robots meta
    spec; RFC 9309 covers only robots.txt): directives from
    ``<meta name="robots" content="noindex, nofollow">`` as a lowercased,
    trimmed array — EMPTY array when the tag is absent (absence means all
    defaults allowed, distinct from NULL html → NULL). Feed ``noindex`` to
    corpus filtering and ``nofollow`` to link discovery."""
    content = meta_content(html, "robots")
    arr = F.filter(
        F.transform(F.split(F.lower(content), ","), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    return F.when(_c(html).isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.coalesce(arr, F.array().cast("array<string>"))
    )


def canonical_link(html: Column | str) -> Column:
    """``<link rel="canonical" href="…">`` target from an html document —
    NULL when absent. Native (two regexp_extracts coalesced: attribute
    order is free in HTML, so both ``rel…href`` and ``href…rel`` forms
    match); accepts binary or string html. The canonical link is the
    dedup-ownership signal real crawls honor: all alias URLs of a page
    consolidate onto its declared canonical before the seen-set sees them.
    """
    s = _c(html).cast("string")
    rel_then_href = F.regexp_extract(
        s, "(?i)<link[^>]*rel=[\"']canonical[\"'][^>]*href=[\"']([^\"']*)[\"']", 1
    )
    href_then_rel = F.regexp_extract(
        s, "(?i)<link[^>]*href=[\"']([^\"']*)[\"'][^>]*rel=[\"']canonical[\"']", 1
    )
    got = F.when(rel_then_href != "", rel_then_href).otherwise(
        F.when(href_then_rel != "", href_then_rel)
    )
    return got
