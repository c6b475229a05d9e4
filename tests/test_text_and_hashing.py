from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from web_crawling_prj_spark.functions.hashing import md5_row_hash, url_hash, variation_key
from web_crawling_prj_spark.functions.text import (
    extract_text_bytes,
    extract_text_udf,
    lang_id,
    render_html,
    token_count,
)

SAMPLES = [
    ("hello world\nsecond <p>ara & more", "en"),
    ("übergröße & <script>alert('x')</script>", "de"),
    ("中文文本，带标点。", "zh"),
    ("", ""),
    ("tab\tand  spaces", "en"),
]


def test_render_extract_roundtrip_bytes():
    for text, lang in SAMPLES:
        html = render_html(text, lang, "https://h.example/x")
        assert extract_text_bytes(html) == text


def test_extract_udf_byte_identity(spark):
    rows = [(render_html(t, la, "https://h/x"), t) for t, la in SAMPLES]
    df = spark.createDataFrame(rows, "html binary, expected string")
    got = df.select(extract_text_udf("html").alias("t"), "expected").collect()
    for r in got:
        assert r.t == r.expected


def test_extract_no_main():
    assert extract_text_bytes(b"<html><body>junk</body></html>") == ""
    assert extract_text_bytes(None) is None


def test_md5_row_hash_reference_parity(spark):
    # reference: md5('_'.join(str(row[col]))) — data_loader.py:393-402
    df = spark.createDataFrame([("s1", 2.5, None)], "sku string, price double, note string")
    got = df.select(md5_row_hash(["sku", "price", "note"]).alias("h")).first().h
    expected = hashlib.md5("_".join([str("s1"), str(2.5), str(None)]).encode()).hexdigest()
    assert got == expected


def test_url_hash_salted_stable(spark):
    df = spark.createDataFrame([("https://a.example/",)], ["u"])
    h1 = df.select(url_hash("u").alias("h")).first().h
    h2 = df.select(url_hash("u").alias("h")).first().h
    h3 = df.select(url_hash("u", salt="other").alias("h")).first().h
    assert h1 == h2 and h1 != h3


def test_variation_key(spark):
    # reference _get_variation_key: "{sku}_{opt1}_{opt2}" (wayfair_service.py:166-194)
    df = spark.createDataFrame([("W123", ["Blue", "King"])], "sku string, options array<string>")
    assert df.select(variation_key("sku", "options").alias("k")).first().k == "W123_Blue_King"


def test_token_count_and_lang(spark):
    df = spark.createDataFrame(
        [("the cat and the hat is in the house", "en"), ("der hund ist nicht da und", "de"), ("", "und")],
        "text string, want string",
    )
    rows = df.select(token_count("text").alias("n"), lang_id("text").alias("l"), "want").collect()
    assert rows[0].n == 9 and rows[0].l == "en"
    assert rows[1].l == "de"
    assert rows[2].n == 0 and rows[2].l == "und"


def test_pages_gen_deterministic(spark, sf_dir):
    from web_crawling_prj_spark.sources.pages_gen import pages_df, robots_df, seeds_df

    p1 = pages_df(spark, sf_dir)
    p2 = pages_df(spark, sf_dir)
    chk = F.sum(F.xxhash64("url", "text", "lang").cast("decimal(38,0)")).alias("s")
    c1 = p1.select(chk).first().s
    c2 = p2.select(chk).first().s
    assert c1 == c2 and p1.count() > 0
    # html roundtrip on generated pages: extract == stored text, byte-for-byte
    bad = (
        p1.limit(200)
        .withColumn("ex", extract_text_udf("html"))
        .where(~F.col("ex").eqNullSafe(F.col("text")))
        .count()
    )
    assert bad == 0
    assert seeds_df(spark, sf_dir).count() > 0
    assert robots_df(spark).count() == 97


def test_canonical_link_extraction(spark):
    from pyspark.sql import functions as F

    from web_crawling_prj_spark.functions.text import canonical_link

    cases = [
        ('<head><link rel="canonical" href="https://x/1"/></head>', "https://x/1"),
        ('<head><link href="https://x/2" rel="canonical"/></head>', "https://x/2"),
        ("<head><link rel='canonical' href='https://x/3'/></head>", "https://x/3"),
        ('<head><link rel="stylesheet" href="https://x/css"/></head>', None),
        ("<head></head>", None),
        # HTML is case-insensitive: uppercase tag/attr forms still match
        ('<head><LINK REL="Canonical" HREF="https://x/4"/></head>', "https://x/4"),
        ("<head><link HREF='https://x/5' Rel='CANONICAL'/></head>", "https://x/5"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "html string")
    got = [r["c"] for r in df.select(canonical_link("html").alias("c")).collect()]
    assert got == [w for _, w in cases]
    # binary html (the pages-table shape) decodes transparently
    b = spark.createDataFrame([(cases[0][0].encode(),)], "html binary")
    assert b.select(canonical_link("html").alias("c")).first()["c"] == "https://x/1"


def test_gopher_metrics_and_gate(spark):
    from pyspark.sql import functions as F

    from web_crawling_prj_spark.functions.text import gopher_metrics, gopher_pass

    good = "the data " + "pipeline runs well and we have results to share with care " * 6
    cases = [
        (0, good),                                # passes every rule
        (1, "too short to have the words"),       # < 50 words
        (2, good + " " + "# " * 30),              # symbol ratio > 0.1
        (3, good + "\n- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"),  # >90% bullets
        (4, good + "\nwait...\nmore...\nsoon..."),  # >30% ellipsis-ended lines
        (5, good + " " + "12345 " * 80),          # alpha ratio < 0.8
        (6, "zz " * 60),                          # no required stop words
    ]
    df = spark.createDataFrame(cases, "i long, text string")
    m = gopher_metrics(F.col("text"))
    out = {
        r.i: r
        for r in df.select("i", *[c.alias(k) for k, c in m.items()],
                           gopher_pass(m).alias("p")).collect()
    }
    assert out[0].p is True
    assert out[1].p is False and out[1].n_words < 50
    assert out[2].p is False and out[2].symbol_word_ratio > 0.1
    assert out[3].p is False and out[3].bullet_line_ratio > 0.9
    assert out[4].p is False and out[4].ellipsis_line_ratio > 0.3
    assert out[5].p is False and out[5].alpha_word_ratio < 0.8
    assert out[6].p is False and out[6].n_stop_hits == 0
    # metric spot checks on the clean doc
    r0 = out[0]
    words = good.split()
    assert r0.n_words == len(words)
    assert r0.mean_word_len == round(sum(map(len, words)) / len(words), 6)
    assert r0.alpha_word_ratio == 1.0 and r0.n_stop_hits >= 2
