"""Focused-crawl (WWW'99) relevance blending: operator math + crawl-loop
integration laws."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.focus import (
    SATURATION,
    blend_child_priority,
    page_relevance,
)


def test_page_relevance_saturated_and_absent_for_no_hits(spark):
    pages = spark.createDataFrame(
        [
            (1, "spark spark window join"),
            (2, "nothing relevant here"),
            (3, None),
        ],
        "url_hash long, extracted_text string",
    )
    rel = {r.url_hash: r.relevance for r in page_relevance(pages, ["spark", "join"]).collect()}
    assert set(rel) == {1}  # no-hit and NULL-text parents are absent
    assert 0.0 < rel[1] < 1.0


def test_blend_child_priority_math(spark):
    parent_rel = spark.createDataFrame(
        [(100, 0.5)], "url_hash long, relevance double"
    )
    discovered = spark.createDataFrame(
        [
            ("a", 0.8, 100),   # child of the relevant parent
            ("b", 0.8, 200),   # parent unknown -> blends relevance 0
            ("c", 0.8, None),  # no lineage -> blends relevance 0
        ],
        "url string, priority double, src_url_hash long",
    )
    out = {
        r.url: r.priority
        for r in blend_child_priority(discovered, parent_rel, weight=0.4).collect()
    }
    assert out["a"] == round(0.6 * 0.8 + 0.4 * 0.5, 6)
    assert out["b"] == out["c"] == round(0.6 * 0.8, 6)
    assert set(out) == {"a", "b", "c"}  # rows preserved


def test_relevance_matches_bm25_saturation(spark):
    """rel = s/(s+SAT) with s = round(bm25, 6) — pinned against the scorer."""
    from web_crawling_prj_spark.operators.relevance import bm25_scores

    pages = spark.createDataFrame(
        [(1, "spark window spark"), (2, "join the window")],
        "url_hash long, extracted_text string",
    )
    terms = ["spark", "window"]
    raw = {
        r.url_hash: r.score
        for r in bm25_scores(pages, "url_hash", "extracted_text", terms).collect()
    }
    rel = {r.url_hash: r.relevance for r in page_relevance(pages, terms).collect()}
    for k, s in raw.items():
        s6 = round(s, 6)
        assert math.isclose(rel[k], s6 / (s6 + SATURATION), rel_tol=1e-12)


def test_crawl_focus_integration(spark, tmp_path, sf_dir):
    """run_crawl with a focus config: (a) deterministic across runs, (b) the
    blend is live — discovered-row priorities differ from the unfocused run
    and stay in [0, 1]."""
    from web_crawling_prj_spark.plans.crawl_round import CrawlConfig, crawl_store, run_crawl
    from web_crawling_prj_spark.sources.pages_gen import pages_df, robots_df, seeds_df

    pages = pages_df(spark, sf_dir)

    def run(name, **kw):
        cfg = CrawlConfig(
            num_buckets=4, n_salts=4, max_per_host=25, default_budget=25, **kw
        )
        cfg.extra["max_doc_id"] = pages.agg(F.max("doc_id")).first()[0] + 1
        store = crawl_store(str(tmp_path / name), cfg)
        run_crawl(spark, store, pages, robots_df(spark), seeds_df(spark, sf_dir), rounds=3, cfg=cfg)
        log = store.read_all(spark, "fetch_log").select(
            "round_id", "url_canon", "attempt", "http_code"
        )
        frontier = store.read_all(spark, "frontier_log").select(
            "url_canon", "priority", "src_url_hash"
        )
        nonesafe = lambda row: tuple((x is None, x) for x in row)
        return (
            sorted(map(tuple, log.collect()), key=nonesafe),
            sorted(map(tuple, frontier.collect()), key=nonesafe),
        )

    focus = dict(focus_terms=("spark", "window", "join"), focus_weight=0.6)
    log_a, fr_a = run("focus_a", **focus)
    log_b, fr_b = run("focus_b", **focus)
    assert log_a == log_b and fr_a == fr_b  # determinism with the blend on

    log_off, fr_off = run("focus_off")
    assert fr_a != fr_off  # the blend actually changed discovered priorities
    # every discovered row's blended priority is a valid rounded score
    for _, prio, src in fr_a:
        if src is not None and prio is not None:
            assert 0.0 <= prio <= 1.0
            assert prio == round(prio, 6)
