"""Crawl-trap detection / URL-template budgeting laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.traps import (
    cap_trapped_frontier,
    detect_trap_templates,
    url_template,
)


def test_url_template_collapses_volatile_tokens(spark):
    rows = [
        ("https://a.example/item/123?page=45",),
        ("https://a.example/item/999?page=1",),
        ("https://a.example/s/550e8400-e29b-41d4-a716-446655440000",),
        ("https://a.example/s/11112222-3333-4444-5555-666677778888",),
        ("https://a.example/t/deadbeefdeadbeefcafe",),
        ("https://a.example/plain/path",),
        ("https://a.example/plain/path#frag",),
        ("https://B.EXAMPLE/MiXeD/7",),
    ]
    out = [
        r.t
        for r in spark.createDataFrame(rows, "url string")
        .select(url_template("url").alias("t"))
        .collect()
    ]
    assert out[0] == out[1] == "a.example/item/«d»?page=«d»"
    assert out[2] == out[3] == "a.example/s/«u»"
    assert out[4] == "a.example/t/«x»"
    assert out[5] == out[6] == "a.example/plain/path"  # fragment is not URL identity
    assert out[7] == "b.example/mixed/«d»"


def test_detect_trap_templates_counts_and_flags(spark):
    # calendar trap: 50 URLs one template; a normal section: 3 URLs
    urls = [(f"https://t.example/cal?day={i}", 0.5) for i in range(50)] + [
        (f"https://t.example/about/page{i}", 0.9) for i in range(3)
    ]
    df = spark.createDataFrame(urls, "url string, priority double")
    traps = {
        r.template: (r.n_urls, r.is_trap)
        for r in detect_trap_templates(df, max_per_template=10).collect()
    }
    assert traps["t.example/cal?day=«d»"] == (50, True)
    assert traps["t.example/about/page«d»"] == (3, False)


def test_cap_keeps_best_and_passes_clean_through(spark):
    urls = [(f"https://t.example/cal?day={i}", i / 100.0) for i in range(50)] + [
        (f"https://t.example/about/page{i}", 0.9) for i in range(3)
    ]
    df = spark.createDataFrame(urls, "url string, priority double")
    capped = cap_trapped_frontier(df, max_per_template=10)
    rows = capped.collect()
    assert len(rows) == 13  # 10 best of the trap + all 3 clean
    trap_kept = sorted(r.url for r in rows if "cal" in r.url)
    # priority = i/100 → the 10 highest-priority are day=40..49
    assert trap_kept == sorted(f"https://t.example/cal?day={i}" for i in range(40, 50))
    assert capped.columns == df.columns  # no helper columns leak


def test_cap_deterministic_under_partitioning_and_salts(spark):
    urls = [(f"https://t.example/p/{i}", float(i % 7)) for i in range(200)]
    df = spark.createDataFrame(urls, "url string, priority double")
    a = sorted(r.url for r in cap_trapped_frontier(df.repartition(1), max_per_template=20, n_salts=4).collect())
    b = sorted(r.url for r in cap_trapped_frontier(df.repartition(13), max_per_template=20, n_salts=16).collect())
    assert a == b and len(a) == 20


def test_crawl_round_trap_budget_integration(spark, tmp_path, sf_dir):
    """run_crawl with trap_max_per_template: every (round, template) schedules
    at most the cap, cut rows stay pending (crawl keeps progressing)."""
    from web_crawling_prj_spark.operators.traps import url_template
    from web_crawling_prj_spark.plans.crawl_round import CrawlConfig, crawl_store, run_crawl
    from web_crawling_prj_spark.sources.pages_gen import pages_df, robots_df, seeds_df

    pages = pages_df(spark, sf_dir)
    cfg = CrawlConfig(
        num_buckets=4, n_salts=4, max_per_host=25, default_budget=25,
        trap_max_per_template=3,
    )
    cfg.extra["max_doc_id"] = pages.agg(F.max("doc_id")).first()[0] + 1
    store = crawl_store(str(tmp_path / "trap"), cfg)
    stats = run_crawl(spark, store, pages, robots_df(spark), seeds_df(spark, sf_dir), rounds=3, cfg=cfg)
    assert all(s["scheduled"] > 0 for s in stats)
    log = store.read_all(spark, "fetch_log")
    per_tpl = (
        log.withColumn("_tpl", url_template("url_canon"))
        .groupBy("round_id", "_tpl")
        .count()
    )
    over = per_tpl.where(F.col("count") > 3).count()
    assert over == 0, "a template exceeded its per-round trap budget"


def test_precomputed_traps_reused(spark):
    urls = [(f"https://t.example/x/{i}", 0.1) for i in range(30)]
    df = spark.createDataFrame(urls, "url string, priority double")
    traps = detect_trap_templates(df, max_per_template=5)
    out = cap_trapped_frontier(df, max_per_template=5, traps=traps)
    assert out.count() == 5
