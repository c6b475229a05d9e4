"""Adaptive recrawl laws: doubling on unchanged, reset on change, cap,
partition-independence, and the due-set pick."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.recrawl import due_for_refetch, recrawl_schedule


def _hist(spark, fps, key="u"):
    t0 = dt.datetime(2026, 1, 1)
    rows = [(key, i, t0 + dt.timedelta(hours=i), fp) for i, fp in enumerate(fps)]
    return spark.createDataFrame(rows, "page string, seq int, ts timestamp, content_fp int")


def _sched(df, **kw):
    return recrawl_schedule(
        df, key="page", ts="ts", fingerprint="content_fp", tiebreak="seq", **kw
    )


def test_intervals_double_then_reset_then_cap(spark):
    # fp: change, same, same, CHANGE, same ×8 (cap at 2^6)
    fps = [1, 1, 1, 2] + [2] * 8
    out = _sched(_hist(spark, fps)).orderBy("seq").collect()
    assert [r["changed"] for r in out] == [True, False, False, True] + [False] * 8
    assert [r["unchanged_streak"] for r in out] == [0, 1, 2, 0, 1, 2, 3, 4, 5, 6, 7, 8]
    assert [r["interval_h"] for r in out] == [1.0, 2.0, 4.0, 1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 64.0, 64.0]
    # next_fetch_ts = ts + interval
    for r in out:
        assert (r["next_fetch_ts"] - r["ts"]).total_seconds() == r["interval_h"] * 3600


def test_schedule_is_partitioning_independent(spark):
    fps = [1, 2, 2, 3, 3, 3, 1]
    a = _sched(_hist(spark, fps)).orderBy("seq").collect()
    b = _sched(_hist(spark, fps).repartition(7)).orderBy("seq").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_schedule_is_one_shuffle(spark):
    plan = _sched(_hist(spark, [1, 1, 2]))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one window partitioning, reused


def test_refresh_mode_frontier_from_committed_crawl(spark, tmp_path):
    """Freshness mode over a real committed crawl: due pages come back as
    frontier rows (attempt reset, deadline as next_eligible_ts), all of them
    previously-fetched ok pages."""
    from web_crawling_prj_spark.plans.crawl_round import (
        CrawlConfig,
        crawl_store,
        refresh_mode_frontier,
        run_crawl,
    )
    from web_crawling_prj_spark.sources.pages_gen import pages_df, robots_df, seeds_df

    sf = "/root/testdata/sf0.001"
    pages, seeds, robots = pages_df(spark, sf), seeds_df(spark, sf), robots_df(spark)
    cfg = CrawlConfig(num_buckets=4)
    store = crawl_store(str(tmp_path / "store"), cfg)
    run_crawl(spark, store, pages, robots, seeds, rounds=2, cfg=cfg)

    # far future → every ok-fetched page is due exactly once
    far = refresh_mode_frontier(spark, store, "2030-01-01 00:00:00")
    ok_urls = {
        r["url_hash"]
        for r in store.read_all(spark, "fetch_log")
        .where(F.col("error_class") == "ok")
        .select("url_hash")
        .distinct()
        .collect()
    }
    rows = far.collect()
    assert {r["url_hash"] for r in rows} == ok_urls
    assert len(rows) == len(ok_urls)  # one frontier row per page
    assert all(r["attempt"] == 0 for r in rows)
    assert all(r["next_eligible_ts"] is not None for r in rows)
    # just after the crawl, nothing has aged past its first-interval deadline
    cfg_ts = cfg.round_ts(2)
    soon = refresh_mode_frontier(spark, store, cfg_ts)
    assert soon.count() <= len(ok_urls)


def test_due_for_refetch_latest_row_and_deadline(spark):
    # two pages: "hot" changes every fetch (short intervals — due soon),
    # "cold" never changes (long interval — not yet due)
    hot = _hist(spark, [1, 2, 3], key="hot")
    cold = _hist(spark, [5, 5, 5, 5, 5, 5], key="cold")
    sched = _sched(hot.unionByName(cold))
    # hot's latest: ts=2h, interval 1h → due at 3h; cold's latest: ts=5h,
    # streak 5 → interval 32h → due at 37h
    due_at_4h = due_for_refetch(sched, key="page", ts="ts", now="2026-01-01 04:00:00")
    assert [r["page"] for r in due_at_4h.collect()] == ["hot"]
    due_at_38h = due_for_refetch(sched, key="page", ts="ts", now="2026-01-02 14:00:00")
    assert sorted(r["page"] for r in due_at_38h.collect()) == ["cold", "hot"]
    # exactly one row per due page, and it is the LATEST fetch's row
    r = {x["page"]: x for x in due_at_38h.collect()}
    assert r["hot"]["seq"] == 2 and r["cold"]["seq"] == 5
