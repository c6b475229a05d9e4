from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from web_crawling_prj_spark.plans.crawl_round import (
    CrawlConfig,
    crawl_store,
    frontier_from_seeds,
    run_crawl,
)
from web_crawling_prj_spark.plans.statestore import StateStore
from web_crawling_prj_spark.sources.pages_gen import pages_df, robots_df, seeds_df


@pytest.fixture(scope="module")
def crawl_inputs(spark, sf_dir):
    pages = pages_df(spark, sf_dir).cache()
    robots = robots_df(spark)
    seeds = seeds_df(spark, sf_dir)
    max_doc = pages.agg(F.max("doc_id")).first()[0] + 1
    cfg = CrawlConfig(num_buckets=8, n_salts=4, max_per_host=25, default_budget=25)
    cfg.extra["max_doc_id"] = max_doc
    yield pages, robots, seeds, cfg
    pages.unpersist()


def _final_state(store, spark):
    seen = store.read_all(spark, "seen_delta")
    log = store.read_all(spark, "fetch_log")
    seen_set = frozenset(r.url_hash for r in seen.collect()) if seen is not None else frozenset()
    sched_order = (
        tuple(
            (r.round_id, r.host, r.url_hash)
            for r in log.orderBy("round_id", "host", "url_hash").collect()
        )
        if log is not None
        else ()
    )
    return seen_set, sched_order


def test_frontier_from_seeds_dedups(spark, sf_dir):
    seeds = seeds_df(spark, sf_dir)
    f = frontier_from_seeds(seeds)
    assert f.count() == f.select("url_hash").distinct().count()
    assert f.count() < seeds.count()  # duplicate seeds collapsed


def test_three_rounds_end_to_end(spark, tmp_path, crawl_inputs):
    pages, robots, seeds, cfg = crawl_inputs
    store = crawl_store(str(tmp_path / "s1"), cfg)
    stats = run_crawl(spark, store, pages, robots, seeds, rounds=3, cfg=cfg)
    assert [s["round_id"] for s in stats] == [1, 2, 3]
    assert all(s["scheduled"] > 0 for s in stats)
    assert sum(s["ok"] for s in stats) > 0

    # no URL fetched twice with status ok∪exhausted (seen-set monotone, no dup fetch)
    log = store.read_all(spark, "fetch_log")
    dup = (
        log.where(~F.col("can_retry"))
        .groupBy("url_hash")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert dup == 0

    # extraction invariant: every ok fetch has byte-identical text to the store
    joined = (
        log.where(F.col("error_class") == "ok")
        .join(pages.select(F.col("url").alias("url_canon"), "text"), "url_canon")
        .where(~F.col("extracted_text").eqNullSafe(F.col("text")))
    )
    assert joined.count() == 0

    # per-partition metrics landed
    metrics = store.read_all(spark, "metrics")
    assert metrics.where(F.col("scheduled_cnt") > 0).count() > 0


def test_kill_resume_reproduces_state(spark, tmp_path, crawl_inputs):
    pages, robots, seeds, cfg = crawl_inputs
    a = crawl_store(str(tmp_path / "a"), cfg)
    run_crawl(spark, a, pages, robots, seeds, rounds=3, cfg=cfg)

    # "killed" run: stop after round 1, then resume to 3
    b = crawl_store(str(tmp_path / "b"), cfg)
    run_crawl(spark, b, pages, robots, seeds, rounds=1, cfg=cfg)
    # simulate orphan garbage from a kill mid-round-2 (data written, no manifest)
    orphan = b.root + "/frontier_log/round=000002"
    store_df = b.read_round(spark, "frontier_log", 1).limit(3)
    store_df.write.mode("overwrite").parquet(orphan)
    run_crawl(spark, b, pages, robots, seeds, rounds=3, cfg=cfg)

    assert _final_state(a, spark) == _final_state(b, spark)
    shutil.rmtree(str(tmp_path / "a"))
    shutil.rmtree(str(tmp_path / "b"))


def test_determinism_across_parallelism(spark, tmp_path, crawl_inputs):
    """Same crawl at shuffle.partitions=3 vs 8 → identical schedule + seen set."""
    pages, robots, seeds, cfg = crawl_inputs
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        s3 = crawl_store(str(tmp_path / "p3"), cfg)
        run_crawl(spark, s3, pages, robots, seeds, rounds=2, cfg=cfg)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        s8 = crawl_store(str(tmp_path / "p8"), cfg)
        run_crawl(spark, s8, pages, robots, seeds, rounds=2, cfg=cfg)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert _final_state(s3, spark) == _final_state(s8, spark)


def test_robots_and_budget_invariants(spark, tmp_path, crawl_inputs):
    pages, robots, seeds, cfg = crawl_inputs
    store = crawl_store(str(tmp_path / "inv"), cfg)
    run_crawl(spark, store, pages, robots, seeds, rounds=2, cfg=cfg)
    log = store.read_all(spark, "fetch_log")

    # politeness: per (round, host) scheduled count ≤ budget
    from web_crawling_prj_spark.operators.politeness import host_budgets

    budgets = host_budgets(robots, cfg.round_duration_ms, max_per_host=cfg.max_per_host)
    over = (
        log.groupBy("round_id", "host")
        .agg(F.count("*").alias("n"))
        .join(budgets, "host", "left")
        .where(F.col("n") > F.coalesce("max_per_round", F.lit(cfg.default_budget)))
    )
    assert over.count() == 0

    # robots: nothing fetched from a disallowed path
    from web_crawling_prj_spark.operators.robots import path_of, robots_allows

    fetched = log.join(F.broadcast(robots), "host", "left")
    viol = fetched.where(~robots_allows(path_of("url_canon"), F.col("disallow_prefixes")))
    assert viol.count() == 0


def test_failed_mode_frontier(spark, tmp_path, crawl_inputs):
    from web_crawling_prj_spark.plans.crawl_round import failed_mode_frontier

    pages, robots, seeds, cfg = crawl_inputs
    store = crawl_store(str(tmp_path / "fm"), cfg)
    run_crawl(spark, store, pages, robots, seeds, rounds=2, cfg=cfg)
    fm = failed_mode_frontier(spark, store)
    rows = fm.collect()
    assert len(rows) > 0  # unknown seeds 404 permanently
    assert all(r.attempt == 0 and r.next_eligible_ts is None for r in rows)
    # every failed-mode url really is a permanent failure in the log
    log = store.read_all(spark, "fetch_log")
    perm = {
        r.url_hash
        for r in log.where((F.col("error_class") != "ok") & (~F.col("can_retry"))).collect()
    }
    assert {r.url_hash for r in rows} <= perm


def test_pagerank_priority_round(spark, tmp_path, crawl_inputs):
    import dataclasses

    pages, robots, seeds, cfg = crawl_inputs
    cfg2 = dataclasses.replace(cfg, pagerank_weight=0.4)
    cfg2.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    store = crawl_store(str(tmp_path / "pr"), cfg)
    stats = run_crawl(spark, store, pages, robots, seeds, rounds=3, cfg=cfg2)
    assert all(s["scheduled"] > 0 for s in stats)
    # determinism holds with pagerank enabled
    store2 = crawl_store(str(tmp_path / "pr2"), cfg)
    run_crawl(spark, store2, pages, robots, seeds, rounds=3, cfg=cfg2)
    assert _final_state(store, spark) == _final_state(store2, spark)


def test_pagerank_refresh_cadence_commits_and_reuses_scores(spark, tmp_path, crawl_inputs):
    """pagerank_every=3: scores are recomputed (and committed as a
    `pagerank_scores` table) only on refresh rounds — round 2 (first round
    with lineage) and round 5 — while the rounds between blend the committed
    scores without touching the fetch_log history. The refresh schedule is a
    pure function of committed state, so a rerun lands on the same rounds
    and the crawl stays deterministic."""
    import dataclasses

    pages, robots, seeds, cfg = crawl_inputs
    cfg2 = dataclasses.replace(cfg, pagerank_weight=0.4, pagerank_every=3)
    cfg2.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    store = crawl_store(str(tmp_path / "prk"), cfg)
    stats = run_crawl(spark, store, pages, robots, seeds, rounds=6, cfg=cfg2)
    assert all(s["scheduled"] > 0 for s in stats)
    refreshed = [
        r for r in store.committed_rounds() if "pagerank_scores" in store.manifest(r)["tables"]
    ]
    assert refreshed == [2, 5]
    # retention: the round-5 refresh reaps the superseded round-2 score dir —
    # score storage is O(graph), not O(refreshes·graph)
    retained = [r for r in store.committed_rounds() if store.has_table("pagerank_scores", r)]
    assert retained == [5]
    scores = store.read_round(spark, "pagerank_scores", 5)
    assert scores.columns == ["url_hash", "_prn"]
    assert scores.count() > 0
    # determinism across reruns (the reuse path is exercised on rounds 3-4/6)
    store2 = crawl_store(str(tmp_path / "prk2"), cfg)
    run_crawl(spark, store2, pages, robots, seeds, rounds=6, cfg=cfg2)
    assert _final_state(store, spark) == _final_state(store2, spark)


def test_robots_refresh_blocks_host_next_round(spark, tmp_path, crawl_inputs):
    """C13: the between-rounds robots_source hook — a host whose robots.txt
    turns to Disallow:/ after round 1 is scheduled in round 1 but never again."""
    from web_crawling_prj_spark.sources.pages_gen import robots_txt_df

    pages, robots, seeds, cfg = crawl_inputs
    hot = "host-0000.example"

    def robots_source(s, round_id):
        raw = robots_txt_df(s)
        if round_id <= 1:
            return raw
        hostile = F.when(
            F.col("host") == hot, F.lit("User-agent: *\nDisallow: /\n")
        ).otherwise(F.col("robots_txt"))
        return raw.select("host", hostile.alias("robots_txt"))

    store = crawl_store(str(tmp_path / "rr"), cfg)
    run_crawl(spark, store, pages, robots, seeds, rounds=3, cfg=cfg, robots_source=robots_source)
    log = store.read_all(spark, "fetch_log")
    per_round = {
        r.round_id: r.n
        for r in log.where(F.col("host") == hot)
        .groupBy("round_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_round.get(1, 0) > 0  # scheduled while allowed
    assert per_round.get(2, 0) == 0 and per_round.get(3, 0) == 0  # gone after refresh


def test_run_report_committed_and_abort_threshold(spark, tmp_path, crawl_inputs):
    """C20/C4: every round commits a run_report row (success-rate parity with
    the metrics table); with abort_on_failed_run a flood of failures raises
    AFTER the round committed (resume-consistent abort)."""
    import dataclasses

    from web_crawling_prj_spark.plans.reports import run_summary

    pages, robots, seeds, cfg = crawl_inputs
    store = crawl_store(str(tmp_path / "rep"), cfg)
    run_crawl(spark, store, pages, robots, seeds, rounds=2, cfg=cfg)
    for r in (1, 2):
        rep = store.read_round(spark, "run_report", r).collect()
        assert len(rep) == 1 and rep[0].round_id == r
        m = store.read_round(spark, "metrics", r)
        exp = run_summary(m).first()
        assert rep[0].asDict() == exp.asDict()
        assert not rep[0].run_failed  # 2.8% synthetic failure rate ≪ 50%

    # force a failing run: ~99% failure per-mille → threshold trips → raises
    bad = dataclasses.replace(cfg, failure_per_mille=990)
    bad.extra = dict(cfg.extra, abort_on_failed_run=True)
    store2 = crawl_store(str(tmp_path / "rep2"), cfg)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="failed"):
        run_crawl(spark, store2, pages, robots, seeds, rounds=1, cfg=bad)
    assert store2.last_committed_round() == 1  # abort happened post-commit


def test_seen_compaction_equivalence_and_path_bound(spark, tmp_path, crawl_inputs):
    """Compaction is a pure layout rewrite: an 8-round crawl compacting every
    3 rounds produces the identical seen-set/schedule as one that never
    compacts (itself kill/resumed mid-run), while its seen-set scan reads
    O(1+K) directories instead of one per round."""
    import dataclasses

    pages, robots, seeds, cfg = crawl_inputs
    ca = dataclasses.replace(cfg, compact_every=3)
    ca.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    cb = dataclasses.replace(cfg, compact_every=0)
    cb.extra["max_doc_id"] = cfg.extra["max_doc_id"]

    a = crawl_store(str(tmp_path / "ca"), cfg)
    run_crawl(spark, a, pages, robots, seeds, rounds=8, cfg=ca)
    b = crawl_store(str(tmp_path / "cb"), cfg)
    run_crawl(spark, b, pages, robots, seeds, rounds=4, cfg=cb)  # "killed" …
    run_crawl(spark, b, pages, robots, seeds, rounds=8, cfg=cb)  # … resumed

    assert _final_state(a, spark) == _final_state(b, spark)
    assert a.base_upto("seen_delta") == 6  # last multiple of 3 ≤ 8
    # directory bound (LSM tiers): ≤ max_tiers tier dirs + deltas 7,8
    import os

    dirs = {os.path.dirname(f.replace("file:", "")) for f in a.read_all(spark, "seen_delta").inputFiles()}
    assert len(dirs) <= 4, dirs

    # vacuum reclaims folded dirs without changing the data
    before = a.read_all(spark, "seen_delta").count()
    n = a.vacuum_compacted("seen_delta")
    assert n > 0
    assert a.read_all(spark, "seen_delta").count() == before
    shutil.rmtree(str(tmp_path / "ca"))
    shutil.rmtree(str(tmp_path / "cb"))


def test_kill_mid_compaction_is_safe(spark, tmp_path, crawl_inputs):
    """A compaction that died before the pointer swap leaves garbage the next
    compact() overwrites; read_all never sees a half-written base."""
    pages, robots, seeds, cfg = crawl_inputs
    store = crawl_store(str(tmp_path / "mc"), cfg)
    run_crawl(spark, store, pages, robots, seeds, rounds=2, cfg=cfg)
    # fabricate a dead half-compaction: base dir exists, no pointer
    dead = store._base_dir("seen_delta", 2)
    store.read_all(spark, "seen_delta").limit(1).write.parquet(dead)
    assert store.base_upto("seen_delta") is None
    full = store.read_all(spark, "seen_delta").count()
    store.compact(spark, "seen_delta", up_to=2, num_buckets=cfg.num_buckets)
    assert store.base_upto("seen_delta") == 2
    assert store.read_all(spark, "seen_delta").count() == full


def test_circuit_open_then_half_open(spark, tmp_path, crawl_inputs):
    """Forced circuit states: open host schedules nothing (rows deferred);
    half-open host schedules exactly one probe URL."""
    import dataclasses
    import datetime as dt

    pages, robots, seeds, cfg = crawl_inputs
    # legacy full-frontier mode: the test fabricates rounds by re-committing
    # the frontier table directly, which only exists in that layout
    cfg = dataclasses.replace(cfg, frontier_deltas=False)
    cfg.extra["max_doc_id"] = crawl_inputs[3].extra["max_doc_id"]
    store = crawl_store(str(tmp_path / "cb"), cfg)
    run_crawl(spark, store, pages, robots, seeds, rounds=1, cfg=cfg)

    hot = "host-0000.example"
    frontier1 = store.read_round(spark, "frontier", 1)
    assert frontier1.where(F.col("host") == hot).count() > 1

    def fabricate(round_id, quarantined_until):
        state = spark.createDataFrame(
            [(hot, dt.datetime(2025, 6, 1), 12, dt.datetime(2025, 6, 1), quarantined_until)],
            "host string, last_fetch_ts timestamp, consecutive_failures long, "
            "last_fail_ts timestamp, quarantined_until timestamp",
        )
        store.commit_round(
            round_id,
            {
                "frontier": store.read_round(spark, "frontier", round_id - 1),
                "seen_delta": spark.createDataFrame(
                    [], "url_hash long, bucket int, first_seen_round int, first_seen_ts timestamp"
                ),
                "host_state": state,
            },
        )

    # round 2 fabricated: hot host OPEN far into the future
    fabricate(2, dt.datetime(2030, 1, 1))
    from web_crawling_prj_spark.plans.crawl_round import run_round

    run_round(spark, store, pages, robots, 3, cfg)
    log3 = store.read_round(spark, "fetch_log", 3)
    assert log3.where(F.col("host") == hot).count() == 0  # fully open: sits out
    # deferred, not lost: hot rows still pending in the next frontier
    f3 = store.read_round(spark, "frontier", 3)
    assert f3.where(F.col("host") == hot).count() > 0

    # round 4 fabricated: recovery window passed → HALF_OPEN (streak still 12)
    fabricate(4, dt.datetime(2025, 6, 1, 0, 0, 30))
    run_round(spark, store, pages, robots, 5, cfg)
    log5 = store.read_round(spark, "fetch_log", 5)
    assert log5.where(F.col("host") == hot).count() == 1  # exactly one probe


def test_bucketed_store_equals_plain_store(spark, tmp_path, crawl_inputs):
    """The bucketed layout is a pure physical choice: a crawl on the bucketed
    crawl_store produces the identical seen-set and schedule as one on a plain
    parquet StateStore."""
    pages, robots, seeds, cfg = crawl_inputs
    plain = StateStore(str(tmp_path / "plain"))
    run_crawl(spark, plain, pages, robots, seeds, rounds=3, cfg=cfg)
    bkt = crawl_store(str(tmp_path / "bkt"), cfg)
    run_crawl(spark, bkt, pages, robots, seeds, rounds=3, cfg=cfg)
    assert _final_state(plain, spark) == _final_state(bkt, spark)
    shutil.rmtree(str(tmp_path / "plain"))
    shutil.rmtree(str(tmp_path / "bkt"))


def test_bucketed_tables_reregister_in_fresh_catalog(spark, tmp_path, crawl_inputs):
    """Resume in a NEW session: the in-memory catalog is empty, so bucketed
    reads re-create the external table entries from manifest metadata. The
    data (and bucket layout) live on disk; registration is metadata-only."""
    pages, robots, seeds, cfg = crawl_inputs
    from web_crawling_prj_spark.plans.crawl_round import live_frontier

    store = crawl_store(str(tmp_path / "fresh"), cfg)
    run_crawl(spark, store, pages, robots, seeds, rounds=2, cfg=cfg)
    store.compact(spark, "seen_delta", up_to=2)
    before = live_frontier(spark, store, 2, cfg).count()
    seen_before = store.read_all(spark, "seen_delta").count()

    # simulate the fresh session: drop every catalog entry this store created
    for t in spark.sql(f"SHOW TABLES LIKE '{store._prefix}*'").collect():
        spark.sql(f"DROP TABLE {t.tableName}")
    store2 = crawl_store(str(tmp_path / "fresh"), cfg)  # resumed driver
    assert store2.last_committed_round() == 2
    f = live_frontier(spark, store2, 2, cfg)
    assert f.count() == before
    bases, deltas = store2.read_parts(spark, "seen_delta", up_to=2)
    total = sum(b.count() for b in bases) + sum(d.count() for d in deltas)
    assert total == seen_before
    # and round 3 actually runs on the re-registered store
    from web_crawling_prj_spark.plans.crawl_round import run_round

    stats = run_round(spark, store2, pages, robots, 3, cfg)
    assert stats["scheduled"] > 0


def test_run_artifact_matches_committed_tables(spark, tmp_path, crawl_inputs):
    """The rendered per-round report artifact (md + json next to the manifest)
    carries EXACTLY the committed run_report / metrics numbers."""
    import json
    import os

    pages, robots, seeds, cfg = crawl_inputs
    store = crawl_store(str(tmp_path / "art"), cfg)
    run_crawl(spark, store, pages, robots, seeds, rounds=2, cfg=cfg)
    for r in (1, 2):
        jpath = os.path.join(store.root, "_manifests", f"{r:06d}.report.json")
        mpath = os.path.join(store.root, "_manifests", f"{r:06d}.report.md")
        assert os.path.exists(jpath) and os.path.exists(mpath)
        with open(jpath) as f:
            art = json.load(f)
        rep = store.read_round(spark, "run_report", r).first().asDict()
        for k, v in rep.items():
            assert art[k] == v, (k, art[k], v)
        m = {x["bucket"]: x for x in art["per_bucket"]}
        for row in store.read_round(spark, "metrics", r).collect():
            assert m[row.bucket]["scheduled_cnt"] == row.scheduled_cnt
            assert m[row.bucket]["failed_cnt"] == row.failed_cnt
        md = open(mpath).read()
        assert f"scheduled: {rep['scheduled']}" in md
        assert ("RUN FAILED" in md) == rep["run_failed"]


def test_run_artifact_idle_round(spark, tmp_path, crawl_inputs):
    """Regression (found by the 30-round drain): a round that schedules
    NOTHING commits an empty run_report — the artifact must render as an idle
    round, not crash."""
    import json
    import os

    from web_crawling_prj_spark.plans.reports import render_run_artifact

    pages, robots, seeds, cfg = crawl_inputs
    store = crawl_store(str(tmp_path / "idle"), cfg)
    empty_m = spark.createDataFrame(
        [], "bucket int, scheduled_cnt long, fetched_ok_cnt long, failed_cnt long, "
        "retried_cnt long, round_id int",
    )
    from web_crawling_prj_spark.plans.reports import run_summary

    store.commit_round(1, {"metrics": empty_m, "run_report": run_summary(empty_m)})
    path = render_run_artifact(spark, store, 1)
    assert os.path.exists(path)
    with open(path.replace(".md", ".json")) as f:
        art = json.load(f)
    assert art["scheduled"] == 0 and art["run_failed"] is False and art["per_bucket"] == []


def test_tiered_compaction_minor_never_rewrites_old_tiers(spark, tmp_path, crawl_inputs):
    """LSM tiering: a MINOR fold writes only the new rounds into a new tier —
    the existing tier's files are byte-untouched (no O(N) rewrite per fold);
    a MAJOR fold (tier count > max_tiers) merges everything into one tier.
    read_all is invariant through all of it."""
    import dataclasses
    import os

    pages, robots, seeds, cfg = crawl_inputs
    c = dataclasses.replace(cfg, compact_every=0)
    c.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    store = crawl_store(str(tmp_path / "lsm"), c)
    run_crawl(spark, store, pages, robots, seeds, rounds=6, cfg=c)
    truth = frozenset(r.url_hash for r in store.read_all(spark, "seen_delta").collect())

    def tier_files(upto):
        d = store._base_dir("seen_delta", upto)
        return {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}

    assert store.compact(spark, "seen_delta", up_to=2, max_tiers=2) == 2
    snap_a = tier_files(2)
    assert store.compact(spark, "seen_delta", up_to=4, max_tiers=2) == 4  # minor
    assert [t["upto"] for t in store.tiers("seen_delta")] == [2, 4]
    assert tier_files(2) == snap_a  # old tier untouched — the LSM property
    bases, deltas = store.read_parts(spark, "seen_delta", up_to=4)
    assert len(bases) == 2
    assert frozenset(r.url_hash for r in store.read_all(spark, "seen_delta").collect()) == truth

    assert store.compact(spark, "seen_delta", up_to=6, max_tiers=2) == 6  # major
    assert [t["upto"] for t in store.tiers("seen_delta")] == [6]
    assert not os.path.exists(store._base_dir("seen_delta", 2))  # superseded reclaimed
    assert not os.path.exists(store._base_dir("seen_delta", 4))
    assert frozenset(r.url_hash for r in store.read_all(spark, "seen_delta").collect()) == truth
    # and the crawl keeps running on the tiered store
    from web_crawling_prj_spark.plans.crawl_round import run_round

    assert run_round(spark, store, pages, robots, 7, c)["scheduled"] >= 0


def test_vacuum_reaps_orphan_tier_dirs(spark, tmp_path, crawl_inputs):
    """A kill between a major fold's pointer publish and its cleanup loop
    leaves superseded tier dirs unreferenced forever (no later fold's
    cleanup lists them). vacuum_compacted reaps them; live tiers and the
    folded state are untouched."""
    import dataclasses
    import os

    pages, robots, seeds, cfg = crawl_inputs
    c = dataclasses.replace(cfg, compact_every=0)
    c.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    store = crawl_store(str(tmp_path / "orph"), c)
    run_crawl(spark, store, pages, robots, seeds, rounds=4, cfg=c)
    assert store.compact(spark, "seen_delta", up_to=4) == 4
    truth = frozenset(r.url_hash for r in store.read_all(spark, "seen_delta").collect())

    # simulate the crash leftover: an upto= dir the pointer no longer lists
    orphan = store._base_dir("seen_delta", 2)
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-00000.parquet"), "wb") as f:
        f.write(b"junk")
    live_dir = store._base_dir("seen_delta", 4)

    store.vacuum_compacted("seen_delta", spark)
    assert not os.path.exists(orphan)
    assert os.path.isdir(live_dir)
    assert [t["upto"] for t in store.tiers("seen_delta")] == [4]
    assert frozenset(r.url_hash for r in store.read_all(spark, "seen_delta").collect()) == truth


def test_rank_prefilter_crawl_equivalence(spark, tmp_path, crawl_inputs):
    """CrawlConfig.rank_prefilter (the sampled top-k pushdown) is a pure
    physical choice: identical schedule and seen-set over a full crawl."""
    import dataclasses

    pages, robots, seeds, cfg = crawl_inputs
    on = dataclasses.replace(cfg, rank_prefilter=True)
    on.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    a = crawl_store(str(tmp_path / "pfa"), cfg)
    run_crawl(spark, a, pages, robots, seeds, rounds=3, cfg=cfg)
    b = crawl_store(str(tmp_path / "pfb"), on)
    run_crawl(spark, b, pages, robots, seeds, rounds=3, cfg=on)
    assert _final_state(a, spark) == _final_state(b, spark)
    shutil.rmtree(str(tmp_path / "pfa"))
    shutil.rmtree(str(tmp_path / "pfb"))


def test_frontier_delta_mode_equals_full_rewrite(spark, tmp_path, crawl_inputs):
    """Round-4 headline: the frontier-delta store (adds + tombstones in
    frontier_log, LSM folds) reproduces the EXACT observable crawl of the
    legacy full-rewrite store — per-round stats, seen-set, schedule order,
    and the reconstructed pending/deferred views — across folds."""
    import dataclasses

    from web_crawling_prj_spark.plans.crawl_round import (
        FRONTIER_COLS,
        pending_frontier,
    )

    pages, robots, seeds, cfg = crawl_inputs
    co = dataclasses.replace(cfg, frontier_deltas=False, compact_every=3)
    co.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    cn = dataclasses.replace(cfg, frontier_deltas=True, compact_every=3)
    cn.extra["max_doc_id"] = cfg.extra["max_doc_id"]

    a = crawl_store(str(tmp_path / "eq_old"), co)
    b = crawl_store(str(tmp_path / "eq_new"), cn)
    sa = run_crawl(spark, a, pages, robots, seeds, rounds=7, cfg=co)
    sb = run_crawl(spark, b, pages, robots, seeds, rounds=7, cfg=cn)
    assert sa == sb
    assert _final_state(a, spark) == _final_state(b, spark)

    bcasts = []
    try:
        pa, da, _ = pending_frontier(spark, a, 8, co, bcasts)
        pb, db, _ = pending_frontier(spark, b, 8, cn, bcasts)
        pa, pb, da, db = (x.select(*FRONTIER_COLS) for x in (pa, pb, da, db))
        assert pa.exceptAll(pb).count() == 0 and pb.exceptAll(pa).count() == 0
        assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0
    finally:
        for bx in bcasts:
            bx.destroy()
    shutil.rmtree(str(tmp_path / "eq_old"))
    shutil.rmtree(str(tmp_path / "eq_new"))


def test_tiered_frontier_folds_and_merge_regime_equal_legacy(spark, tmp_path, crawl_inputs):
    """Round-5 headline: TIERED frontier-log folds (minor folds O(window
    churn), tombstones kept until a major fold) + the co-located MERGE
    regime for every churn-key join (broadcast_churn_max_keys=0 forces it)
    reproduce the exact legacy crawl. fold_max_tiers=2, compact_every=2 over
    9 rounds exercises: terminal first fold (r2), minor fold with tombstones
    (r4), MAJOR fold (r6, tier count would exceed 2), minor again (r8) — and
    the old tier's files are byte-untouched by the minor fold."""
    import dataclasses
    import os

    pages, robots, seeds, cfg = crawl_inputs
    co = dataclasses.replace(cfg, frontier_deltas=False, compact_every=2)
    co.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    cn = dataclasses.replace(
        cfg,
        frontier_deltas=True,
        compact_every=2,
        fold_max_tiers=2,
        broadcast_churn_max_keys=0,
    )
    cn.extra["max_doc_id"] = cfg.extra["max_doc_id"]

    a = crawl_store(str(tmp_path / "tier_old"), co)
    b = crawl_store(str(tmp_path / "tier_new"), cn)
    sa = run_crawl(spark, a, pages, robots, seeds, rounds=5, cfg=co)

    def tier_files(store, upto):
        d = store._base_dir("frontier_log", upto)
        return {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}

    sb = run_crawl(spark, b, pages, robots, seeds, rounds=3, cfg=cn)  # fold @ r2
    snap = tier_files(b, 2)
    sb += run_crawl(spark, b, pages, robots, seeds, rounds=5, cfg=cn)  # minor fold @ r4
    # after r2 (terminal) + r4 (minor): two tiers, minor fold carries dels
    assert [t["upto"] for t in b.tiers("frontier_log")] == [2, 4]
    log4 = spark.read.parquet(b._base_dir("frontier_log", 4))
    assert log4.where(F.col("is_del")).count() > 0  # non-terminal keeps tombstones
    assert tier_files(b, 2) == snap  # minor fold left the old tier byte-untouched
    sa += run_crawl(spark, a, pages, robots, seeds, rounds=9, cfg=co)
    sb += run_crawl(spark, b, pages, robots, seeds, rounds=9, cfg=cn)
    assert [t["upto"] for t in b.tiers("frontier_log")] == [6, 8]  # major@6, minor@8
    log6 = spark.read.parquet(b._base_dir("frontier_log", 6))
    assert log6.where(F.col("is_del")).count() == 0  # terminal dropped tombstones
    assert sa == sb
    assert _final_state(a, spark) == _final_state(b, spark)
    shutil.rmtree(str(tmp_path / "tier_old"))
    shutil.rmtree(str(tmp_path / "tier_new"))


def test_vacuum_after_fold_bounds_store_dirs(spark, tmp_path, crawl_inputs):
    """CrawlConfig.vacuum_after_fold reclaims folded round dirs each fold:
    the store's per-round dir inventory stays bounded by the un-folded
    window, the crawl's observable state is unchanged, and a partial
    (killed) vacuum is repaired by the next one."""
    import dataclasses
    import os

    pages, robots, seeds, cfg = crawl_inputs
    cv = dataclasses.replace(cfg, compact_every=2, vacuum_after_fold=True)
    cv.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    cn = dataclasses.replace(cfg, compact_every=2)
    cn.extra["max_doc_id"] = cfg.extra["max_doc_id"]

    a = crawl_store(str(tmp_path / "vac"), cv)
    b = crawl_store(str(tmp_path / "novac"), cn)
    run_crawl(spark, a, pages, robots, seeds, rounds=4, cfg=cv)

    def round_dirs(store, table):
        d = os.path.join(store.root, table)
        return sorted(f for f in os.listdir(d)) if os.path.isdir(d) else []

    # folded rounds reclaimed; only the un-folded window survives
    assert round_dirs(a, "frontier_log") == []  # fold at r4 covers all rounds
    assert round_dirs(a, "seen_delta") == []
    # simulate a kill MID-vacuum: resurrect a superseded round-3 dir (vacuum
    # deleted rounds 1-4 after the r4 fold; a kill between two rmtrees leaves
    # exactly this shape — some folded dirs gone, one still on disk). Head
    # reads must ignore it (≤ fold floor), and the NEXT fold's vacuum must
    # finish the job.
    remnant = os.path.join(a.root, "frontier_log", "round=000003")
    os.makedirs(remnant)
    with open(os.path.join(remnant, "part-00000-stale.parquet"), "wb") as fh:
        fh.write(b"stale bytes from a killed vacuum")  # never read: r3 <= floor
    run_crawl(spark, a, pages, robots, seeds, rounds=5, cfg=cv)
    assert round_dirs(a, "frontier_log") == ["round=000003", "round=000005"]
    run_crawl(spark, b, pages, robots, seeds, rounds=5, cfg=cn)
    assert _final_state(a, spark) == _final_state(b, spark)  # remnant ignored
    # resume past the vacuumed history keeps working, and the r6 fold's
    # vacuum repairs the killed one: the round-3 remnant is gone
    run_crawl(spark, a, pages, robots, seeds, rounds=7, cfg=cv)
    run_crawl(spark, b, pages, robots, seeds, rounds=7, cfg=cn)
    assert _final_state(a, spark) == _final_state(b, spark)
    assert not os.path.exists(remnant)
    assert round_dirs(a, "frontier_log") == ["round=000007"]
    shutil.rmtree(str(tmp_path / "vac"))
    shutil.rmtree(str(tmp_path / "novac"))


@pytest.mark.parametrize(
    "compact_every,fold_max_tiers,vacuum",
    [
        (1, 1, True),   # fold EVERY round, always-major, vacuum — max pressure
        (1, 3, False),  # fold every round into a 3-tier stack (deep tombstone
                        # shadowing: every tier but the first carries dels)
        (3, 2, True),   # staggered minor/major folds with vacuum racing reads
    ],
)
def test_fold_schedule_sweep_equals_legacy(
    spark, tmp_path, crawl_inputs, compact_every, fold_max_tiers, vacuum
):
    """Fold-schedule property: ANY (compact_every, fold_max_tiers,
    vacuum_after_fold) combination reproduces the exact legacy crawl. The
    targeted tests pin one schedule each; this sweep covers the aggressive
    corners — fold-every-round (the un-folded window is empty at EVERY
    round boundary, so the post-fold regime estimate and the drained-
    detection paths run constantly) and deep tier stacks (tier-vs-tier
    tombstone shadowing through 3 layers)."""
    import dataclasses

    pages, robots, seeds, cfg = crawl_inputs
    tag = f"{compact_every}_{fold_max_tiers}_{vacuum}"
    co = dataclasses.replace(cfg, frontier_deltas=False, compact_every=0)
    co.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    cn = dataclasses.replace(
        cfg,
        frontier_deltas=True,
        compact_every=compact_every,
        fold_max_tiers=fold_max_tiers,
        vacuum_after_fold=vacuum,
    )
    cn.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    a = crawl_store(str(tmp_path / f"sw_old_{tag}"), co)
    b = crawl_store(str(tmp_path / f"sw_new_{tag}"), cn)
    sa = run_crawl(spark, a, pages, robots, seeds, rounds=5, cfg=co)
    sb = run_crawl(spark, b, pages, robots, seeds, rounds=5, cfg=cn)
    assert sa == sb
    assert _final_state(a, spark) == _final_state(b, spark)
    shutil.rmtree(str(tmp_path / f"sw_old_{tag}"))
    shutil.rmtree(str(tmp_path / f"sw_new_{tag}"))


def test_churn_broadcast_regime_survives_fold_and_vacuum(spark, tmp_path):
    """Regression (round-5 review): the broadcast↔merge regime estimate must
    NOT collapse to 0 on the first round after a fold. The un-folded window
    is empty right after a fold, but the next round's candidate keys are
    ≈ last round's churn — at 10^8-key rounds, force-broadcasting them is
    the exact OOM cliff broadcast_churn_max_keys exists to prevent. The
    estimate floors at the newest non-empty round dir, and falls back to the
    newest tier when vacuum reclaimed the round dirs too."""
    from web_crawling_prj_spark.plans.crawl_round import (
        FRONTIER_LOG_COLS,
        _churn_broadcast_ok,
        resolve_frontier_log,
    )

    store = StateStore(str(tmp_path / "regime"))
    rows = (
        spark.range(4000)
        .select(
            F.concat(F.lit("http://h"), F.col("id")).alias("url"),
            F.concat(F.lit("http://h"), F.col("id")).alias("url_canon"),
            F.col("id").alias("url_hash"),
            F.lit("h").alias("host"),
            F.lit(1.0).alias("priority"),
            F.lit(0).alias("depth"),
            F.lit(None).cast("timestamp").alias("discovered_ts"),
            F.lit(None).cast("long").alias("src_url_hash"),
            F.lit(0).alias("attempt"),
            F.lit(None).cast("timestamp").alias("next_eligible_ts"),
            F.lit(1).alias("evt_round"),
            F.lit(False).alias("is_del"),
        )
        .select(*FRONTIER_LOG_COLS)
    )
    store.commit_round(1, {"frontier_log": rows})
    # 4000-key churn vs a 10-key broadcast ceiling → merge regime...
    cfg = CrawlConfig(num_buckets=4, broadcast_churn_max_keys=10)
    assert not _churn_broadcast_ok(store, 1, cfg)
    store.compact(spark, "frontier_log", up_to=1, max_tiers=4, resolver=resolve_frontier_log)
    # ...and STILL the merge regime right after the fold (window empty, round
    # dir present: last-round floor) and after vacuum (tier fallback)
    assert not _churn_broadcast_ok(store, 1, cfg)
    store.vacuum_compacted("frontier_log")
    assert not _churn_broadcast_ok(store, 1, cfg)
    # a genuinely tiny-churn store keeps the broadcast regime throughout
    roomy = CrawlConfig(num_buckets=4, broadcast_churn_max_keys=1_000_000)
    assert _churn_broadcast_ok(store, 1, roomy)
    # round-6: the estimate is EXACT (parquet footer rows, not bytes÷const) —
    # the crossover sits precisely at the true key count
    assert not _churn_broadcast_ok(store, 1, CrawlConfig(num_buckets=4, broadcast_churn_max_keys=3_999))
    assert _churn_broadcast_ok(store, 1, CrawlConfig(num_buckets=4, broadcast_churn_max_keys=4_000))


def test_delta_mode_commit_volume_tracks_churn_not_frontier(spark, tmp_path, crawl_inputs):
    """The delta store's per-round frontier commit is bounded by round
    ACTIVITY (adds = retries + discovery winners; dels = scheduled +
    disallowed keys) — unchanged backlog rows are never rewritten. The
    legacy store rewrites the whole frontier every round."""
    import dataclasses

    from web_crawling_prj_spark.plans.crawl_round import live_frontier

    pages, robots, seeds, cfg = crawl_inputs
    cn = dataclasses.replace(cfg, frontier_deltas=True, compact_every=0)
    cn.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    store = crawl_store(str(tmp_path / "churn"), cn)
    stats = run_crawl(spark, store, pages, robots, seeds, rounds=5, cfg=cn)

    for s in stats:
        r = s["round_id"]
        log = store.read_round(spark, "frontier_log", r)
        n_add = log.where(~F.col("is_del")).count()
        n_del = log.where(F.col("is_del")).count()
        fetched = store.read_round(spark, "fetch_log", r).count()
        # dels = scheduled + robots-disallowed; disallowed only enters via
        # fresh discovery, so it is bounded by the previous round's adds
        assert n_del >= fetched
        # adds are bounded by round activity: every add is a retry (≤
        # scheduled) or a discovery winner (≤ links_per_page × ok-fetches)
        # or a re-added incumbent (≤ discovery winners)
        assert n_add <= fetched * (2 * cn.links_per_page + 1)
    # and the live view is still reconstructible after all that
    live = live_frontier(spark, store, 5, cn)
    assert live.count() > 0
    assert live.groupBy("url_hash").count().where("count > 1").count() == 0
    shutil.rmtree(str(tmp_path / "churn"))


def test_rank_prefilter_auto_threshold(spark, tmp_path, crawl_inputs):
    """Tri-state rank_prefilter: explicit settings win; None auto-enables by
    driver-side frontier-footprint estimate, and a crawl forced over the
    threshold schedules identically (the pushdown is exact by construction)."""
    import dataclasses

    from web_crawling_prj_spark.plans.crawl_round import _resolve_prefilter

    pages, robots, seeds, cfg = crawl_inputs
    store = crawl_store(str(tmp_path / "pfauto"), cfg)
    run_crawl(spark, store, pages, robots, seeds, rounds=1, cfg=cfg)
    assert _resolve_prefilter(store, cfg) is False  # tiny store, default crossover
    low = dataclasses.replace(cfg, rank_prefilter_auto_min_rows=1)
    low.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    assert _resolve_prefilter(store, low) is True
    assert _resolve_prefilter(store, dataclasses.replace(cfg, rank_prefilter=True)) is True
    assert (
        _resolve_prefilter(
            store, dataclasses.replace(cfg, rank_prefilter=False, rank_prefilter_auto_min_rows=1)
        )
        is False
    )
    a = crawl_store(str(tmp_path / "pfauto_on"), low)
    run_crawl(spark, a, pages, robots, seeds, rounds=3, cfg=low)
    b = crawl_store(str(tmp_path / "pfauto_off"), cfg)
    run_crawl(spark, b, pages, robots, seeds, rounds=3, cfg=cfg)
    assert _final_state(a, spark) == _final_state(b, spark)
    shutil.rmtree(str(tmp_path / "pfauto_on"))
    shutil.rmtree(str(tmp_path / "pfauto_off"))


def test_frontier_mode_mismatch_refused_on_resume(spark, tmp_path, crawl_inputs):
    import dataclasses

    pages, robots, seeds, cfg = crawl_inputs
    store = crawl_store(str(tmp_path / "mm1"), cfg)
    run_crawl(spark, store, pages, robots, seeds, rounds=1, cfg=cfg)  # delta layout
    legacy = dataclasses.replace(cfg, frontier_deltas=False)
    legacy.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    with pytest.raises(ValueError, match="frontier_deltas=True"):
        run_crawl(spark, store, pages, robots, seeds, rounds=2, cfg=legacy)
    store2 = crawl_store(str(tmp_path / "mm2"), legacy)
    run_crawl(spark, store2, pages, robots, seeds, rounds=1, cfg=legacy)
    with pytest.raises(ValueError, match="frontier_deltas=False"):
        run_crawl(spark, store2, pages, robots, seeds, rounds=2, cfg=cfg)


def test_drained_frontier_yields_idle_round_not_crash(spark, tmp_path, crawl_inputs):
    """A delta store whose frontier legitimately drains (all tombstones,
    folded to an EMPTY tier — empty bucketed writes emit no files) must keep
    running idle rounds, not die in live_frontier with a mode error."""
    import dataclasses

    from web_crawling_prj_spark.plans.crawl_round import live_frontier

    pages, robots, seeds, cfg = crawl_inputs
    tiny = dataclasses.replace(cfg, links_per_page=0, compact_every=2, failure_per_mille=0)
    tiny.extra["max_doc_id"] = cfg.extra["max_doc_id"]
    few = seeds.limit(5)
    store = crawl_store(str(tmp_path / "drain"), tiny)
    stats = run_crawl(spark, store, pages, robots, few, rounds=6, cfg=tiny)
    assert stats[-1]["scheduled"] == 0  # fully drained, still committing rounds
    assert live_frontier(spark, store, 6, tiny).count() == 0
    shutil.rmtree(str(tmp_path / "drain"))


def test_tracking_param_aliases_collapse_before_seen(spark):
    """Round-6 wiring: utm/gclid-aliased seeds of one page dedup to ONE
    frontier row keyed on the cleaned canonical URL (tracking params never
    reach the seen-set); clean-URL semantics unchanged."""
    rows = [
        ("https://a.example/p?id=5&utm_source=nl&gclid=xyz", 0.9, 0),
        ("https://a.example/p?utm_campaign=q3&id=5", 0.5, 0),
        ("https://a.example/p?id=5", 0.7, 0),
        ("https://b.example/q?x=1", 0.4, 0),  # clean URL, untouched
    ]
    seeds = spark.createDataFrame(rows, "url string, priority double, depth int")
    f = frontier_from_seeds(seeds)
    got = {r.url_canon: r for r in f.collect()}
    assert set(got) == {"https://a.example/p?id=5", "https://b.example/q?x=1"}
    # the dedup kept the highest-priority alias's row
    assert got["https://a.example/p?id=5"].priority == 0.9


def test_redirect_chains_resolve_to_terminals(spark, tmp_path, crawl_inputs):
    """Round-6 wiring (VERDICT r5 next #4): with 3xx pages injected, the
    redirect SOURCE is terminal in the fetch log (class 'redirect', never
    refetched) and its chain's TERMINAL — not the intermediates — lands in
    the frontier and is fetched in a later round."""
    from web_crawling_prj_spark.operators.redirects import resolve_redirects

    pages, robots, seeds, base_cfg = crawl_inputs
    cfg = CrawlConfig(
        num_buckets=8, n_salts=4, max_per_host=25, default_budget=25,
        redirect_per_mille=250, redirect_max_hops=8,
    )
    cfg.extra["max_doc_id"] = base_cfg.extra["max_doc_id"]
    store = crawl_store(str(tmp_path / "redir"), cfg)
    run_crawl(spark, store, pages, robots, seeds, rounds=3, cfg=cfg)
    log = store.read_all(spark, "fetch_log")

    r3 = log.where(F.col("error_class") == "redirect")
    assert r3.count() > 0, "no redirects injected — raise redirect_per_mille"
    # a 3xx source is terminal: exactly one fetch ever, no retries
    assert r3.groupBy("url_canon").count().where("count > 1").count() == 0
    assert r3.where(F.col("can_retry")).count() == 0

    # terminals of round-1 chains appear in the round-2 fetch log (unless the
    # target was already seen in round 1 or lost the budget race — so assert
    # on a positive subset: at least one resolved terminal got fetched later)
    edges = r3.where(F.col("round_id") == 1).select(
        F.col("url_canon").alias("src"), F.col("redirect_to").alias("dst")
    )
    resolved = resolve_redirects(edges, max_hops=8)
    terms = {r.final for r in resolved.where("terminated").collect()}
    later = {
        r.url_canon for r in log.where(F.col("round_id") > 1).select("url_canon").collect()
    }
    assert terms, "round-1 chains resolved to no terminals"
    assert terms & later, "no resolved terminal was ever fetched in a later round"

    # intermediates (3xx pages) never re-enter the frontier: live view is
    # disjoint from redirect sources
    from web_crawling_prj_spark.plans.crawl_round import live_frontier

    live = live_frontier(spark, store, 3, cfg)
    srcs = r3.select(F.col("url_canon").alias("u")).distinct()
    assert live.join(srcs, live["url_canon"] == srcs["u"], "left_semi").count() == 0


def test_shard_rows_seen_tier_equals_broadcast_tier(spark, tmp_path, crawl_inputs):
    """Legacy plain-layout crawl with the PARTITION-RESIDENT bloom tier
    (approx_seen_tier='shard_rows': shards committed as rows, cogroup probe,
    zero driver assembly) produces the identical seen-set and schedule as the
    broadcast tier — and maintains exactly one bloom_shards round table."""
    pages, robots, seeds, base_cfg = crawl_inputs

    def run(tier, name):
        cfg = CrawlConfig(
            num_buckets=8, n_salts=4, max_per_host=25, default_budget=25,
            frontier_deltas=False, use_bloom=True, approx_seen_tier=tier,
        )
        cfg.extra["max_doc_id"] = base_cfg.extra["max_doc_id"]
        store = StateStore(str(tmp_path / name))  # plain layout → bloom tier active
        run_crawl(spark, store, pages, robots, seeds, rounds=3, cfg=cfg)
        return store

    s_bc = run("broadcast", "bc")
    s_sr = run("shard_rows", "sr")
    assert _final_state(s_bc, spark) == _final_state(s_sr, spark)
    # retention: only the newest shard table survives
    have = [r for r in s_sr.committed_rounds() if s_sr.has_table("bloom_shards", r)]
    assert have == [3]
    # and the shard rows cover the full seen-set (no false negatives):
    # every seen key must probe TRUE against the committed table
    from web_crawling_prj_spark.operators.shardprobe import probe_bloom_shard_rows

    seen = s_sr.read_all(spark, "seen_delta").select("url_hash")
    rows = s_sr.read_round(spark, "bloom_shards", 3)
    cfg = CrawlConfig(num_buckets=8)
    probed = probe_bloom_shard_rows(
        seen, rows, num_shards=8, expected_per_shard=cfg.bloom_expected_per_shard,
        fpp=cfg.bloom_fpp,
    )
    assert probed.where(~F.col("_maybe_seen")).count() == 0
    shutil.rmtree(str(tmp_path / "bc"))
    shutil.rmtree(str(tmp_path / "sr"))


def test_shard_rows_tier_migration_keeps_full_seen_set(spark, tmp_path, crawl_inputs):
    """Migration onto the shard_rows tier (ADVICE r6 high): rounds 1-2 run
    with the broadcast tier, round 3 switches the SAME store to shard_rows.
    The committed bloom_shards table must cover the FULL seen-set — the old
    maintenance path built it from round 3's delta alone, so rounds 1-2 keys
    probed false, bypassed the exact rescue, and were re-fetched. Asserts
    zero false negatives over all seen keys and schedule equality with a
    never-migrated broadcast run."""
    pages, robots, seeds, base_cfg = crawl_inputs

    def mk_cfg(tier):
        cfg = CrawlConfig(
            num_buckets=8, n_salts=4, max_per_host=25, default_budget=25,
            frontier_deltas=False, use_bloom=True, approx_seen_tier=tier,
        )
        cfg.extra["max_doc_id"] = base_cfg.extra["max_doc_id"]
        return cfg

    # control: 4 rounds entirely on the broadcast tier
    s_bc = StateStore(str(tmp_path / "mig_bc"))
    run_crawl(spark, s_bc, pages, robots, seeds, rounds=4, cfg=mk_cfg("broadcast"))

    # migrated: 2 broadcast rounds, then resume with shard_rows for 2 more
    s_mig = StateStore(str(tmp_path / "mig_sr"))
    run_crawl(spark, s_mig, pages, robots, seeds, rounds=2, cfg=mk_cfg("broadcast"))
    run_crawl(spark, s_mig, pages, robots, seeds, rounds=4, cfg=mk_cfg("shard_rows"))

    assert _final_state(s_bc, spark) == _final_state(s_mig, spark)

    # the committed shard table covers the WHOLE seen-set, not just deltas
    # since the switch: every seen key probes true (bloom: no false negatives)
    from web_crawling_prj_spark.operators.shardprobe import probe_bloom_shard_rows

    cfg = mk_cfg("shard_rows")
    seen = s_mig.read_all(spark, "seen_delta").select("url_hash")
    rows = s_mig.read_round(spark, "bloom_shards", 4)
    probed = probe_bloom_shard_rows(
        seen, rows, num_shards=8,
        expected_per_shard=cfg.bloom_expected_per_shard, fpp=cfg.bloom_fpp,
    )
    assert probed.where(~F.col("_maybe_seen")).count() == 0
    shutil.rmtree(str(tmp_path / "mig_bc"))
    shutil.rmtree(str(tmp_path / "mig_sr"))
