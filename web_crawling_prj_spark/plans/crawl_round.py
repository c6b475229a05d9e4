"""The crawl round — one Spark job per round, the engine's flagship plan.

Reference lifecycle being re-expressed (SURVEY.md §3.1, dags/common/
base_source_dag.py): branch(mode) → build frontier → dedup vs seen → schedule
batches with politeness → fetch with retries → persist results + summary.
Here every boundary is a stage inside one declarative plan:

    frontier ──(bloom + left-anti vs seen)──► pending
    pending ──(robots gate, broadcast)──► allowed
    allowed ──(salted 2-level top-k per host)──► scheduled
    scheduled ──(synthetic/mapInPandas fetch + Arrow extract)──► fetch_log
    fetch_log ──(classify, budgets, backoff)──► retries
    fetch_log ──(outlink discovery)──► discovered
    retries ∪ discovered ∪ leftover ──► next frontier
    commit atomically: seen-delta, fetch_log, frontier, per-partition metrics

Scale decisions, explicit:
- seen-set partitioned by pmod(url_hash, P); the anti-join shuffles the
  frontier once on the same key (bucketed layout reusable round over round);
- budgets/robots are per-host (tiny) → broadcast joins, never shuffled;
- hot-host skew bounded by the salted two-level rank (operators.politeness);
- the fetch join broadcasts the scheduled batch against the page store, so the
  100 TB side never moves;
- per-partition lineage counters are computed by seen-bucket (deterministic,
  unlike spark_partition_id) and land in the metrics table each round.

Determinism: every ordering is (priority DESC, url_hash), every random draw is
a seeded hash → identical crawl ordering and final seen-set at local[8] vs
local[32] and across kill/resume (tests/test_crawl_round.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_crawling_prj_spark.functions.hashing import bucket_of, url_hash
from web_crawling_prj_spark.functions.urls import canonicalize_url_udf, host_of
from web_crawling_prj_spark.operators.bloom import (
    bloom_from_bytes,
    bloom_to_bytes,
    broadcast_bloom,
    build_sharded_bloom,
    merge_blooms,
)
from web_crawling_prj_spark.operators.dedup import anti_join_seen_layered, dedup_within_batch
from web_crawling_prj_spark.operators.fetch import discover_outlinks, synthetic_fetch
from web_crawling_prj_spark.operators.politeness import host_budgets, schedule_round
from web_crawling_prj_spark.operators.retry import classify_fetch_log, update_circuit_state
from web_crawling_prj_spark.operators.robots import gate_frontier, gate_frontier_flagged
from web_crawling_prj_spark.plans.statestore import StateStore

FRONTIER_COLS = [
    "url",
    "url_canon",
    "url_hash",
    "host",
    "priority",
    "depth",
    "discovered_ts",
    "src_url_hash",
    "attempt",
    "next_eligible_ts",
]

#: frontier-as-event-log layout (frontier_deltas mode): each round commits only
#: its CHANGES — adds (full replacement rows: retries, discovery winners) and
#: dels (key-only tombstones: scheduled + robots-disallowed keys). The live
#: frontier is per-key latest-event-wins over (evt_round, add-beats-del).
FRONTIER_LOG_COLS = [*FRONTIER_COLS, "evt_round", "is_del"]

_STATE_COLS = [c for c in FRONTIER_COLS if c != "url_hash"]


@dataclass
class CrawlConfig:
    # seen-set/frontier shards (P). Sizing rule: bucketed scans cap their
    # parallelism at P (one task per bucket), so set P ≥ total executor cores
    # on a real cluster (e.g. 4096 for 1000 executors) — small P costs
    # parallelism, large P only costs file count (one file per bucket/round).
    num_buckets: int = 16
    n_salts: int = 16  # politeness skew salts
    round_duration_ms: int = 30_000
    max_per_host: int = 40
    default_budget: int = 40
    bloom_fpp: float = 0.01
    bloom_expected_per_shard: int = 200_000
    use_bloom: bool = True
    links_per_page: int = 3
    failure_per_mille: int = 28
    base_ts: str = "2025-06-01 00:00:00"
    # blend link-graph PageRank into frontier priority each round (0 = off).
    # Deterministic (power iteration over committed lineage), so resume/
    # parallelism invariants hold with it enabled.
    pagerank_weight: float = 0.0
    # PageRank refresh cadence (delta mode). The score computation is
    # inherently O(all fetched pages) — the one remaining per-round
    # O(history) job when the blend is on: _link_lineage re-reads the FULL
    # committed fetch_log and the power iteration sweeps the whole graph.
    # With K > 1 the scores are recomputed only every K-th round, committed
    # as a `pagerank_scores` table, and the rounds in between blend the last
    # committed scores (standard periodic-refresh engineering: priorities
    # tolerate K rounds of staleness; the heavy job amortizes to O(graph/K)
    # per round). Resume-deterministic — the refresh schedule is derived
    # from committed state, never wall clock. K = 1 (default) recomputes
    # every round and commits nothing, byte-identical to the old behavior.
    # Legacy full-rewrite mode ignores the cadence (its every-round frontier
    # rewrite is already O(backlog), so the blend does not change its
    # complexity class).
    pagerank_every: int = 1
    # focused crawling (operators.focus, WWW'99): when focus_weight > 0 and
    # focus_terms is non-empty, each round BM25-scores the pages it fetched
    # against the terms and blends the parent's saturated relevance into the
    # priority of the links that page discovered (children of off-topic or
    # text-less parents blend 0). Delta-sized — the scorer sees only this
    # round's fetch log — and deterministic (rounded sums), so resume /
    # parallelism invariants hold with it enabled. Default off: flagship
    # ordering unchanged.
    focus_terms: tuple = ()
    focus_weight: float = 0.0
    # crawl-trap budgeting (operators.traps): cap how many URLs of one URL
    # TEMPLATE (volatile tokens collapsed) may be scheduled per round
    # (0 = off). Cut rows are NOT dropped — they stay pending (legacy: in
    # leftover; delta: live in the log), so a trap drains at cap/round while
    # the rest of its host's budget goes to real pages.
    trap_max_per_template: int = 0
    # fold seen_delta round dirs into a bucketed base every K rounds so the
    # per-round seen-set scan lists O(1+K) paths forever (0 = off). Pure
    # file-layout rewrite, never a semantics change; resume-safe (atomic
    # pointer swap, old dirs kept).
    compact_every: int = 8
    # sampled top-k pushdown before the politeness rank (exact via rescue
    # pass — politeness.schedule_round(threshold_prefilter=)). Tri-state:
    # True/False force it; None (default) auto-enables when the committed
    # frontier's on-disk size implies ≥ rank_prefilter_auto_min_rows live
    # rows (driver-side file-size arithmetic: no count() job, no data read).
    # HONEST MEASUREMENT NOTE (round 4, BENCH/SCALING.md): with the winners-
    # cache leak fixed, the pushdown LOSES at every measured point on this
    # VM (0.23–0.80× at 16M–64M rows, both parallelism levels) — round 3's
    # "2.1× at 8 cores" was the leaked cache serving later best-of runs. The
    # default crossover therefore sits beyond the measured range; it exists
    # for real clusters whose rank shuffle is network-bound (where cutting
    # shuffle rows 6–10× is the win this VM's shared memory bus never shows)
    # — measure there before lowering it.
    rank_prefilter: bool | None = None
    rank_prefilter_auto_min_rows: int = 1_000_000_000
    # commit frontier CHANGES (adds + key tombstones in `frontier_log`)
    # instead of rewriting the full `frontier` table every round — per-round
    # commit bytes ∝ round churn, not frontier size (the 10^10-row backlog
    # must never be rewritten to schedule a 10^6-row batch). Observable crawl
    # behavior is identical in both modes (equality-tested); a store is
    # created in one mode and stays in it.
    frontier_deltas: bool = True
    # LSM fold width for BOTH state tables (seen_delta concatenation tiers,
    # frontier_log event tiers). Minor folds touch only the rounds since the
    # newest tier — O(window churn); a major fold (all tiers merge, the only
    # O(live) job left) runs every fold_max_tiers·compact_every rounds, i.e.
    # amortized O(live / (fold_max_tiers·compact_every)) per round.
    fold_max_tiers: int = 4
    # reclaim per-round dirs already folded into a base tier right after each
    # fold (opt-in: it forfeits read_round/read_all history below the fold
    # floor — keep it off for audit-grade stores). Kill-safe: only superseded
    # dirs are touched, so a partial vacuum never affects current-head reads
    # and the next fold's vacuum finishes the job.
    vacuum_after_fold: bool = False
    # forced-broadcast ceiling for the per-round churn-key joins (the
    # un-folded frontier_log window vs the base tiers, and the candidate/
    # scheduled key probes). While the window's estimated key count (driver-
    # side file-size arithmetic, no job) stays below this, churn keys
    # broadcast — fastest, and safe: 20M longs ≈ 160 MB serialized. Above it
    # the joins switch to the co-located bucketed merge shape: every live
    # branch keeps HashPartitioning(url_hash, P), so only the delta-sized key
    # sets shuffle and nothing is collected driver-side (the 10^8-key regime
    # where a forced broadcast is an OOM cliff, VERDICT r4 watch-item #3).
    broadcast_churn_max_keys: int = 20_000_000
    # WARC archive sidecar (sources.warc): when set, every committed round's
    # successful fetches are exported as WARC/1.0 response records under
    # warc_dir/round=NNNNNN/ (num_buckets files, bucketed by url_hash — the
    # object-store layout real crawls ship, Common Crawl analog). Derived
    # artifact: a pure function of committed state, rebuilt by the resume
    # catch-up sweep if a kill lands between commit and archive.
    warc_dir: str | None = None
    # replayability knobs (both default to the xxhash-keyed fast paths):
    # - schedule_tiebreak: ascending column breaking per-host priority ties in
    #   the politeness rank ("url_canon" → total order an ANSI-SQL engine can
    #   reproduce; semantics of the exact top-k are unchanged either way);
    # - fetch_roll_mode: synthetic-fetch failure draw ("doc" → pure integer
    #   arithmetic over (page_doc_id, round_id), DuckDB-expressible).
    # Together they make a whole crawl value-replayable by the independent
    # event-replay oracle (query crawl_rounds_replay).
    schedule_tiebreak: str = "url_hash"
    fetch_roll_mode: str = "xxhash"
    # redirect following (operators.redirects wired into discovery): when the
    # synthetic web injects 3xx pages (redirect_per_mille > 0, per-PAGE draw),
    # each round resolves the 3xx rows' chains to TERMINAL targets — bounded
    # by redirect_max_hops; cycles/over-budget chains never enqueue — and the
    # terminals (not the intermediates) enter the next frontier. The 3xx
    # source URL itself is terminal (class 'redirect', budget 0 → seen).
    redirect_per_mille: int = 0
    redirect_max_hops: int = 8
    # approximate seen-tier transport (legacy plain-layout mode only — the
    # bucketed layout replaces the tier structurally and delta mode never
    # probes the seen-set at read time):
    #   "broadcast"  — assemble the shard array on the driver and broadcast
    #                  (fastest to a few hundred MB; the 10^10-URL OOM cliff);
    #   "shard_rows" — shards live as (shard, bitmap) ROWS in a per-round
    #                  `bloom_shards` store table, maintained incrementally
    #                  (delta-OR per round) and probed map-side by cogroup —
    #                  zero driver memory term (operators.shardprobe).
    approx_seen_tier: str = "broadcast"
    extra: dict = field(default_factory=dict)

    def round_ts(self, round_id: int) -> str:
        # each round advances wall-clock by round_duration (driver-side, deterministic)
        from datetime import datetime, timedelta

        t0 = datetime.fromisoformat(self.base_ts)
        return (t0 + timedelta(milliseconds=round_id * self.round_duration_ms)).isoformat(sep=" ")


def crawl_store(root: str, cfg: CrawlConfig | None = None) -> StateStore:
    """The crawl's StateStore: frontier and seen-set BUCKETED on url_hash with
    cfg.num_buckets — the layout that makes the steady-state per-round
    anti-join shuffle-free (each task reads its own bucket from both sides;
    see tests/test_plan_shapes.py). Iceberg analog: bucket(N, url_hash)
    partition transform on both tables."""
    cfg = cfg or CrawlConfig()
    spec = {
        "frontier": ("url_hash", cfg.num_buckets),
        "frontier_log": ("url_hash", cfg.num_buckets),
        "seen_delta": ("url_hash", cfg.num_buckets),
    }
    return StateStore(root, bucket_spec=spec)


def frontier_from_seeds(seeds: DataFrame) -> DataFrame:
    """Seeds → frontier rows: strip tracking params, canonicalize, hash,
    dedup within batch.

    Tracking-param stripping (functions.urls.strip_tracking_params, fully
    native) runs BEFORE canonicalization so utm_/gclid-style click-id aliases
    of one page collapse onto one canonical key before the seen-set ever
    sees them — otherwise every ad-click alias re-enters the frontier as a
    "new" URL (reference analog: canonical-key identity,
    services/wayfair_service.py:166-194). The original ``url`` column is
    preserved verbatim; only the canonical key is built from the cleaned
    form. Canonicalization itself is HYBRID
    (functions.urls.canonicalize_urls_hybrid): provably-already-canonical
    URLs — the steady-state majority, since discovered links come out of OUR
    extractor against canonical base URLs — bypass the Arrow UDF through a
    codegen predicate; equality with the pure UDF path is property-tested."""
    from web_crawling_prj_spark.functions.urls import (
        canonicalize_urls_hybrid,
        strip_tracking_params,
    )

    stripped = seeds.withColumn("_url_clean", strip_tracking_params(F.col("url")))
    f = (
        canonicalize_urls_hybrid(stripped, "_url_clean", "url_canon")
        .drop("_url_clean")
        .withColumn("url_hash", url_hash("url_canon"))
        .withColumn("host", host_of("url_canon"))
        .withColumns(
            {
                "depth": F.coalesce(F.col("depth"), F.lit(0)),
                "discovered_ts": F.lit(None).cast("timestamp"),
                "src_url_hash": F.lit(None).cast("long"),
                "attempt": F.lit(0),
                "next_eligible_ts": F.lit(None).cast("timestamp"),
            }
        )
        .select(*FRONTIER_COLS)
    )
    return dedup_within_batch(f, key="url_hash")


def init_crawl(spark: SparkSession, store: StateStore, seeds: DataFrame, cfg: CrawlConfig) -> None:
    """Round 0: commit the seed frontier and an empty seen-set."""
    frontier = frontier_from_seeds(seeds).repartition(cfg.num_buckets, "url_hash")
    empty_seen = spark.createDataFrame(
        [], "url_hash long, bucket int, first_seen_round int, first_seen_ts timestamp"
    )
    if cfg.frontier_deltas:
        log0 = frontier.withColumns(
            {"evt_round": F.lit(0), "is_del": F.lit(False)}
        ).select(*FRONTIER_LOG_COLS)
        store.commit_round(
            0, {"frontier_log": log0, "seen_delta": empty_seen}, extra_meta={"kind": "init"}
        )
        return
    store.commit_round(
        0, {"frontier": frontier, "seen_delta": empty_seen}, extra_meta={"kind": "init"}
    )


def run_round(
    spark: SparkSession,
    store: StateStore,
    pages: DataFrame,
    robots: DataFrame,
    round_id: int,
    cfg: CrawlConfig,
) -> dict:
    """Execute one crawl round and commit its state atomically.

    All round-scoped resources (persisted DataFrames, the bloom broadcast)
    are released in one finally block — any exit path, including the
    failure-threshold abort or an unexpected error, must not leak caches or
    executor bitmap copies into the next round."""
    persisted: list[DataFrame] = []
    bcasts: list = []
    try:
        return _run_round(spark, store, pages, robots, round_id, cfg, persisted, bcasts)
    finally:
        for df in persisted:
            df.unpersist()
        for b in bcasts:
            b.destroy()


def _resolve_events(log: DataFrame) -> DataFrame:
    """THE latest-event-wins resolution — the one place its ordering lives
    (the live read path and the compaction resolver MUST agree or increment
    ≡ full breaks): max(struct(evt_round, is_add, state)) per key — the
    newest round wins, an add beats a del within its own round (the del
    tombstones OLDER versions; its round's replacement row supersedes it).
    Output: winner state per key in FRONTIER_LOG_COLS shape (is_del=true
    rows mark keys whose latest event is a tombstone)."""
    packed = log.select(
        "url_hash",
        F.struct(
            F.col("evt_round"),
            (~F.col("is_del")).alias("is_add"),
            *[F.col(c) for c in _STATE_COLS],
        ).alias("_e"),
    )
    resolved = packed.groupBy("url_hash").agg(F.max("_e").alias("_e"))
    return resolved.select(
        "url_hash",
        *[F.col(f"_e.{c}").alias(c) for c in _STATE_COLS],
        F.col("_e.evt_round").alias("evt_round"),
        (~F.col("_e.is_add")).alias("is_del"),
    )


def _resolve_recent_log(deltas: list[DataFrame], num_buckets: int) -> DataFrame:
    """Per-key latest event over the un-folded frontier_log rounds: union of
    the per-round logs (delta-sized: Σ round churn since the last fold), ONE
    repartition to the frontier's bucket layout, then :func:`_resolve_events`.
    Output partitioning is HashPartitioning(url_hash, num_buckets), so
    downstream joins against the bucketed base/seen tables co-locate."""
    ev = deltas[0]
    for d in deltas[1:]:
        ev = ev.unionByName(d)
    return _resolve_events(ev.repartition(num_buckets, "url_hash"))


def _churn_broadcast_ok(store: StateStore, upto_round: int, cfg: CrawlConfig) -> bool:
    """One regime switch per round for every forced-broadcast churn-key join:
    True while the estimated churn-key count stays under
    cfg.broadcast_churn_max_keys. Driver-side and jobless: EXACT row counts
    from parquet footer metadata (:func:`_dir_rows` — immune to encoding
    drift), falling back to file-size ÷ bytes-per-row only if a footer is
    unreadable; either way both regimes are correct, a mis-estimate only
    moves the crossover.

    The estimate is max(un-folded window rows, newest non-empty round's
    rows): the window bounds the resolved recent-event key set exactly, and
    the last-round floor keeps the first round AFTER a fold honest — its
    window is empty, but THIS round's candidate keys are ≈ last round's
    churn, which must not be force-broadcast just because the log was folded
    (at 10^8-key rounds that broadcast is the exact OOM cliff this switch
    exists to prevent). When the round dirs are vacuumed too, the newest
    tier stands in: a minor tier is the last window's resolved churn (a ≤K×
    overestimate — conservative); a major tier is the whole backlog, which
    errs to the merge regime — always correct, never the memory cliff."""
    tiers = store.tiers("frontier_log")
    floor = tiers[-1]["upto"] if tiers else -1
    window = 0
    last_round = 0
    # newest-first: sum the un-folded window, then stop at the FIRST
    # non-empty (or vacuumed — vacuum removes a contiguous ≤floor prefix)
    # folded dir — O(window + 1) walks per round, never O(all rounds)
    for r in reversed(store.committed_rounds()):
        if r > upto_round:
            continue
        d = store._table_round_dir("frontier_log", r)
        if r > floor:
            b = _dir_keys_est(d)
            window += b
            if b and not last_round:
                last_round = b
        else:
            if last_round or not os.path.isdir(d):
                break
            b = _dir_keys_est(d)
            if b:
                last_round = b
                break
    est = max(window, last_round)
    if est == 0 and tiers:
        est = _dir_keys_est(store._base_dir("frontier_log", floor))
    return est <= cfg.broadcast_churn_max_keys


def live_frontier_parts(
    spark: SparkSession,
    store: StateStore,
    upto_round: int,
    cfg: CrawlConfig,
    persisted: list | None = None,
    bcast_ok: bool | None = None,
) -> tuple[list[DataFrame], DataFrame | None]:
    """The live frontier as a LIST of branches whose union is the live view,
    each branch keeping the store's HashPartitioning(url_hash, num_buckets)
    bucket layout — the union erases it (Spark's Union reports unknown
    output partitioning), so callers that need co-located probes (the
    incumbent lookup's merge regime) join the branches, not the union.

    Branches: one per base tier (oldest→newest) + one for the resolved
    recent churn. Per tier: live rows (``~is_del`` pushed into the scan — a
    non-terminal tier carries tombstones targeting older tiers) ∖ keys of
    every NEWER tier (zero-exchange co-located merges: both sides are
    bucketed scans) ∖ recent-event keys (broadcast below
    cfg.broadcast_churn_max_keys; above it the co-located merge — the
    resolved aggregation already carries the same partitioning). Per-round
    cost: one pushed-down scan of each tier + delta-sized everything else.

    Returns ``(parts, resolved)``: parts in FRONTIER_COLS shape; ``resolved``
    = per-key-latest recent events (FRONTIER_LOG_COLS shape, persisted when a
    ``persisted`` list is passed — it feeds many consumers per round), or
    None when no un-folded rounds exist."""
    bases, deltas = store.read_parts(spark, "frontier_log", up_to=upto_round)
    resolved = None
    if deltas:
        resolved = _resolve_recent_log(deltas, cfg.num_buckets)
        if persisted is not None:
            resolved = resolved.persist()
            persisted.append(resolved)
    if bcast_ok is None:  # round-constant; _run_round computes it ONCE and
        # passes it down (the estimate walks the store's round dirs)
        bcast_ok = _churn_broadcast_ok(store, upto_round, cfg)
    parts: list[DataFrame] = []
    for i, b in enumerate(bases):  # oldest→newest
        branch = b.where(~F.col("is_del")).select(*FRONTIER_COLS)
        for newer in bases[i + 1 :]:
            branch = branch.join(newer.select("url_hash"), "url_hash", "left_anti")
        if resolved is not None:
            keys = resolved.select("url_hash")
            branch = branch.join(
                F.broadcast(keys) if bcast_ok else keys, "url_hash", "left_anti"
            )
        parts.append(branch)
    if resolved is not None:
        parts.append(resolved.where(~F.col("is_del")).select(*FRONTIER_COLS))
    return parts, resolved


def _empty_frontier(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [],
        "url string, url_canon string, url_hash long, host string, "
        "priority double, depth int, discovered_ts timestamp, "
        "src_url_hash long, attempt int, next_eligible_ts timestamp",
    ).select(*FRONTIER_COLS)


def live_frontier(
    spark: SparkSession,
    store: StateStore,
    upto_round: int,
    cfg: CrawlConfig,
    persisted: list | None = None,
    parts_out: list | None = None,
    bcast_ok: bool | None = None,
) -> DataFrame:
    """The live frontier as of committed round ``upto_round``, either mode.

    frontier_deltas mode: the union of :func:`live_frontier_parts` — tier
    branches ∖ newer-layer keys ∪ recent adds. Each tier is touched by
    exactly ONE pushed-down scan per round — O(live) read, O(churn)
    everything else — versus the legacy mode's O(live) WRITE every round.
    The live view is disjoint from the seen-set by construction (adds are
    seen-filtered at write time, and every key entering the seen-set is
    tombstoned the same round), so pending needs no read-time seen join at
    all. ``parts_out``: optional list the branches are appended to (same
    contract as live_frontier_parts) for callers that also need the
    layout-preserving branches."""
    if not cfg.frontier_deltas:
        return store.read_round(spark, "frontier", upto_round)
    parts, _resolved = live_frontier_parts(
        spark, store, upto_round, cfg, persisted=persisted, bcast_ok=bcast_ok
    )
    if parts_out is not None:
        parts_out.extend(parts)
    if not parts:
        # no parts with rows. Either the frontier legitimately DRAINED (all
        # tombstones folded to an empty tier — empty bucketed writes emit no
        # files) / init ran with zero seeds, or this store was never in delta
        # mode. A delta store commits frontier_log EVERY round, so the newest
        # manifest answers — walk newest-first and stop at the first mention
        # (the drained idle tail must not re-parse every manifest each round).
        if store.base_upto("frontier_log") is not None:
            return _empty_frontier(spark)
        for r in reversed(store.committed_rounds()):
            if r > upto_round:
                continue
            if "frontier_log" in store.manifest(r).get("tables", []):
                return _empty_frontier(spark)
        raise ValueError(
            f"no frontier_log state up to round {upto_round} — store was "
            "initialised with frontier_deltas=False (modes cannot mix mid-store)"
        )
    live = parts[0]
    for p in parts[1:]:
        live = live.unionByName(p)
    return live


def pending_frontier(
    spark: SparkSession,
    store: StateStore,
    round_id: int,
    cfg: CrawlConfig,
    bcasts: list,
    persisted: list | None = None,
    parts_out: list | None = None,
    bcast_ok: bool | None = None,
) -> tuple[DataFrame, DataFrame, "object"]:
    """Steps 0–2 of a round: read the committed frontier, split by backoff
    eligibility, and dedup vs the seen-set → (pending, deferred, bloom).

    This is THE scale-critical plan of the steady state. frontier_deltas mode
    (default): the live view comes from :func:`live_frontier` — one bucketed
    base scan + one broadcast anti-join + the resolved recent churn; no seen
    join exists at read time because the log is kept seen-clean at write
    time. Legacy full-rewrite mode: the frontier scan, the bloom probe, and
    the anti-join chain against the compacted seen base + per-round deltas
    all run in the frontier's own bucket layout — zero exchanges end to end
    (tests/test_plan_shapes.py pins both shapes on this exact function)."""
    round_ts = cfg.round_ts(round_id)
    if cfg.frontier_deltas:
        frontier = live_frontier(
            spark, store, round_id - 1, cfg,
            persisted=persisted, parts_out=parts_out, bcast_ok=bcast_ok,
        )
    else:
        frontier = store.read_round(spark, "frontier", round_id - 1)
        seen_bases, seen_deltas = store.read_parts(spark, "seen_delta", up_to=round_id - 1)

    # 0) optional importance re-prioritization from the discovered link graph.
    # LEGACY mode only at this point: blending here rewrites every frontier
    # row's priority (fine when the whole frontier is rewritten anyway) but
    # the scores join sits BEFORE the anti-join and breaks the zero-exchange
    # bucket propagation — the documented degraded shape of the legacy path.
    # Delta mode blends at SCHEDULING time instead (_run_round step 5): the
    # rank stage shuffles by design, the pending plan keeps its shape, and
    # commits stay O(churn) (stored priorities are not rewritten; the blend
    # is a pure scheduling-time view).
    if cfg.pagerank_weight > 0 and not cfg.frontier_deltas:
        from web_crawling_prj_spark.operators.graph import priority_from_pagerank

        link_log = _link_lineage(spark, store, round_id, cfg)
        if link_log is not None:
            frontier = priority_from_pagerank(frontier, link_log, weight=cfg.pagerank_weight)

    # 1) backoff gate (reference C10): only rows whose next_eligible_ts has passed
    eligible = frontier.where(
        F.col("next_eligible_ts").isNull() | (F.col("next_eligible_ts") <= F.lit(round_ts).cast("timestamp"))
    )
    deferred = frontier.where(
        F.col("next_eligible_ts").isNotNull() & (F.col("next_eligible_ts") > F.lit(round_ts).cast("timestamp"))
    )
    if cfg.frontier_deltas:
        # live ∩ seen = ∅ by construction → pending IS the eligible set
        return eligible, deferred, None

    # 2) dedup vs seen. Two layout-matched strategies:
    #    - BUCKETED store (crawl_store): frontier, seen base, and deltas all
    #      carry HashPartitioning(url_hash, P) + per-bucket sort → the chained
    #      anti-joins are zero-exchange streaming merges. The bloom tier is
    #      deliberately NOT routed here: it only ever saved shuffle bytes, the
    #      bucketed join has none, the seen side streams fully either way, and
    #      the Arrow probe node would break partitioning propagation
    #      (EvalPython nodes report unknown output partitioning) and reinstate
    #      the exchange it was meant to avoid.
    #    - PLAIN store: bloom prefilter routes provably-unseen rows around the
    #      exchange, maintained INCREMENTALLY (puffin-style sidecar; each
    #      round ORs in a delta bloom — the full seen-set is never rescanned).
    bloom = None
    bloom_bcast = None  # round-owned broadcast (destroyed in run_round's
    # finally) — a thousand-round crawl must not accumulate bitmaps on executors
    if seen_bases or seen_deltas:
        if _use_bloom(store, cfg) and cfg.approx_seen_tier == "shard_rows":
            # partition-resident tier: probe the committed shard ROWS map-side
            # (cogroup — each task decodes only its own shard; no driver
            # assembly, no broadcast). Routing contract unchanged: probe-false
            # rows skip the layered anti-join, probe-true rows are rescued
            # exactly.
            from web_crawling_prj_spark.operators.shardprobe import (
                build_bloom_shard_rows,
                probe_bloom_shard_rows,
            )

            if store.has_table("bloom_shards", round_id - 1):
                shard_rows = store.read_round(spark, "bloom_shards", round_id - 1)
            else:  # store predates the tier: one-time build over the seen-set
                shard_rows = build_bloom_shard_rows(
                    store.read_all(spark, "seen_delta", up_to=round_id - 1),
                    num_shards=cfg.num_buckets,
                    expected_per_shard=cfg.bloom_expected_per_shard,
                    fpp=cfg.bloom_fpp,
                )
            probed = probe_bloom_shard_rows(
                eligible,
                shard_rows,
                num_shards=cfg.num_buckets,
                expected_per_shard=cfg.bloom_expected_per_shard,
                fpp=cfg.bloom_fpp,
            )
            new = probed.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
            cand = probed.filter(F.col("_maybe_seen")).drop("_maybe_seen")
            pending = new.unionByName(
                anti_join_seen_layered(cand, [*seen_bases, *seen_deltas])
            )
            return pending, deferred, None
        if _use_bloom(store, cfg):
            raw = store.load_bloom(round_id - 1)
            if raw is not None:
                bloom = bloom_from_bytes(raw)
            else:  # first bloom round (or store predates blooms): one-time build
                seen_all = store.read_all(spark, "seen_delta", up_to=round_id - 1)
                bloom = build_sharded_bloom(
                    seen_all,
                    num_shards=cfg.num_buckets,
                    expected_per_shard=cfg.bloom_expected_per_shard,
                    fpp=cfg.bloom_fpp,
                )
            bloom_bcast = broadcast_bloom(spark, bloom)
            bcasts.append(bloom_bcast)
        pending = anti_join_seen_layered(
            eligible, [*seen_bases, *seen_deltas], bloom=bloom, bloom_bcast=bloom_bcast
        )
    else:
        pending = eligible
    return pending, deferred, bloom


def _link_lineage(
    spark: SparkSession, store: StateStore, round_id: int, cfg: CrawlConfig
) -> DataFrame | None:
    """Link-graph edges (src_url_hash → url_hash) for PageRank priorities.

    Legacy mode reads them off the committed full-frontier history. Delta
    mode re-derives them from the committed fetch_log (outlinks are a pure
    function of fetched pages) — the log only stores each discovery winner
    once, so the frontier history no longer carries every edge."""
    if not cfg.frontier_deltas:
        lineage = store.read_all(spark, "frontier", up_to=round_id - 1)
        if lineage is None:
            return None
        return lineage.where(F.col("src_url_hash").isNotNull()).select(
            "src_url_hash", "url_hash"
        )
    log = store.read_all(spark, "fetch_log", up_to=round_id - 1)
    if log is None:
        return None
    edges = discover_outlinks(
        log, links_per_page=cfg.links_per_page, max_doc_id=cfg.extra.get("max_doc_id")
    )
    return edges.select("src_url_hash", "url_hash")


def _pagerank_priority(
    spark: SparkSession, store: StateStore, round_id: int, cfg: CrawlConfig, df: DataFrame
) -> tuple[DataFrame, DataFrame | None]:
    """Delta-mode PageRank blend with the ``pagerank_every`` refresh cadence.

    Returns (blended df, scores-to-commit or None). A round REUSES the
    newest committed ``pagerank_scores`` table strictly younger than K
    rounds (the walk checks at most K manifests, newest-first — never
    O(rounds)); otherwise it REFRESHES: full-history lineage → pagerank →
    normalized scores, committed with this round iff K > 1 (K = 1 reuses
    nothing, so committing would be dead weight). The cadence is a pure
    function of committed state — kill/resume and reruns land on the same
    refresh rounds, keeping the crawl's determinism invariants."""
    from web_crawling_prj_spark.operators.graph import blend_priority, normalized_pagerank

    K = max(1, cfg.pagerank_every)
    for r in reversed(store.committed_rounds()):
        if r >= round_id:
            continue
        if round_id - r >= K:
            break
        if store.has_table("pagerank_scores", r):
            scores = store.read_round(spark, "pagerank_scores", r)
            return blend_priority(df, scores, weight=cfg.pagerank_weight), None
    link_log = _link_lineage(spark, store, round_id, cfg)
    if link_log is None:
        return df, None
    pr_n = normalized_pagerank(link_log)
    blended = blend_priority(df, pr_n, weight=cfg.pagerank_weight)
    return blended, (pr_n if K > 1 else None)


#: zstd-parquet bytes per frontier row, measured on the bench layout (16M
#: rows → ~1.0 GB). Only feeds the prefilter auto-enable ESTIMATE — a 2×
#: error moves the crossover 2×, which the wide wash region tolerates.
_FRONTIER_BYTES_PER_ROW_EST = 64


def _dir_bytes(d: str) -> int:
    """Driver-side parquet footprint of one store dir — feeds the prefilter
    and broadcast-regime ESTIMATES only (no Spark job; a 2× error is fine)."""
    total = 0
    if not os.path.isdir(d):
        return 0
    for dp, _dn, fns in os.walk(d):
        for fn in fns:
            if fn.endswith(".parquet"):
                try:
                    total += os.path.getsize(os.path.join(dp, fn))
                except OSError:
                    pass
    return total


def _dir_keys_est(d: str) -> int:
    """Churn-key count of one store dir: exact footer rows when readable,
    bytes ÷ per-row constant otherwise."""
    rows = _dir_rows(d)
    return rows if rows >= 0 else _dir_bytes(d) // _FRONTIER_BYTES_PER_ROW_EST


def _dir_rows(d: str) -> int:
    """EXACT row count of one store dir from parquet FOOTER metadata —
    still driver-side and jobless (a footer read is a few KB of tail bytes
    per file), but immune to the encoding/compression drift a bytes÷constant
    estimate suffers (VERDICT r5 wrong #5). Returns -1 when any footer is
    unreadable so callers can fall back to the bytes estimate."""
    if not os.path.isdir(d):
        return 0
    try:
        import pyarrow.parquet as pq
    except Exception:  # pragma: no cover - pyarrow is a baked-in dependency
        return -1
    total = 0
    for dp, _dn, fns in os.walk(d):
        for fn in fns:
            if fn.endswith(".parquet"):
                try:
                    total += pq.ParquetFile(os.path.join(dp, fn)).metadata.num_rows
                except Exception:
                    return -1
    return total


def _resolve_prefilter(store: StateStore, cfg: CrawlConfig) -> bool:
    """Tri-state rank_prefilter: explicit setting wins; None auto-enables
    when the committed frontier's on-disk footprint implies the live row
    count has crossed the measured amortization threshold. Driver-side
    os.walk over the store dirs — no Spark job."""
    if cfg.rank_prefilter is not None:
        return cfg.rank_prefilter
    # estimate LIVE state only, never history: delta mode sums EVERY fold
    # tier (tiered folds: the live set spans all of them; tombstone rows in
    # non-terminal tiers inflate the estimate slightly — fine) + only the
    # un-folded round dirs (folded dirs stay on disk until vacuum but are
    # superseded); legacy mode reads only the last round's dir (older dirs
    # are history). Walk is O(live dirs), not O(rounds) — called once per round.
    if cfg.frontier_deltas:
        tiers = store.tiers("frontier_log")
        floor = tiers[-1]["upto"] if tiers else -1
        total = sum(_dir_bytes(store._base_dir("frontier_log", t["upto"])) for t in tiers)
        for r in store.committed_rounds():
            if r > floor:
                total += _dir_bytes(store._table_round_dir("frontier_log", r))
    else:
        last = store.last_committed_round()
        total = _dir_bytes(store._table_round_dir("frontier", last)) if last is not None else 0
    return total >= cfg.rank_prefilter_auto_min_rows * _FRONTIER_BYTES_PER_ROW_EST


def _use_bloom(store: StateStore, cfg: CrawlConfig) -> bool:
    """Bloom tier is the PLAIN-layout optimization; the bucketed layout
    replaces it structurally (see pending_frontier step 2)."""
    return cfg.use_bloom and "seen_delta" not in store.bucket_spec


def _run_round(
    spark: SparkSession,
    store: StateStore,
    pages: DataFrame,
    robots: DataFrame,
    round_id: int,
    cfg: CrawlConfig,
    persisted: list,
    bcasts: list,
) -> dict:
    round_ts = cfg.round_ts(round_id)
    live_parts: list[DataFrame] = []
    # churn-broadcast regime: round-constant — estimated ONCE here, shared by
    # the live view's tier joins and the incumbent probe below
    bcast_ok = _churn_broadcast_ok(store, round_id - 1, cfg) if cfg.frontier_deltas else True
    pending, deferred, bloom = pending_frontier(
        spark, store, round_id, cfg, bcasts,
        persisted=persisted, parts_out=live_parts, bcast_ok=bcast_ok,
    )

    # 3) robots gate (broadcast join + codegen'd prefix predicate). Persisted
    # HERE (not after the circuit split) so the quarantined branch does not
    # re-run the live-view reconstruction at commit time. Delta mode keeps
    # BOTH outcomes of the gate: disallowed keys become frontier tombstones
    # (legacy mode removes them by simply not rewriting them).
    disallowed_keys = None
    if cfg.frontier_deltas:
        flagged = gate_frontier_flagged(pending, robots).persist()
        persisted.append(flagged)
        gated = flagged.where(F.col("robots_allowed")).drop("robots_allowed")
        disallowed_keys = flagged.where(~F.col("robots_allowed")).select("url_hash")
    else:
        gated = gate_frontier(pending, robots).persist()
        persisted.append(gated)
    allowed = gated

    # 4) circuit breaker (reference C12): hosts with open circuits sit out this
    # round but their URLs are DEFERRED, not dropped — they rejoin the next
    # frontier untouched (quarantine is temporal, never data loss). Circuit
    # state is maintained INCREMENTALLY: each round folds only its own fetch
    # log into the committed host_state table (O(round), not O(history)).
    prev_host_state = None
    if round_id > 1 and store.has_table("host_state", round_id - 1):
        prev_host_state = store.read_round(spark, "host_state", round_id - 1)
    # else: store predates host_state tables (or round 1) → no circuit history
    half_open_hosts = None
    if prev_host_state is not None:
        tripped = prev_host_state.where(F.col("quarantined_until").isNotNull())
        open_hosts = tripped.where(
            F.col("quarantined_until") > F.lit(round_ts).cast("timestamp")
        ).select("host")
        # HALF_OPEN (reference error_handler.py:223-256): recovery window passed
        # but no success has reset the streak yet → admit ONE probe URL
        half_open_hosts = tripped.where(
            F.col("quarantined_until") <= F.lit(round_ts).cast("timestamp")
        ).select("host")
        quarantined = allowed.join(F.broadcast(open_hosts), "host", "left_semi").select(
            *FRONTIER_COLS
        )
        allowed = allowed.join(F.broadcast(open_hosts), "host", "left_anti")
    else:
        quarantined = None

    # 5) politeness schedule (salted two-level exact top-k per host).
    # `gated` is cached above (feeds allowed/quarantined/leftover); `scheduled`
    # feeds both fetch and the leftover anti-join — persist it so the window
    # stages run once per round.
    # Delta-mode PageRank blend happens HERE, on the rows entering the rank:
    # the rank stage owns its two designed exchanges anyway, so the scores
    # join rides into them instead of degrading the pending plan (see
    # pending_frontier step 0). The blend is a scheduling-time view: unsched-
    # uled backlog rows keep their base priorities (never rewritten — commit
    # volume stays O(churn)); only rows that re-enter via the retry path
    # carry a blended value forward (bounded by the retry budget).
    pr_scores = None
    if cfg.pagerank_weight > 0 and cfg.frontier_deltas:
        allowed, pr_scores = _pagerank_priority(spark, store, round_id, cfg, allowed)
    budgets = host_budgets(robots, cfg.round_duration_ms, max_per_host=cfg.max_per_host)
    if half_open_hosts is not None:
        # half-open circuit: budget forced to 1 probe for the host
        # full outer: a half-open host with no robots row must still get budget 1
        budgets = (
            budgets.join(half_open_hosts.withColumn("_ho", F.lit(True)), "host", "full_outer")
            .withColumn(
                "max_per_round",
                F.when(F.col("_ho"), F.lit(1)).otherwise(F.col("max_per_round")),
            )
            .drop("_ho")
        )
    # crawl-trap budgeting: candidates for THIS round's schedule are capped
    # per URL template; `allowed` itself stays untouched so trap-cut rows
    # remain pending (legacy leftover math subtracts from the uncapped set)
    candidates = allowed
    if cfg.trap_max_per_template > 0:
        from web_crawling_prj_spark.operators.traps import cap_trapped_frontier

        candidates = cap_trapped_frontier(
            allowed,
            url_col="url_canon",
            priority_col="priority",
            max_per_template=cfg.trap_max_per_template,
            n_salts=cfg.n_salts,
        )
    scheduled = schedule_round(
        candidates,
        budgets,
        n_salts=cfg.n_salts,
        default_budget=cfg.default_budget,
        threshold_prefilter=_resolve_prefilter(store, cfg),
        persisted=persisted,
        tiebreak=cfg.schedule_tiebreak,
    ).persist()
    persisted.append(scheduled)
    # frontier rows that lost the budget race stay pending for the next round.
    # Delta mode never materializes them: they simply stay live in the log
    # (not tombstoned), so the O(frontier) anti-join below is legacy-only.
    leftover = None
    if not cfg.frontier_deltas:
        leftover = allowed.join(scheduled.select("url_hash"), "url_hash", "left_anti").select(
            *FRONTIER_COLS
        )

    # 6) fetch + extract (synthetic deterministic fetcher; same schema as real).
    # The fetch log feeds FOUR consumers (next frontier, seen delta, metrics,
    # its own commit) — persist it so the fetch+extract stage runs once, not
    # once per committed table.
    fetch_log = synthetic_fetch(
        scheduled,
        pages,
        round_id,
        round_ts,
        failure_per_mille=cfg.failure_per_mille,
        roll_mode=cfg.fetch_roll_mode,
        redirect_per_mille=cfg.redirect_per_mille,
        max_doc_id=cfg.extra.get("max_doc_id"),
    )
    fetch_log = classify_fetch_log(fetch_log).persist()
    persisted.append(fetch_log)

    # 7) retries re-enter the frontier with backoff; exhausted rows tombstone
    retries = (
        fetch_log.where(F.col("can_retry"))
        .select(
            F.col("url_canon").alias("url"),
            "url_canon",
            "url_hash",
            "host",
            "priority",
            "depth",
            F.col("fetched_ts").alias("discovered_ts"),
            F.lit(None).cast("long").alias("src_url_hash"),
            "attempt",
            "next_eligible_ts",
        )
        .select(*FRONTIER_COLS)
    )

    # 8) outlink discovery feeds the next frontier
    max_doc = cfg.extra.get("max_doc_id")
    discovered = discover_outlinks(
        fetch_log, links_per_page=cfg.links_per_page, max_doc_id=max_doc
    ).withColumns({"attempt": F.lit(0), "next_eligible_ts": F.lit(None).cast("timestamp")})
    discovered = discovered.select(*FRONTIER_COLS)

    # 8b) redirect resolution (reference: httpx follow_redirects inside
    # services/request_client.py; here the redirect map is DATA): this
    # round's 3xx rows resolve — through each other, when several hops of a
    # chain were fetched in the same round — to terminal targets, which
    # enqueue like discovered links. Each hop's Location is cleaned +
    # canonicalized first (same strip→canon path as seeds), so chains key
    # consistently; ``terminated = false`` rows (cycles / over-budget) never
    # enqueue — their source is already terminal in the fetch log (class
    # 'redirect', retry budget 0 → seen). Delta-sized: only 3xx rows join.
    if cfg.redirect_per_mille > 0:
        from web_crawling_prj_spark.functions.urls import (
            canonicalize_urls_hybrid,
            strip_tracking_params,
        )
        from web_crawling_prj_spark.operators.redirects import resolve_redirects

        r3 = fetch_log.where(F.col("error_class") == "redirect").select(
            F.col("url_canon").alias("src"),
            strip_tracking_params(F.col("redirect_to")).alias("_loc"),
            "priority",
            "depth",
            F.col("fetched_ts").alias("discovered_ts"),
            F.col("url_hash").alias("src_url_hash"),
        )
        r3 = canonicalize_urls_hybrid(r3, "_loc", "dst").drop("_loc")
        resolved = resolve_redirects(r3.select("src", "dst"), max_hops=cfg.redirect_max_hops)
        terminals = (
            resolved.where(F.col("terminated"))
            .join(r3.drop("dst"), "src")
            .select(
                F.col("final").alias("url"),
                F.col("final").alias("url_canon"),
                url_hash(F.col("final")).alias("url_hash"),
                host_of(F.col("final")).alias("host"),
                "priority",
                "depth",
                "discovered_ts",
                "src_url_hash",
                F.lit(0).alias("attempt"),
                F.lit(None).cast("timestamp").alias("next_eligible_ts"),
            )
            .select(*FRONTIER_COLS)
        )
        discovered = discovered.unionByName(terminals)

    # 8c) focused crawling (WWW'99): blend each parent page's BM25 topic
    # relevance into its children's priority. Scorer input is THIS round's
    # fetch log only (delta-sized); the rel table is per-round-small and
    # broadcasts. Redirect terminals blend their 3xx source's relevance,
    # which is 0 (no text) — off-topic-by-default, the soft-focus rule.
    if cfg.focus_weight > 0 and cfg.focus_terms:
        from web_crawling_prj_spark.operators.focus import (
            blend_child_priority,
            page_relevance,
        )

        rel = page_relevance(fetch_log, list(cfg.focus_terms))
        discovered = blend_child_priority(
            discovered, rel, weight=cfg.focus_weight
        ).select(*FRONTIER_COLS)

    # dedup preference (both modes): in-flight retry state (attempt, backoff)
    # must survive a fresh rediscovery of the same URL — otherwise attempt
    # counters reset and the per-class retry budget / backoff gate are
    # silently bypassed.
    _prefer = [
        -F.coalesce(F.col("attempt"), F.lit(0)),
        -F.coalesce(F.col("priority"), F.lit(0.0)),
    ]
    if cfg.frontier_deltas:
        # Delta commit: O(churn) rows, never the 10^10-row backlog.
        #   adds = winners among {retries, discovered} ∪ their incumbent rows
        #          (same dedup_within_batch + prefer as the legacy full dedup,
        #          so conflict resolution is identical BY CONSTRUCTION — a
        #          winning incumbent re-adds its own row, a no-op on the view),
        #          seen-filtered at write time (anti_join_seen_layered) so the
        #          live view stays disjoint from the seen-set;
        #   dels = scheduled keys (fetched→seen, or replaced by their retry
        #          row) + robots-disallowed keys.
        cand = retries.unionByName(discovered)
        cand_keys = cand.select("url_hash").distinct()
        # incumbents = unchanged live rows competing with a candidate key.
        # Two regimes, flipped by the same driver-side churn estimate as the
        # live view's tier joins (cfg.broadcast_churn_max_keys):
        if bcast_ok:
            # broadcast regime (normal scale): probe the ROUND-CACHED gated/
            # deferred views — (gated ∖ scheduled) covers leftover +
            # quarantined; deferred rows bypass the gate by design. The key
            # sets are round-churn-sized → forced broadcast is the fast join.
            inc_gated = (
                gated.join(F.broadcast(cand_keys), "url_hash", "left_semi")
                .join(F.broadcast(scheduled.select("url_hash")), "url_hash", "left_anti")
                .select(*FRONTIER_COLS)
            )
            inc = inc_gated.unionByName(
                deferred.join(F.broadcast(cand_keys), "url_hash", "left_semi").select(
                    *FRONTIER_COLS
                )
            )
        else:
            # merge regime (churn too big to collect into the driver): probe
            # each live BRANCH — every branch keeps HashPartitioning(url_hash,
            # P) (live_frontier_parts contract), so the semi-joins shuffle
            # ONLY the repartitioned key set (its exchange is reused across
            # branches), never the backlog. The probe result is ≤ |cand| rows
            # per branch; the robots flag is re-derived on it (broadcast
            # join), and incumbents keep exactly the broadcast regime's rows:
            # (eligible ∧ allowed ∧ ¬scheduled) ∪ ¬eligible — an eligible-but-
            # disallowed row is tombstoned this round, never an incumbent.
            ck = cand_keys.repartition(cfg.num_buckets, "url_hash")
            probe = None
            for p in live_parts:
                hit = p.join(ck, "url_hash", "left_semi")
                probe = hit if probe is None else probe.unionByName(hit)
            if probe is None:
                inc = None
            else:
                elig = F.col("next_eligible_ts").isNull() | (
                    F.col("next_eligible_ts") <= F.lit(round_ts).cast("timestamp")
                )
                inc = (
                    gate_frontier_flagged(probe, robots)
                    .where(F.col("robots_allowed") | ~elig)
                    .drop("robots_allowed")
                    .join(
                        scheduled.select("url_hash").repartition(
                            cfg.num_buckets, "url_hash"
                        ),
                        "url_hash",
                        "left_anti",
                    )
                    .select(*FRONTIER_COLS)
                )
        winners = dedup_within_batch(
            (cand if inc is None else cand.unionByName(inc)).repartition(
                cfg.num_buckets, "url_hash"
            ),
            key="url_hash",
            prefer=_prefer,
        )
        next_frontier = None
    else:
        candidates = leftover.unionByName(deferred).unionByName(retries).unionByName(discovered)
        if quarantined is not None:
            candidates = candidates.unionByName(quarantined)
        # Repartition BEFORE the dedup groupBy: hashpartitioning(url_hash, P)
        # satisfies the aggregation's clustering requirement AND is exactly the
        # bucket layout the frontier write wants — one exchange total, and the
        # bucketed write then emits one file per bucket.
        next_frontier = dedup_within_batch(
            candidates.repartition(cfg.num_buckets, "url_hash"),
            key="url_hash",
            prefer=_prefer,
        )

    # 9) seen-delta: everything scheduled this round (fetched or failed —
    # failures re-enter via the retry path, not by staying "unseen";
    # reference: a fetched-and-failed sku is re-derived from mode='failed')
    seen_delta = (
        fetch_log.where(~F.col("can_retry"))
        .select(
            "url_hash",
            bucket_of("url_hash", cfg.num_buckets).alias("bucket"),
            F.lit(round_id).alias("first_seen_round"),
            F.col("fetched_ts").alias("first_seen_ts"),
        )
        .repartition(cfg.num_buckets, "url_hash")  # bucket layout, 1 file/bucket
    )

    # 10) per-partition lineage counters (north rule C20) — by seen bucket
    metrics = (
        fetch_log.groupBy(bucket_of("url_hash", cfg.num_buckets).alias("bucket"))
        .agg(
            F.count("*").alias("scheduled_cnt"),
            F.sum(F.when(F.col("error_class") == "ok", 1).otherwise(0)).alias("fetched_ok_cnt"),
            F.sum(F.when(F.col("error_class") != "ok", 1).otherwise(0)).alias("failed_cnt"),
            F.sum(F.when(F.col("can_retry"), 1).otherwise(0)).alias("retried_cnt"),
        )
        .withColumn("round_id", F.lit(round_id))
    )

    # run report (C20/C4 completion): the alerting row the reference renders
    # into its Teams card, committed per round next to the metrics it summarizes
    from web_crawling_prj_spark.plans.reports import run_summary

    new_host_state = update_circuit_state(prev_host_state, fetch_log)
    tables = {
        "seen_delta": seen_delta,
        "fetch_log": fetch_log.drop("max_attempts"),
        "metrics": metrics,
        "host_state": new_host_state,
        "run_report": run_summary(metrics),
    }
    if (
        not cfg.frontier_deltas
        and _use_bloom(store, cfg)
        and cfg.approx_seen_tier == "shard_rows"
    ):
        # partition-resident tier maintenance: OR this round's delta shard
        # rows into the committed table — incremental, distributed, never a
        # full seen-set rescan; committed atomically with the round
        from web_crawling_prj_spark.operators.shardprobe import (
            build_bloom_shard_rows,
            merge_bloom_shard_rows,
        )

        if store.has_table("bloom_shards", round_id - 1):
            shard_rows = merge_bloom_shard_rows(
                store.read_round(spark, "bloom_shards", round_id - 1),
                build_bloom_shard_rows(
                    seen_delta,
                    num_shards=cfg.num_buckets,
                    expected_per_shard=cfg.bloom_expected_per_shard,
                    fpp=cfg.bloom_fpp,
                ),
            )
        else:
            # migration bootstrap (ADVICE r6 high): no committed shard table
            # yet — a store that predates the tier must seed it from the FULL
            # seen-set, not this round's delta alone, or every later round
            # probes a delta-only filter and previously-seen URLs bypass the
            # exact anti-join rescue (re-enqueue/refetch). One-time cost, the
            # same full build pending_frontier already ran for this round's
            # probe.
            base = seen_delta.select("url_hash")
            hist = store.read_all(spark, "seen_delta", up_to=round_id - 1)
            if hist is not None:
                base = hist.select("url_hash").unionByName(base)
            shard_rows = build_bloom_shard_rows(
                base,
                num_shards=cfg.num_buckets,
                expected_per_shard=cfg.bloom_expected_per_shard,
                fpp=cfg.bloom_fpp,
            )
        tables["bloom_shards"] = shard_rows
    if pr_scores is not None:
        # refreshed this round with pagerank_every > 1: commit the normalized
        # scores so the next K-1 rounds blend them without touching the full
        # fetch_log history (pagerank() localCheckpoints its result — this
        # write re-runs nothing)
        tables["pagerank_scores"] = pr_scores
    if cfg.frontier_deltas:
        # write-time seen filter on the delta-sized winners (this round's
        # seen_delta included): keeps the live view seen-clean so reads never
        # join against the seen-set at all. The winners carry the bucket
        # layout (repartition upstream), so the tier joins co-locate.
        seen_bases, seen_deltas = store.read_parts(spark, "seen_delta", up_to=round_id - 1)
        adds = anti_join_seen_layered(winners, [*seen_bases, *seen_deltas, seen_delta])
        ftypes = {f.name: f.dataType for f in pending.select(*FRONTIER_COLS).schema.fields}
        del_keys = scheduled.select("url_hash").unionByName(disallowed_keys)
        del_rows = del_keys.select(
            *[
                F.lit(None).cast(ftypes[c]).alias(c) if c != "url_hash" else F.col(c)
                for c in FRONTIER_COLS
            ],
            F.lit(round_id).alias("evt_round"),
            F.lit(True).alias("is_del"),
        )
        add_rows = adds.select(
            *FRONTIER_COLS, F.lit(round_id).alias("evt_round"), F.lit(False).alias("is_del")
        )
        tables["frontier_log"] = add_rows.unionByName(del_rows).repartition(
            cfg.num_buckets, "url_hash"
        )
    else:
        tables["frontier"] = next_frontier
    store.commit_round(round_id, tables, extra_meta={"round_ts": round_ts})
    if pr_scores is not None:
        # retention: only the newest committed scores are ever read (the
        # reuse walk in _pagerank_priority looks back < K rounds), so reap
        # superseded score dirs now — score storage stays O(graph), not
        # O(rounds·graph) over a long crawl. Kill-safe: a kill before the
        # reap just leaves dirs for the next refresh round to collect.
        for r in store.committed_rounds():
            if r < round_id and store.has_table("pagerank_scores", r):
                store.drop_round_table("pagerank_scores", r)
    if "bloom_shards" in tables:
        # same retention as pagerank_scores: only the newest shard table is
        # ever probed, so reap superseded rounds — O(P·m) storage total, not
        # O(rounds·P·m). Kill-safe for the same reason.
        for r in store.committed_rounds():
            if r < round_id and store.has_table("bloom_shards", r):
                store.drop_round_table("bloom_shards", r)
    # maintain the cumulative bloom sidecar: delta bloom over this round's
    # seen_delta (tiny, fetch_log is cached) OR'd into the running bitmap.
    # Skipped entirely on the bucketed layout — nothing ever probes it there —
    # AND in delta mode, where no read path probes the seen-set at all (a
    # delta-mode round would otherwise overwrite the sidecar with just its
    # own delta bloom: wasted work + a broken cumulative contract, ADVICE r4).
    # The shard_rows tier maintains its own committed table instead.
    if (
        not cfg.frontier_deltas
        and _use_bloom(store, cfg)
        and cfg.approx_seen_tier != "shard_rows"
    ):
        delta = build_sharded_bloom(
            seen_delta,
            num_shards=cfg.num_buckets,
            expected_per_shard=cfg.bloom_expected_per_shard,
            fpp=cfg.bloom_fpp,
        )
        merged = merge_blooms(bloom, delta) if bloom is not None else delta
        store.save_bloom(round_id, bloom_to_bytes(merged))

    # read the committed tables back ONCE (two small driver jobs per round);
    # the artifact render, the summary, and the abort check all share the rows
    from web_crawling_prj_spark.plans.reports import render_run_artifact

    metrics_rows = store.read_round(spark, "metrics", round_id).collect()
    report = store.read_round(spark, "run_report", round_id).first()
    # render the human-readable run artifact (reference Teams card analog) —
    # post-commit sidecar, numbers from the committed tables only
    render_run_artifact(spark, store, round_id, rep_row=report, metrics_rows=metrics_rows)

    summary = {
        r["bucket"]: (r["scheduled_cnt"], r["fetched_ok_cnt"], r["failed_cnt"])
        for r in metrics_rows
    }
    # batch/run failure threshold (reference C4/C5): abort AFTER committing so
    # a resumed run (mode='failed' analog) starts from consistent state;
    # run_round's finally releases the caches/broadcast on this path too
    if cfg.extra.get("abort_on_failed_run"):
        if report and report["run_failed"]:
            raise RuntimeError(
                f"round {round_id} failed: {report['failed']}/{report['scheduled']} fetches failed"
            )
    totals = [sum(v[i] for v in summary.values()) for i in range(3)]
    return {
        "round_id": round_id,
        "scheduled": totals[0],
        "ok": totals[1],
        "failed": totals[2],
        "per_bucket": summary,
    }


def failed_mode_frontier(spark: SparkSession, store: StateStore) -> DataFrame | None:
    """Reference mode='failed' branch (C14, dags/common/base_source_dag.py:93-104):
    rebuild a frontier containing ONLY permanently-failed URLs (retry budget
    exhausted), attempt counters reset — the operator a new run uses to re-crawl
    yesterday's failures after fixing credentials/proxies."""
    log = store.read_all(spark, "fetch_log")
    if log is None:
        return None
    w = Window.partitionBy("url_hash").orderBy(F.desc("round_id"), F.desc("attempt"))
    latest = log.withColumn("_rn", F.row_number().over(w)).where("_rn = 1")
    failed = latest.where((F.col("error_class") != "ok") & (~F.col("can_retry")))
    return failed.select(
        F.col("url_canon").alias("url"),
        "url_canon",
        "url_hash",
        "host",
        "priority",
        "depth",
        F.col("fetched_ts").alias("discovered_ts"),
        F.lit(None).cast("long").alias("src_url_hash"),
        F.lit(0).alias("attempt"),
        F.lit(None).cast("timestamp").alias("next_eligible_ts"),
    ).select(*FRONTIER_COLS)


def refresh_mode_frontier(
    spark: SparkSession,
    store: StateStore,
    now_ts: str,
    base_interval_h: float = 1.0,
    max_doublings: int = 6,
) -> DataFrame | None:
    """Freshness mode (beyond the reference's all/failed pair, C14): rebuild
    a frontier of SEEN pages whose adaptive recrawl deadline has passed —
    interval doubles per consecutive fetch with unchanged extracted content,
    resets on change (operators.recrawl). Content identity is
    ``md5(extracted_text)``, so a byte-identical re-render does not count as
    a change. Attempt counters reset (this is a fresh fetch, not a retry);
    priority carries over; ``next_eligible_ts`` = the page's own deadline, so
    the round's backoff gate and the recrawl deadline are one mechanism."""
    from web_crawling_prj_spark.operators.recrawl import due_for_refetch, recrawl_schedule

    log = store.read_all(spark, "fetch_log")
    if log is None:
        return None
    hist = log.where(F.col("error_class") == "ok").withColumn(
        "_fp", F.md5(F.coalesce(F.col("extracted_text"), F.lit("")))
    )
    sched = recrawl_schedule(
        hist,
        key="url_hash",
        ts="fetched_ts",
        fingerprint="_fp",
        tiebreak="attempt",
        base_interval_h=base_interval_h,
        max_doublings=max_doublings,
    )
    due = due_for_refetch(
        sched, key="url_hash", ts="fetched_ts", now=now_ts, tiebreak="attempt"
    )
    return due.select(
        F.col("url_canon").alias("url"),
        "url_canon",
        "url_hash",
        "host",
        "priority",
        "depth",
        F.col("fetched_ts").alias("discovered_ts"),
        F.lit(None).cast("long").alias("src_url_hash"),
        F.lit(0).alias("attempt"),
        F.col("next_fetch_ts").alias("next_eligible_ts"),
    ).select(*FRONTIER_COLS)


def run_crawl(
    spark: SparkSession,
    store: StateStore,
    pages: DataFrame,
    robots: DataFrame,
    seeds: DataFrame,
    rounds: int,
    cfg: CrawlConfig | None = None,
    robots_source=None,
) -> list[dict]:
    """Drive `rounds` crawl rounds, resuming from the last committed round.

    Reference C17: a killed run re-derives pending work from committed state —
    here that is literally `last_committed_round() + 1`.

    ``robots_source``: optional ``(spark, round_id) -> DataFrame[host,
    robots_txt]`` — the between-rounds credential/config refresh hook
    (reference C13, services/credential_refresh_service.py:38-169): each round
    re-fetches the raw per-host rules and re-parses them, so a host that turns
    hostile mid-crawl stops being scheduled from the NEXT round on. When None,
    the pre-parsed ``robots`` table is used unchanged all run.
    """
    from web_crawling_prj_spark.operators.robots import parse_robots_table
    from web_crawling_prj_spark.plans.statestore import guard_union_partitioning

    # correctness under ANY caller-built session (the store's read paths guard
    # too; this covers plans built before the first store read)
    guard_union_partitioning(spark)
    cfg = cfg or CrawlConfig()
    last = store.last_committed_round()
    if last is not None:
        # a store is created in one frontier layout and stays in it: resuming
        # with the other mode would silently read an empty frontier — refuse
        # up front with the fix in the message (same spirit as the bucket
        # layout drift guard in statestore)
        committed = store.manifest(last).get("tables", [])
        has_log = "frontier_log" in committed or store.base_upto("frontier_log") is not None
        has_full = "frontier" in committed
        if cfg.frontier_deltas and has_full and not has_log:
            raise ValueError(
                "store was created with frontier_deltas=False (full-rewrite "
                "layout); resume with CrawlConfig(frontier_deltas=False)"
            )
        if not cfg.frontier_deltas and has_log and not has_full:
            raise ValueError(
                "store was created with frontier_deltas=True (event-log "
                "layout); resume with CrawlConfig(frontier_deltas=True)"
            )
    if last is None:
        init_crawl(spark, store, seeds, cfg)
        last = 0
    if cfg.warc_dir:
        # resume catch-up: rebuild any archive a kill orphaned (derived
        # artifact — pure function of committed state, always rebuildable)
        from web_crawling_prj_spark.sources.warc import archive_missing_rounds

        archive_missing_rounds(spark, store, pages, cfg.warc_dir, cfg.num_buckets)
    stats = []
    for r in range(last + 1, rounds + 1):
        if robots_source is not None:
            robots = parse_robots_table(robots_source(spark, r))
        stats.append(run_round(spark, store, pages, robots, r, cfg))
        if cfg.warc_dir:
            from web_crawling_prj_spark.sources.warc import archive_round

            archive_round(spark, store, pages, r, cfg.warc_dir, cfg.num_buckets)
        if cfg.compact_every and r % cfg.compact_every == 0:
            store.compact(
                spark,
                "seen_delta",
                up_to=r,
                num_buckets=cfg.num_buckets,
                max_tiers=cfg.fold_max_tiers,
            )
            if cfg.frontier_deltas:
                # TIERED event-log fold: a minor fold resolves only the
                # rounds since the newest tier — O(window churn), keeping
                # tombstones that target older tiers — so the only O(live)
                # job left anywhere is the major fold every
                # fold_max_tiers·compact_every rounds (amortized
                # O(live/(T·K)) per round; was O(live/K) with the round-4
                # always-major fold, and O(live) EVERY round in legacy mode).
                store.compact(
                    spark,
                    "frontier_log",
                    up_to=r,
                    num_buckets=cfg.num_buckets,
                    max_tiers=cfg.fold_max_tiers,
                    resolver=resolve_frontier_log,
                )
            if cfg.vacuum_after_fold:
                store.vacuum_compacted("seen_delta", spark)
                if cfg.frontier_deltas:
                    store.vacuum_compacted("frontier_log", spark)
    return stats


def resolve_frontier_log(df: DataFrame, terminal: bool = True) -> DataFrame:
    """Fold resolver for the frontier event log: the SAME latest-event
    resolution as the live read path (:func:`_resolve_events`), in the log's
    own schema.

    ``terminal`` (statestore.compact's flag): True when the fold output has
    no tier beneath it (major fold / first tier) — tombstoned keys can then
    be dropped outright. A non-terminal MINOR fold resolves only its own
    round window, so a tombstone may target a key living in an OLDER tier:
    those rows are KEPT (the tier's keys shadow older tiers at read; the
    final ``~is_del`` filter drops them from the live view). This is what
    bounds fold cost by the churn window instead of the 10^10-row backlog."""
    out = _resolve_events(df)
    if terminal:
        out = out.where(~F.col("is_del"))
    return out.select(*FRONTIER_LOG_COLS)
