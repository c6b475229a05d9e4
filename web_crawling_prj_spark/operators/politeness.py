"""Politeness-aware per-host scheduling — salted window ranking (SURVEY.md W4/C1-C6).

Reference semantics being re-expressed declaratively:
- rate limit: sleep(1/rps) before each request (services/request_client.py:222-223,
  default 2 rps :67) → per-host budget = round_duration / crawl_delay, and a
  per-row ``fetch_offset_ms`` spacing fetches inside the round;
- concurrency cap (semaphore(10), :261-263) → the budget cap + executor
  parallelism;
- proxy rotation every 5 requests over a 30-slot pool (:269-275) →
  deterministic ``proxy_slot`` column;
- per-source serialization (Semaphore(1), criteo_service.py:140) → the
  degenerate budget=1 case.

Skew is the scale hazard: one hot host can own 25%+ of the frontier, so a naive
``Window.partitionBy(host)`` puts 2.5B rows in one task at 10^10 scale. The
two-level salted rank bounds that: level 1 ranks within (host, salt) — at most
1/n_salts of the hot host per task — and keeps only `budget` rows per salt;
level 2 ranks exactly within host over ≤ n_salts × budget survivors. The global
top-`budget` per host is provably a subset of the union of per-salt top-`budget`
sets, so the result is EXACTLY the unsalted ranking at a fraction of the cost.

Ordering is a pure function of data — (priority DESC, url_hash ASC) — never of
partition arrival, so local[8] and local[32] schedule identical batches
(determinism requirement, SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CRAWL_DELAY_MS = 500  # reference: 2 rps (services/request_client.py:67)
PROXY_POOL = 30  # services/request_client.py:74
PROXY_SWITCH_EVERY = 5  # services/request_client.py:269-275


def host_budgets(robots: DataFrame, round_duration_ms: int, max_per_host: int | None = None) -> DataFrame:
    """Per-host rows-per-round budget from crawl delay (politeness arithmetic)."""
    delay = F.coalesce(F.col("crawl_delay_ms"), F.lit(DEFAULT_CRAWL_DELAY_MS))
    budget = F.when(delay <= 0, F.lit(round_duration_ms)).otherwise(
        F.floor(F.lit(round_duration_ms) / delay)
    )
    if max_per_host is not None:
        budget = F.least(budget, F.lit(max_per_host))
    return robots.select(
        "host",
        F.greatest(budget, F.lit(1)).cast("int").alias("max_per_round"),
        delay.alias("crawl_delay_ms"),
    )


def reputation_budgets(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    base_budget: int = 40,
    cap: int = 400,
) -> DataFrame:
    """Spam-resistant crawl budgets from in-link DIVERSITY (IRLbot, Lee et
    al. WWW'08: budget a site by how many DISTINCT other sites link to it —
    volume is cheap for a spam farm to inflate, diversity is expensive).

    budget = min(cap, base · (floor(log2(1 + in_hosts)) + 1)), with the log2
    computed as the bin-string length of (1 + in_hosts) — pure integer math,
    so the whole policy is DuckDB-oracle-exact. Self-loops never count.
    One countDistinct groupBy (two-phase partial agg); the result is one row
    per host — broadcastable into schedule_round like host_budgets."""
    s, d = F.col(src), F.col(dst)
    rep = (
        edges.where(s != d)
        .groupBy(d.alias("node"))
        .agg(F.countDistinct(s).alias("in_hosts"))
    )
    budget = F.least(
        F.lit(cap), F.lit(base_budget) * F.length(F.bin(F.col("in_hosts") + 1))
    )
    return rep.select(
        "node",
        F.col("in_hosts").cast("long").alias("in_hosts"),
        budget.cast("int").alias("max_per_round"),
    )


def schedule_round(
    pending: DataFrame,
    budgets: DataFrame,
    n_salts: int = 16,
    default_budget: int = 60,
    slim: bool = False,
    threshold_prefilter: bool = False,
    prefilter_sample_mod: int = 64,
    prefilter_safety: float = 2.0,
    persisted: list | None = None,
    tiebreak: str = "url_hash",
) -> DataFrame:
    """Pick ≤ budget URLs per host: two-level salted exact top-k.

    Input: pending frontier with (host, priority, url_hash, ...).
    Output: scheduled rows + host_rank / fetch_offset_ms / proxy_slot columns.
    Budgets are broadcast (one row per host — always small relative to frontier).

    ``slim=True`` ranks over a key-only projection (url_hash, host, priority)
    and joins the winners back by url_hash, so the window sorts never move wide
    frontier rows through the shuffle. Measured on this repo's ~100B rows the
    extra join costs more than the slimmer sort saves, so the default is
    slim=False; enable it when frontier rows carry KB-wide payload/metadata
    columns (then the sort-byte reduction dominates, and on a bucketed table
    the join-back co-locates with the frontier layout for free).

    ``threshold_prefilter=True`` adds a sampled top-k pushdown BEFORE the rank
    shuffle: a deterministic 1-in-``prefilter_sample_mod`` hash sample yields a
    conservative per-host priority threshold (the per-salt k-th highest sample,
    k = ⌈budget·safety/mod⌉, min'd over salts — never a single-task sort), and
    only rows at-or-above it enter the window. EXACTNESS is restored by a
    rescue pass: a host whose post-filter winners number under its budget
    while rows were cut re-ranks its FULL row set (see
    :func:`_rescue_hosts_for_exactness`); ties at the threshold are always
    kept, so the kept set provably contains the true winners whenever the
    count reaches the budget. It cuts the rank-shuffle ROWS ~6–10× at the
    cost of one extra full scan + the sample/threshold jobs. Round-4 honest
    measurement (BENCH/SCALING.md, winners-cache lifecycle fixed): on this
    single-node VM the pushdown LOSES at every point tried (16M–64M rows,
    8 and 32 cores, 0.23–0.80×) — the earlier "2.1× at 8 cores" was the
    leaked cache serving later best-of runs. It stays available for
    network-bound clusters where shuffle bytes, not the local memory bus,
    price the rank; measure before enabling (CrawlConfig.rank_prefilter).
    """
    # ``tiebreak``: the ascending order column breaking priority ties inside a
    # host (default url_hash — cheap 8-byte sort key). A crawl that must be
    # replayable by an engine without xxhash64 (the DuckDB replay oracle)
    # passes "url_canon": same exact-top-k semantics, portable total order.
    slim_proj = ["url_hash", "host", "priority"] + (
        [tiebreak] if tiebreak not in ("url_hash", "host", "priority") else []
    )
    slim_cols = pending.select(*slim_proj) if slim else pending
    p = slim_cols.join(
        F.broadcast(budgets.select("host", "max_per_round", "crawl_delay_ms")),
        "host",
        "left",
    ).withColumns(
        {
            "max_per_round": F.coalesce("max_per_round", F.lit(default_budget)),
            "crawl_delay_ms": F.coalesce("crawl_delay_ms", F.lit(DEFAULT_CRAWL_DELAY_MS)),
        }
    )

    order = [F.desc("priority"), F.asc(tiebreak)]
    salt = F.pmod(F.col("url_hash"), F.lit(n_salts))

    def exact_rank(rows: DataFrame) -> DataFrame:
        w1 = Window.partitionBy("host", salt).orderBy(*order)
        pre = (
            rows.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= F.col("max_per_round"))
            .drop("_r1")
        )
        w2 = Window.partitionBy("host").orderBy(*order)
        return pre.withColumn("host_rank", F.row_number().over(w2)).filter(
            F.col("host_rank") <= F.col("max_per_round")
        )

    if threshold_prefilter:
        sched = _rank_with_threshold_prefilter(
            p, exact_rank, salt, prefilter_sample_mod, prefilter_safety, persisted
        )
    else:
        sched = exact_rank(p)

    # politeness spacing + proxy rotation, all deterministic column math
    sched = sched.withColumns(
        {
            "fetch_offset_ms": ((F.col("host_rank") - 1) * F.col("crawl_delay_ms")).cast("long"),
            "proxy_slot": F.pmod(
                F.floor((F.col("host_rank") - 1) / PROXY_SWITCH_EVERY)
                + F.pmod(F.xxhash64("host"), F.lit(PROXY_POOL)),
                F.lit(PROXY_POOL),
            ).cast("int"),
        }
    ).drop("max_per_round", "crawl_delay_ms")
    if not slim:
        return sched
    winners = sched.select("url_hash", "host_rank", "fetch_offset_ms", "proxy_slot")
    return pending.join(winners, "url_hash", "inner")


def _rank_with_threshold_prefilter(
    p: DataFrame,
    exact_rank,
    salt,
    sample_mod: int,
    safety: float,
    persisted: list | None = None,
) -> DataFrame:
    """Sampled top-k pushdown around ``exact_rank`` — exact by construction.

    1. deterministic hash sample (1 in ``sample_mod`` rows);
    2. conservative per-host threshold: within each (host, salt) the k-th
       highest sampled priority (k = ⌈budget·safety/mod⌉ ≥ 1), then MIN over
       salts — the min keeps MORE rows and bounds every sort by the salt
       fan-out, never a single hot-host task;
    3. keep rows with priority ≥ threshold (ties kept → the kept set contains
       the true winners whenever it is budget-deep) plus all rows of hosts too
       small to have a threshold; exact_rank the survivors;
    4. rescue: any thresholded host whose winner count came up short of its
       budget re-ranks its FULL rows — only then can a cut row have mattered.
       The rescue set is detected with one tiny aggregation over the winner
       rows (≤ hosts×budget) and is empty in the expected case, so the extra
       pass usually never runs.
    """
    sample = p.where(F.pmod(F.xxhash64("url_hash"), F.lit(sample_mod)) == 0)
    k = F.greatest(
        F.lit(1), F.ceil(F.col("max_per_round") * float(safety) / sample_mod)
    ).cast("int")
    # the TRUE per-host sample k-th, computed with the same two-level trick as
    # the main rank (per-(host,salt) top-k then exact per-host k-th over
    # ≤ n_salts·k survivors) — a hot host's sample never sorts in one task,
    # and cold hosts get TIGHT thresholds too (a per-salt min would barely
    # filter them: most (host,salt) cells hold fewer than k samples)
    ws1 = Window.partitionBy("host", salt).orderBy(F.desc("priority"))
    s_pre = sample.withColumn("_sr", F.row_number().over(ws1)).where(F.col("_sr") <= k)
    ws2 = Window.partitionBy("host").orderBy(F.desc("priority"))
    thr = (
        s_pre.withColumn("_sr2", F.row_number().over(ws2))
        .where(F.col("_sr2") == k)
        .select("host", F.col("priority").alias("_thr"))
    )
    # the threshold-applied marker rides THROUGH the rank so rescue detection
    # reads it off the cached winners — re-deriving "was this host
    # thresholded?" from thr would re-run the sample + its windows over the
    # full input a second time
    filtered = (
        p.join(F.broadcast(thr), "host", "left")
        .where(F.col("_thr").isNull() | (F.col("priority") >= F.col("_thr")))
        .withColumn("_had_thr", F.col("_thr").isNotNull())
        .drop("_thr")
    )
    # persist the winners: the rescue check below is an ACTION over them, and
    # without the cache it would re-execute the whole filtered rank a second
    # time when the caller consumes the result. Bounded ≤ hosts×budget rows.
    # Spark's unpersist is non-cascading and the returned plan carries a
    # Project on top of this one, so the CALLER cannot release this cache by
    # unpersisting the return value — the handle must be surfaced via
    # ``persisted`` (run_round's round lifecycle) or released here before
    # returning (one recompute at the caller's action).
    sched = exact_rank(filtered).persist()
    if persisted is not None:
        persisted.append(sched)

    # rescue detection: thresholded hosts whose winners fall short of budget.
    # (A thresholded host whose TOTAL rows are under budget lands here too —
    # nothing qualifying was cut, its redo is a no-op on few rows; the
    # threshold's k-sample requirement makes such hosts rare.) Broadcast
    # joins, never collected values or isin literals — the rescue set must
    # not grow the plan or the driver with host-count.
    short = (
        sched.where(F.col("_had_thr"))
        .groupBy("host")
        .agg(F.count("*").alias("_n"), F.first("max_per_round").alias("_b"))
        .where(F.col("_n") < F.col("_b"))
        .select("host")
    )
    if short.isEmpty():  # the expected case: one tiny job over cached winners
        if persisted is None:
            # no owner to release the cache later — drop it now; the caller's
            # action recomputes the filtered rank once (same total executions
            # as never persisting), but nothing accumulates across rounds
            sched.unpersist()
        return sched.drop("_had_thr")
    ok = sched.join(F.broadcast(short), "host", "left_anti").drop("_had_thr")
    redo = exact_rank(p.join(F.broadcast(short), "host", "left_semi"))
    result = ok.unionByName(redo)
    # rare path: the returned plan no longer equals the cached one — release
    # now (harmless double-unpersist later if registered in ``persisted``)
    sched.unpersist()
    return result


def batch_ids(df: DataFrame, batch_size: int = 50) -> DataFrame:
    """Reference ``chunk_list`` (dags/common/base_source_dag.py:55-57): assign a
    deterministic batch id per host from the politeness rank."""
    return df.withColumn("batch_id", F.floor((F.col("host_rank") - 1) / batch_size).cast("int"))
