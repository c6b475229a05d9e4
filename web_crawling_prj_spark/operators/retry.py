"""Retry/error semantics as pure column arithmetic (SURVEY.md C8-C12).

The reference runs a per-item retry loop inside the worker process
(``services/error_handler.py:357-440``). In a batch-round engine, retries are
DATA: a failed fetch row re-enters the next round's frontier with an
incremented ``attempt`` and a backoff gate ``next_eligible_ts``; exhausted rows
become permanent tombstones (reference ``(identifier, None)``,
error_handler.py:424-432). Everything below is a native expression — the whole
state machine is shuffle-free column math.

Parity tables (byte-matched against the reference, tested in
tests/test_retry.py):
- classification: exception/status → class (error_handler.py:73-99);
- budgets: NETWORK 5, RATE_LIMIT 3, TIMEOUT 3, PROXY 2, AUTH 1, TOKEN 1,
  API 0, PARSING 0, UNKNOWN 3 (= config.max_retries, error_handler.py:30-46,136);
- backoff: min(base·2^(n-1), 60 s) with per-class bases rate_limit 10 s,
  token_expired 3 s, proxy_error 2 s, auth_error 2 s, default 1 s, jitter
  ×[0.5, 1.0) (error_handler.py:141-165) — jitter here is a deterministic hash
  draw so reruns and different parallelism levels reproduce identical schedules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# class name → max retries (services/error_handler.py:30-46; UNKNOWN uses
# config.max_retries = 3, error_handler.py:32,136)
RETRY_BUDGETS: dict[str, int] = {
    "network_error": 5,
    "rate_limit": 3,
    "timeout": 3,
    "proxy_error": 2,
    "auth_error": 1,
    "token_expired": 1,
    "api_error": 0,
    "parsing_error": 0,
    "unknown": 3,
    # 3xx is terminal for the URL itself: its resolved TARGET re-enters the
    # frontier via the discovery step (plans.crawl_round wiring of
    # operators.redirects.resolve_redirects), the source is never refetched.
    "redirect": 0,
}

# per-class base delays (error_handler.py:146-153); others base 1 s
BACKOFF_BASE_S = {
    "rate_limit": 10.0,
    "token_expired": 3.0,
    "proxy_error": 2.0,
    "auth_error": 2.0,
}
BACKOFF_CAP_S = 60.0
CIRCUIT_OPEN_AFTER = 10  # consecutive failures (error_handler.py:226-231)
CIRCUIT_RECOVERY_S = 60.0


def classify_status(http_code: Column | str, error_kind: Column | str | None = None) -> Column:
    """HTTP status / transport error → error class (error_handler.py:73-99).

    ``error_kind`` carries transport-level failures that have no HTTP code
    (dns/conn/timeout/proxy/parse), mirroring the exception-type branch.
    """
    code = F.col(http_code) if isinstance(http_code, str) else http_code
    kind = F.col(error_kind) if isinstance(error_kind, str) else error_kind
    by_code = (
        F.when(code.isin(429, 408, 498), F.lit("rate_limit"))
        .when(code == 401, F.lit("auth_error"))
        .when(code == 403, F.lit("token_expired"))
        .when((code >= 400) & (code < 500), F.lit("api_error"))
        .when(code >= 500, F.lit("network_error"))
        .when((code >= 300) & (code < 400), F.lit("redirect"))
        .when((code >= 200) & (code < 300), F.lit("ok"))
        .otherwise(F.lit("unknown"))
    )
    if kind is None:
        return by_code
    return (
        F.when(kind == "timeout", F.lit("timeout"))
        .when(kind == "proxy", F.lit("proxy_error"))
        .when(kind == "network", F.lit("network_error"))
        .when(kind == "parsing", F.lit("parsing_error"))
        .otherwise(by_code)
    )


def retry_budget(error_class: Column | str) -> Column:
    """Per-class max attempts as a CASE ladder (error_handler.py:30-46)."""
    c = F.col(error_class) if isinstance(error_class, str) else error_class
    out = F.lit(0)
    for name, budget in RETRY_BUDGETS.items():
        out = F.when(c == name, F.lit(budget)).otherwise(out)
    return out


def backoff_seconds(error_class: Column | str, attempt: Column | str, jitter_key: Column | None = None) -> Column:
    """min(base·2^(attempt-1), 60) with deterministic ×[0.5,1.0) jitter.

    ``attempt`` is 1-based (the attempt that just failed). Jitter is drawn from
    a hash of (jitter_key, attempt) so the schedule is a pure function of data.
    """
    c = F.col(error_class) if isinstance(error_class, str) else error_class
    a = F.col(attempt) if isinstance(attempt, str) else attempt
    base = F.lit(1.0)
    for name, sec in BACKOFF_BASE_S.items():
        base = F.when(c == name, F.lit(sec)).otherwise(base)
    raw = F.least(base * F.pow(F.lit(2.0), a.cast("double") - 1), F.lit(BACKOFF_CAP_S))
    if jitter_key is None:
        return raw
    u = F.pmod(F.xxhash64(jitter_key, a), F.lit(1_000_000)) / 1_000_000.0
    return raw * (0.5 + 0.5 * u)


def classify_fetch_log(fetch_log: DataFrame) -> DataFrame:
    """Annotate raw fetch results with class / budget / retryability / backoff."""
    df = fetch_log.withColumn("error_class", classify_status("http_code", "error_kind"))
    df = df.withColumn("max_attempts", retry_budget("error_class"))
    df = df.withColumn(
        "can_retry",
        (F.col("error_class") != "ok") & (F.col("attempt") <= F.col("max_attempts")),
    )
    return df.withColumn(
        "next_eligible_ts",
        F.when(
            F.col("can_retry"),
            F.col("fetched_ts")
            + F.make_interval(secs=backoff_seconds("error_class", "attempt", F.col("url_hash"))),
        ),
    )


CIRCUIT_STATE_SCHEMA = (
    "host string, last_fetch_ts timestamp, consecutive_failures long, "
    "last_fail_ts timestamp, quarantined_until timestamp"
)


def update_circuit_state(prev: DataFrame | None, round_log: DataFrame) -> DataFrame:
    """Incremental circuit fold: prev per-host state ⊕ ONE round's fetch log →
    new state. Same semantics as :func:`host_circuit_state` over the full
    history (tested equivalent), but each round touches only its own log —
    O(round) instead of O(history) per round.
    """
    ok = F.col("error_class") == "ok"
    agg = round_log.groupBy("host").agg(
        F.max(F.when(ok, F.col("fetched_ts"))).alias("_ok_ts"),
        F.max("fetched_ts").alias("_r_last_fetch"),
        F.max(F.when(~ok, F.col("fetched_ts"))).alias("_fail_ts"),
    )
    trailing = (
        round_log.join(agg.select("host", F.col("_ok_ts").alias("_o")), "host")
        .where(~ok & (F.col("_o").isNull() | (F.col("fetched_ts") > F.col("_o"))))
        .groupBy("host")
        .agg(F.count("*").alias("_trail"))
    )
    rnd = agg.join(trailing, "host", "left").withColumn(
        "_trail", F.coalesce("_trail", F.lit(0))
    )
    if prev is None:
        merged = rnd.select(
            "host",
            F.lit(None).cast("timestamp").alias("_p_last_fetch"),
            F.lit(None).cast("long").alias("_p_streak"),
            F.lit(None).cast("timestamp").alias("_p_fail_ts"),
            "_ok_ts",
            "_r_last_fetch",
            "_fail_ts",
            "_trail",
        )
    else:
        p = prev.select(
            "host",
            F.col("last_fetch_ts").alias("_p_last_fetch"),
            F.col("consecutive_failures").alias("_p_streak"),
            F.col("last_fail_ts").alias("_p_fail_ts"),
        )
        merged = p.join(rnd, "host", "full_outer")

    in_round = F.col("_r_last_fetch").isNotNull()
    has_ok = F.col("_ok_ts").isNotNull()
    streak = (
        F.when(~in_round, F.coalesce("_p_streak", F.lit(0)))
        .when(has_ok, F.col("_trail"))
        .otherwise(F.coalesce("_p_streak", F.lit(0)) + F.col("_trail"))
    )
    last_fail = (
        F.when(~in_round, F.col("_p_fail_ts"))
        .when(F.col("_trail") > 0, F.col("_fail_ts"))
        .otherwise(F.lit(None).cast("timestamp"))  # streak reset by an ok
    )
    out = merged.select(
        "host",
        F.greatest(
            F.coalesce("_r_last_fetch", F.col("_p_last_fetch")),
            F.coalesce("_p_last_fetch", F.col("_r_last_fetch")),
        ).alias("last_fetch_ts"),
        streak.cast("long").alias("consecutive_failures"),
        last_fail.alias("last_fail_ts"),
    )
    return out.withColumn(
        "quarantined_until",
        F.when(
            (F.col("consecutive_failures") >= CIRCUIT_OPEN_AFTER)
            & F.col("last_fail_ts").isNotNull(),
            F.col("last_fail_ts") + F.make_interval(secs=F.lit(CIRCUIT_RECOVERY_S)),
        ),
    )


def host_circuit_state(fetch_log: DataFrame) -> DataFrame:
    """Per-host circuit breaker (error_handler.py:223-256): a host whose trailing
    failure streak ≥ 10 is quarantined until last_failure + 60 s.

    Streak = failures strictly after the host's last success — one agg pass,
    no window over the full log. Output matches CIRCUIT_STATE_SCHEMA exactly,
    so a full-history rebuild can seed :func:`update_circuit_state` as `prev`
    (the recovery path for stores missing the incremental host_state table).
    """
    per_host = fetch_log.groupBy("host").agg(
        F.max(F.when(F.col("error_class") == "ok", F.col("fetched_ts"))).alias("_last_ok"),
        F.max("fetched_ts").alias("last_fetch_ts"),
    )
    streaks = fetch_log.join(per_host.select("host", "_last_ok"), "host", "left").where(
        F.col("_last_ok").isNull() | (F.col("fetched_ts") > F.col("_last_ok"))
    )
    streak_cnt = streaks.where(F.col("error_class") != "ok").groupBy("host").agg(
        F.count("*").alias("consecutive_failures"),
        F.max("fetched_ts").alias("last_fail_ts"),
    )
    return (
        per_host.join(streak_cnt, "host", "left")
        .withColumn("consecutive_failures", F.coalesce("consecutive_failures", F.lit(0)).cast("long"))
        .withColumn(
            "quarantined_until",
            F.when(
                F.col("consecutive_failures") >= CIRCUIT_OPEN_AFTER,
                F.col("last_fail_ts") + F.make_interval(secs=F.lit(CIRCUIT_RECOVERY_S)),
            ),
        )
        .select("host", "last_fetch_ts", "consecutive_failures", "last_fail_ts", "quarantined_until")
    )
