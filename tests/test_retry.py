from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.retry import (
    RETRY_BUDGETS,
    backoff_seconds,
    classify_fetch_log,
    classify_status,
    host_circuit_state,
    retry_budget,
)


def test_classification_table(spark):
    # parity with services/error_handler.py:73-99
    rows = [
        (429, None, "rate_limit"),
        (408, None, "rate_limit"),
        (498, None, "rate_limit"),
        (401, None, "auth_error"),
        (403, None, "token_expired"),
        (404, None, "api_error"),
        (500, None, "network_error"),
        (200, None, "ok"),
        (None, "timeout", "timeout"),
        (None, "proxy", "proxy_error"),
        (None, "network", "network_error"),
        (200, "parsing", "parsing_error"),
        (None, None, "unknown"),
    ]
    df = spark.createDataFrame(
        [(c, k) for c, k, _ in rows], "http_code int, error_kind string"
    )
    got = [r.cls for r in df.select(classify_status("http_code", "error_kind").alias("cls")).collect()]
    assert got == [want for _, _, want in rows]


def test_budget_table(spark):
    # parity with services/error_handler.py:30-46; UNKNOWN = max_retries = 3
    # (error_handler.py:32,136). Hardcoded so a drift in RETRY_BUDGETS fails here.
    want = {
        "network_error": 5,
        "rate_limit": 3,
        "timeout": 3,
        "proxy_error": 2,
        "auth_error": 1,
        "token_expired": 1,
        "api_error": 0,
        "parsing_error": 0,
        "unknown": 3,
        # beyond the reference (httpx follows 3xx internally): the source URL
        # of a redirect is terminal — its resolved target re-enters via the
        # discovery step, never a refetch of the source
        "redirect": 0,
    }
    assert RETRY_BUDGETS == want
    df = spark.createDataFrame([(k,) for k in RETRY_BUDGETS], "cls string")
    got = {r.cls: r.b for r in df.select("cls", retry_budget("cls").alias("b")).collect()}
    assert got == want


def test_backoff_schedule(spark):
    # min(base*2^(n-1), 60) with all five per-class bases
    # (error_handler.py:146-153): rate_limit 10, token_expired 3,
    # proxy_error 2, auth_error 2, default 1. No jitter.
    bases = {
        "network_error": 1.0,
        "timeout": 1.0,
        "unknown": 1.0,
        "rate_limit": 10.0,
        "token_expired": 3.0,
        "proxy_error": 2.0,
        "auth_error": 2.0,
    }
    df = spark.createDataFrame(
        [(cls, a) for cls in bases for a in range(1, 9)],
        "cls string, attempt int",
    )
    got = df.select("cls", "attempt", backoff_seconds("cls", "attempt").alias("s")).collect()
    for r in got:
        assert r.s == min(bases[r.cls] * 2 ** (r.attempt - 1), 60.0), (r.cls, r.attempt)


def test_backoff_jitter_bounds_and_determinism(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "url_hash long").withColumn(
        "cls", F.lit("network_error")
    ).withColumn("attempt", F.lit(3))
    j = df.select(
        backoff_seconds("cls", "attempt", F.col("url_hash")).alias("s"),
        backoff_seconds("cls", "attempt", F.col("url_hash")).alias("s2"),
    )
    rows = j.collect()
    # jitter in [0.5, 1.0) x raw, deterministic per key
    assert all(2.0 <= r.s < 4.0 for r in rows)
    assert all(r.s == r.s2 for r in rows)
    assert len({round(r.s, 6) for r in rows}) > 10  # actually varies


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "host string, url_hash long, attempt int, http_code int, error_kind string, fetched_ts timestamp"
    )


def test_classify_fetch_log_can_retry(spark):
    t = dt.datetime(2025, 6, 1)
    log = _log(
        spark,
        [
            ("a", 1, 1, 503, None, t),  # network, budget 5 → retry
            ("a", 2, 6, 503, None, t),  # attempt 6 == budget+1 → exhausted
            ("a", 3, 1, 404, None, t),  # api budget 0 → no retry
            ("a", 4, 1, 200, None, t),  # ok
        ],
    )
    out = {r.url_hash: (r.error_class, r.can_retry) for r in classify_fetch_log(log).collect()}
    assert out[1] == ("network_error", True)
    assert out[2] == ("network_error", False)
    assert out[3] == ("api_error", False)
    assert out[4] == ("ok", False)
    ne = {r.url_hash: r.next_eligible_ts for r in classify_fetch_log(log).collect()}
    assert ne[1] is not None and ne[2] is None and ne[4] is None


def test_circuit_breaker(spark):
    t0 = dt.datetime(2025, 6, 1)
    rows = []
    # host "bad": 1 success then 12 consecutive failures → open
    rows.append(("bad", 100, 1, 200, None, t0))
    for i in range(12):
        rows.append(("bad", 200 + i, 1, 503, None, t0 + dt.timedelta(seconds=i + 1)))
    # host "good": alternating, streak < 10 → closed
    for i in range(8):
        rows.append(("good", 300 + i, 1, 503 if i % 2 else 200, None, t0 + dt.timedelta(seconds=i)))
    log = classify_fetch_log(_log(spark, rows))
    state = {r.host: r for r in host_circuit_state(log).collect()}
    assert state["bad"].consecutive_failures == 12
    assert state["bad"].quarantined_until == t0 + dt.timedelta(seconds=12 + 60)
    assert state["good"].quarantined_until is None
