"""Regression tests for the code-review findings (round 1 review pass)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from web_crawling_prj_spark.functions.extract import clean_percent, first_struct_match, paginate
from web_crawling_prj_spark.functions.urls import canonicalize_url
from web_crawling_prj_spark.operators.dedup import dedup_within_batch
from web_crawling_prj_spark.operators.retry import (
    classify_fetch_log,
    host_circuit_state,
    update_circuit_state,
)
from web_crawling_prj_spark.operators.scd2 import scd2_apply_batch
from web_crawling_prj_spark.plans.reports import ReportJob, ReportServiceConfig, SyntheticReportService, run_report_pipeline
from web_crawling_prj_spark.sources.readers import read


def test_canonicalize_percent_encoded_dot_segments():
    # %2E%2E decodes to '..' and must be resolved (idempotence)
    assert canonicalize_url("https://example.com/a/%2E%2E/b") == "https://example.com/b"
    c = canonicalize_url("https://example.com/a/%2e/b/%2E%2E/c")
    assert canonicalize_url(c) == c == "https://example.com/a/c"


def test_first_struct_match_no_match_is_null(spark):
    df = spark.createDataFrame(
        [([{"k": "a", "v": "1"}],), ([],)], "arr array<struct<k string, v string>>"
    )
    rows = df.select(first_struct_match("arr", "k", "zzz", "v").alias("out")).collect()
    assert [r.out for r in rows] == [None, None]  # no ANSI element_at crash


def test_paginate_single_page_fans_out_nothing(spark):
    df = spark.createDataFrame([(1, 1), (2, 0), (3, 4)], "id int, total int")
    out = paginate(df, "total").collect()
    got = sorted((r.id, r.page) for r in out)
    assert got == [(3, 2), (3, 3), (3, 4)]  # totals 1 and 0 emit zero pages


def test_clean_percent_coerces_garbage(spark):
    df = spark.createDataFrame([("5%",), ("N/A",), ("",)], "s string")
    vals = [r.v for r in df.select(clean_percent("s").alias("v")).collect()]
    assert vals[0] == pytest.approx(0.05)
    assert vals[1] is None and vals[2] is None  # coerce, never crash (ANSI)


def test_report_threshold_is_ceil(spark):
    # 5 jobs, 2 failures: ceil(5/2)=3 → must NOT abort (round() would)
    jobs = [ReportJob(f"r{i}", "d") for i in range(5)]
    svc = SyntheticReportService(fail_ids={"r0", "r1"})
    df = run_report_pipeline(spark, jobs, svc, ReportServiceConfig(sleep=lambda s: None))
    assert df.count() == 9  # 3 downloaded reports x 3 rows


def test_scd2_batch_dedup_deterministic(spark):
    batch = spark.createDataFrame(
        [("a", "Z", 9.0), ("a", "A", 1.0)], "sku string, title string, price double"
    )
    out1 = scd2_apply_batch(None, batch, ["sku"], ["sku", "title"], "s", "2025-01-01 00:00:00")
    out2 = scd2_apply_batch(
        None, batch.repartition(7), ["sku"], ["sku", "title"], "s", "2025-01-01 00:00:00"
    )
    assert out1.first().title == out2.first().title == "A"  # min-struct, not arrival order


def test_dedup_prefer_retry_state(spark):
    # same url_hash: a retry row (attempt 3, backoff set) vs fresh discovery
    rows = [
        (1, 3, 0.2, dt.datetime(2025, 6, 1, 0, 1, 0)),
        (1, 0, 0.9, None),
        (2, 0, 0.5, None),
    ]
    df = spark.createDataFrame(
        rows, "url_hash long, attempt int, priority double, next_eligible_ts timestamp"
    )
    out = {
        r.url_hash: (r.attempt, r.next_eligible_ts is not None)
        for r in dedup_within_batch(
            df,
            prefer=[
                -F.coalesce(F.col("attempt"), F.lit(0)),
                -F.coalesce(F.col("priority"), F.lit(0.0)),
            ],
        ).collect()
    }
    assert out[1] == (3, True)  # retry state survives rediscovery
    assert out[2] == (0, False)


def _log(spark, rows):
    df = spark.createDataFrame(
        rows, "host string, url_hash long, attempt int, http_code int, error_kind string, fetched_ts timestamp"
    )
    return classify_fetch_log(df)


def test_incremental_circuit_equals_full_recompute(spark):
    t0 = dt.datetime(2025, 6, 1)
    rounds = []
    # r1: host a 3 fails; host b ok
    rounds.append([("a", i, 1, 503, None, t0 + dt.timedelta(seconds=i)) for i in range(3)]
                  + [("b", 100, 1, 200, None, t0)])
    # r2: host a 8 more fails (streak 11 → opens); host b fail,ok,fail (streak 1)
    rounds.append([("a", 10 + i, 1, 503, None, t0 + dt.timedelta(seconds=60 + i)) for i in range(8)]
                  + [("b", 101, 1, 503, None, t0 + dt.timedelta(seconds=61)),
                     ("b", 102, 1, 200, None, t0 + dt.timedelta(seconds=62)),
                     ("b", 103, 1, 503, None, t0 + dt.timedelta(seconds=63))])
    # r3: host a recovers with an ok; host c appears failing
    rounds.append([("a", 30, 1, 200, None, t0 + dt.timedelta(seconds=200)),
                   ("c", 200, 1, 503, None, t0 + dt.timedelta(seconds=201))])

    state = None
    full = []
    for r in rounds:
        log = _log(spark, r)
        state = update_circuit_state(state, log)
        full.extend(r)
        inc = {
            row.host: (row.consecutive_failures, row.quarantined_until)
            for row in state.collect()
        }
        ref = {
            row.host: (row.consecutive_failures, row.quarantined_until)
            for row in host_circuit_state(_log(spark, full)).collect()
        }
        assert inc == ref, f"divergence after round with {len(r)} rows: {inc} != {ref}"
    assert inc["a"] == (0, None)  # recovered
    assert inc["c"][0] == 1


def test_csv_skip_rows_real(spark, tmp_path):
    p = tmp_path / "report.csv"
    p.write_text("Google Report junk line 1\njunk line 2\nsku,price\nA,1.5\nB,2.0\n")
    df = read(spark, "csv", str(p), schema="sku string, price double", skip_rows=2)
    got = sorted((r.sku, r.price) for r in df.collect())
    assert got == [("A", 1.5), ("B", 2.0)]


def test_csv_skip_rows_quoted_newline_and_permissive(spark, tmp_path):
    """RFC-4180 corners of the skip_rows path: a quoted field with an
    embedded newline stays ONE record (the old split-on-newline parse broke
    it in half), quoted delimiters survive, and a malformed numeric cell
    goes NULL (PERMISSIVE parity) instead of raising under ANSI."""
    p = tmp_path / "report2.csv"
    p.write_text(
        'junk 1\njunk 2\nsku,descr,price\n'
        'A,"line one\nline two",1.5\n'
        'B,"has, comma",2.0\n'
        "C,plain,not_a_number\n"
    )
    df = read(
        spark, "csv", str(p), schema="sku string, descr string, price double", skip_rows=2
    )
    got = {r.sku: (r.descr, r.price) for r in df.collect()}
    assert got == {
        "A": ("line one\nline two", 1.5),
        "B": ("has, comma", 2.0),
        "C": ("plain", None),
    }


def test_full_rebuild_seeds_incremental_circuit(spark):
    """Recovery path: host_circuit_state output must be usable as `prev` for
    update_circuit_state (schema parity with CIRCUIT_STATE_SCHEMA)."""
    t0 = dt.datetime(2025, 6, 1)
    hist = _log(spark, [("a", i, 1, 503, None, t0 + dt.timedelta(seconds=i)) for i in range(11)])
    rebuilt = host_circuit_state(hist)
    assert set(rebuilt.columns) == {
        "host", "last_fetch_ts", "consecutive_failures", "last_fail_ts", "quarantined_until"
    }
    nxt = _log(spark, [("a", 99, 1, 200, None, t0 + dt.timedelta(seconds=100))])
    state = {r.host: r.consecutive_failures for r in update_circuit_state(rebuilt, nxt).collect()}
    assert state["a"] == 0  # the ok resets the rebuilt streak


def test_asof_duplicate_ts_right_rows_deterministic(spark):
    from web_crawling_prj_spark.operators.asof import asof_join_native, asof_join_pandas

    t = dt.datetime(2025, 1, 1, 10, 0, 0)
    left = spark.createDataFrame([(1, t, "e")], "user_id long, ts timestamp, ev string")
    right = spark.createDataFrame(
        [(1, t, 5.0), (1, t, 9.0), (1, t, 1.0)], "user_id long, rts timestamp, price double"
    )
    for reps in range(3):
        n = asof_join_native(left, right.repartition(reps + 1), "user_id", "ts", "rts", ["price"]).first()
        p = asof_join_pandas(left, right.repartition(reps + 1), "user_id", "ts", "rts", ["price"]).first()
        assert n.price == p.price == 9.0  # max payload wins, any partitioning


def test_components_nonconvergence_raises(spark):
    from web_crawling_prj_spark.operators.graph import connected_components

    chain = spark.createDataFrame([(i, i + 1) for i in range(8)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    comp = connected_components(chain, max_iter=20)
    assert comp.select("component").distinct().count() == 1


# --- round-3 self-review fixes ---


def test_png_truncated_raises_valueerror():
    """Truncation inside a chunk raises the module's ValueError contract,
    never a bare struct.error."""
    import pytest

    from web_crawling_prj_spark.functions.png import png_decode, png_encode
    import numpy as np

    blob = png_encode(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated PNG"):
        png_decode(blob[:-6])  # cut inside IEND's CRC


def test_png_path_is_backend_independent(spark):
    """DECODE_BACKEND='real' must NOT break PNG datasets (the stdlib path
    needs no missing dependency); non-PNG blobs under 'real' raise per blob."""
    import numpy as np
    import pytest

    from web_crawling_prj_spark.functions.png import png_encode
    from web_crawling_prj_spark.operators import multimodal as mm

    png_df = spark.createDataFrame(
        [(0, bytearray(png_encode(np.arange(64, dtype=np.uint8).reshape(8, 8))))],
        "doc_id long, media binary",
    )
    wcpm_df = spark.createDataFrame([(1, 0)], "doc_id long, mtype int").withColumn(
        "media", mm.synth_media_udf("doc_id", "mtype")
    ).drop("mtype")
    jpeg_df = spark.createDataFrame(
        [(2, bytearray(b"\xff\xd8\xff\xe0" + b"\x00" * 32))], "doc_id long, media binary"
    )
    junk_df = spark.createDataFrame(
        [(3, bytearray(b"not media at all, truly"))], "doc_id long, media binary"
    )
    old = mm.DECODE_BACKEND
    try:
        mm.DECODE_BACKEND = "real"
        rows = mm.decode_metadata(png_df).collect()
        assert rows[0].media_type == "image" and rows[0].width == 8
        # r3 ADVICE contract: classify the blob FIRST. WCPM is our own
        # self-describing format → parses under any backend; a structurally
        # plausible real container (JPEG magic) is the environment gap; junk
        # is a DATA error, never misreported as an environment gap.
        assert mm.decode_metadata(wcpm_df).collect()[0].media_type == "image"
        with pytest.raises(Exception, match="NotImplementedError|PIL"):
            mm.decode_metadata(jpeg_df).collect()
        with pytest.raises(Exception, match="ValueError|not a WCPM"):
            mm.decode_metadata(junk_df).collect()
    finally:
        mm.DECODE_BACKEND = old


def test_read_parts_raises_on_vacuumed_history(spark, tmp_path):
    """read_parts must refuse to reconstruct a historical seen-set whose
    rounds were folded into a deeper tier and vacuumed — a silently
    incomplete seen-set would re-schedule fetched URLs."""
    import pytest

    from web_crawling_prj_spark.plans.statestore import StateStore

    store = StateStore(str(tmp_path / "hist"))
    for r in range(4):
        df = spark.range(5).selectExpr(f"id + {r * 10} as url_hash")
        store.commit_round(r, {"seen_delta": df})
    store.compact(spark, "seen_delta", up_to=3)
    store.vacuum_compacted("seen_delta")
    with pytest.raises(ValueError, match="cannot reconstruct"):
        store.read_parts(spark, "seen_delta", up_to=1)
    # at-or-past the tier: fine
    bases, deltas = store.read_parts(spark, "seen_delta", up_to=3)
    assert sum(b.count() for b in bases) == 20 and deltas == []


def test_bucket_layout_drift_refused(spark, tmp_path):
    """Resuming a bucketed store with a different num_buckets must fail loudly
    — mixed layouts would silently put the exchange back in every
    co-partitioned join."""
    import pytest

    from web_crawling_prj_spark.plans.crawl_round import CrawlConfig, crawl_store

    store = crawl_store(str(tmp_path / "drift"), CrawlConfig(num_buckets=8))
    df = spark.range(10).selectExpr("xxhash64(id) as url_hash")
    store.commit_round(0, {"seen_delta": df.repartition(8, "url_hash")})

    resumed = crawl_store(str(tmp_path / "drift"), CrawlConfig(num_buckets=16))
    with pytest.raises(ValueError, match="bucket layout cannot change"):
        resumed.commit_round(1, {"seen_delta": df.repartition(16, "url_hash")})
    # same layout resumes fine
    ok = crawl_store(str(tmp_path / "drift"), CrawlConfig(num_buckets=8))
    ok.commit_round(1, {"seen_delta": df.repartition(8, "url_hash")})
    assert ok.last_committed_round() == 1


def test_bucket_layout_drift_refused_both_directions(spark, tmp_path):
    """Dropping bucketing on resume (bucketed store → plain writer) must be
    refused just like changing the bucket count."""
    import pytest

    from web_crawling_prj_spark.plans.crawl_round import CrawlConfig, crawl_store
    from web_crawling_prj_spark.plans.statestore import StateStore

    bkt = crawl_store(str(tmp_path / "dir2"), CrawlConfig(num_buckets=8))
    df = spark.range(10).selectExpr("xxhash64(id) as url_hash")
    bkt.commit_round(0, {"seen_delta": df.repartition(8, "url_hash")})
    plain = StateStore(str(tmp_path / "dir2"))
    with pytest.raises(ValueError, match="bucket layout cannot change"):
        plain.commit_round(1, {"seen_delta": df})
    # and plain → bucketed is refused too
    p2 = StateStore(str(tmp_path / "dir3"))
    p2.commit_round(0, {"seen_delta": df})
    b2 = crawl_store(str(tmp_path / "dir3"), CrawlConfig(num_buckets=8))
    with pytest.raises(ValueError, match="bucket layout cannot change"):
        b2.commit_round(1, {"seen_delta": df.repartition(8, "url_hash")})


def test_layout_registry_file_written_and_used(spark, tmp_path):
    """The _layout.json registry is actually created on the first commit (the
    post-commit replay would already contain the round's tables — regression
    for the unreachable-registration ordering) and later commits check
    against it without replaying manifests."""
    import json
    import os

    from web_crawling_prj_spark.plans.crawl_round import CrawlConfig, crawl_store

    store = crawl_store(str(tmp_path / "layoutreg"), CrawlConfig(num_buckets=8))
    df = spark.range(10).selectExpr("id AS url_hash", "CAST(id AS INT) AS bucket",
                                    "CAST(1 AS INT) AS first_seen_round",
                                    "CAST(NULL AS TIMESTAMP) AS first_seen_ts")
    store.commit_round(0, {"seen_delta": df.repartition(8, "url_hash")})
    path = os.path.join(store.root, "_manifests", "_layout.json")
    assert os.path.exists(path)
    reg = json.load(open(path))
    assert reg["seen_delta"] == {"col": "url_hash", "n": 8}
    # drift still refused, now via the registry
    drifted = crawl_store(str(tmp_path / "layoutreg"), CrawlConfig(num_buckets=16))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket layout"):
        drifted.commit_round(1, {"seen_delta": df.repartition(16, "url_hash")})
