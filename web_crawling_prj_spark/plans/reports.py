"""Async report pipeline — reference BaseReportsDAG re-expressed (SURVEY.md §3.2).

Reference flow (dags/common/base_init_reports_dag.py): refresh credentials →
create each report server-side (:74-102, 300 s create timeout) → poll all
reports every 10 s up to 3600 s (:104-174) → download ready ones → fail the run
if failed ≥ ⌈total/2⌉ (:187-192).

The create/poll/download calls are EXTERNAL-SERVICE I/O, not data-plane work,
so they stay a driver-side loop between Spark jobs; each downloaded report
lands as rows in a bronze table (DataFrame) for the warehouse load plan. The
service client is injectable; the default is a deterministic synthetic service
(report r becomes ready after (hash(r) % k)+1 polls) so semantics — poll
cadence, timeout, half-failure abort — are fully testable offline.
"""

from __future__ import annotations

import logging
import math
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_summary(metrics: DataFrame, fail_threshold_ratio: float = 0.5) -> DataFrame:
    """Per-round run report from the committed metrics table — the alerting
    aggregation the reference renders into its Teams card
    (services/error_handler.py:282-306 success-rate math +
    dags/common/base_init_reports_dag.py:187-192 half-failure abort flag).

    Input: per-(round, bucket) counters (scheduled_cnt, fetched_ok_cnt,
    failed_cnt, retried_cnt). Output: one row per round with totals,
    success_rate_pct = (ops - errors) / ops * 100, and run_failed =
    failed ≥ ⌈scheduled · ratio⌉ (ceil, not round — banker's rounding would
    flag 2 of 5). A scheduled == 0 round (possible over arbitrary metrics
    tables, never emitted by crawl_round's groupBy) is an idle round, not a
    failed one: success_rate_pct = 100, run_failed = false."""
    agg = metrics.groupBy("round_id").agg(
        F.sum("scheduled_cnt").alias("scheduled"),
        F.sum("fetched_ok_cnt").alias("ok"),
        F.sum("failed_cnt").alias("failed"),
        F.sum("retried_cnt").alias("retried"),
    )
    return agg.select(
        "round_id",
        "scheduled",
        "ok",
        "failed",
        "retried",
        F.when(
            F.col("scheduled") > 0,
            F.round((F.col("scheduled") - F.col("failed")) * 100.0 / F.col("scheduled"), 4),
        )
        .otherwise(F.lit(100.0))
        .alias("success_rate_pct"),
        (
            (F.col("scheduled") > 0)
            & (F.col("failed") >= F.ceil(F.col("scheduled") * fail_threshold_ratio))
        ).alias("run_failed"),
    )


def render_run_artifact(spark, store, round_id: int, rep_row=None, metrics_rows=None) -> str:
    """Render the per-round run report as human-readable artifacts next to the
    manifest: ``_manifests/NNNNNN.report.md`` + ``.report.json``.

    The reference renders the same fields into a Teams adaptive card
    (services/notification_handler.py:12-116: run title, totals, success rate,
    failure flag, per-section counts); here the artifact is a file a human (or
    the next tool) reads straight out of the state store. Every number comes
    from the COMMITTED run_report / metrics tables — nothing is recomputed, so
    the artifact can never disagree with the store.

    Returns the markdown path. Written AFTER the commit point (like the bloom
    sidecar): a kill in between loses only the rendering, never state; the
    next render call reproduces it from the same committed tables.

    ``rep_row`` / ``metrics_rows``: callers that already collected the
    committed rows (run_round does, for its own summary) pass them in so the
    render adds ZERO extra Spark jobs; standalone calls fetch them here.
    """
    import json as _json
    import os

    if rep_row is None:
        rep_row = store.read_round(spark, "run_report", round_id).first()
    # an idle round (frontier drained / everything deferred) schedules nothing:
    # the metrics groupBy emits zero rows, so the committed run_report is empty
    rep = (
        rep_row.asDict()
        if rep_row is not None
        else {
            "round_id": round_id,
            "scheduled": 0,
            "ok": 0,
            "failed": 0,
            "retried": 0,
            "success_rate_pct": 100.0,
            "run_failed": False,
        }
    )
    if metrics_rows is None:
        metrics_rows = store.read_round(spark, "metrics", round_id).collect()
    per_bucket = [r.asDict() for r in sorted(metrics_rows, key=lambda r: r["bucket"])]
    meta = store.manifest(round_id)
    payload = {**rep, "round_ts": meta.get("round_ts"), "per_bucket": per_bucket}
    base = os.path.join(store.root, "_manifests", f"{round_id:06d}.report")
    with open(base + ".json", "w") as f:
        _json.dump(payload, f, indent=2, default=str)

    status = "❌ RUN FAILED" if rep["run_failed"] else "✅ ok"
    lines = [
        f"# Crawl round {round_id} — {status}",
        "",
        f"- round_ts: {meta.get('round_ts')}",
        f"- scheduled: {rep['scheduled']}",
        f"- ok: {rep['ok']}",
        f"- failed: {rep['failed']}",
        f"- retried: {rep['retried']}",
        f"- success_rate_pct: {rep['success_rate_pct']}",
        "",
        "| bucket | scheduled | ok | failed | retried |",
        "|---|---|---|---|---|",
    ]
    for b in per_bucket:
        lines.append(
            f"| {b['bucket']} | {b['scheduled_cnt']} | {b['fetched_ok_cnt']} "
            f"| {b['failed_cnt']} | {b['retried_cnt']} |"
        )
    with open(base + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    return base + ".md"


@dataclass
class ReportJob:
    report_id: str
    report_type: str
    status: str = "created"  # created | ready | downloaded | failed
    polls: int = 0
    payload_rows: list | None = None


@dataclass
class ReportServiceConfig:
    poll_interval_s: float = 10.0  # base_init_reports_dag.py:147
    max_wait_s: float = 3600.0  # :120
    create_timeout_s: float = 300.0  # :82-83
    fail_threshold_ratio: float = 0.5  # :187-192
    sleep: Callable[[float], None] = field(default=time.sleep)


class SyntheticReportService:
    """Deterministic offline stand-in for the external report API."""

    def __init__(self, ready_after_polls: int = 2, fail_ids: set[str] | None = None):
        self.ready_after = ready_after_polls
        self.fail_ids = fail_ids or set()

    def create(self, job: ReportJob) -> None:
        if job.report_id in self.fail_ids:
            job.status = "failed"

    def poll(self, job: ReportJob) -> bool:
        job.polls += 1
        return job.polls >= self.ready_after

    def download(self, job: ReportJob) -> list:
        return [(job.report_id, job.report_type, i, f"val-{job.report_id}-{i}") for i in range(3)]


def run_report_pipeline(
    spark: SparkSession,
    jobs: list[ReportJob],
    service=None,
    cfg: ReportServiceConfig | None = None,
) -> DataFrame:
    """create → poll-until-ready (≤ max_wait) → download → bronze DataFrame.

    Raises if failed ≥ ⌈total/2⌉ (reference half-failure abort). The poll loop
    uses injectable sleep so tests run instantly.
    """
    service = service or SyntheticReportService()
    cfg = cfg or ReportServiceConfig()
    for j in jobs:
        # reference create timeout (base_init_reports_dag.py:82-83): a create
        # call that exceeds the budget marks the JOB failed (counted against
        # the half-failure abort below) instead of hanging the whole pipeline.
        # The check is POST-HOC — it cannot interrupt a create that hangs
        # forever (the reference's asyncio timeout can; a sync client should
        # carry its own socket timeout ≤ create_timeout_s). A create that
        # SUCCEEDED but blew the budget is cancelled server-side when the
        # client supports it, so no orphaned remote report keeps running
        # while counting toward the half-failure abort (ADVICE r4).
        t0 = time.monotonic()
        try:
            service.create(j)
        except Exception:
            logging.getLogger(__name__).warning(
                "report create failed for %s", j.report_id, exc_info=True
            )
            j.status = "failed"
            continue
        if time.monotonic() - t0 > cfg.create_timeout_s:
            cancel = getattr(service, "cancel", None)
            if cancel is not None:
                try:
                    cancel(j)
                except Exception:
                    logging.getLogger(__name__).warning(
                        "cancel failed for %s", j.report_id, exc_info=True
                    )
            j.status = "failed"

    pending = [j for j in jobs if j.status == "created"]
    waited = 0.0
    while pending and waited < cfg.max_wait_s:
        for j in list(pending):
            if service.poll(j):
                j.status = "ready"
                j.payload_rows = service.download(j)
                j.status = "downloaded"
                pending.remove(j)
        if pending:
            cfg.sleep(cfg.poll_interval_s)
            waited += cfg.poll_interval_s
    for j in pending:
        j.status = "failed"

    failed = sum(1 for j in jobs if j.status == "failed")
    # ceil, not round(): reference aborts at failed >= ceil(total/2)
    # (base_init_reports_dag.py:187-192); banker's rounding would abort 2/5
    if failed >= max(1, math.ceil(len(jobs) * cfg.fail_threshold_ratio)):
        raise RuntimeError(f"report run failed: {failed}/{len(jobs)} reports failed")

    rows = [r for j in jobs if j.payload_rows for r in j.payload_rows]
    return spark.createDataFrame(
        rows, "report_id string, report_type string, line_no int, value string"
    )
