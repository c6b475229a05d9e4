"""Real HTTP fetcher (operators.fetch.real_fetch): end-to-end against a
localhost server — no external network needed — plus a probe-gated external
test that auto-activates when the environment allows outbound connections
(VERDICT r5 next #7, the PIL/av auto-activation pattern)."""

from __future__ import annotations

import http.server
import threading

import pytest
from pyspark.sql import functions as F

from web_crawling_prj_spark.functions.text import render_html
from web_crawling_prj_spark.operators.fetch import has_network, real_fetch
from web_crawling_prj_spark.operators.retry import classify_fetch_log

PAGE_TEXT = "real fetch round trip body"


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/ok":
            body = render_html(PAGE_TEXT, "en", "http://t/ok")
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/redir":
            self.send_response(302)
            self.send_header("Location", "/ok")
            self.send_header("Content-Length", "0")
            self.end_headers()
        else:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()

    def log_message(self, *args):  # quiet test output
        pass


@pytest.fixture(scope="module")
def http_srv():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _sched(spark, urls):
    rows = [(u,) for u in urls]
    df = spark.createDataFrame(rows, "url_canon string")
    return df.select(
        "url_canon",
        F.xxhash64("url_canon").alias("url_hash"),
        F.lit("127.0.0.1").alias("host"),
        F.lit(0.5).alias("priority"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("attempt"),
        F.lit(0).cast("long").alias("fetch_offset_ms"),
        F.lit(0).alias("proxy_slot"),
    ).repartition(1)


def test_real_fetch_localhost_end_to_end(spark, http_srv):
    """ok / redirect / 404 / connection-refused through the REAL fetcher, all
    classified by the same ladder the synthetic path uses."""
    refused = "http://127.0.0.1:9/nope"  # port 9 (discard) — nothing listens
    urls = [f"{http_srv}/ok", f"{http_srv}/redir", f"{http_srv}/gone", refused]
    log = classify_fetch_log(
        real_fetch(_sched(spark, urls), 1, "2025-06-01 00:00:00", timeout_s=5)
    )
    got = {r.url_canon: r for r in log.collect()}
    assert len(got) == 4

    ok = got[f"{http_srv}/ok"]
    assert (ok.http_code, ok.error_class, ok.can_retry) == (200, "ok", False)
    assert ok.extracted_text == PAGE_TEXT  # byte-identical extraction invariant
    assert ok.round_id == 1 and ok.attempt == 1

    rd = got[f"{http_srv}/redir"]
    assert (rd.http_code, rd.error_class, rd.can_retry) == (302, "redirect", False)
    assert rd.redirect_to == f"{http_srv}/ok"  # Location resolved vs request URL

    gone = got[f"{http_srv}/gone"]
    assert (gone.http_code, gone.error_class, gone.can_retry) == (404, "api_error", False)

    ref = got[refused]
    assert ref.http_code is None
    assert (ref.error_kind, ref.error_class, ref.can_retry) == ("network", "network_error", True)
    assert ref.next_eligible_ts is not None  # backoff gate armed


def test_real_fetch_schema_matches_synthetic(spark, http_srv, sf_dir):
    """Fetcher-agnostic contract: real_fetch emits exactly the synthetic
    fetch-log columns, so retry/seen/metrics/archive run unchanged."""
    from web_crawling_prj_spark.operators.fetch import synthetic_fetch
    from web_crawling_prj_spark.sources.pages_gen import pages_df

    pages = pages_df(spark, sf_dir)
    sched = _sched(spark, [f"{http_srv}/ok"])
    syn = synthetic_fetch(sched, pages, 1, "2025-06-01 00:00:00")
    real = real_fetch(sched, 1, "2025-06-01 00:00:00")
    assert [f.name for f in real.schema.fields] == [f.name for f in syn.schema.fields]


@pytest.mark.skipif(
    not has_network(), reason="no outbound network — auto-activates when connected"
)
def test_real_fetch_external_auto_activates(spark):
    log = real_fetch(_sched(spark, ["http://example.com/"]), 1, "2025-06-01 00:00:00")
    row = log.first()
    assert row.http_code is not None or row.error_kind is not None
