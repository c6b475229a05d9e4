"""WARC source (ISO 28500): byte-exact round-trip, adversarial payloads,
length-driven parsing (never delimiter splitting), malformed-stream errors,
and the binaryFile directory reader."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from web_crawling_prj_spark.sources.warc import (
    WARC_DATE,
    _parse_blob,
    parse_warc,
    read_warc_dir,
    warc_files_df,
    warc_record_col,
)

# payloads a delimiter-split parser gets wrong: a record trailer mid-payload,
# a full fake record header mid-payload, non-ASCII (bytes != chars), empty
ADVERSARIAL = [
    (0, "plain ascii payload"),
    (1, "contains the record trailer \r\n\r\n twice \r\n\r\n mid-payload"),
    (2, "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 4\r\n\r\nfake\r\n\r\n"),
    (3, "héllo wörld — 日本語テキスト"),  # UTF-8 byte length > char length
    (4, ""),
]


def _encode(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uri = F.concat(F.lit("https://h.example/doc/"), F.col("doc_id"))
    return df.select("doc_id", warc_record_col(uri, F.col("text")).alias("record"))


def test_roundtrip_is_byte_exact_on_adversarial_payloads(spark):
    rec = _encode(spark, ADVERSARIAL)
    files = warc_files_df(
        rec, file_key=(F.col("doc_id") % 2), order_key=F.col("doc_id"), record=F.col("record")
    )
    out = {
        r["target_uri"]: r
        for r in parse_warc(files).collect()
    }
    assert len(out) == len(ADVERSARIAL)
    for doc_id, text in ADVERSARIAL:
        r = out[f"https://h.example/doc/{doc_id}"]
        assert r["payload"] == text  # byte-exact through encode→pack→parse
        assert r["content_length"] == len(text.encode("utf-8"))
        assert r["rec_type"] == "resource"
        assert r["warc_date"] == WARC_DATE
        assert r["warc_file"] == doc_id % 2


def test_rec_seq_is_in_file_order_under_any_partitioning(spark):
    rows = [(i, f"payload {i}") for i in range(20)]
    rec = _encode(spark, rows).repartition(7)  # scramble
    files = warc_files_df(
        rec, file_key=(F.col("doc_id") % 3), order_key=F.col("doc_id"), record=F.col("record")
    )
    got = parse_warc(files).select("warc_file", "rec_seq", "target_uri").collect()
    for r in got:
        doc_id = int(r["target_uri"].rsplit("/", 1)[1])
        expect_seq = sorted(i for i in range(20) if i % 3 == r["warc_file"]).index(doc_id)
        assert r["rec_seq"] == expect_seq


@pytest.mark.parametrize(
    "blob, msg",
    [
        (b"WARC/2.0\r\n\r\n\r\n", "bad record magic"),
        (b"WARC/1.0\r\nWARC-Type: resource\r\n", "unterminated header"),
        (b"WARC/1.0\r\nWARC-Type: resource\r\n\r\nno length", "lacks Content-Length"),
        (b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort\r\n\r\n", "truncated payload"),
        # payload present but the two-CRLF record trailer is missing
        (b"WARC/1.0\r\nContent-Length: 2\r\n\r\nab", "truncated payload"),
    ],
)
def test_malformed_streams_raise_not_partial_rows(blob, msg):
    with pytest.raises(ValueError, match=msg):
        list(_parse_blob(9, blob))


def test_read_warc_dir_parses_real_files(spark, tmp_path):
    # hand-assembled spec-shaped file, written as real bytes on disk
    payload = "doc body — ünïcode"
    body = payload.encode("utf-8")
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Target-URI: https://x.example/1\r\n"
        b"WARC-Date: " + WARC_DATE.encode() + b"\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
        b"\r\n" + body + b"\r\n\r\n"
    ) * 3
    (tmp_path / "a.warc").write_bytes(raw)
    (tmp_path / "ignored.txt").write_bytes(b"not a warc")
    out = read_warc_dir(spark, str(tmp_path)).collect()
    assert len(out) == 3
    assert [r["rec_seq"] for r in sorted(out, key=lambda r: r["rec_seq"])] == [0, 1, 2]
    assert all(r["payload"] == payload for r in out)
    assert all(r["target_uri"] == "https://x.example/1" for r in out)


def test_parser_is_a_narrow_transform(spark):
    """Files never shuffle on the parse path: the plan between the scan and
    the Arrow eval has no Exchange (file-per-task at a directory scan)."""
    rec = _encode(spark, [(i, "x") for i in range(4)])
    files = warc_files_df(
        rec, file_key=F.col("doc_id"), order_key=F.col("doc_id"), record=F.col("record")
    )
    plan = parse_warc(files)._sc._jvm.PythonSQLUtils.explainString(
        parse_warc(files)._jdf.queryExecution(), "formatted"
    ) if False else parse_warc(files)._jdf.queryExecution().executedPlan().toString()
    # one exchange total (the pack groupBy) — none introduced by parse_warc
    assert plan.count("Exchange") <= 1
