"""WARC (ISO 28500 / WARC/1.0) encode + parse — the web-archive interchange
format every large crawl emits (Common Crawl, Internet Archive).

The reference persists fetched pages as rows in a database
(``utils/common/db_loader/data_loader.py``); a web-scale crawl persists them
as WARC files on object storage. This module is the Spark-native version of
that sink/source pair:

- **encode**: :func:`warc_record_col` builds one spec-shaped ``resource``
  record per row as pure native column arithmetic (``concat`` — JVM codegen,
  no Python); :func:`warc_files_df` packs records into per-file blobs.
- **parse**: :func:`parse_warc` is a LENGTH-DRIVEN record parser (reads
  ``Content-Length``, consumes exactly that many payload bytes) over
  ``mapInPandas`` — NOT a delimiter split, so payloads containing
  ``"WARC/1.0"`` or bare CRLFCRLF parse correctly. One Arrow batch of file
  blobs in, a stream of record rows out; files are independent rows, so a
  directory of WARCs parallelizes file-per-task with zero shuffle.
- **read**: :func:`read_warc_dir` scans ``*.warc`` files via Spark's
  ``binaryFile`` source and parses them.

Scale notes. A WARC *file* is the unit of parallelism here (binaryFile gives
one row per file, whole-file in memory) — right for the 100 MB–1 GB file
sizes crawls actually emit, wrong for one 100 GB file. Common Crawl's
member-gzipped layout (each record an independent gzip member) is what makes
sub-file splitting possible; that needs a custom splittable input format,
out of scope here and documented as such.

Byte discipline: ``Content-Length`` counts PAYLOAD BYTES (UTF-8), not
characters — the encoder uses ``octet_length`` semantics via ``F.encode``
lengths and the parser slices a ``bytes`` buffer, so non-ASCII payloads
round-trip exactly (tested).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CRLF = "\r\n"

#: fixed, deterministic record date — the round-trip oracle recomputes it
WARC_DATE = "2026-01-01T00:00:00Z"

PARSED_SCHEMA = (
    "warc_file bigint, rec_seq int, rec_type string, target_uri string, "
    "warc_date string, content_length bigint, payload string"
)


def warc_record_col(uri: Column, payload: Column, rec_type: str = "resource") -> Column:
    """One WARC/1.0 record as a string column — header block, CRLFCRLF,
    payload, CRLFCRLF trailer (ISO 28500 §4: every record ends with two
    CRLFs). ``Content-Length`` is the payload's UTF-8 BYTE length
    (``F.length(F.encode(...))``), and ``WARC-Record-ID`` is a deterministic
    urn from md5(uri) so the encoding is a pure function of the row."""
    header = F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit(f"WARC-Type: {rec_type}" + CRLF),
        F.lit("WARC-Record-ID: <urn:md5:"), F.md5(F.encode(uri, "UTF-8")), F.lit(">" + CRLF),
        F.lit(f"WARC-Date: {WARC_DATE}" + CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(CRLF),
        F.lit("Content-Type: text/plain" + CRLF),
        F.lit("Content-Length: "),
        F.length(F.encode(payload, "UTF-8")).cast("string"),
        F.lit(CRLF),
    )
    return F.concat(header, F.lit(CRLF), payload, F.lit(CRLF + CRLF))


def warc_files_df(
    records: DataFrame, file_key: Column, order_key: Column, record: Column
) -> DataFrame:
    """Pack records into per-file blobs: ``(warc_file, blob)``.

    Records are ordered WITHIN each file by ``order_key`` via
    ``array_sort`` over collected (key, record) structs — deterministic
    under any input partitioning (same trick as the store's best-row dedup).
    One shuffle on the file key; at scale the file key is chosen so a blob
    is one object-store PUT (100 MB–1 GB), i.e. the groupBy is the sink's
    natural write unit, not overhead."""
    packed = records.select(
        file_key.alias("warc_file"),
        F.struct(order_key.alias("k"), record.alias("r")).alias("kr"),
    )
    return (
        packed.groupBy("warc_file")
        .agg(F.array_sort(F.collect_list("kr")).alias("krs"))
        .select(
            "warc_file",
            F.array_join(F.transform("krs", lambda s: s["r"]), "").alias("blob"),
        )
    )


def _parse_blob(file_id, blob: bytes):
    """Yield (rec_seq, rec_type, target_uri, warc_date, content_length,
    payload) from one WARC blob. Length-driven per ISO 28500: header block
    to the first CRLFCRLF, then EXACTLY Content-Length payload bytes, then
    the two-CRLF record trailer. Raises ValueError on malformed input
    (bad magic, missing Content-Length, truncated payload/trailer) — a
    corrupt archive should fail the task loudly, not emit partial rows."""
    off, seq = 0, 0
    n = len(blob)
    while off < n:
        if not blob.startswith(b"WARC/1.0" + b"\r\n", off):
            raise ValueError(f"warc_file={file_id}: bad record magic at offset {off}")
        hdr_end = blob.find(b"\r\n\r\n", off)
        if hdr_end < 0:
            raise ValueError(f"warc_file={file_id}: unterminated header at offset {off}")
        headers: dict[str, str] = {}
        for line in blob[off + 10 : hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii").lower()] = v.strip().decode("utf-8")
        if "content-length" not in headers:
            raise ValueError(f"warc_file={file_id}: record at {off} lacks Content-Length")
        clen = int(headers["content-length"])
        p0 = hdr_end + 4
        p1 = p0 + clen
        if p1 + 4 > n or blob[p1 : p1 + 4] != b"\r\n\r\n":
            raise ValueError(
                f"warc_file={file_id}: truncated payload/trailer at offset {off}"
            )
        yield (
            seq,
            headers.get("warc-type", ""),
            headers.get("warc-target-uri", ""),
            headers.get("warc-date", ""),
            clen,
            blob[p0:p1].decode("utf-8"),
        )
        seq += 1
        off = p1 + 4


def parse_warc(files: DataFrame, file_col: str = "warc_file", blob_col: str = "blob") -> DataFrame:
    """``(warc_file, blob)`` → one row per WARC record (:data:`PARSED_SCHEMA`).

    mapInPandas generator: each Arrow batch of file blobs streams out its
    records without materializing all of them at once; files never shuffle
    (narrow transform), so a directory scan parses file-per-task."""
    is_str = dict(files.dtypes)[blob_col] == "string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf[file_col], pdf[blob_col]):
                raw = blob.encode("utf-8") if is_str else bytes(blob)
                for rec in _parse_blob(fid, raw):
                    rows.append((fid, *rec))
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "rec_seq", "rec_type", "target_uri",
                    "warc_date", "content_length", "payload",
                ],
            )

    return files.mapInPandas(gen, schema=PARSED_SCHEMA)


def read_warc_dir(spark: SparkSession, path: str) -> DataFrame:
    """Parse every ``*.warc`` under ``path`` (Spark ``binaryFile`` source —
    one row per file, parallel file-per-task). ``warc_file`` carries a
    dense per-path id (xxhash64 of the path) since real archives are named,
    not numbered."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc")
        .load(path)
        .select(F.xxhash64("path").alias("warc_file"), F.col("content").alias("blob"))
    )
    return parse_warc(raw)
