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

Scale notes. A WARC *file* is the unit of scan parallelism here (binaryFile
gives one row per file, whole-file in memory) — right for the 100 MB–1 GB
file sizes crawls actually emit, wrong for one 100 GB file. The writer emits
Common Crawl's member-gzipped ``.warc.gz`` layout (:func:`warc_gz_files_df`:
each record an independent gzip member) plus a CDX member index, so RECORD
lookups are ranged reads (:func:`fetch_warc_record`) — sub-file-parallel
SCANNING inside one Spark task set would additionally need a custom
splittable input format, still out of scope and documented as such.

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


def warc_record_col(
    uri: Column,
    payload: Column,
    rec_type: str = "resource",
    date: Column | None = None,
    content_type: str = "text/plain",
) -> Column:
    """One WARC/1.0 record as a string column — header block, CRLFCRLF,
    payload, CRLFCRLF trailer (ISO 28500 §4: every record ends with two
    CRLFs). ``Content-Length`` is the payload's UTF-8 BYTE length
    (``F.length(F.encode(...))``), and ``WARC-Record-ID`` is a deterministic
    urn from md5(uri) so the encoding is a pure function of the row.
    ``date``: optional per-row WARC-Date column (ISO 8601 string); defaults
    to the fixed :data:`WARC_DATE` literal so encodes stay reproducible."""
    header = F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit(f"WARC-Type: {rec_type}" + CRLF),
        F.lit("WARC-Record-ID: <urn:md5:"), F.md5(F.encode(uri, "UTF-8")), F.lit(">" + CRLF),
        F.lit("WARC-Date: "), F.lit(WARC_DATE) if date is None else date, F.lit(CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(CRLF),
        F.lit(f"Content-Type: {content_type}" + CRLF),
        F.lit("Content-Length: "),
        F.length(F.encode(payload, "UTF-8")).cast("string"),
        F.lit(CRLF),
    )
    return F.concat(header, F.lit(CRLF), payload, F.lit(CRLF + CRLF))


def http_response_payload(html: Column, http_code: Column | None = None) -> Column:
    """Wrap a page body in the minimal HTTP response envelope a WARC
    ``response`` record archives (Common-Crawl layout: the payload is the
    full HTTP message, ``Content-Type: application/http;msgtype=response``).
    The envelope's Content-Length is the BODY's UTF-8 byte length."""
    code = F.lit(200) if http_code is None else F.coalesce(http_code, F.lit(200))
    return F.concat(
        # RFC 7230 status-line: "HTTP-version SP status-code SP reason-phrase"
        # — the SP after the code is mandatory even with an empty phrase.
        F.lit("HTTP/1.1 "), code.cast("string"),
        F.when(code == 200, F.lit(" OK")).otherwise(F.lit(" ")), F.lit(CRLF),
        F.lit("Content-Type: text/html; charset=utf-8" + CRLF),
        F.lit("Content-Length: "),
        F.length(F.encode(html, "UTF-8")).cast("string"), F.lit(CRLF),
        F.lit(CRLF),
        html,
    )


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
    (narrow transform), so a directory scan parses file-per-task.
    Member-gzipped blobs (``.warc.gz``) are detected by magic bytes and
    decompressed transparently."""
    is_str = dict(files.dtypes)[blob_col] == "string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf[file_col], pdf[blob_col]):
                raw = blob.encode("utf-8") if is_str else bytes(blob)
                if raw[:2] == b"\x1f\x8b":
                    raw = _gunzip_members(raw)
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


def pages_from_warc(parsed: DataFrame) -> DataFrame:
    """Parsed WARC records → the engine's input-hint pages shape
    ``(url, warc_ts:timestamp, html:binary, text, lang)`` — Common-Crawl
    ingestion: a directory of archives becomes the page table a crawl
    seeds/fetches from.

    - ``response`` records carry the full HTTP message (Common-Crawl
      layout); the envelope is stripped by splitting on the FIRST CRLFCRLF
      (split limit 2 — a body containing CRLFCRLF stays intact).
      ``resource`` records are bare content.
    - ``text`` is the byte-deterministic extraction (north-rule invariant:
      re-archiving then re-ingesting reproduces it byte-identically);
      ``lang`` is re-DETECTED from the extracted text (an archive carries no
      trusted lang column).
    - Exactly ONE Arrow UDF evaluation per row: lang/text share the single
      extracted column (plan-tested — one ArrowEvalPython node).
    """
    from web_crawling_prj_spark.functions.text import extract_text_udf, lang_id

    body = F.when(
        F.col("payload").startswith("HTTP/"),
        F.element_at(F.split("payload", CRLF + CRLF, 2), 2),
    ).otherwise(F.col("payload"))
    ts = F.coalesce(
        F.try_to_timestamp(F.col("warc_date"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        F.try_to_timestamp(F.col("warc_date"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")),
        # foreign archives with explicit offsets / other ISO variants:
        # Spark's default lenient parse, NULL (not an error) when unparseable
        F.try_to_timestamp(F.col("warc_date")),
    )
    return (
        parsed.where(F.col("rec_type").isin("response", "resource"))
        .select(
            F.col("target_uri").alias("url"),
            ts.alias("warc_ts"),
            F.encode(body, "UTF-8").alias("html"),
        )
        .withColumn("text", extract_text_udf("html"))
        .withColumn("lang", lang_id("text"))
    )


def write_warc_files(files: DataFrame, out_dir: str, suffix: str = ".warc") -> list[dict]:
    """Materialize ``(warc_file, blob)`` rows as ``part-NNNNNN.warc`` files
    under ``out_dir`` — the file-per-key sink (S10) in its native habitat.
    Executors write in parallel (tmp + atomic rename per file, so a killed
    write never leaves a torn archive); the driver collects only the tiny
    manifest (one row per FILE). ``out_dir`` must be storage every executor
    reaches — trivially true in local mode, shared/object storage on a
    cluster (the reference's S3 target, utils/s3.py:66-118)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    is_str = dict(files.dtypes)["blob"] == "string"

    def w(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf["warc_file"], pdf["blob"]):
                data = blob.encode("utf-8") if is_str else bytes(blob)
                path = os.path.join(out_dir, f"part-{int(fid):06d}{suffix}")
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, path)
                rows.append((int(fid), path, len(data)))
            yield pd.DataFrame(rows, columns=["warc_file", "path", "bytes"])

    manifest = files.mapInPandas(w, "warc_file bigint, path string, bytes bigint").collect()
    return [r.asDict() for r in manifest]


def warc_gz_files_df(
    records: DataFrame,
    file_key: Column,
    order_key: Column,
    record: Column,
    uri: Column | None = None,
) -> DataFrame:
    """Pack records into MEMBER-GZIPPED per-file blobs — Common Crawl's
    actual on-disk layout (``.warc.gz``): each record compresses as an
    INDEPENDENT gzip member and members concatenate, which is what makes a
    100 GB archive range-splittable at member boundaries (a whole-file
    gzip stream is not). Compression is deterministic (``mtime=0``, no
    filename), so identical records → byte-identical archives.

    Output ``(warc_file, blob:binary)`` — same contract as
    :func:`warc_files_df`, binary blob. The records aggregate to a SORTED
    array (deterministic in-file order under any input partitioning) and
    compress inside one Arrow batch pass.

    Pass ``uri`` to additionally get a CDX-style member index column:
    ``cdx: array<struct<uri, offset, length>>`` with each record's BYTE
    offset and compressed length inside the blob — the Common-Crawl index
    contract that turns an archive into a random-access store (fetch one
    record = ranged read of ``length`` bytes at ``offset`` + one member
    gunzip, no file scan; see :func:`fetch_warc_record`)."""
    import gzip

    fields = [order_key.alias("k"), record.alias("r")]
    if uri is not None:
        fields.append(uri.alias("u"))
    packed = records.select(
        file_key.alias("warc_file"), F.struct(*fields).alias("kr")
    )
    grouped = packed.groupBy("warc_file").agg(
        F.array_sort(F.collect_list("kr")).alias("krs")
    )
    with_cdx = uri is not None
    schema = "warc_file bigint, blob binary" + (
        ", cdx array<struct<uri:string, offset:bigint, length:bigint>>" if with_cdx else ""
    )

    def gz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, krs in zip(pdf["warc_file"], pdf["krs"]):
                members, cdx, off = [], [], 0
                for kr in krs:
                    m = gzip.compress(kr["r"].encode("utf-8"), mtime=0)
                    members.append(m)
                    if with_cdx:
                        cdx.append((kr["u"], off, len(m)))
                    off += len(m)
                rows.append(
                    (fid, b"".join(members), cdx) if with_cdx else (fid, b"".join(members))
                )
            cols = ["warc_file", "blob"] + (["cdx"] if with_cdx else [])
            yield pd.DataFrame(rows, columns=cols)

    return grouped.mapInPandas(gz, schema=schema)


def fetch_warc_record(path: str, offset: int, length: int) -> tuple:
    """Random-access fetch of ONE record from a member-gzipped archive via
    its CDX row: ranged read of ``length`` bytes at ``offset``, one member
    gunzip, one record parse — never a file scan. This is the access
    pattern a 100 TB archive store serves lookups with (object-store GET
    with a Range header); the local ``seek`` here is its file:// analog.
    Returns the parsed record tuple (rec_seq-relative fields; seq is 0 —
    one member is one record by construction)."""
    with open(path, "rb") as f:
        f.seek(offset)
        member = f.read(length)
    raw = _gunzip_members(member)
    recs = list(_parse_blob(path, raw))
    if len(recs) != 1:
        raise ValueError(f"{path}@{offset}+{length}: expected 1 record, got {len(recs)}")
    return recs[0]


def _gunzip_members(raw: bytes) -> bytes:
    """Decompress a concatenated-member gzip stream (``.warc.gz``).
    Python's gzip handles multi-member streams natively; a trailing
    garbage byte (torn write) raises rather than truncating silently."""
    import gzip

    return gzip.decompress(raw)


#: WARC-Date format written by the archive sink (second resolution, UTC)
_WARC_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def archive_round(
    spark: SparkSession,
    store,
    pages: DataFrame,
    round_id: int,
    out_root: str,
    num_files: int,
    compress: bool = True,
) -> list[dict]:
    """Archive one committed round's successful fetches as WARC ``response``
    records — the sidecar export every real crawl ships to object storage
    (Common Crawl's layout; the reference's DB insert of fetched rows,
    data_loader.py, is the small-scale analog).

    Derived-artifact semantics: the archive is a PURE FUNCTION of committed
    state (fetch_log round + page store), so it can be (re)built at any time
    — a kill mid-archive just leaves it missing and the next
    :func:`archive_missing_rounds` pass rebuilds it. ``_SUCCESS`` marker =
    archived; written by the driver strictly after every file landed.

    Plan shape: the round's ok-keys BROADCAST against the page store (the
    100 TB side never moves — same shape as the fetch join), records pack
    into ``num_files`` archives bucketed by url_hash (deterministic
    membership and in-file order), one executor-side write per file.
    ``compress=True`` (default) writes Common Crawl's member-gzipped
    ``.warc.gz`` layout (:func:`warc_gz_files_df`) plus a CDX member index
    (``_cdx/`` parquet: path, uri, offset, length) — the random-access
    contract :func:`fetch_warc_record` serves lookups with."""
    import os

    log = store.read_round(spark, "fetch_log", round_id)
    ok = log.where(F.col("error_class") == "ok").select(
        "url_hash", "url_canon", "http_code", "fetched_ts"
    )
    page_html = pages.select(F.col("url").alias("url_canon"), "html")
    j = page_html.join(F.broadcast(ok), "url_canon")
    rec = j.select(
        F.pmod(F.col("url_hash"), F.lit(num_files)).alias("warc_file"),
        F.col("url_hash").alias("order_key"),
        F.col("url_canon"),
        warc_record_col(
            F.col("url_canon"),
            http_response_payload(F.decode("html", "UTF-8"), F.col("http_code")),
            rec_type="response",
            date=F.date_format("fetched_ts", _WARC_TS_FMT),
        ).alias("record"),
    )
    out_dir = os.path.join(out_root, f"round={round_id:06d}")
    # rebuild-from-scratch: a killed or re-configured earlier attempt may
    # have left part files under a different num_files/compress layout; a
    # stale part would otherwise survive the rebuild and be read alongside
    # the new files. Derived artifact → wiping the dir is always safe.
    import shutil

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    if compress:
        # member-gzip + CDX: one pack pass produces both the blobs and the
        # per-record (uri, offset, length) index; persisted so the blob
        # write and the index write don't each re-run the compression
        files = warc_gz_files_df(
            rec,
            file_key=F.col("warc_file"),
            order_key=F.col("order_key"),
            record=F.col("record"),
            uri=F.col("url_canon"),
        ).persist()
        try:
            manifest = write_warc_files(
                files.select("warc_file", "blob"), out_dir, suffix=".warc.gz"
            )
            cdx = files.select("warc_file", F.explode("cdx").alias("c")).select(
                F.concat(
                    F.lit(out_dir + "/part-"),
                    F.format_string("%06d", "warc_file"),
                    F.lit(".warc.gz"),
                ).alias("path"),
                F.col("c.uri").alias("uri"),
                F.col("c.offset").alias("offset"),
                F.col("c.length").alias("length"),
            )
            cdx.write.mode("overwrite").parquet(os.path.join(out_dir, "_cdx"))
        finally:
            files.unpersist()
    else:
        files = warc_files_df(
            rec,
            file_key=F.col("warc_file"),
            order_key=F.col("order_key"),
            record=F.col("record"),
        )
        manifest = write_warc_files(files, out_dir, suffix=".warc")
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("")
    return manifest


def wet_round(
    spark: SparkSession,
    store,
    round_id: int,
    out_root: str,
    num_files: int,
) -> list[dict]:
    """WET export — Common Crawl's extracted-TEXT sibling of the WARC
    archive: one ``conversion`` record per successfully fetched page whose
    payload is the byte-exact extracted text (already in the committed
    fetch_log — no page-store join at all). Same member-gzip packing,
    ``part-NNNNNN.warc.wet.gz`` naming per Common Crawl convention; same
    derived-artifact semantics as :func:`archive_round`. This is the archive
    LLM-training pipelines actually consume."""
    import os
    import shutil

    log = store.read_round(spark, "fetch_log", round_id)
    ok = log.where(F.col("error_class") == "ok")
    rec = ok.select(
        F.pmod(F.col("url_hash"), F.lit(num_files)).alias("warc_file"),
        F.col("url_hash").alias("order_key"),
        warc_record_col(
            F.col("url_canon"),
            F.coalesce(F.col("extracted_text"), F.lit("")),
            rec_type="conversion",
            date=F.date_format("fetched_ts", _WARC_TS_FMT),
        ).alias("record"),
    )
    files = warc_gz_files_df(
        rec, file_key=F.col("warc_file"), order_key=F.col("order_key"), record=F.col("record")
    )
    out_dir = os.path.join(out_root, f"round={round_id:06d}")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    manifest = write_warc_files(
        files.select("warc_file", "blob"), out_dir, suffix=".warc.wet.gz"
    )
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("")
    return manifest


def wat_round(
    spark: SparkSession,
    store,
    round_id: int,
    out_root: str,
    num_files: int,
    links_per_page: int = 3,
    max_doc_id: int | None = None,
) -> list[dict]:
    """WAT export — the METADATA member of Common Crawl's WARC/WAT/WET trio:
    one ``metadata`` record per fetched page whose payload is a JSON envelope
    of the crawl facts (http code, fetch time, extracted-text digest/length,
    outlink list). Everything is native — ``to_json`` over a struct, the
    outlinks re-derived from the committed fetch_log exactly as the crawl's
    own discovery stage derives them (same operator, so WAT links ≡ the
    frontier's discovered edges by construction). Same packing/naming rules
    as the siblings: member-gzip, ``part-NNNNNN.warc.wat.gz``."""
    import os
    import shutil

    from web_crawling_prj_spark.operators.fetch import discover_outlinks

    log = store.read_round(spark, "fetch_log", round_id)
    ok = log.where(F.col("error_class") == "ok")
    links = (
        discover_outlinks(ok, links_per_page=links_per_page, max_doc_id=max_doc_id)
        .groupBy("src_url_hash")
        .agg(F.array_sort(F.collect_list("url_canon")).alias("outlinks"))
        .withColumnRenamed("src_url_hash", "url_hash")
    )
    meta = ok.join(links, "url_hash", "left").select(
        "url_hash",
        "url_canon",
        F.to_json(
            F.struct(
                F.col("url_canon").alias("url"),
                F.col("http_code"),
                F.date_format("fetched_ts", _WARC_TS_FMT).alias("fetched"),
                F.md5(F.coalesce("extracted_text", F.lit(""))).alias("text_md5"),
                F.length(F.coalesce("extracted_text", F.lit(""))).alias("text_chars"),
                F.coalesce("outlinks", F.array().cast("array<string>")).alias("outlinks"),
            )
        ).alias("payload"),
        F.date_format("fetched_ts", _WARC_TS_FMT).alias("_date"),
    )
    rec = meta.select(
        F.pmod(F.col("url_hash"), F.lit(num_files)).alias("warc_file"),
        F.col("url_hash").alias("order_key"),
        warc_record_col(
            F.col("url_canon"),
            F.col("payload"),
            rec_type="metadata",
            date=F.col("_date"),
            content_type="application/json",
        ).alias("record"),
    )
    files = warc_gz_files_df(
        rec, file_key=F.col("warc_file"), order_key=F.col("order_key"), record=F.col("record")
    )
    out_dir = os.path.join(out_root, f"round={round_id:06d}")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    manifest = write_warc_files(
        files.select("warc_file", "blob"), out_dir, suffix=".warc.wat.gz"
    )
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("")
    return manifest


def archive_missing_rounds(
    spark: SparkSession,
    store,
    pages: DataFrame,
    out_root: str,
    num_files: int,
    compress: bool = True,
) -> list[int]:
    """(Re)build the WARC archive for every committed round that lacks its
    ``_SUCCESS`` marker — the resume path's catch-up sweep (a crawl killed
    between commit and archive resumes with complete archives). Returns the
    round ids archived."""
    import os

    done = []
    for r in store.committed_rounds():
        if not store.has_table("fetch_log", r):
            continue  # init round (or store predates fetch logs)
        if os.path.exists(os.path.join(out_root, f"round={r:06d}", "_SUCCESS")):
            continue
        archive_round(spark, store, pages, r, out_root, num_files, compress=compress)
        done.append(r)
    return done


def read_warc_splits(
    spark: SparkSession, cdx: DataFrame, records_per_split: int = 4096
) -> DataFrame:
    """Splittable ``.warc.gz`` scan driven by the CDX sidecar (VERDICT r5
    next #6): :func:`read_warc_dir` is one-task-per-FILE, so a single
    multi-hundred-GB archive serializes onto one core. The CDX index already
    stores every member's ``(path, offset, length)``; this scan groups
    ``records_per_split`` CONSECUTIVE members into byte-range splits — the
    members are back-to-back gzip members, so a split is one contiguous
    span — and each task does ONE ranged read of its span (object-store GET
    with a Range header; local ``seek`` is the file:// analog), gunzips its
    members, and parses only them. ``rec_seq`` stays file-global (the
    split's starting member index offsets it), so the output is ROW-IDENTICAL
    to the whole-file scan (tested).

    ``cdx``: the ``_cdx/`` parquet (path, uri, offset, length) an archive
    write emits (see :func:`archive_round`)."""
    from pyspark.sql import Window

    w = Window.partitionBy("path").orderBy("offset")
    idx = cdx.withColumn("_i", F.row_number().over(w) - 1)
    splits = idx.groupBy(
        "path", F.floor(F.col("_i") / records_per_split).alias("_split")
    ).agg(
        F.min("offset").alias("off"),
        F.max(F.col("offset") + F.col("length")).alias("end"),
        F.min("_i").alias("seq0"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, off, end, seq0 in zip(
                pdf["path"], pdf["off"], pdf["end"], pdf["seq0"]
            ):
                with open(path, "rb") as f:
                    f.seek(int(off))
                    raw = f.read(int(end) - int(off))
                for rec in _parse_blob(path, _gunzip_members(raw)):
                    rows.append((path, int(seq0) + rec[0], *rec[1:]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "rec_seq", "rec_type", "target_uri",
                    "warc_date", "content_length", "payload",
                ],
            )

    parsed = splits.repartition(F.col("path"), F.col("_split")).mapInPandas(
        gen,
        schema=(
            "path string, rec_seq int, rec_type string, target_uri string, "
            "warc_date string, content_length bigint, payload string"
        ),
    )
    # same warc_file identity as read_warc_dir: dense per-path id over the
    # SCHEME-NORMALIZED path (binaryFile reports file: URIs, CDX stores
    # plain paths — both must hash to one id for the two scans to agree)
    return parsed.select(
        F.xxhash64(F.regexp_replace("path", "^[a-z][a-z0-9+.-]*:(//)?", "")).alias(
            "warc_file"
        ),
        "rec_seq", "rec_type", "target_uri", "warc_date", "content_length", "payload",
    )


def read_warc_dir(spark: SparkSession, path: str) -> DataFrame:
    """Parse every ``*.warc`` / ``*.warc.gz`` under ``path`` (Spark
    ``binaryFile`` source — one row per file, parallel file-per-task;
    member-gzip decompressed transparently by :func:`parse_warc`).
    ``warc_file`` carries a dense per-path id (xxhash64 of the path) since
    real archives are named, not numbered. ``.tmp`` leftovers from a killed
    writer never match the glob."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{warc,warc.gz,warc.wet.gz,warc.wat.gz}")
        .load(path)
        .select(
            # scheme-normalized id so the CDX-driven split scan
            # (read_warc_splits, plain paths) agrees file-for-file
            F.xxhash64(
                F.regexp_replace("path", "^[a-z][a-z0-9+.-]*:(//)?", "")
            ).alias("warc_file"),
            F.col("content").alias("blob"),
        )
    )
    return parse_warc(raw)
