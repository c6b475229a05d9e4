"""Structured Streaming surface: continuous frontier ingest.

The reference is batch-cron (SURVEY.md §2.11 — no streaming exists there), and
the engine's crawl rounds are deliberately batch jobs. This module covers the
CONTINUOUS half a production deployment still needs: URL discoveries trickling
in (from parsers, sitemaps, uploads) between rounds. Design:

- ``stream_frontier``: readStream over the frontier drop-zone (parquet/json
  files) → canonicalize (Arrow UDF) → hash → watermarked streaming dedup
  (``dropDuplicatesWithinWatermark`` on url_hash — the streaming analog of the
  seen-set for in-flight duplicates; the authoritative cross-round dedup stays
  the batch anti-join);
- ``host_rate_stats``: sliding-window per-host discovery counts with late-data
  watermark — feeds the politeness budgets of the next round;
- ``sink_to_frontier``: foreachBatch bridge appending micro-batches into the
  round store layout (exactly-once per micro-batch via checkpointLocation);
- ``stream_warc_records``: incremental Common-Crawl ingestion — readStream
  over a growing WARC archive directory, each new file parsed exactly once
  (file-source processed-log), stateless, file-per-task parallel.

All stateful steps declare explicit watermarks so state is bounded at
web-scale input rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from web_crawling_prj_spark.functions.hashing import url_hash
from web_crawling_prj_spark.functions.urls import canonicalize_url_udf, host_of

DISCOVERY_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("priority", DoubleType()),
        StructField("depth", IntegerType()),
        StructField("discovered_ts", TimestampType()),
    ]
)


def stream_frontier(
    spark: SparkSession,
    drop_zone: str,
    fmt: str = "parquet",
    watermark: str = "10 minutes",
    dedup: bool = True,
) -> DataFrame:
    """Streaming discoveries → canonicalized, hashed, in-flight-deduped rows."""
    raw = spark.readStream.format(fmt).schema(DISCOVERY_SCHEMA).load(drop_zone)
    out = (
        raw.withColumn("url_canon", canonicalize_url_udf("url"))
        .withColumn("url_hash", url_hash("url_canon"))
        .withColumn("host", host_of("url_canon"))
        .withWatermark("discovered_ts", watermark)
    )
    if dedup:
        out = out.dropDuplicatesWithinWatermark(["url_hash"])
    return out


def host_rate_stats(
    discoveries: DataFrame,
    window: str = "5 minutes",
    slide: str = "1 minute",
) -> DataFrame:
    """Sliding-window per-host discovery rates (budget input for next rounds)."""
    return (
        discoveries.groupBy(F.window("discovered_ts", window, slide), "host")
        .agg(
            F.count("*").alias("n_discovered"),
            F.approx_count_distinct("url_hash").alias("n_distinct_approx"),
            F.max("priority").alias("max_priority"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "host",
            "n_discovered",
            "n_distinct_approx",
            "max_priority",
        )
    )


def streaming_hll_registers(
    discoveries: DataFrame, key_col: str = "url_hash", p: int = 12
) -> DataFrame:
    """Cumulative distinct-URL sketch over an unbounded stream with BOUNDED
    state: ≤ 2^p HLL register rows. Registers are monotone maxes, so the
    streaming aggregate's state never grows past the register table — unlike
    exact streaming ``dropDuplicates`` whose state is O(distinct keys) and
    needs watermark eviction. The register stream is the SAME relational
    sketch as the batch ``sketches.hll_build`` (md5-hex hash, bin-length
    rho), so a micro-batch's output merges with batch sidecars via
    ``hll_merge`` and reads via ``hll_estimate``."""
    from web_crawling_prj_spark.operators.sketches import _hll_rows

    reg, rho = _hll_rows(F.col(key_col), p)
    return discoveries.select(reg, rho).groupBy("reg").agg(F.max("rho").alias("max_rho"))


def host_sessions(discoveries: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Streaming sessionization: session_window groups a host's discovery
    burst into one session row (complement of the batch operator
    operators.asof.sessionize — this one is the native streaming session
    window with watermark-bounded state).

    Input must already carry a watermark on ``discovered_ts`` (stream_frontier
    sets one; Spark disallows redefining it downstream).
    """
    return (
        discoveries.groupBy(F.session_window("discovered_ts", gap), "host")
        .agg(F.count("*").alias("n_urls"), F.max("priority").alias("max_priority"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "host",
            "n_urls",
            "max_priority",
        )
    )


#: binaryFile's fixed schema — streaming sources require it declared up front
_BINARY_FILE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("modificationTime", TimestampType()),
        StructField("length", LongType()),
        StructField("content", BinaryType()),
    ]
)


def stream_warc_records(spark: SparkSession, archive_dir: str) -> DataFrame:
    """Incremental Common-Crawl ingestion: ``readStream`` over a GROWING
    archive directory — each new ``.warc`` / ``.warc.gz`` file a crawl
    exports is discovered by the file source, parsed once, and never
    re-read (the source's processed-files log is the state; no watermark
    needed — the parse is stateless). One row per WARC record, same schema
    as the batch :func:`~web_crawling_prj_spark.sources.warc.parse_warc`.

    Compose downstream exactly like the batch path: ``pages_from_warc``
    (stateless projections — streaming-safe) keeps a pages table
    continuously current; ``sink_to_frontier`` lands it for the next crawl
    round. File-per-task parallelism is preserved — a micro-batch of N new
    archives parses N-wide with zero shuffle."""
    from web_crawling_prj_spark.sources.warc import parse_warc

    raw = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", "*.{warc,warc.gz}")
        .load(archive_dir)
        .select(F.xxhash64("path").alias("warc_file"), F.col("content").alias("blob"))
    )
    return parse_warc(raw)


def stream_curated_pages(
    spark: SparkSession, archive_dir: str, lang: str = "en"
) -> DataFrame:
    """Continuously-curated training pages: the streaming WARC ingest
    composed with the round-6 curation gates — ``pages_from_warc`` →
    language gate (the pages table's re-detected ``lang``) → the Gopher
    A1.1 quality gate. Every stage is a stateless projection/filter, so the
    stream needs no watermark and no state store; each new archive a crawl
    round exports yields exactly its curated rows once (file-source
    processed-log), with file-per-task parallelism preserved. Streaming ≡
    batch by construction (same expressions) — pinned by test."""
    from web_crawling_prj_spark.functions.text import gopher_metrics, gopher_pass
    from web_crawling_prj_spark.sources.warc import pages_from_warc

    pages = pages_from_warc(stream_warc_records(spark, archive_dir))
    return pages.where(F.col("lang") == lang).where(
        gopher_pass(gopher_metrics(F.col("text")))
    )


def sink_to_frontier(discoveries: DataFrame, out_dir: str, checkpoint_dir: str):
    """foreachBatch bridge: land micro-batches in the batch-round drop table.

    foreachBatch alone is AT-LEAST-ONCE — a crash between the write and the
    checkpoint commit replays the epoch. Each epoch therefore OVERWRITES its
    own partition directory (``epoch_id=N``): the replayed epoch replaces its
    previous partial/full output instead of appending a duplicate, making the
    sink idempotent per epoch (file-level exactly-once). Readers of
    ``out_dir`` see ``epoch_id`` as a partition column — same schema as the
    old append layout. The batch round's within-batch dedup + seen anti-join
    stay the key-level backstop, mirroring the reference's file-per-key
    idempotence (dags/common/base_source_dag.py:107-114).
    """

    def write_epoch(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/epoch_id={epoch_id}")

    return (
        discoveries.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
