"""Sinks — the reference's output surfaces re-expressed on Spark (S10-S17).

| ref | reference behavior | here |
|-----|--------------------|------|
| S10 | one JSON file per item, filename = business key | key-column partitioned/appended parquet (filename-as-key becomes a column) |
| S11 | CSV with QUOTE_ALL (base_db_load_dag.py:103) | csv writer with quoteAll |
| S12 | S3 upload (utils/s3.py:66-118) | ``df.write.parquet("s3a://…")`` — same call, path scheme only |
| S13 | JDBC append (data_loader.py:464-506) | ``jdbc_append`` |
| S14 | truncate+reload (data_loader.py:434-462) | overwrite mode / partition overwrite |
| S16 | zip→CSV decode (walmart_seller_service.py:113-123) | real zipfile decode inside mapInPandas |
| S17 | zip-folder backup (bak.backup_data_to_sharepoint.py) | statestore manifest snapshot covers it |
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _parquet_writer(df: DataFrame, mode: str, partition_cols: list[str] | None):
    """One writer chain for every parquet sink here: with partition columns,
    dynamic partition overwrite replaces only the touched partitions."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.option("partitionOverwriteMode", "dynamic").partitionBy(*partition_cols)
    return w


def write_keyed(df: DataFrame, path: str, key_col: str, mode: str = "append", partition_cols: list[str] | None = None) -> None:
    """S10: the reference writes one file per key (``{sku}.json``); at scale the
    filename-key becomes the ``key_col`` COLUMN and rows land in (optionally
    partitioned) parquet. Idempotent re-writes of a slice need
    ``mode='overwrite'`` with ``partition_cols`` (dynamic partition overwrite
    replaces only the touched partitions); plain append is the fetch-log path."""
    if key_col not in df.columns:
        raise ValueError(f"key column {key_col!r} not in {df.columns}")
    _parquet_writer(df, mode, partition_cols).parquet(path)


def write_csv(df: DataFrame, path: str, quote_all: bool = True, header: bool = True) -> None:
    """S11: CSV sink with QUOTE_ALL parity (csv.QUOTE_ALL in the reference)."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("quoteAll", str(quote_all).lower())
        .csv(path)
    )


def jdbc_append(df: DataFrame, url: str, table: str, **opts) -> None:
    """S13: JDBC append (no DB in sandbox; surface kept for parity)."""
    w = df.write.format("jdbc").option("url", url).option("dbtable", table).mode("append")
    for k, v in opts.items():
        w = w.option(k, v)
    w.save()


def truncate_reload(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """S14: truncate+append ≡ overwrite — the same writer chain as
    :func:`write_keyed`'s overwrite path, minus the key-column contract."""
    _parquet_writer(df, "overwrite", partition_cols).parquet(path)


def unzip_csv_rows(
    df: DataFrame,
    blob_col: str = "zip_blob",
    csv_opts: dict | None = None,
    sample_blob: bytes | None = None,
) -> DataFrame:
    """S16: binary zip payload → rows of its first CSV member, decoded inside
    mapInPandas (reference `_zip_file_to_csv`). Output schema: source row's key
    columns + csv text line columns parsed by pandas.

    ``sample_blob``: optional representative zip payload used for schema
    discovery. Without it, one non-null blob is collected from ``df`` — an
    extra Spark job that recomputes the upstream plan; pass the sample when
    the input pipeline is expensive."""
    keys = [c for c in df.columns if c != blob_col]

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = []
            for _, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    continue
                with zipfile.ZipFile(io.BytesIO(bytes(blob))) as z:
                    name = z.namelist()[0]
                    body = z.read(name).decode("utf-8")
                sub = pd.read_csv(io.StringIO(body), dtype=str, **(csv_opts or {}))
                for k in keys:
                    sub[k] = row[k]
                frames.append(sub)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    if sample_blob is None:
        # skip null blobs (failed fetches — the rows fn itself skips): the
        # first row being null must not crash schema discovery
        sample = df.where(F.col(blob_col).isNotNull()).limit(1).collect()
        if not sample:
            raise ValueError("cannot infer zip-csv schema: no non-null blobs")
        sample_blob = bytes(sample[0][blob_col])
    with zipfile.ZipFile(io.BytesIO(sample_blob)) as z:
        cols = pd.read_csv(io.StringIO(z.read(z.namelist()[0]).decode()), dtype=str, nrows=0, **(csv_opts or {})).columns
    clash = sorted(set(cols) & set(keys))
    if clash:
        # a duplicate field name would both break downstream resolution AND
        # silently clobber the CSV's values with the outer row's key value
        raise ValueError(
            f"zip CSV columns collide with key columns: {clash} — rename the "
            f"key columns or drop them before unzip_csv_rows"
        )
    key_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name != blob_col)
    csv_schema = ", ".join(f"`{c}` string" for c in cols)
    schema = ", ".join(x for x in [csv_schema, key_schema] if x)
    return df.mapInPandas(fn, schema=schema)


def chunked_range_updates(
    df: DataFrame, order_cols: list[str], chunk_size: int, start_row: int = 2
) -> DataFrame:
    """S15: chunked spreadsheet range-update plan (reference update_cell with
    chunk_size, sharepoint_manager.py:800-890): split a deterministically
    ordered export into A1-style row-range chunks of ≤ chunk_size rows.

    Returns one row per chunk: (chunk_id, range_address, n_rows, payload)
    where payload is the array of string-cast row arrays the reference PATCHes
    to that range — callers hand each chunk to their sheet/HTTP writer.
    Exports are sheet-sized by definition, so the global-order window's single
    partition is fine (the reference serializes the same rows over HTTP).
    """
    from pyspark.sql import Window

    from web_crawling_prj_spark.functions.extract import col_index_to_name

    last_col = col_index_to_name(len(df.columns))
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    cells = F.array(*[F.col(c).cast("string") for c in df.columns])
    rows = df.select(
        ((F.row_number().over(w) - 1)).alias("_rn"), cells.alias("_cells")
    ).withColumn("chunk_id", F.floor(F.col("_rn") / chunk_size).cast("int"))
    chunks = rows.groupBy("chunk_id").agg(
        F.count("*").alias("n_rows"),
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("_rn"), F.col("_cells")))),
            lambda s: s["_cells"],
        ).alias("payload"),
    )
    first_row = F.lit(start_row) + F.col("chunk_id").cast("long") * chunk_size
    return chunks.select(
        "chunk_id",
        F.concat(
            F.lit("A"),
            first_row.cast("string"),
            F.lit(f":{last_col}"),
            (first_row + F.col("n_rows") - 1).cast("string"),
        ).alias("range_address"),
        "n_rows",
        "payload",
    )
