"""Format-dispatched scans — reference DataLoaderFactory re-expressed on Spark.

The reference hand-rolls one pandas loader class per format plus a registration
factory (``utils/common/db_loader/data_loader.py:64-267``). On Spark the same
surface is ``spark.read.format(...)`` with per-format options; this module keeps
the factory shape (including dynamic registration, S4) so config-driven
pipelines can say ``read(spark, 'csv', path, schema=..., skip_rows=2)``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

ReaderFn = Callable[..., DataFrame]
_READERS: dict[str, ReaderFn] = {}


def register_reader(fmt: str, fn: ReaderFn) -> None:
    """Dynamic registration (reference: DataLoaderFactory.register_loader,
    data_loader.py:202-267)."""
    _READERS[fmt.lower()] = fn


def read(spark: SparkSession, fmt: str, path: str, schema: StructType | str | None = None, **opts) -> DataFrame:
    fn = _READERS.get(fmt.lower())
    if fn is None:
        raise ValueError(f"no reader registered for format {fmt!r}; have {sorted(_READERS)}")
    return fn(spark, path, schema=schema, **opts)


def _csv(spark: SparkSession, path: str, schema=None, skip_rows: int = 0, **opts) -> DataFrame:
    """CSV scan (S1) incl. header-offset variant (S5: Google reports carry 2
    junk lines, gg_ads.init_dag_iload_gg_ads.py:24).

    OSS Spark has no 'skipRows' CSV option (Databricks-only; the option is
    silently ignored here — verified on 4.1), so skip_rows > 0 takes the
    wholetext path: each file is read whole, its first `skip_rows` PHYSICAL
    lines + the header line sliced off, and the remaining body parsed with
    Python's RFC-4180 csv reader inside mapInPandas — a quoted field
    containing an embedded newline stays ONE record (the previous
    split-on-newline + from_csv approach silently broke such records in
    half). Values land as strings and are try_cast to the schema (PERMISSIVE
    parity: malformed cells → NULL, not an ANSI error). Report files are
    small (driver-side exports), so one-row-per-file wholetext is the right
    trade.
    """
    if skip_rows:
        if schema is None:
            raise ValueError("skip_rows requires an explicit schema")
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
        delim = str(opts.get("sep", opts.get("delimiter", ",")))
        quote = str(opts.get("quote", '"'))
        names = [f.name for f in st.fields]

        def parse(it):
            import csv as _csvmod
            import io as _io

            import pandas as _pd

            for pdf in it:
                recs: list[list] = []
                for txt in pdf["value"]:
                    body = (txt or "").replace("\r\n", "\n")
                    # junk region is PHYSICAL lines (pandas skiprows parity);
                    # +1 drops the header line that follows it
                    parts = body.split("\n", skip_rows + 1)
                    body = parts[-1] if len(parts) > skip_rows + 1 else ""
                    for row in _csvmod.reader(
                        _io.StringIO(body), delimiter=delim, quotechar=quote
                    ):
                        if row and any(c != "" for c in row):
                            recs.append((row + [None] * len(names))[: len(names)])
                yield _pd.DataFrame(recs, columns=names, dtype=object)

        raw = spark.read.text(path, wholetext=True).mapInPandas(
            parse, schema=", ".join(f"`{n}` string" for n in names)
        )
        return raw.select(
            *[F.col(f.name).try_cast(f.dataType).alias(f.name) for f in st.fields]
        )
    r = spark.read.option("header", "true")
    for k, v in opts.items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    return r.csv(path)


def _json(spark: SparkSession, path: str, schema=None, path_glob: str | None = None, **opts) -> DataFrame:
    """JSON scan (S2) + whole-directory scan with filename-as-key (S6: the
    reference's one-file-per-key layout, services/wayfair_service.py:57-99).
    ``_metadata.file_path`` recovers the key column."""
    r = spark.read
    if path_glob:
        r = r.option("pathGlobFilter", path_glob)
    for k, v in opts.items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def _parquet(spark: SparkSession, path: str, schema=None, **opts) -> DataFrame:
    r = spark.read
    for k, v in opts.items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def _jdbc(spark: SparkSession, url: str, schema=None, table: str | None = None, **opts) -> DataFrame:
    """JDBC scan (S7; reference pd.read_sql_query, data_reader.py:25). Not
    exercised in the sandbox (no DB) but the dispatch surface is real."""
    r = spark.read.format("jdbc").option("url", url)
    if table:
        r = r.option("dbtable", table)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


for _fmt, _fn in {"csv": _csv, "json": _json, "parquet": _parquet, "jdbc": _jdbc}.items():
    register_reader(_fmt, _fn)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Convenience scan of a driver testdata table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
