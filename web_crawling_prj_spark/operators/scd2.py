"""SCD2 incremental warehouse merge — reference UniversalDataLoader, Spark-first.

Reference semantics (utils/common/db_loader/data_loader.py:639-816), replayed
exactly but as ONE DataFrame program instead of a chunked temp-table dance:

1. source batch → select cols, rename, ``hash_key = md5('_'.join(str(col)))``
   over the configured hash_cols (:690-701, :393-402);
2. rows whose pk matches a latest row with a DIFFERENT hash close that row
   (``row_end_date = now, row_is_latest = false``) and insert a new version
   with ``row_version_number = prev + 1`` (:775-804);
3. brand-new pks insert as version 1;
4. unchanged rows (same hash) are no-ops.

Metadata columns match ETLConfig (data_loader.py:23-37, 287-325):
row_start_date ('1900-01-01' for first version), row_end_date ('9999-12-31'
open), row_is_latest, row_is_delete, row_version_number, created_at,
modified_at, from_src, hash_key.

With Iceberg this would be a single ``MERGE INTO``; the sandbox has no Iceberg
jars, so :func:`scd2_apply_batch` produces the new full table functionally
(current ∖ closed ∪ closed' ∪ inserts) — the same rows a MERGE would leave,
checkpointable via plans.statestore. :func:`scd2_rebuild_from_history` derives
the SCD2 columns for a whole history in one windowed pass (used for oracle
parity with DuckDB SQL).

At scale: the merge joins current-latest with the batch on pk — both sides
hash-partitioned on pk; history rows (is_latest=false) are untouched and never
shuffled. Batches are tiny vs the table → broadcast the batch side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from web_crawling_prj_spark.functions.hashing import md5_row_hash

OPEN_END = "9999-12-31 00:00:00"
FIRST_START = "1900-01-01 00:00:00"

META_COLS = [
    "hash_key",
    "row_start_date",
    "row_end_date",
    "row_is_latest",
    "row_is_delete",
    "row_version_number",
    "created_at",
    "modified_at",
    "from_src",
]


def with_scd2_metadata(
    batch: DataFrame, hash_cols: list[str], from_src: str, load_ts: str
) -> DataFrame:
    """add_metadata_columns parity (data_loader.py:287-325) for a fresh batch."""
    ts = F.lit(load_ts).cast("timestamp")
    return batch.withColumns(
        {
            "hash_key": md5_row_hash(hash_cols),
            "row_start_date": F.lit(FIRST_START).cast("timestamp"),
            "row_end_date": F.lit(OPEN_END).cast("timestamp"),
            "row_is_latest": F.lit(True),
            "row_is_delete": F.lit(False),
            "row_version_number": F.lit(1),
            "created_at": ts,
            "modified_at": ts,
            "from_src": F.lit(from_src),
        }
    )


def scd2_apply_batch(
    current: DataFrame | None,
    batch: DataFrame,
    primary_key: list[str],
    hash_cols: list[str],
    from_src: str,
    load_ts: str,
) -> DataFrame:
    """Apply one batch to the SCD2 table; returns the new full table.

    Equivalent to the reference's UPDATE+MERGE+INSERT transaction
    (data_loader.py:767-804) and to an Iceberg MERGE INTO with the same
    predicates.
    """
    # deterministic within-batch dedup: min-struct per pk, never
    # dropDuplicates (which keeps an arrival-order-dependent row)
    value_cols = [c for c in batch.columns if c not in primary_key]
    packed = batch.groupBy(*primary_key).agg(
        F.min(F.struct(*[F.col(c) for c in value_cols])).alias("_row")
    )
    deduped = packed.select(
        *primary_key, *[F.col(f"_row.{c}").alias(c) for c in value_cols]
    )
    staged = with_scd2_metadata(deduped, hash_cols, from_src, load_ts)
    if current is None:
        return staged

    ts = F.lit(load_ts).cast("timestamp")
    latest = current.where(F.col("row_is_latest"))
    history = current.where(~F.col("row_is_latest"))

    src = staged.select(
        *[F.col(c).alias(f"_src_{c}") for c in staged.columns]
    )
    join_cond = [latest[k] == src[f"_src_{k}"] for k in primary_key]
    j = latest.join(src, on=join_cond, how="full_outer")

    src_present = src[f"_src_{primary_key[0]}"].isNotNull()
    tgt_present = latest[primary_key[0]].isNotNull()
    changed = src_present & tgt_present & (latest["hash_key"] != src["_src_hash_key"])

    # 1) untouched latest rows (absent from batch, or unchanged hash)
    untouched = j.where(tgt_present & (~src_present | (latest["hash_key"] == src["_src_hash_key"]))).select(
        *[latest[c] for c in current.columns]
    )
    # 2) closed-out old versions (MERGE WHEN MATCHED AND hash≠ → UPDATE :785-796)
    closed = j.where(changed).select(
        *[
            latest[c]
            for c in current.columns
            if c not in ("row_end_date", "row_is_latest", "modified_at")
        ],
        ts.alias("row_end_date"),
        F.lit(False).alias("row_is_latest"),
        ts.alias("modified_at"),
    ).select(*[F.col(c) for c in current.columns])
    # 3) new versions for changed rows (second INSERT :798-804): version = prev+1,
    #    row_start_date = load_ts
    bumped = j.where(changed).select(
        *[
            src[f"_src_{c}"].alias(c)
            for c in staged.columns
            if c not in ("row_version_number", "row_start_date")
        ],
        (latest["row_version_number"] + 1).alias("row_version_number"),
        ts.alias("row_start_date"),
    ).select(*[F.col(c) for c in staged.columns])
    # 4) brand-new keys (MERGE WHEN NOT MATCHED → INSERT, version 1)
    fresh = j.where(src_present & ~tgt_present).select(
        *[src[f"_src_{c}"].alias(c) for c in staged.columns]
    )

    return history.unionByName(untouched).unionByName(closed).unionByName(bumped).unionByName(fresh)


def scd2_merge_sql(
    target_table: str,
    batch_view: str,
    primary_key: list[str],
    load_ts: str,
    columns: list[tuple[str, str]],
) -> str:
    """The single-statement ANSI ``MERGE INTO`` equivalent of
    :func:`scd2_apply_batch` for engines with row-level table ops
    (Iceberg/Delta; reference transaction data_loader.py:767-804).

    Standard SCD2-via-MERGE shape: the USING source is the staged batch
    (matched on pk → close the old latest version) UNION ALL the changed rows
    re-emitted with a NULL join key (never match → INSERT the new version,
    with row_version_number = previous + 1 precomputed in the subquery).

    ``columns``: the staged batch's (name, sql_type) pairs — the null join
    keys are cast to the REAL pk types (a string pk would otherwise break the
    UNION), and the INSERT branch lists every target column explicitly:
    helper columns (_join_*, _new_version) never reach the target, inserted
    rows take row_version_number = s._new_version and, for re-emitted changed
    rows (version > 1), row_start_date = load_ts — exactly the functional
    path's `bumped`/`fresh` branches."""
    types = dict(columns)
    pk_eq = " AND ".join(f"t.{k} = s._join_{k}" for k in primary_key)
    pk_join = " AND ".join(f"t.{k} = b.{k}" for k in primary_key)
    join_sel = ", ".join(f"b.{k} AS _join_{k}" for k in primary_key)
    null_join_sel = ", ".join(
        f"CAST(NULL AS {types[k]}) AS _join_{k}" for k in primary_key
    )
    col_names = [c for c, _ in columns]
    insert_cols = ", ".join(col_names)
    insert_vals = ", ".join(
        "s._new_version"
        if c == "row_version_number"
        else (
            f"CASE WHEN s._new_version = 1 THEN s.row_start_date "
            f"ELSE TIMESTAMP '{load_ts}' END"
            if c == "row_start_date"
            else f"s.{c}"
        )
        for c in col_names
    )
    return f"""
MERGE INTO {target_table} t
USING (
  SELECT {join_sel}, b.*, CAST(1 AS INT) AS _new_version FROM {batch_view} b
  UNION ALL
  SELECT {null_join_sel}, b.*, t.row_version_number + 1 AS _new_version
  FROM {batch_view} b JOIN {target_table} t
    ON {pk_join} AND t.row_is_latest AND t.hash_key <> b.hash_key
) s
ON {pk_eq} AND t.row_is_latest
WHEN MATCHED AND t.hash_key <> s.hash_key THEN UPDATE SET
  t.row_end_date = TIMESTAMP '{load_ts}',
  t.row_is_latest = false,
  t.modified_at = TIMESTAMP '{load_ts}'
WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})
""".strip()


def scd2_apply_batch_table(
    spark,
    target_table: str,
    batch: DataFrame,
    primary_key: list[str],
    hash_cols: list[str],
    from_src: str,
    load_ts: str,
) -> str:
    """Apply a batch to an SCD2 METASTORE TABLE in place. Returns the path
    taken: ``"merge"`` (engine executed the single MERGE INTO — Iceberg/Delta
    row-level ops available) or ``"rewrite"`` (v1 parquet tables can't MERGE:
    falls back to the functional :func:`scd2_apply_batch` and swaps the table
    via stage-and-rename — same final rows, proven by the parity test; only
    Iceberg's metadata swap would make the fallback atomic).

    On this sandbox (no Iceberg/Delta jars) the merge path is composed and
    attempted but always falls back — honest environment gate, same pattern
    as plans.statestore's Iceberg notes.

    Crash safety of the fallback: the new state is staged to
    ``{target}__scd2_stage``, the live table renamed ASIDE (never dropped
    first), the stage promoted, then the old copy dropped — so a complete
    copy of the data exists in the catalog at every instant. A crash between
    rename-aside and promote leaves no ``target_table``; the next call
    detects that (stage present, target absent — the stage's catalog entry
    only exists once its write committed) and promotes the stage
    automatically before applying the new batch."""
    stage = f"{target_table}__scd2_stage"
    aside = f"{target_table}__scd2_old"
    if not spark.catalog.tableExists(target_table) and spark.catalog.tableExists(stage):
        # crashed between rename-aside and promote: the stage holds the
        # complete post-batch state of that earlier run — promote it
        spark.sql(f"ALTER TABLE {stage} RENAME TO {target_table}")
        spark.sql(f"DROP TABLE IF EXISTS {aside}")
    if not spark.catalog.tableExists(target_table):
        staged = scd2_apply_batch(None, batch, primary_key, hash_cols, from_src, load_ts)
        staged.write.mode("overwrite").saveAsTable(target_table)
        return "create"
    value_cols = [c for c in batch.columns if c not in primary_key]
    packed = batch.groupBy(*primary_key).agg(
        F.min(F.struct(*[F.col(c) for c in value_cols])).alias("_row")
    )
    deduped = packed.select(*primary_key, *[F.col(f"_row.{c}").alias(c) for c in value_cols])
    staged = with_scd2_metadata(deduped, hash_cols, from_src, load_ts)
    staged.createOrReplaceTempView("_scd2_batch_stage")
    cols = [(f.name, f.dataType.simpleString()) for f in staged.schema.fields]
    if _table_supports_merge(spark, target_table):
        # capability decided from the table's PROVIDER, not by sniffing
        # exception text (brittle across Spark versions/locales) — and real
        # MERGE failures (e.g. Delta's multiple-source-rows-matched error)
        # surface to the caller, never silently reroute into the rewrite.
        spark.sql(scd2_merge_sql(target_table, "_scd2_batch_stage", primary_key, load_ts, cols))
        return "merge"
    current = spark.table(target_table)
    merged = scd2_apply_batch(current, batch, primary_key, hash_cols, from_src, load_ts)
    spark.sql(f"DROP TABLE IF EXISTS {stage}")  # stale stage from a crashed run
    merged.write.mode("overwrite").saveAsTable(stage)
    # stage complete → swap with the live copy always present in the catalog:
    # rename target ASIDE, promote the stage, drop the old copy last
    spark.sql(f"DROP TABLE IF EXISTS {aside}")
    spark.sql(f"ALTER TABLE {target_table} RENAME TO {aside}")
    spark.sql(f"ALTER TABLE {stage} RENAME TO {target_table}")
    spark.sql(f"DROP TABLE {aside}")
    return "rewrite"


#: table providers with row-level operation (MERGE INTO) support
MERGE_CAPABLE_PROVIDERS = {"delta", "iceberg", "hudi"}


def _table_supports_merge(spark, table: str) -> bool:
    """MERGE capability from the table's catalog PROVIDER (Delta/Iceberg/Hudi
    implement SupportsRowLevelOperations; Spark's v1 parquet/csv/hive tables
    do not) — deterministic, locale-independent, version-stable."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    provider = next(
        (r.data_type for r in rows if (r.col_name or "").strip() == "Provider"), ""
    )
    return (provider or "").strip().lower() in MERGE_CAPABLE_PROVIDERS


def scd2_rebuild_from_history(
    history: DataFrame,
    primary_key: list[str],
    order_col: str = "created_at",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Derive SCD2 columns for an append-only change history in one windowed
    pass — row_version_number / row_is_latest / row_start_date / row_end_date
    per pk ordered by ``order_col``. SQL-expressible (oracle parity W3).

    ``tiebreak_cols``: extra ordering columns for histories where several
    versions share the same ``order_col`` value (e.g. same-day orders) — the
    ranking must be a pure function of data, never of partition arrival."""
    tb = tiebreak_cols or []
    w = Window.partitionBy(*primary_key).orderBy(
        F.col(order_col).asc(), *[F.col(c).asc() for c in tb]
    )
    wdesc = Window.partitionBy(*primary_key).orderBy(
        F.col(order_col).desc(), *[F.col(c).desc() for c in tb]
    )
    return (
        history.withColumn("row_version_number", F.row_number().over(w))
        .withColumn("_rn_desc", F.row_number().over(wdesc))
        .withColumn("row_is_latest", F.col("_rn_desc") == 1)
        .withColumn(
            "row_start_date",
            F.when(F.col("row_version_number") == 1, F.lit(FIRST_START).cast("timestamp")).otherwise(
                F.col(order_col)
            ),
        )
        .withColumn(
            "row_end_date",
            F.coalesce(F.lead(order_col, 1).over(w), F.lit(OPEN_END).cast("timestamp")),
        )
        .drop("_rn_desc")
    )


def new_reviews_query(history: DataFrame) -> DataFrame:
    """Reference LAG query parity (utils/common/db_loader/data_reader.py:13-21):
    latest rows whose review_count changed vs the previous version."""
    w = Window.partitionBy("display_sku").orderBy(F.col("created_at").asc())
    return (
        history.withColumn("last_review_count", F.lag("review_count").over(w))
        .where(F.col("row_is_latest") & (~F.col("review_count").eqNullSafe(F.col("last_review_count"))))
        .select(
            "display_sku",
            "review_count",
            "last_review_count",
            (F.col("review_count") - F.coalesce("last_review_count", F.lit(0))).alias(
                "new_review_count"
            ),
        )
    )
