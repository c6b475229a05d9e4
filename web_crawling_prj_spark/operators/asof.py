"""As-of join + sessionization — time-series operators Spark lacks natively.

Reference analog (J9/W2): "latest report matching a request" — filter
``requestedOn >= request_time`` then take the most recent
(dags/walmart/walmart_ad.get_all_report.py:62-79). Generalized here to a true
as-of join: for every left row, the most recent right row with the same key
and ``right.ts <= left.ts``.

Two implementations with identical semantics (tested against each other and a
DuckDB ``ASOF JOIN`` oracle):

- :func:`asof_join_native` — union-and-window: tag both sides, union, then
  ``last_value(ignorenulls)`` of the right payload over (key ORDER BY ts, side)
  gives each left row the latest preceding right row. ONE shuffle on the key,
  no UDF, no per-group memory blowup — this is the 100 TB path.
- :func:`asof_join_pandas` — ``applyInPandas`` + ``pd.merge_asof`` per key
  group (the guide's recipe); simpler but groups must fit in memory — kept as
  the readability/verification twin.

Sessionization: gap-based session ids via lag + cumulative sum — the standard
webtext/event-pipeline operator (guide §Common OLAP patterns).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_native(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row per key with right_ts <= left_ts."""
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(F.col(right_ts).alias(f"{right_ts}{suffix}"), *[F.col(c) for c in right_payload]).alias("_pay"),
    )
    l = l.select(*lcols, "_side", "_ts", F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"))
    r = r.select(*[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on], F.col(on), "_side", "_ts", "_pay").select(
        *lcols, "_side", "_ts", "_pay"
    )
    u = l.unionByName(r)
    # right rows sort BEFORE left rows at equal ts (side 0 < 1) → ties are
    # inclusive (right.ts == left.ts matches), like merge_asof/DuckDB defaults.
    # `_pay` as the final key makes duplicate (key, ts) right rows resolve
    # deterministically (max payload struct wins) instead of by arrival order.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_pay").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_last_pay", F.last("_pay", ignorenulls=True).over(w))
    out = matched.where(F.col("_side") == 1).drop("_side", "_ts", "_pay")
    return out.select(
        *lcols, *[F.col(f"_last_pay.{f}").alias(f) for f in [f"{right_ts}{suffix}", *right_payload]]
    ).drop("_last_pay")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Same semantics via applyInPandas + pd.merge_asof per key cogroup."""
    out_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields)
    rs = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out_fields += f", `{right_ts}{suffix}` {rs[right_ts]}"
    for c in right_payload:
        out_fields += f", `{c}` {rs[c]}"

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_pdf = l_pdf.sort_values(left_ts)
        r_pdf = r_pdf[[right_ts, *right_payload]].rename(
            columns={right_ts: f"{right_ts}{suffix}"}
        )
        # sort by (ts, payload): merge_asof takes the LAST matching row, so
        # duplicate-ts right rows resolve to max payload — same rule as the
        # native variant's struct tiebreak
        r_pdf = r_pdf.sort_values([f"{right_ts}{suffix}", *right_payload])
        if r_pdf.empty:
            for c in [f"{right_ts}{suffix}", *right_payload]:
                l_pdf[c] = None
            return l_pdf
        return pd.merge_asof(
            l_pdf, r_pdf, left_on=left_ts, right_on=f"{right_ts}{suffix}", direction="backward"
        )

    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(
        lambda lk, rk: merge(lk, rk), schema=out_fields
    )


def sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based session ids: a new session starts when the time since the
    previous event of the same key exceeds the gap. Adds ``session_seq`` (per
    key) and a globally unique ``session_id`` string."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    # interval arithmetic (not epoch casts) so TIMESTAMP and TIMESTAMP_NTZ both work
    gap = F.expr(f"INTERVAL '{int(gap_minutes)}' MINUTE")  # day-time interval:
    # matches the ts-minus-ts result type for TIMESTAMP and TIMESTAMP_NTZ alike
    new_sess = ((F.col(ts) - F.lag(F.col(ts)).over(w)) > gap).cast("int")
    out = events.withColumn("_new", F.coalesce(new_sess, F.lit(1)))
    out = out.withColumn(
        "session_seq", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ).drop("_new")
    return out.withColumn("session_id", F.concat_ws("#", F.col(key).cast("string"), F.col("session_seq").cast("string")))
