"""Nested-payload extraction — the reference's JSON-wrangling surface (F12-F19).

Everything stays native (from_json / higher-order functions / get_json_object):
the reference's 66-line Python dict-walkers (e.g. ``process_info_data``,
dags/data_warehouse/wayfair.init_dag_iload_wayfair.py:80-145) become single
Column expressions that Catalyst prunes and codegens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def json_path(col: Column | str, path: str) -> Column:
    """F12: nested JSON path extraction (reference chained dict access,
    request_client.py:394-400)."""
    return F.get_json_object(_c(col), path)


def first_struct_match(arr: Column | str, field: str, value, out_field: str) -> Column:
    """F13: first element of an array<struct> whose ``field`` equals ``value``,
    returning its ``out_field`` (reference priceBlockElements search,
    wayfair.init_dag_iload_wayfair.py:39-56). Null when no match."""
    matches = F.filter(_c(arr), lambda s: s[field] == F.lit(value))
    # try_element_at: plain element_at on an empty array THROWS under Spark 4's
    # default ANSI mode instead of returning null
    return F.try_element_at(matches, F.lit(1))[out_field]


def explode_map_keys_split(df: DataFrame, map_col: str, sep: str = "-", out_col: str = "parts") -> DataFrame:
    """F14: explode map keys and split each (reference optionComboToPartId,
    services/wayfair_service.py:77-83)."""
    return df.withColumn("_key", F.explode(F.map_keys(_c(map_col)))).withColumn(
        out_col, F.split(F.col("_key"), sep)
    )


def filename_to_key(col: Column | str, suffix: str = ".json", sep: str = "_") -> Column:
    """F3: filename → key parts (reference ``file.replace('.json','').split('_')``,
    services/wayfair_service.py:136-148)."""
    return F.split(F.regexp_replace(_c(col), f"\\{suffix}$", ""), sep)


def template_substitute(col: Column | str, substitutions: dict[str, str]) -> Column:
    """F11: ``__PLACEHOLDER__`` template substitution (reference report payloads,
    services/gg_ads_service.py:89-99)."""
    out = _c(col)
    for k, v in substitutions.items():
        out = F.replace(out, F.lit(k), F.lit(v))
    return out


def to_local_timestamp(ts: Column | str, tz: str) -> Column:
    """F10: UTC → local wall time (reference ZoneInfo conversions,
    services/walmart_ad_service.py:62)."""
    return F.from_utc_timestamp(_c(ts), tz)


def month_name_to_last_day(col: Column | str) -> Column:
    """F7: "April 2025" → 2025-04-30 (gg_ads.init_dag_iload_gg_ads.py:42-48)."""
    return F.last_day(F.to_date(_c(col), "MMMM yyyy"))


def clean_percent(col: Column | str) -> Column:
    """F5: percent-string cleanup → fraction (gg_ads.init_dag_iload_gg_ads.py:24-39):
    trim, '< 10%'→'9.99', strip '%', '--'→'0', cast, /100."""
    s = F.trim(_c(col))
    s = F.regexp_replace(s, "^< 10%$", "9.99")
    s = F.regexp_replace(s, "%", "")
    s = F.regexp_replace(s, "^--$", "0")
    # try_cast: reference pd.to_numeric(errors='coerce') → NaN; ANSI cast would
    # abort the whole load on one stray 'N/A'
    return s.try_cast("double") / 100.0


def pivot_first(df: DataFrame, index: str, pivot_col: str, value_col: str, values: list | None = None) -> DataFrame:
    """A5: pivot_table(aggfunc='first') parity (walmart_seller_service.py:163-169)."""
    g = df.groupBy(index)
    p = g.pivot(pivot_col, values) if values is not None else g.pivot(pivot_col)
    return p.agg(F.first(value_col))


def paginate(df: DataFrame, total_pages_col: str, page_col: str = "page") -> DataFrame:
    """O5: pagination fan-out — once a response reports its total page count,
    emit one frontier row per remaining page (reference while-loop
    process_reviews_with_pagination, request_client.py:322-412) as a native
    sequence+explode (no driver loop)."""
    total = _c(total_pages_col)
    # guard: sequence(2, 1) would be DESCENDING [2, 1]; single-page responses
    # must fan out to zero remaining pages (explode of empty array drops the row)
    pages = F.when(total >= 2, F.sequence(F.lit(2), total)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(page_col, F.explode(pages))


def col_index_to_name(index: int) -> str:
    """F20: 1-based spreadsheet column index → A1 letters (1→A, 26→Z, 27→AA;
    parity with sharepoint_manager.py:790-798)."""
    if index < 1:
        raise ValueError("column index is 1-based")
    out = []
    while index > 0:
        index, rem = divmod(index - 1, 26)
        out.append(chr(ord("A") + rem))
    return "".join(reversed(out))


def parse_cell_address(cell: str) -> tuple[int, int]:
    """A1-style cell → (row, 1-based col index); parity with the reference's
    _parse_cell (sharepoint_manager.py:833-843)."""
    import re

    m = re.match(r"^([A-Z]+)([0-9]+)$", cell)
    if not m:
        raise ValueError(f"invalid cell address: {cell}")
    letters, row = m.groups()
    col = 0
    for ch in letters:
        col = col * 26 + (ord(ch) - ord("A") + 1)
    return int(row), col
