"""Config-driven schema mapping + load dispatch — the reference's ETLConfig.

The reference drives every warehouse load from a mapping config
(``config/mapping.yaml`` loaded at utils/common/config_manager.py:108-122,
consumed at utils/common/db_loader/data_loader.py:600-622,682-706):
``cols_to_insert, etl_cols, mapping_cols, hash_cols, primary_key, des_schema,
des_table, from_src, load_type``. Here the same declarative dict compiles to a
DataFrame plan: select → rename → hash → metadata → (full | incremental-SCD2)
load. Keeping it declarative preserves the reference's operating model (add a
source by adding config, not code) while Catalyst sees plain projections it
can prune through.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.scd2 import scd2_apply_batch, with_scd2_metadata


@dataclass
class ETLConfig:
    """Parity with data_loader.py:23-37 (des_schema/des_table become the
    state-store table path)."""

    des_table: str
    primary_key: list[str]
    hash_cols: list[str]
    from_src: str
    cols_to_insert: list[str] = field(default_factory=list)  # post-rename selection
    mapping_cols: dict[str, str] = field(default_factory=dict)  # src name -> dest name
    load_type: str = "incremental"  # 'full' | 'incremental' (data_loader.py:818-872)

    @staticmethod
    def from_json(s: str) -> "ETLConfig":
        return ETLConfig(**json.loads(s))


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P2 parity (data_loader.py:327-361): missing source columns are tolerated
    (the reference logs and skips them)."""
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(present)


def _rename_and_project(df: DataFrame, cfg: ETLConfig) -> DataFrame:
    """The one staging rule (rename → cols_to_insert projection) shared by
    both load paths — a change here reaches full AND incremental loads."""
    out = rename_columns(df, cfg.mapping_cols)
    if cfg.cols_to_insert:
        out = out.select(*[c for c in cfg.cols_to_insert if c in out.columns])
    return out


def stage_batch(df: DataFrame, cfg: ETLConfig, load_ts: str) -> DataFrame:
    """select → rename → hash+metadata (data_loader.py:690-701)."""
    return with_scd2_metadata(_rename_and_project(df, cfg), cfg.hash_cols, cfg.from_src, load_ts)


def load_batch(
    current: DataFrame | None, batch: DataFrame, cfg: ETLConfig, load_ts: str
) -> DataFrame:
    """Dispatch by load_type (reference load_data_to_db, data_loader.py:818-872):
    'full' = truncate+reload semantics (batch replaces the table), 'incremental'
    = SCD2 merge. Returns the new table contents (caller checkpoints it)."""
    if cfg.load_type == "full":
        return stage_batch(batch, cfg, load_ts)
    if cfg.load_type == "incremental":
        staged = _rename_and_project(batch, cfg)
        return scd2_apply_batch(
            current, staged, cfg.primary_key, cfg.hash_cols, cfg.from_src, load_ts
        )
    raise ValueError(f"unknown load_type {cfg.load_type!r}")


def add_literal_columns(df: DataFrame, values: dict) -> DataFrame:
    """P3 parity: add literal/metadata columns in one withColumns call."""
    return df.withColumns({k: F.lit(v) for k, v in values.items()})


def dict_union_join(details: DataFrame, headers: DataFrame, key: str | list[str]) -> DataFrame:
    """J8: dict-union join — merge one header row into each detail row,
    ``{**header, **detail}`` semantics (detail wins on overlapping columns;
    reference dags/lowes/lowes_vendor/lowes_vendor.init_all_reports.py:62-66).

    Headers are one row per key (typically tiny) → broadcast left join; the
    detail side never shuffles.
    """
    keys = [key] if isinstance(key, str) else list(key)
    overlap = [c for c in headers.columns if c in details.columns and c not in keys]
    return details.join(F.broadcast(headers.drop(*overlap)), keys, "left")
