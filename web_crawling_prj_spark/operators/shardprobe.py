"""Partition-resident approximate seen tier — no driver memory term.

The broadcast tiers (operators.bloom / operators.cuckoo) build their shards
distributed but assemble the full array on the driver and ship it as ONE
broadcast — fine to a few hundred MB, an OOM cliff at the 10^10-URL design
point (~12 GB bloom at 1% fpp, ~22 GB cuckoo). This module keeps the shards
as ROWS — ``(shard, bitmap)`` / ``(shard, table, occ)`` DataFrames, stored
like any other state table — and probes by COGROUPING the frontier with its
own shard: each task decodes exactly one shard's bytes once per group and
probes its rows vectorized. No ``collect()``, no broadcast, no bitmap
duplication per row; the probe costs one exchange of the probe-side keys
(the same exchange the exact anti-join would need anyway) plus a shard-row
shuffle of P rows.

Semantics are IDENTICAL to the broadcast tiers (equality-tested): shard
assignment ``pmod(key, P)``, the same double-hashed bloom positions /
partial-key cuckoo buckets, false ⇒ definitely unseen. The routing contract
is unchanged too: probe-false rows skip the exact join, probe-true rows are
rescued exactly — correctness never depends on the filter.

Store the shard rows alongside the seen-set partitions (the Iceberg-sidecar
layout ``bloom.py`` documents); keep the broadcast tier for small stores
where one executor-resident array is cheaper than a cogroup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from web_crawling_prj_spark.operators.bloom import ShardedBloom, _probe_positions
from web_crawling_prj_spark.operators.cuckoo import (
    _SLOTS,
    ShardedCuckoo,
    _alt_index,
    _fingerprints,
    _index1,
    _insert_into_shard,
)


def build_bloom_shard_rows(
    seen: DataFrame,
    hash_col: str = "url_hash",
    num_shards: int = 16,
    expected_per_shard: int = 100_000,
    fpp: float = 0.01,
) -> DataFrame:
    """Distributed bloom build → ``(shard int, bitmap binary)`` rows.

    One 8-bytes/key shuffle routes keys to their shard; each shard's bitmap
    is built by its own task and never leaves the cluster. Parameters
    (m_bits, k) are a pure function of (expected_per_shard, fpp) — pass the
    SAME pair to :func:`probe_bloom_shard_rows`."""
    m_bits, k = ShardedBloom.params_for(expected_per_shard, fpp)
    m_bytes = m_bits // 8

    def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["_shard"].iloc[0])
        h = pdf[hash_col].to_numpy(dtype=np.int64)
        local = np.zeros(m_bytes, dtype=np.uint8)
        if len(h):
            flat = _probe_positions(h, m_bits, k).ravel()
            np.bitwise_or.at(local, flat >> 3, np.uint8(1) << (flat & 7).astype(np.uint8))
        return pd.DataFrame({"shard": [s], "bitmap": [local.tobytes()]})

    return (
        seen.select(F.col(hash_col).cast("long").alias(hash_col))
        .withColumn("_shard", F.pmod(hash_col, F.lit(num_shards)).cast("int"))
        .groupBy("_shard")
        .applyInPandas(build_shard, schema="shard int, bitmap binary")
    )


def build_cuckoo_shard_rows(
    seen: DataFrame,
    hash_col: str = "url_hash",
    num_shards: int = 16,
    expected_per_shard: int = 100_000,
    load_factor: float = 0.66,
) -> DataFrame:
    """Distributed cuckoo build → ``(shard int, table binary, occ binary)``
    rows — the same deterministic per-shard tables
    ``operators.cuckoo.build_sharded_cuckoo`` assembles, minus the driver
    assembly."""
    m = ShardedCuckoo.buckets_for(expected_per_shard, load_factor)

    def build_shard(keydf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(keydf["_shard"].iloc[0])
        h = np.sort(np.unique(keydf[hash_col].to_numpy(dtype=np.int64)))
        table = np.zeros((m, _SLOTS), dtype=np.uint16)
        occ = np.zeros(m, dtype=np.uint8)
        _insert_into_shard(table, occ, h, m)
        return pd.DataFrame(
            {"shard": [shard_id], "table": [table.tobytes()], "occ": [occ.tobytes()]}
        )

    return (
        seen.select(F.col(hash_col).cast("long").alias(hash_col))
        .withColumn("_shard", F.pmod(hash_col, F.lit(num_shards)).cast("int"))
        .groupBy("_shard")
        .applyInPandas(build_shard, schema="shard int, table binary, occ binary")
    )


def _cogroup_probe(
    frontier: DataFrame,
    shard_rows: DataFrame,
    key: str,
    num_shards: int,
    out_col: str,
    probe_group,
) -> DataFrame:
    """Frontier ⟂ its own shard row: cogroup on the shard id, decode the
    shard's bytes ONCE per group, flag the group's rows vectorized. An empty
    shard group (no seen keys hashed there) flags False — definitely unseen."""
    out_schema = StructType(
        [f for f in frontier.schema.fields] + [StructField(out_col, BooleanType())]
    )
    cols = frontier.columns

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        out = left[cols].copy()
        if right.empty or left.empty:
            out[out_col] = False if len(left) else pd.Series([], dtype=bool)
            return out
        h = left[key].to_numpy(dtype=np.int64)
        out[out_col] = probe_group(right.iloc[0], h)
        return out

    left = frontier.withColumn("_shard", F.pmod(F.col(key), F.lit(num_shards)).cast("int"))
    return (
        left.groupBy("_shard")
        .cogroup(shard_rows.groupBy("shard"))
        .applyInPandas(fn, schema=out_schema)
    )


def probe_bloom_shard_rows(
    frontier: DataFrame,
    shard_rows: DataFrame,
    key: str = "url_hash",
    num_shards: int = 16,
    expected_per_shard: int = 100_000,
    fpp: float = 0.01,
    out_col: str = "_maybe_seen",
) -> DataFrame:
    """Map-side bloom probe against shard ROWS: frontier + ``out_col`` flag
    (False ⇒ definitely unseen). Same (expected_per_shard, fpp) as the build."""
    m_bits, k = ShardedBloom.params_for(expected_per_shard, fpp)

    def probe_group(shard_row, h: np.ndarray) -> np.ndarray:
        bits = np.frombuffer(shard_row["bitmap"], dtype=np.uint8)
        pos = _probe_positions(h, m_bits, k)
        bit = np.uint8(1) << (pos & 7).astype(np.uint8)
        return ((bits[pos >> 3] & bit) != 0).all(axis=1)

    return _cogroup_probe(frontier, shard_rows, key, num_shards, out_col, probe_group)


def probe_cuckoo_shard_rows(
    frontier: DataFrame,
    shard_rows: DataFrame,
    key: str = "url_hash",
    num_shards: int = 16,
    expected_per_shard: int = 100_000,
    load_factor: float = 0.66,
    out_col: str = "_maybe_seen",
) -> DataFrame:
    """Map-side cuckoo probe against shard ROWS (no false negatives across
    insert/delete maintenance — the deletable tier's contract)."""
    m = ShardedCuckoo.buckets_for(expected_per_shard, load_factor)

    def probe_group(shard_row, h: np.ndarray) -> np.ndarray:
        table = np.frombuffer(shard_row["table"], dtype=np.uint16).reshape(m, _SLOTS)
        fp = _fingerprints(h)
        i1 = _index1(h, m)
        i2 = _alt_index(i1, fp, m)
        return (table[i1] == fp[:, None]).any(axis=1) | (table[i2] == fp[:, None]).any(axis=1)

    return _cogroup_probe(frontier, shard_rows, key, num_shards, out_col, probe_group)


def merge_bloom_shard_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two compatible bloom shard-row tables — the incremental-maintenance
    primitive (same contract as ``bloom.merge_blooms``, kept distributed):
    each round builds shard rows over its seen DELTA and ORs them into the
    persisted table, so the filter never rescans the full seen-set. Shards
    present on one side only pass through unchanged."""

    def or_group(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["shard"].iloc[0])
        acc: np.ndarray | None = None
        for blob in pdf["bitmap"]:
            cur = np.frombuffer(blob, dtype=np.uint8)
            acc = cur.copy() if acc is None else (acc | cur)
        return pd.DataFrame({"shard": [s], "bitmap": [acc.tobytes()]})

    return (
        a.select("shard", "bitmap")
        .unionByName(b.select("shard", "bitmap"))
        .groupBy("shard")
        .applyInPandas(or_group, schema="shard int, bitmap binary")
    )


def anti_join_seen_shard_rows(
    frontier: DataFrame,
    seen: DataFrame,
    shard_rows: DataFrame,
    key: str = "url_hash",
    kind: str = "bloom",
    num_shards: int = 16,
    expected_per_shard: int = 100_000,
    **params,
) -> DataFrame:
    """pending = frontier ∖ seen, routed through a PARTITION-RESIDENT filter
    tier: probe-false rows skip the exact join entirely; probe-true rows are
    rescued by the exact left-anti (the authority — correctness never depends
    on the filter). Same routing contract as ``dedup.anti_join_seen``, zero
    driver memory term."""
    probe = probe_bloom_shard_rows if kind == "bloom" else probe_cuckoo_shard_rows
    probed = probe(
        frontier,
        shard_rows,
        key=key,
        num_shards=num_shards,
        expected_per_shard=expected_per_shard,
        out_col="_maybe_seen",
        **params,
    )
    definitely_new = probed.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    candidates = probed.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    survivors = candidates.join(seen.select(key), key, "left_anti")
    return definitely_new.unionByName(survivors)
