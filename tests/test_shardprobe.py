"""Partition-resident seen tier (operators.shardprobe): equality with the
broadcast tiers, routing exactness, and the no-driver-term plan shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.bloom import build_sharded_bloom, might_contain
from web_crawling_prj_spark.operators.cuckoo import build_sharded_cuckoo, cuckoo_might_contain
from web_crawling_prj_spark.operators.shardprobe import (
    anti_join_seen_shard_rows,
    build_bloom_shard_rows,
    build_cuckoo_shard_rows,
    probe_bloom_shard_rows,
    probe_cuckoo_shard_rows,
)

P = 8
EXP = 2_000


def _keys(spark, n, seed):
    return spark.range(n).select(
        F.xxhash64(F.col("id") + F.lit(seed)).alias("url_hash")
    )


def test_bloom_shard_rows_probe_equals_broadcast_tier(spark):
    seen = _keys(spark, 5_000, 1)
    probe_set = _keys(spark, 2_000, 1).unionByName(_keys(spark, 2_000, 999))

    bloom = build_sharded_bloom(seen, num_shards=P, expected_per_shard=EXP, fpp=0.01)
    want = {
        r.url_hash: r.m
        for r in probe_set.withColumn(
            "m", might_contain(bloom, "url_hash", spark=spark)
        ).collect()
    }
    rows = build_bloom_shard_rows(seen, num_shards=P, expected_per_shard=EXP, fpp=0.01)
    got = {
        r.url_hash: r._maybe_seen
        for r in probe_bloom_shard_rows(
            probe_set, rows, num_shards=P, expected_per_shard=EXP, fpp=0.01
        ).collect()
    }
    assert got == want
    # zero false negatives: every seen key probes true
    seen_keys = {r.url_hash for r in seen.collect()}
    assert all(got[k] for k in set(got) & seen_keys)


def test_cuckoo_shard_rows_probe_equals_broadcast_tier(spark):
    seen = _keys(spark, 5_000, 2)
    probe_set = _keys(spark, 2_000, 2).unionByName(_keys(spark, 2_000, 777))

    ck = build_sharded_cuckoo(seen, num_shards=P, expected_per_shard=EXP)
    want = {
        r.url_hash: r.m
        for r in probe_set.withColumn(
            "m", cuckoo_might_contain(ck, "url_hash", spark=spark)
        ).collect()
    }
    rows = build_cuckoo_shard_rows(seen, num_shards=P, expected_per_shard=EXP)
    got = {
        r.url_hash: r._maybe_seen
        for r in probe_cuckoo_shard_rows(
            probe_set, rows, num_shards=P, expected_per_shard=EXP
        ).collect()
    }
    assert got == want


def test_anti_join_shard_rows_exactness_both_kinds(spark):
    """Routing through the partition-resident tier must equal the plain exact
    anti-join — fpp only moves rows between the fast lane and the rescue."""
    seen = _keys(spark, 4_000, 3)
    frontier = _keys(spark, 3_000, 3).unionByName(_keys(spark, 3_000, 555))
    exact = {r.url_hash for r in frontier.join(seen, "url_hash", "left_anti").collect()}

    b_rows = build_bloom_shard_rows(seen, num_shards=P, expected_per_shard=EXP)
    got_b = {
        r.url_hash
        for r in anti_join_seen_shard_rows(
            frontier, seen, b_rows, kind="bloom", num_shards=P, expected_per_shard=EXP
        ).collect()
    }
    assert got_b == exact

    c_rows = build_cuckoo_shard_rows(seen, num_shards=P, expected_per_shard=EXP)
    got_c = {
        r.url_hash
        for r in anti_join_seen_shard_rows(
            frontier, seen, c_rows, kind="cuckoo", num_shards=P, expected_per_shard=EXP
        ).collect()
    }
    assert got_c == exact


def test_shard_rows_plan_has_no_driver_term(spark):
    """The probe plan is a cogroup — each task decodes only ITS shard; no
    broadcast of the assembled filter, no driver collect anywhere."""
    seen = _keys(spark, 3_000, 4)
    frontier = _keys(spark, 1_000, 4)
    rows = build_bloom_shard_rows(seen, num_shards=P, expected_per_shard=EXP)
    probed = probe_bloom_shard_rows(frontier, rows, num_shards=P, expected_per_shard=EXP)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BroadcastExchange" not in plan
    # empty-shard behavior: a frontier key whose shard holds no seen keys is
    # definitely unseen
    lonely = spark.createDataFrame([(int(1),)], "url_hash long")
    empty_rows = build_bloom_shard_rows(
        spark.createDataFrame([], "url_hash long"), num_shards=P, expected_per_shard=EXP
    )
    got = probe_bloom_shard_rows(lonely, empty_rows, num_shards=P, expected_per_shard=EXP)
    assert [r._maybe_seen for r in got.collect()] == [False]
