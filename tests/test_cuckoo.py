"""Sharded cuckoo filter — the deletable half of the north-star's
"partitioned cuckoo/bloom-filter URL-seen set".

Laws under test:
  1. Zero false negatives after a distributed build.
  2. False-positive rate stays near the design point (≈0.012% at b=4/f=16;
     asserted with generous slack).
  3. Exactness of anti_join_seen is independent of the filter (routing only).
  4. THE cuckoo-specific law: incremental maintenance against an
     add+tombstone event log — insert the round's adds, delete the round's
     tombstones, never rescan the backlog — preserves zero false negatives
     for the keys that remain live (a bloom cannot do this; it is add-only).
  5. Serialized bytes are deterministic under input partitioning, and
     round-trip through to_bytes/from_bytes.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.cuckoo import (
    ShardedCuckoo,
    build_sharded_cuckoo,
    cuckoo_from_bytes,
    cuckoo_might_contain,
    cuckoo_to_bytes,
    delete_keys,
    insert_keys,
)
from web_crawling_prj_spark.operators.dedup import anti_join_seen


def _hashes(spark, lo, hi):
    return spark.range(lo, hi).select(F.xxhash64("id").alias("url_hash"))


def test_cuckoo_no_false_negatives_and_fp_rate(spark):
    seen = _hashes(spark, 0, 5000)
    ck = build_sharded_cuckoo(seen, num_shards=8, expected_per_shard=1000)
    probed = (
        spark.range(0, 20000)
        .select(F.xxhash64("id").alias("url_hash"), (F.col("id") < 5000).alias("is_seen"))
        .withColumn("maybe", cuckoo_might_contain(ck))
    )
    assert probed.where(F.col("is_seen") & ~F.col("maybe")).count() == 0
    # design fpp ≈ 8/2^16 ≈ 0.012%; allow a wide band (<=0.5%) on 15k unseen
    fp = probed.where(~F.col("is_seen") & F.col("maybe")).count()
    assert fp <= 15000 * 0.005, f"cuckoo false-positive rate too high: {fp}/15000"


def test_anti_join_with_cuckoo_probe_is_exact(spark):
    frontier = spark.range(2000).select(
        F.xxhash64("id").alias("url_hash"), F.col("id").alias("doc")
    )
    seen = _hashes(spark, 500, 1200)
    expected = {r.url_hash for r in frontier.collect()} - {
        r.url_hash for r in seen.collect()
    }
    ck = build_sharded_cuckoo(seen, num_shards=8, expected_per_shard=200)
    out = anti_join_seen(
        frontier, seen, probe_col=cuckoo_might_contain(ck, spark=spark)
    )
    assert {r.url_hash for r in out.collect()} == expected


def test_anti_join_rejects_bloom_plus_probe(spark):
    from web_crawling_prj_spark.operators.bloom import build_sharded_bloom

    frontier = spark.range(10).select(F.xxhash64("id").alias("url_hash"))
    seen = _hashes(spark, 0, 5)
    bloom = build_sharded_bloom(seen, num_shards=2, expected_per_shard=10, fpp=0.01)
    ck = build_sharded_cuckoo(seen, num_shards=2, expected_per_shard=10)
    with pytest.raises(ValueError):
        anti_join_seen(
            frontier, seen, bloom=bloom, probe_col=cuckoo_might_contain(ck), spark=spark
        )


def test_incremental_maintenance_matches_event_log(spark):
    """Drive the filter the way the delta-mode frontier log drives state:
    per round insert adds, delete tombstones (tombstones only ever target
    committed adds — the event-log contract). After every round, every LIVE
    key must still probe true; fully-deleted keys drop back to the
    false-positive floor."""
    rng = np.random.RandomState(7)
    ck = build_sharded_cuckoo(
        _hashes(spark, 0, 0), num_shards=4, expected_per_shard=4000
    )
    live: set[int] = set()
    universe = [int(x) for x in rng.randint(-(2**62), 2**62, size=12000)]
    pos = 0
    for rnd in range(6):
        adds = universe[pos : pos + 1500]
        pos += 1500
        insert_keys(ck, np.array(adds, dtype=np.int64))
        live.update(adds)
        # tombstone a random committed subset
        dels = rng.choice(sorted(live), size=min(400, len(live)), replace=False)
        removed = delete_keys(ck, dels.astype(np.int64))
        assert removed == len(dels)  # every committed add is findable to delete
        live.difference_update(int(x) for x in dels)
        # law 4: zero false negatives for the remaining live keys
        live_arr = np.array(sorted(live), dtype=np.int64)
        probed = (
            spark.createDataFrame([(int(k),) for k in live_arr], "url_hash long")
            .withColumn("maybe", cuckoo_might_contain(ck))
        )
        missed = probed.where(~F.col("maybe")).count()
        assert missed == 0, f"round {rnd}: {missed} live keys lost after deletes"
    # deleted keys are mostly gone (allow the fp floor + fingerprint collisions)
    dead = [k for k in universe[:pos] if k not in live]
    dead_df = spark.createDataFrame([(int(k),) for k in dead], "url_hash long")
    still = dead_df.withColumn("maybe", cuckoo_might_contain(ck)).where("maybe").count()
    assert still <= max(10, int(0.01 * len(dead))), f"{still}/{len(dead)} dead keys still probe true"


def test_build_deterministic_and_serialization_roundtrip(spark):
    seen = _hashes(spark, 0, 3000)
    a = build_sharded_cuckoo(seen.repartition(1), num_shards=4, expected_per_shard=1000)
    b = build_sharded_cuckoo(seen.repartition(13), num_shards=4, expected_per_shard=1000)
    assert cuckoo_to_bytes(a) == cuckoo_to_bytes(b)  # partitioning-independent bytes
    c = cuckoo_from_bytes(cuckoo_to_bytes(a))
    assert c.num_shards == a.num_shards and c.m_buckets == a.m_buckets
    assert np.array_equal(c.table, a.table) and np.array_equal(c.occ, a.occ)


def test_overfull_shard_raises(spark):
    seen = _hashes(spark, 0, 4000)
    with pytest.raises(Exception, match="overfull|exceed"):
        # 4000 keys into 4 shards sized for 64 slots each → must refuse loudly
        build_sharded_cuckoo(seen, num_shards=4, expected_per_shard=16)


def test_broadcast_lifecycle(spark):
    from web_crawling_prj_spark.operators.cuckoo import broadcast_cuckoo

    seen = _hashes(spark, 0, 1000)
    ck = build_sharded_cuckoo(seen, num_shards=4, expected_per_shard=500)
    bcast = broadcast_cuckoo(spark, ck)
    probed = seen.withColumn("maybe", cuckoo_might_contain(ck, bcast=bcast))
    assert probed.where(~F.col("maybe")).count() == 0
    bcast.destroy()
