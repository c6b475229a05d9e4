"""Exact stratified sampling + sequence packing laws."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.sampling import pack_sequences, stratified_exact_sample


def test_stratified_exact_allocation(spark):
    # strata with sizes 100, 7, 1 — exact ceil(0.3·n) from each
    rows = (
        [(i, "en", i % 3) for i in range(100)]
        + [(1000 + i, "de", 0) for i in range(7)]
        + [(2000, "vi", 0)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, band int")
    out = stratified_exact_sample(df, ["lang"], 0.3, "doc_id")
    got = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    assert got == {"en": 30, "de": 3, "vi": 1}


def test_stratified_sample_deterministic_set(spark):
    rows = [(i, "s") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    a = {r.doc_id for r in stratified_exact_sample(df.repartition(1), ["g"], 0.2, "doc_id").collect()}
    b = {r.doc_id for r in stratified_exact_sample(df.repartition(13), ["g"], 0.2, "doc_id").collect()}
    assert a == b and len(a) == 10


def test_pack_sequences_fill_and_budget(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(1000)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(df, "n_tokens", "doc_id", max_tokens=1000, n_shards=8)
    # every bin except possibly the last per shard holds exactly 10 docs
    sizes = packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n"), F.sum("n_tokens").alias("tok")
    )
    last_bin = packed.groupBy("shard").agg(F.max("bin").alias("mb"))
    full = sizes.join(last_bin, "shard").where(F.col("bin") < F.col("mb"))
    bad = full.where((F.col("n") != 10) | (F.col("tok") != 1000)).count()
    assert bad == 0
    # offsets within a bin are the running fill
    row = packed.where((F.col("shard") == packed.first().shard)).orderBy(
        "bin", "bin_offset_tokens"
    ).first()
    assert row.bin_offset_tokens == 0


def test_pack_sequences_overlong_doc_gets_own_overhanging_bin(spark):
    df = spark.createDataFrame(
        [(1, 5000), (2, 10), (3, 10)], "doc_id long, n_tokens long"
    )
    packed = {r.doc_id: r for r in pack_sequences(df, "n_tokens", "doc_id", max_tokens=100, n_shards=1).collect()}
    bins = {}
    for r in packed.values():
        bins.setdefault(r.bin, []).append(r.doc_id)
    # the 5000-token doc opens at a bin boundary for whoever follows:
    # everything is deterministic and total order is md5-based, so just check
    # structural laws: every doc has a bin, offsets < max for bin openers
    assert all(r.bin >= 0 for r in packed.values())
    openers = [r for r in packed.values() if r.bin_offset_tokens == 0]
    assert openers, "at least one bin opener"
    # doc 1 (5000 tokens) spans 50 budgets: no other doc shares its START bin
    b1 = packed[1].bin
    sharing = [d for d, r in packed.items() if r.bin == b1 and d != 1]
    assert sharing == [] or packed[1].bin_offset_tokens > 0  # only if 1 isn't the opener


def test_pack_deterministic_under_partitioning(spark):
    df = spark.createDataFrame([(i, 17 + i % 50) for i in range(500)], "doc_id long, n_tokens long")
    a = sorted(map(tuple, pack_sequences(df.repartition(1), "n_tokens", "doc_id", 256, 4).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(19), "n_tokens", "doc_id", 256, 4).collect()))
    assert a == b
