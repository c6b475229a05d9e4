"""Relational HyperLogLog laws: exact mergeability, estimate accuracy,
partitioning independence (register rows are pure column math)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.sketches import hll_build, hll_estimate, hll_merge


def _keys(spark, lo, hi, prefix="k"):
    return spark.range(lo, hi).select(F.concat(F.lit(prefix), F.col("id")).alias("key"))


def test_merge_is_exact_setwise(spark):
    a = _keys(spark, 0, 4000)
    b = _keys(spark, 2500, 7000)  # overlapping
    merged = hll_merge(hll_build(a, "key"), hll_build(b, "key"))
    direct = hll_build(a.unionByName(b), "key")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_estimate_within_error_bound(spark):
    # p=12 → σ ≈ 1.04/√4096 ≈ 1.63%; assert 5σ
    for n in (500, 20_000, 100_000):
        est = hll_estimate(hll_build(_keys(spark, 0, n), "key"))
        assert abs(est - n) / n < 0.082, f"n={n}: estimate {est} off by >5 sigma"


def test_duplicates_do_not_move_registers(spark):
    once = hll_build(_keys(spark, 0, 3000), "key")
    tripled = hll_build(
        _keys(spark, 0, 3000).unionByName(_keys(spark, 0, 3000)).unionByName(_keys(spark, 0, 3000)),
        "key",
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, tripled.collect()))


def test_partitioning_independent_and_bounded(spark):
    df = _keys(spark, 0, 50_000)
    a = hll_build(df.repartition(1), "key", p=10)
    b = hll_build(df.repartition(37), "key", p=10)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.count() <= 1024  # ≤ 2^p register rows


def test_incremental_rounds_accumulate(spark):
    """Per-round sidecar accumulation: fold rounds with hll_merge, estimate
    tracks the true cumulative distinct count without rescanning."""
    acc = None
    true_n = 0
    for r in range(5):
        # each round: 2000 new + 1000 re-seen urls
        lo = r * 2000
        round_keys = _keys(spark, max(0, lo - 1000), lo + 2000)
        true_n = lo + 2000
        sketch = hll_build(round_keys, "key")
        acc = sketch if acc is None else hll_merge(acc, sketch)
        est = hll_estimate(acc)
        assert abs(est - true_n) / true_n < 0.082, f"round {r}: {est} vs {true_n}"
