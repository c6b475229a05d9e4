"""Mergeable frequency sketches — count-min (Cormode & Muthukrishnan '05).

A 100 TB crawl wants approximate per-key frequencies (host heavy hitters,
hot-path detection) without materializing a full groupBy at every checkpoint.
The count-min sketch here is expressed RELATIONALLY: the d×w counter table is
a DataFrame of (j, cell, cnt) rows built with one explode + one
partial-aggregable groupBy, so it is

- bounded: d·w rows regardless of input size (broadcastable);
- mergeable: union two sketches and re-sum cnt — the streaming/multi-batch
  property that makes sketches useful at all;
- oracle-checkable: the row hashes are md5-hex arithmetic
  (``conv(substr(md5(j || ':' || key),1,15),16,10) % w``) that DuckDB
  reproduces bit-exactly (``CAST('0x'||substr(...) AS BIGINT)``), so the
  driver's correctness gate can verify estimates value-for-value — unlike
  opaque binary sketch blobs.

Guarantees (standard CMS): estimate ≥ true count always; estimate ≤ true +
εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. Both are asserted by
the golden test against exact counts.

Native expressions only — no UDFs anywhere on the sketch path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_cell(key: Column, j: int, width: int) -> Column:
    """Row-j hash cell: first 15 md5 hex chars (fits a long) mod width."""
    h = F.md5(F.concat(F.lit(f"{j}:"), key.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(width))


def _probe_rows(df: DataFrame, key_col: str, width: int, depth: int, keep_key: bool) -> DataFrame:
    """Melt each row into its d (j, cell) probe rows — the ONE place the
    probe construction lives, so build and estimate can never disagree on
    hash salt, depth range, or field names."""
    cols = ([F.col(key_col)] if keep_key else []) + [
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_cell(F.col(key_col), j, width).alias("cell"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("e")
    ]
    out = df.select(*cols)
    keep = ([key_col] if keep_key else []) + [
        F.col("e.j").alias("j"),
        F.col("e.cell").alias("cell"),
    ]
    return out.select(*keep)


def cms_build(df: DataFrame, key_col: str, width: int = 256, depth: int = 4) -> DataFrame:
    """Build the sketch: (j, cell, cnt) rows, ≤ depth·width of them.

    One explode (d rows per input row, map-side) + one groupBy with partial
    aggregation — the only shuffle moves ≤ d·w distinct cells per partition.
    Merge two sketches with ``unionByName(...).groupBy(j, cell).sum(cnt)``."""
    return _probe_rows(df, key_col, width, depth, keep_key=False).groupBy("j", "cell").agg(
        F.count("*").alias("cnt")
    )


def cms_estimate(
    cells: DataFrame, keys: DataFrame, key_col: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Point queries: (key, cms_count = min over rows of the key's cells).

    Melt-join-min shape: each key explodes to its d (j, cell) probes, ONE
    broadcast join against the sketch rows, min per key — the sketch subtree
    is evaluated once (a join per depth row would replicate the cells
    aggregation d times in the plan). The keys side never shuffles beyond the
    final per-key min (partial-aggregable). Absent cells count 0."""
    probes = _probe_rows(keys, key_col, width, depth, keep_key=True)
    joined = probes.join(F.broadcast(cells), ["j", "cell"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_count")
    )


# --- HyperLogLog (Flajolet et al. '07), relational like the CMS above ---
#
# The sketch IS a DataFrame of (reg, max_rho) rows — ≤ 2^p of them — not an
# opaque binary blob, which buys the same three properties as the CMS:
# bounded (broadcastable), mergeable (union + groupBy max — and register-wise
# max is EXACT: hll(A ∪ B) ≡ merge(hll(A), hll(B)) as a set equality, the law
# that lets per-round sidecars accumulate without rescanning the backlog),
# and oracle-checkable (registers are md5-hex integer arithmetic DuckDB
# reproduces bit-exactly; only the final float estimate is driver-side).
#
# Hash split: h = first 15 md5 hex chars as a 60-bit integer; reg = low p
# bits; w = the remaining (60 - p) bits; rho = leading-zeros-of-w + 1
# computed EXACTLY as (60 - p + 1) - length(bin(w)) — string-length integer
# math, no float log2 edge cases, identical in Spark and DuckDB.

_HLL_HASH_BITS = 60


def _hll_rows(key: Column, p: int) -> tuple[Column, Column]:
    m = 1 << p
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    reg = h.bitwiseAND(F.lit(m - 1))  # low p bits (h ≥ 0)
    w = F.shiftright(h, p)  # upper 60-p bits — exact, never float division
    wbits = _HLL_HASH_BITS - p
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return reg.cast("int").alias("reg"), rho.cast("int").alias("rho")


def hll_build(df: DataFrame, key_col: str, p: int = 12) -> DataFrame:
    """(reg, max_rho) register rows; one partial-aggregable groupBy over ≤ 2^p
    distinct registers per partition — map-side combine bounds the shuffle at
    2^p rows per task regardless of input size."""
    reg, rho = _hll_rows(F.col(key_col), p)
    return df.select(reg, rho).groupBy("reg").agg(F.max("rho").alias("max_rho"))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Register-wise max — exact: merge(hll(A), hll(B)) ≡ hll(A ∪ B)."""
    it = iter(sketches)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    return u.groupBy("reg").agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(sketch: DataFrame, p: int = 12) -> float:
    """Driver-side estimate from ≤ 2^p register rows (standard HLL bias
    handling: linear counting below 2.5m when empty registers remain).
    Relative error ≈ 1.04/√m (≈1.6% at p=12)."""
    import math

    m = 1 << p
    rows = sketch.collect()
    n_present = len(rows)
    inv_sum = sum(2.0 ** -r.max_rho for r in rows) + (m - n_present)  # absent ⇒ 2^0
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else 0.697
    e = alpha * m * m / inv_sum
    zeros = m - n_present
    if e <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return e
