"""Similarity search over embedding columns (array<float>).

Two paths, per the scale doctrine:
- **Brute-force cosine top-k** (the correctness baseline): queries are a small
  set → broadcast cross join against the embedding table; the dot product is a
  native ``aggregate(zip_with(...))`` expression (JVM-side, no Python); top-k
  via window over query_id. Cost O(|Q|·N) — fine for |Q| small at any N, since
  the big table is scanned once and never shuffled (the window partitions by
  query, and rows are pre-filtered to k·|Q| candidates per partition if needed).
- **LSH-bucketed ANN** (the scale path): random-hyperplane signs (seeded
  numpy matmul in an Arrow UDF — one BLAS call per batch) bucket vectors;
  queries probe their own bucket (+ optional multi-probe neighbors), exact
  cosine re-rank inside the bucket. Recall < 1 by design; the oracle records a
  rows-only check for it while the brute-force variant is the value-checked one.

Also: pairwise embedding near-duplicate detection (cosine ≥ τ) via the same
bucketing — the "embedding-cosine near-dup" tier of the dedup family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

SEED = 42


def _vec(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Native dot product: aggregate(zip_with(a, b, *), sum) — codegen'd."""
    prods = F.zip_with(_vec(a), _vec(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    v = _vec(a)
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column | str, b: Column | str) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_hoisted(a: Column | str, norm_a: Column, b: Column | str, norm_b: Column) -> Column:
    """:func:`cosine` with the two row norms precomputed by the caller —
    bit-identical values (same fold, same multiply, same zero guard), but in
    a pair join each side's norm is computed once per ROW instead of once
    per PAIR (the per-pair flops drop 3×: one dot instead of dot + two
    norm folds + two sqrts). Round-7 optimization; every cosine-over-join
    site uses this."""
    denom = norm_a * norm_b
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query. Broadcast the (small) query side; the
    embedding table is scanned once, map-side; the only shuffle is the
    per-query top-k window over |Q|·N scored rows (pre-reduced map-side by
    Spark's TakeOrdered when followed by limit, and prunable via AQE)."""
    # broadcast-NLJ inherits the embeddings side's partitioning, and a small
    # parquet is often 1-2 input splits — which serializes the |Q|·N compare
    # onto 1-2 cores (measured 31 s → 3 s for the every-vector-as-query
    # neighbor scan at sf0.1). Spread ONLY when below cluster parallelism:
    # at scale the table already has ≥cores splits and no shuffle is added.
    emb_n = embeddings.withColumn("_en", l2_norm(vec_col))
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    if emb_n.rdd.getNumPartitions() < par:
        emb_n = emb_n.repartition(par)
    q_n = queries.withColumn("_qn", l2_norm(query_vec_col))
    scored = emb_n.crossJoin(F.broadcast(q_n)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(
            cosine_hoisted(vec_col, F.col("_en"), query_vec_col, F.col("_qn")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def hyperplane_signature_udf(dim: int, n_planes: int = 16, seed: int = SEED):
    """Arrow UDF: vector → n-bit random-hyperplane sign signature (one matmul
    per Arrow batch). The plane matrix is a deterministic function of
    (seed, dim, n_planes) regenerated per executor — no driver shipping."""

    @F.pandas_udf(LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_planes))
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ planes) >= 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series((bits * weights).sum(axis=1).astype(np.int64))

    return _sig


def rademacher_planes_md5(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 parity: plane j, component i =
    +1 iff md5("i:j")'s first 60 bits are even. Rademacher projections are a
    standard Johnson-Lindenstrauss/SimHash choice (same concentration bounds
    as Gaussian planes up to constants); the md5 derivation makes the WHOLE
    LSH pipeline reproducible in DuckDB, so the ANN path gets a value-exact
    oracle instead of only recall gates."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:15], 16) % 2 == 0 else -1.0
            for i in range(dim)
        ]
        for j in range(n_planes)
    ]


def hyperplane_signature_native(vec_col: Column | str, dim: int, n_planes: int = 8) -> Column:
    """Vector → n-bit sign signature with NO Python at all: the md5-Rademacher
    plane matrix is built driver-side and embedded as literal arrays, each
    projection is a codegen'd aggregate(zip_with(...)) fold, and the bucket id
    packs the sign bits. The fold order matches DuckDB's list_dot_product, so
    signatures are bit-identical across engines."""
    signs = rademacher_planes_md5(dim, n_planes)
    v = _vec(vec_col)
    bucket = F.lit(0).cast("long")
    for j, s in enumerate(signs):
        prods = F.zip_with(
            v, F.array(*[F.lit(x) for x in s]), lambda x, y: x.cast("double") * y
        )
        proj = F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return bucket


def probe_buckets_udf(dim: int, n_planes: int, n_probes: int, seed: int = SEED):
    """Arrow UDF: query vector → array of probe buckets (true multi-probe LSH:
    the base bucket plus flips of the ``n_probes-1`` LEAST-CONFIDENT sign bits,
    i.e. the hyperplanes with the smallest |projection| margin)."""
    from pyspark.sql.types import ArrayType

    @F.pandas_udf(ArrayType(LongType()))
    def _probes(vecs: pd.Series) -> pd.Series:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_planes))
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        proj = m @ planes
        bits = proj >= 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        base = (bits * weights).sum(axis=1).astype(np.int64)
        # least-confident bits = smallest |margin|
        order = np.argsort(np.abs(proj), axis=1)
        out = []
        for row_i in range(len(base)):
            buckets = [int(base[row_i])]
            for j in range(min(n_probes - 1, n_planes)):
                buckets.append(int(base[row_i] ^ (1 << int(order[row_i, j]))))
            out.append(buckets)
        return pd.Series(out)

    return _probes


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    planes: str = "gaussian",
) -> DataFrame:
    """ANN: bucket by hyperplane signature, exact re-rank within probed buckets.

    At 100 TB the bucketed table is written once partitioned by signature and
    re-used by every query batch; a query touches ~n_probes·N/2^p rows.
    ``n_probes`` > 1 enables margin-aware multi-probe: each query also searches
    the buckets at Hamming distance 1 on its least-confident sign bits (the
    hyperplanes its vector lies closest to) — recall climbs steeply for
    near-hyperplane vectors at linear extra cost. Use brute_force_topk as the
    gold standard for recall measurement.

    ``planes='md5'`` swaps the seeded Gaussian planes for the deterministic
    md5-Rademacher signature (:func:`hyperplane_signature_native` — pure
    codegen, no Python) whose buckets DuckDB reproduces bit-for-bit; single
    probe only (margins are equally expressible but the oracle query keeps
    the simple shape).
    """
    if planes == "md5":
        sig_col = hyperplane_signature_native(F.col(vec_col), dim, n_planes)
        emb_b = embeddings.withColumn("bucket", sig_col).withColumn("_en", l2_norm(vec_col))
        q_b = queries.withColumn(
            "bucket", hyperplane_signature_native(F.col(query_vec_col), dim, n_planes)
        ).withColumn("_qn", l2_norm(query_vec_col))
        scored = (
            emb_b.join(F.broadcast(q_b), "bucket")
            .select(
                F.col(query_id_col),
                F.col(id_col),
                F.round(
                    cosine_hoisted(vec_col, F.col("_en"), query_vec_col, F.col("_qn")), 6
                ).alias("cos_sim"),
            )
            .dropDuplicates([query_id_col, id_col])
        )
        w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
        return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    sig = hyperplane_signature_udf(dim, n_planes)
    emb_b = embeddings.withColumn("bucket", sig(F.col(vec_col))).withColumn("_en", l2_norm(vec_col))
    if n_probes > 1:
        probes = probe_buckets_udf(dim, n_planes, n_probes)
        q_b = queries.withColumn("bucket", F.explode(probes(F.col(query_vec_col))))
    else:
        q_b = queries.withColumn("bucket", sig(F.col(query_vec_col)))
    q_b = q_b.withColumn("_qn", l2_norm(query_vec_col))
    scored = (
        emb_b.join(F.broadcast(q_b), "bucket")
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(
                cosine_hoisted(vec_col, F.col("_en"), query_vec_col, F.col("_qn")), 6
            ).alias("cos_sim"),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int, query_id_col: str = "query_id", id_col: str = "vec_id") -> float:
    """Mean recall@k of an ANN result vs the brute-force gold standard."""
    a = approx.where(F.col("rank") <= k).select(query_id_col, id_col)
    e = exact.where(F.col("rank") <= k).select(query_id_col, id_col)
    hits = e.join(a, [query_id_col, id_col], "left_semi").groupBy(query_id_col).count()
    total = e.groupBy(query_id_col).count().withColumnRenamed("count", "t")
    per_q = total.join(hits, query_id_col, "left").select(
        (F.coalesce("count", F.lit(0)) / F.col("t")).alias("r")
    )
    return per_q.agg(F.avg("r")).first()[0]


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int = 256,
    stats_out: dict | None = None,
) -> DataFrame:
    """(id_a < id_b, cos_sim ≥ τ) pairs — the embedding-cosine tier of the
    dedup family. Skew defenses mirror the text tiers (operators.textdedup):
    byte-identical vectors collapse to a min-id representative pre-LSH and
    pair with it directly (cos 1.0, O(group) rows); the within-bucket join is
    capped at ``bucket_cap`` representatives per bucket (shared helper
    textdedup._cap_buckets: observed-metric + optional eager stats) so one
    hot bucket can never go O(N²)."""
    from web_crawling_prj_spark.operators.textdedup import _cap_buckets

    v = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    grp = v.groupBy("v").agg(F.min("id").alias("_rep"))
    j = v.join(grp, "v")
    intra = j.where(F.col("id") != F.col("_rep")).select(
        F.col("_rep").alias("id_a"), F.col("id").alias("id_b"), F.lit(1.0).alias("cos_sim")
    )
    reps = j.where(F.col("id") == F.col("_rep")).select("id", "v")

    sig = hyperplane_signature_udf(dim, n_planes)
    b = _cap_buckets(
        reps.withColumn("bucket", sig(F.col("v"))), ["bucket"], bucket_cap, stats_out
    ).withColumn("_n", l2_norm(F.col("v")))
    x, y = b.alias("x"), b.alias("y")
    pairs = x.join(
        y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.id") < F.col("y.id"))
    ).select(
        F.col("x.id").alias("id_a"),
        F.col("y.id").alias("id_b"),
        F.round(
            cosine_hoisted(F.col("x.v"), F.col("x._n"), F.col("y.v"), F.col("y._n")), 6
        ).alias("cos_sim"),
    )
    return pairs.where(F.col("cos_sim") >= threshold).unionByName(intra)


# --- IVF (inverted-file) ANN: the coarse-quantizer alternative to LSH ---

def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def centroid_assign_udf(centroids: np.ndarray, n_probe: int = 1):
    """Arrow UDF: vector → its `n_probe` nearest centroid ids by cosine (one
    BLAS matmul per batch; the centroid matrix is a tiny closure capture)."""
    from pyspark.sql.types import ArrayType, IntegerType

    cn = _normalize_rows(np.asarray(centroids, dtype=np.float64))

    @F.pandas_udf(ArrayType(IntegerType()))
    def _assign(vecs: pd.Series) -> pd.Series:
        m = _normalize_rows(np.stack([np.asarray(v, dtype=np.float64) for v in vecs]))
        sims = m @ cn.T
        top = np.argsort(-sims, kind="stable", axis=1)[:, :n_probe]
        return pd.Series([[int(c) for c in row] for row in top])

    return _assign


def kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int = 64,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> np.ndarray:
    """Deterministic spherical-kmeans centroids: init = the `n_centroids`
    vectors with smallest xxhash64(seed, id) (a hash-ordered sample —
    partitioning-independent), then `iters` distributed Lloyd passes (assign
    via one matmul UDF, recompute means via posexplode + exact DECIMAL sums —
    float sums are partial-order-dependent and would make centroids, and thus
    cell assignments, differ across parallelism levels; decimal sums are
    exact, so the index is bit-identical at local[8] and local[32]). Empty
    clusters keep their previous centroid."""
    init = (
        embeddings.select(vec_col, F.xxhash64(F.lit(seed), F.col(id_col)).alias("_h"))
        .orderBy("_h", vec_col)
        .limit(n_centroids)
        .collect()
    )
    cents = _normalize_rows(np.array([list(r[0]) for r in init], dtype=np.float64))
    for _ in range(iters):
        assign = centroid_assign_udf(cents, 1)
        means = (
            embeddings.withColumn("_cid", F.element_at(assign(F.col(vec_col)), 1))
            .select("_cid", F.posexplode(vec_col).alias("_p", "_v"))
            .groupBy("_cid", "_p")
            .agg(
                (
                    F.sum(F.col("_v").cast("decimal(28,14)")) / F.count("*")
                ).cast("double").alias("_m")
            )
            .collect()
        )
        new = cents.copy()
        for r in means:
            new[r["_cid"], r["_p"]] = r["_m"]
        cents = _normalize_rows(new)
    return cents


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 4,
    kmeans_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: coarse-quantize vectors to their nearest centroid cell, probe
    each query's `n_probe` nearest cells, exact cosine re-rank inside.

    The scale shape mirrors a production IVF index: the big table is written
    ONCE partitioned by cell id (pass precomputed ``centroids`` to reuse the
    index across query batches); a query touches ~n_probe/n_centroids of the
    data. Versus LSH buckets: cells adapt to the data distribution (planted
    clusters land in few cells), at the cost of the (cheap, deterministic)
    k-means build. Use brute_force_topk as the recall gold standard."""
    if centroids is None:
        centroids = kmeans_centroids(
            embeddings, n_centroids, kmeans_iters, id_col=id_col, vec_col=vec_col
        )
    a1 = centroid_assign_udf(centroids, 1)
    emb_c = embeddings.withColumn("cell", F.element_at(a1(F.col(vec_col)), 1)).withColumn(
        "_en", l2_norm(vec_col)
    )
    aq = centroid_assign_udf(centroids, n_probe)
    q_c = queries.withColumn("cell", F.explode(aq(F.col(query_vec_col)))).withColumn(
        "_qn", l2_norm(query_vec_col)
    )
    scored = (
        emb_c.join(F.broadcast(q_c), "cell")
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(
                cosine_hoisted(vec_col, F.col("_en"), query_vec_col, F.col("_qn")), 6
            ).alias("cos_sim"),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
