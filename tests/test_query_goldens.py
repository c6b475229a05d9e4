"""Value-asserting goldens for the driver's rows-only (``no_oracle``) queries.

The DuckDB oracle cannot express these (LSH randomness, UDF kernels, iterative
algorithms, stateful rounds), so each gets an INDEPENDENT in-test computation:
pure-Python union-find for `dedup_components`, exact shingle Jaccard for
`minhash_neardups`, numpy brute-force Hamming for `simhash_pairs`, a planted
recall@k gate for `ann_lsh_topk`, scalar power iteration + a closed form for
`pagerank_hosts`, error-bounded exact counts for `frontier_cardinality`, the
synthetic blob formula for `media_decode`, and fetch-log invariants for
`crawl_rounds`. Test names reference the query they prove.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


class UnionFind:
    """Independent reference for connected components (min-label convention)."""

    def __init__(self):
        self.parent = {}

    def find(self, x):
        p = self.parent
        while p.setdefault(x, x) != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)  # root stays the min id


def test_dedup_components_golden_union_find(spark, sf_dir):
    """Query `dedup_components` (winnowing pair source, now also DuckDB-
    oracled): cluster ids/sizes equal a pure-Python union-find over the same
    pair list. The minhash pair source drives the same operator below."""
    from web_crawling_prj_spark.operators.textdedup import winnowing_overlap_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = [(r.id_a, r.id_b) for r in winnowing_overlap_pairs(docs, min_shared=40).collect()]
    assert pairs, "fixture corpus must contain overlapping docs"
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    clusters = {}
    for node in list(uf.parent):
        clusters.setdefault(uf.find(node), set()).add(node)
    expected = {(root, len(members), min(members)) for root, members in clusters.items()}

    got_rows = entry.queries()["dedup_components"](spark, sf_dir).collect()
    got = {(r.component, r.cluster_size, r.keep_id) for r in got_rows}
    assert got == expected


def test_dedup_components_minhash_source_union_find(spark, sf_dir):
    """Same connected-components operator over the MINHASH pair tier (not
    SQL-expressible, so golden-only): equals union-find on the same pairs."""
    from web_crawling_prj_spark.operators.graph import connected_components
    from web_crawling_prj_spark.operators.textdedup import minhash_candidate_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pair_df = minhash_candidate_pairs(docs, jaccard_threshold=0.5)
    pairs = [(r.id_a, r.id_b) for r in pair_df.collect()]
    assert pairs, "fixture corpus must contain near-dups"
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    expected = {(n, uf.find(n)) for n in list(uf.parent)}
    got = {(r.node, r.component) for r in connected_components(pair_df).collect()}
    assert got == expected


def test_minhash_neardups_golden_exact_jaccard(spark, sf_dir):
    """Query `minhash_neardups`: every returned pair's est_jaccard is within
    the 32-hash sampling error of the EXACT shingle Jaccard, and every truly
    high-Jaccard pair in the corpus is connected through the pair graph
    (the dedup-sufficiency guarantee of the LSH S-curve at j≥0.9)."""
    from web_crawling_prj_spark.operators.textdedup import shingles_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = {
        r.doc_id: frozenset(r.s)
        for r in docs.select("doc_id", shingles_col("text").alias("s")).collect()
    }

    def jac(a: int, b: int) -> float:
        u = sh[a] | sh[b]
        return len(sh[a] & sh[b]) / len(u) if u else 1.0

    # retired from the queries() listing (superseded by oracle-exact
    # minhash_neardups_md5) but the xxhash64 operator stays golden-tested
    rows = entry.q_minhash_neardups(spark, sf_dir).collect()
    assert rows
    uf = UnionFind()
    for r in rows:
        exact = jac(r.id_a, r.id_b)
        # 32 independent minhashes: σ = sqrt(j(1-j)/32) ≤ 0.09; ±0.3 ≈ 3.3σ
        assert abs(r.est_jaccard - exact) <= 0.3, (r.id_a, r.id_b, r.est_jaccard, exact)
        uf.union(r.id_a, r.id_b)

    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if jac(a, b) >= 0.9:
                assert uf.find(a) == uf.find(b), f"missed near-dup pair ({a},{b})"


def test_embedding_neardups_golden_numpy_union_find(spark, sf_dir):
    """Query `embedding_neardups` (also DuckDB-oracled): clusters equal a
    numpy all-pairs cosine at the same threshold + pure-Python union-find,
    singletons included as their own component."""
    docs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = [r.vec_id for r in docs]
    m = np.array([r.embedding for r in docs], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = np.round(m @ m.T, 6)
    uf = UnionFind()
    for i, a in enumerate(ids):
        uf.find(a)
        for j in range(i + 1, len(ids)):
            if cos[i, j] >= 0.4:
                uf.union(a, ids[j])
    comp = {a: uf.find(a) for a in ids}
    sizes = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    expected = {(a, comp[a], sizes[comp[a]], a != comp[a]) for a in ids}

    rows = entry.queries()["embedding_neardups"](spark, sf_dir).collect()
    got = {(r.vec_id, r.component, r.cluster_size, r.is_dup) for r in rows}
    assert got == expected


def test_ngram_jaccard_pairs_golden_exact(spark, sf_dir):
    """Query `ngram_jaccard_pairs` (also DuckDB-oracled): every returned
    pair's jaccard EQUALS the pure-Python exact shingle-set Jaccard (to the
    query's 4-digit rounding), is_dup thresholds the unrounded value, and
    the pair list is exactly the md5-LSH candidate set."""
    from web_crawling_prj_spark.operators.textdedup import (
        minhash_candidate_pairs,
        shingles_col,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = {
        r.doc_id: frozenset(r.s)
        for r in docs.select("doc_id", shingles_col("text").alias("s")).collect()
    }

    def jac(a: int, b: int) -> float:
        u = sh[a] | sh[b]
        return len(sh[a] & sh[b]) / len(u) if u else 1.0

    rows = entry.q_ngram_jaccard(spark, sf_dir).collect()
    assert rows
    got_pairs = {(r.id_a, r.id_b) for r in rows}
    cand = {
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs(docs, jaccard_threshold=0.5, hash_fn="md5")
        .select("id_a", "id_b")
        .collect()
    }
    assert got_pairs == cand
    for r in rows:
        exact = jac(r.id_a, r.id_b)
        assert abs(r.jaccard - round(exact, 4)) < 1e-9, (r.id_a, r.id_b, r.jaccard, exact)
        assert r.is_dup == (exact >= 0.7), (r.id_a, r.id_b, exact, r.is_dup)


def test_simhash_pairs_golden_bruteforce(spark, sf_dir):
    """Query `simhash_pairs`: hamming values re-verified against numpy
    popcount, and the banded result connects every brute-force pair with
    Hamming ≤ 3 (the 4×16-bit pigeonhole completeness guarantee)."""
    from web_crawling_prj_spark.operators.textdedup import simhash64_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sims = {
        r.doc_id: r.sh for r in docs.select("doc_id", simhash64_col("text").alias("sh")).collect()
    }
    ids = sorted(sims)
    h = np.array([sims[i] for i in ids], dtype=np.int64).view(np.uint64)
    x = h[:, None] ^ h[None, :]
    if hasattr(np, "bitwise_count"):
        ham = np.bitwise_count(x).astype(np.int64)
    else:  # numpy<2 fallback: byte-LUT popcount
        lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)
        ham = lut[x.view(np.uint8).reshape(len(ids), len(ids), 8)].sum(axis=2)

    rows = entry.queries()["simhash_pairs"](spark, sf_dir).collect()
    assert rows
    idx = {d: i for i, d in enumerate(ids)}
    uf = UnionFind()
    for r in rows:
        assert r.hamming == int(ham[idx[r.id_a], idx[r.id_b]])
        assert r.hamming <= 3
        uf.union(r.id_a, r.id_b)
    ai, bi = np.nonzero(np.triu(ham <= 3, k=1))
    assert len(ai), "fixture corpus must contain simhash near-dups"
    for i, j in zip(ai, bi):
        a, b = ids[int(i)], ids[int(j)]
        assert uf.find(a) == uf.find(b), f"missed simhash pair ({a},{b}) ham={ham[i, j]}"


def test_ann_lsh_topk_recall_gate(spark):
    """Query `ann_lsh_topk`'s operator: recall@5 vs the oracle-checked brute
    force on PLANTED cluster structure (random testdata embeddings have no
    true neighbors — only planted neighbors measure LSH recall honestly).
    Gates: ≥0.9 at n_probes=3, and multi-probe never hurts."""
    from web_crawling_prj_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
        recall_at_k,
    )

    rng = np.random.default_rng(123)
    dim, per_cluster = 16, 6
    centers = rng.standard_normal((3, dim))
    rows, vid = [], 0
    for c in range(3):
        for _ in range(per_cluster):
            v = centers[c] + 0.05 * rng.standard_normal(dim)
            rows.append((vid, [float(t) for t in v]))
            vid += 1
    for _ in range(400):
        rows.append((vid, [float(t) for t in rng.standard_normal(dim)]))
        vid += 1
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = e.where(F.col("vec_id").isin(0, 6, 12)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = brute_force_topk(e, q, k=5).cache()
    recalls = {}
    for probes in (1, 3):
        ann = lsh_bucketed_topk(e, q, dim=dim, k=5, n_planes=8, n_probes=probes)
        recalls[probes] = recall_at_k(ann, exact, 5)
    assert recalls[3] >= 0.9, recalls
    assert recalls[3] >= recalls[1] - 1e-9, recalls


def _scalar_pagerank(edges: set[tuple[int, int]], iterations: int = 8, damping: float = 0.85):
    """Independent scalar power iteration matching operators.graph.pagerank
    semantics (dangling mass redistributed uniformly)."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        in_mass = {v: 0.0 for v in nodes}
        for s, t in edges:
            in_mass[t] += ranks[s] / out_deg[s]
        dangling = sum(r for v, r in ranks.items() if v not in out_deg)
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = {v: base + damping * in_mass[v] for v in nodes}
    return ranks


def test_pagerank_hosts_golden_power_iteration(spark, sf_dir):
    """Query `pagerank_hosts`: rank values equal an independent scalar power
    iteration over the same derived 50-node host graph, to rounding."""
    doc_ids = [
        r.doc_id for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").collect()
    ]
    edges = {(d % 50, (d * 7 + 3) % 50) for d in doc_ids if d % 50 != (d * 7 + 3) % 50}
    expected = _scalar_pagerank(edges, iterations=8)

    got = {r.node: r.rank for r in entry.queries()["pagerank_hosts"](spark, sf_dir).collect()}
    assert set(got) == set(expected)
    for v, r in expected.items():
        assert abs(got[v] - r) <= 1.5e-6, (v, got[v], r)  # query rounds to 6 dp
    assert abs(sum(got.values()) - 1.0) <= 1e-4  # mass conserved (post-rounding)


def test_pagerank_cycle_closed_form(spark):
    """Closed form: a k-cycle's PageRank is exactly uniform 1/k."""
    from web_crawling_prj_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(edges, iterations=20).collect()}
    for v in (0, 1, 2):
        assert abs(got[v] - 1 / 3) < 1e-9


def test_frontier_cardinality_golden_bounds(spark, sf_dir):
    """Query `frontier_cardinality`: sketch outputs sit inside rigorous error
    bounds of the exact values computed independently."""
    row = entry.queries()["frontier_cardinality"](spark, sf_dir).first()
    f = entry._frontier(spark, sf_dir)
    exact_urls = f.select("url").distinct().count()
    exact_hosts = f.select("host").distinct().count()
    # HLL++ default rsd = 5%; allow 3 rsd
    assert abs(row.approx_urls - exact_urls) <= max(3, 0.15 * exact_urls)
    assert abs(row.approx_hosts - exact_hosts) <= max(3, 0.15 * exact_hosts)
    pri = sorted(r.priority for r in f.select("priority").collect())
    p50, p99 = pri[int(0.5 * (len(pri) - 1))], pri[int(0.99 * (len(pri) - 1))]
    assert abs(row.p50_priority - p50) <= 0.05  # percentile_approx default accuracy
    assert abs(row.p99_priority - p99) <= 0.05


def test_media_decode_golden(spark, sf_dir):
    """Query `media_decode`: per-type counts and dimension sums recomputed from
    the synthetic blob formula (rng(doc_id*3+mtype) header) in pure Python."""
    doc_ids = [
        r.doc_id for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").collect()
    ]
    mtypes = {0: "image", 1: "audio", 2: "video"}
    expected = {m: [0, 0, 0] for m in mtypes.values()}  # n, sum_w, sum_h
    for d in doc_ids:
        m = d % 3
        rng = np.random.default_rng(int(d) * 3 + m)
        w, h = int(rng.integers(16, 512)), int(rng.integers(16, 512))
        agg = expected[mtypes[m]]
        agg[0] += 1
        agg[1] += w
        agg[2] += h
    got = {
        r.media_type: [r.n, r.sum_w, r.sum_h]
        for r in entry.queries()["media_decode"](spark, sf_dir).collect()
    }
    assert got == expected


def test_crawl_rounds_fetchlog_invariants(spark):
    """Query `crawl_rounds` (the flagship `entry()`): no URL is fetched twice
    at the same attempt, attempts never exceed the retry ceiling, and every
    row's error_class matches the C8 classification of its http_code."""
    from web_crawling_prj_spark.operators.retry import classify_status

    log = entry.entry(spark).cache()
    assert log.count() > 0
    dup = (
        log.groupBy("round_id", "url_hash", "attempt")
        .agg(F.count("*").alias("n"))
        .where("n > 1")
        .count()
    )
    assert dup == 0
    # same url never re-fetched at the same attempt across rounds either
    assert log.groupBy("url_hash", "attempt").agg(F.count("*").alias("n")).where("n > 1").count() == 0
    assert log.where(F.col("attempt") > 6).count() == 0
    # non-2xx rows classify purely from the code (C8 ladder parity); 2xx rows
    # may downgrade to parsing_error when payload validation fails (C8 PARSING)
    mismatch = log.where(F.col("http_code").isNotNull() & (F.col("http_code") != 200)).where(
        classify_status("http_code") != F.col("error_class")
    )
    assert mismatch.count() == 0
    ok_rows = log.where(F.col("http_code") == 200)
    assert ok_rows.where(~F.col("error_class").isin("ok", "parsing_error")).count() == 0
    log.unpersist()
