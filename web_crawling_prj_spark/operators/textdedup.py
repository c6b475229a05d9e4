"""Document deduplication family for webtext training pipelines.

Tiers, cheapest first (each is a standalone operator; a 100 TB pipeline chains
them):
1. exact: hash-groupBy on the raw text fingerprint (native xxhash64);
2. normalized-exact: case/whitespace-folded fingerprint;
3. MinHash + LSH banding: word-shingle Jaccard near-dups without any O(n²)
   compare — signatures are map-side column math, the only shuffle is the
   groupBy on (band_id, band_hash);
4. SimHash: 64-bit bit-vote fingerprint (vectorized numpy UDF), candidate
   pairs via 16-bit band equality, verified by native ``bit_count(xor)``
   Hamming distance;
5. exact n-gram Jaccard verification for candidate pairs.

Dedup decision is the standard min-representative rule: a doc survives iff no
duplicate-pair partner has a smaller doc_id — one anti-join, no union-find
needed for pair-pruning semantics (transitive clusters need iterated passes;
at web scale pipelines run the pair rule per round, which is what we model).

MinHash math: sig_i(doc) = min over shingles s of xxhash64(i, s); banding with
b bands × r rows; P(candidate) = 1-(1-j^r)^b (LSH S-curve). All JVM-side
higher-order functions — no Python in the signature path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from web_crawling_prj_spark.functions.text import doc_fingerprint, normalized_fingerprint


# --- tier 1/2: exact ---

def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", normalized: bool = False) -> DataFrame:
    """Groups of byte-identical (or normalized-identical) docs: (fingerprint,
    group_size, keep_id=min id, member ids)."""
    fp = normalized_fingerprint(text_col) if normalized else doc_fingerprint(text_col)
    return (
        docs.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("group_size"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
        .where(F.col("group_size") > 1)
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", normalized: bool = False) -> DataFrame:
    """Keep one representative (min id) per identical text."""
    fp = normalized_fingerprint(text_col) if normalized else doc_fingerprint(text_col)
    tagged = docs.withColumn("_fp", fp)
    keep = tagged.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return tagged.join(keep, [id_col, "_fp"], "left_semi").drop("_fp")


# --- shingling (shared by minhash / jaccard) ---

def tokens_col(text_col: Column | str) -> Column:
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    cleaned = F.lower(F.regexp_replace(t, r"[^\p{L}\p{N}]+", " "))
    return F.filter(F.split(F.trim(cleaned), " "), lambda s: s != F.lit(""))


def shingles_col(text_col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles; docs shorter than n words get one whole-doc shingle."""
    toks = tokens_col(text_col)
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(grams)


# --- tier 3: MinHash + LSH ---

def minhash_signature(text_col: Column | str, num_hashes: int = 32, shingle_n: int = 3) -> Column:
    """Array of `num_hashes` minima of seeded xxhash64 over shingles (native)."""
    sh = shingles_col(text_col, shingle_n)
    return F.array(
        *[F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(F.lit(i), s))) for i in range(num_hashes)]
    )


def minhash_bands(sig_col: Column | str, bands: int = 8, rows: int = 4) -> Column:
    """Band hashes: band j = xxhash64 over its r contiguous signature slots."""
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    return F.array(
        *[
            F.xxhash64(F.lit(j), F.concat_ws(",", F.transform(F.slice(sig, j * rows + 1, rows), lambda x: x.cast("string"))))
            for j in range(bands)
        ]
    )


def minhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """(id_a < id_b, est_jaccard) pairs sharing ≥1 LSH band, filtered by the
    signature-estimated Jaccard (fraction of agreeing minhashes)."""
    rows = num_hashes // bands
    sigs = docs.select(
        F.col(id_col).alias("id"),
        minhash_signature(text_col, num_hashes, shingle_n).alias("sig"),
    ).withColumn("band", F.explode(F.arrays_zip(F.sequence(F.lit(0), F.lit(bands - 1)).alias("band_id"), minhash_bands("sig", bands, rows).alias("band_hash"))))
    banded = sigs.select("id", "sig", F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.size(F.col("sig_a"))
    )
    return pairs.withColumn("est_jaccard", est).where(F.col("est_jaccard") >= jaccard_threshold).drop("sig_a", "sig_b")


def dedup_minhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """Drop every doc that has a near-dup partner with a smaller id."""
    pairs = minhash_candidate_pairs(docs, id_col, text_col, **kw)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


# --- tier 5: exact n-gram Jaccard (verification) ---

def ngram_jaccard(pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 3) -> DataFrame:
    """Exact Jaccard for (id_a, id_b) candidate pairs via native set ops."""
    sh = docs.select(F.col(id_col).alias("id"), shingles_col(text_col, shingle_n).alias("sh"))
    out = (
        pairs.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return out.withColumn(
        "jaccard", F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(1.0))
    ).drop("sh_a", "sh_b")


# --- tier 4: SimHash ---

@F.pandas_udf(LongType())
def simhash64_udf(text: pd.Series) -> pd.Series:
    """64-bit SimHash: per-token 64-bit hash, bit votes weighted by count.

    Vectorized per batch with numpy; token hashing via Python hash of the token
    bytes through a splitmix-style finalizer (deterministic, PYTHONHASHSEED-free).
    """
    import re as _re

    def tok_hashes(s: str) -> np.ndarray:
        toks = _re.findall(r"[a-z0-9]+", (s or "").lower())
        if not toks:
            return np.zeros(0, dtype=np.uint64)
        # FNV-1a 64 per token, numpy-free loop over tokens only (not chars)
        out = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = np.uint64(0xCBF29CE484222325)
            for byte in t.encode():
                h = np.uint64((int(h) ^ byte) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
            out[i] = h
        return out

    res = np.zeros(len(text), dtype=np.int64)
    bitpos = np.arange(64, dtype=np.uint64)
    for row_i, s in enumerate(text):
        h = tok_hashes(s)
        if len(h) == 0:
            continue
        bits = ((h[:, None] >> bitpos[None, :]) & np.uint64(1)).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(h)  # +1 for set bit, -1 for unset
        sim = np.uint64(0)
        for j in range(64):
            if votes[j] > 0:
                sim |= np.uint64(1) << np.uint64(j)
        res[row_i] = np.int64(sim)
    return pd.Series(res)


def simhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on one of four 16-bit bands (any pair
    within Hamming ≤ 3 of 64 bits must agree on ≥1 band by pigeonhole when
    distance < 4), verify with native bit_count(xor)."""
    sh = docs.select(F.col(id_col).alias("id"), simhash64_udf(F.col(text_col)).alias("simhash"))
    banded = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(j).alias("band_id"), F.shiftright("simhash", j * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_val")) for j in range(4)])
        ).alias("b"),
    ).select("id", "simhash", "b.band_id", "b.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.where(F.col("hamming") <= max_hamming)
