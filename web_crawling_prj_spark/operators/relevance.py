"""BM25 relevance scoring over a document corpus (Robertson/Spärck Jones).

The keyword-search half of corpus curation: score every document against a
query term set with the Lucene BM25 variant —

    idf(t)  = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
    s(d, t) = idf(t) · tf(t,d) · (k1 + 1) / (tf(t,d) + k1·(1 − b + b·dl/avgdl))
    score   = Σ_t s(d, t)

All column-native: one token explode, two partial-aggregable groupBys for
df/tf, corpus stats (N, avgdl) as a 1-row broadcast, query terms as a
broadcast list. At 100 TB the per-term posting groupBy shuffles token rows
once for the query terms only (the WHERE on terms prunes before the shuffle);
df/avgdl are corpus-bounded aggregates.

Reference analog: the reference has no search scorer — this is the standard
downstream op for its extracted text (SURVEY.md LLM-pipeline extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.lmquality import _tokens


def bm25_scores(
    docs: DataFrame,
    key: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(key, n_terms_hit, score) for every doc matching ≥1 query term.

    ``terms`` must be pre-normalized (lowercase). Deterministic: pure column
    math, no sampling — so the full scored set is oracle-checkable (top-k
    presentation is a trivial orderBy downstream)."""
    terms = sorted(set(terms))
    tok = docs.select(F.col(key), F.explode(_tokens(text_col)).alias("w"))
    dl = tok.groupBy(key).agg(F.count("*").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    hits = tok.where(F.col("w").isin(terms))
    tf = hits.groupBy(key, "w").agg(F.count("*").cast("long").alias("tf"))
    df_tab = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    idf = df_tab.crossJoin(F.broadcast(stats)).select(
        "w",
        F.log(
            1
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        "avgdl",
    )
    scored = (
        tf.join(F.broadcast(idf), "w")
        .join(dl, key)
        .select(
            key,
            "w",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("_s"),
        )
    )
    return scored.groupBy(key).agg(
        F.count("*").cast("long").alias("n_terms_hit"),
        F.sum("_s").alias("score"),
    )
