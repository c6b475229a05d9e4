"""Linear quality classifier over hashed n-gram features — the
"quality filter" step of GPT-3/LLaMA-style data pipelines (Brown et al.
2020 §A trained a logistic classifier on WebText-vs-CommonCrawl; fastText
(Joulin et al. 2017) is the usual implementation: a linear model over
averaged hashed n-gram features).

Relational re-expression: documents become (doc, bucket, x) rows of
L1-NORMALIZED hashed unigram+bigram counts (the fastText averaging), the
bias is bucket −1 with x = 1, and the model is a (bucket, w) table trained
by K full-batch gradient-descent steps of logistic loss:

    p_i   = sigmoid(Σ_f x_if · w_f)
    grad_f = Σ_i x_if · (p_i − y_i) / N
    w_f   ← round(w_f − eta · grad_f, 6)

Each step is two partial-aggregable groupBys (per-doc margin, per-bucket
gradient) plus a broadcast join of the (≤ B+1)-row weights table; K is
fixed, so the whole trajectory unrolls into SQL. Rounding the carried
weights to 6 decimals each step makes the trajectory independent of
float-summation order — engine- and partitioning-deterministic, like the
k-means in semdedup.py.

Scale notes (100 TB): the weights table is B+1 rows (broadcast); the
feature table is O(tokens) built by one groupBy; each GD step shuffles only
doc-margin and bucket-gradient aggregates. Nothing is quadratic; training
cost is K passes over the feature table (standard full-batch GD; swap in
per-partition mini-batching only if K passes are too hot).

Reference scope: the reference has no classifier; public-paper semantics
only (SURVEY.md LLM-pipeline extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.lmquality import hashed_ngram_features

BIAS = -1


def doc_features(
    docs: DataFrame, key: str, text_col: str, n_buckets: int = 256
) -> DataFrame:
    """(key, bucket, x): L1-normalized hashed n-gram features + the bias row
    (bucket = −1, x = 1). Docs with zero tokens contribute only a bias row
    is impossible — they have no features at all and are absent entirely."""
    f = hashed_ngram_features(docs, key, text_col, n_buckets)
    tot = f.groupBy(key).agg(F.sum("cnt").alias("_n"))
    feats = f.join(tot, key).select(
        key, "bucket", (F.col("cnt") / F.col("_n")).alias("x")
    )
    bias = tot.select(key, F.lit(BIAS).alias("bucket"), F.lit(1.0).alias("x"))
    return feats.unionByName(bias)


def train_logistic(
    pos: DataFrame,
    neg: DataFrame,
    key: str,
    text_col: str,
    n_buckets: int = 256,
    steps: int = 3,
    eta: float = 1.0,
) -> DataFrame:
    """K-step full-batch logistic regression. pos = label 1 (target corpus),
    neg = label 0. Returns the (bucket, w) weights table (zero-weight buckets
    absent — they never moved off the 0 init). Weights rounded to 6 each
    step; feature table localCheckpointed once (K steps re-read it)."""
    labeled = doc_features(pos, key, text_col, n_buckets).withColumn(
        "y", F.lit(1.0)
    ).unionByName(
        doc_features(neg, key, text_col, n_buckets).withColumn("y", F.lit(0.0))
    )
    # disambiguate colliding keys across the two corpora
    labeled = labeled.select(
        F.concat(F.col("y").cast("int").cast("string"), F.lit(":"), F.col(key).cast("string")).alias("_doc"),
        "bucket",
        "x",
        "y",
    ).localCheckpoint(eager=True)
    n_docs = labeled.select("_doc").distinct().count()
    weights = None  # all-zero init: margin 0, p = 0.5
    for _ in range(steps):
        if weights is None:
            scored = labeled.withColumn("_p", F.lit(0.5))
        else:
            margin = (
                labeled.join(F.broadcast(weights), "bucket", "left")
                .na.fill({"w": 0.0})
                .groupBy("_doc", "y")
                .agg(F.sum(F.col("x") * F.col("w")).alias("_m"))
                .select("_doc", (1.0 / (1.0 + F.exp(-F.col("_m")))).alias("_p"))
            )
            scored = labeled.join(margin, "_doc")
        grad = (
            scored.groupBy("bucket")
            .agg((F.sum(F.col("x") * (F.col("_p") - F.col("y"))) / n_docs).alias("_g"))
        )
        if weights is None:
            weights = grad.select(
                "bucket", F.round(-eta * F.col("_g"), 6).alias("w")
            )
        else:
            weights = (
                weights.join(grad, "bucket", "full")
                .na.fill({"w": 0.0, "_g": 0.0})
                .select(
                    "bucket", F.round(F.col("w") - eta * F.col("_g"), 6).alias("w")
                )
            )
        weights = weights.localCheckpoint(eager=True)
    return weights


def score_quality(
    docs: DataFrame,
    weights: DataFrame,
    key: str,
    text_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """(key, n_features, score): sigmoid quality probability per doc under
    the trained weights — one broadcast join + one groupBy, rounded to 6."""
    feats = doc_features(docs, key, text_col, n_buckets)
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .na.fill({"w": 0.0})
        .groupBy(key)
        .agg(
            (F.count("*") - 1).cast("long").alias("n_features"),  # minus bias row
            F.sum(F.col("x") * F.col("w")).alias("_m"),
        )
        .select(
            key,
            "n_features",
            F.round(1.0 / (1.0 + F.exp(-F.col("_m"))), 6).alias("score"),
        )
    )
