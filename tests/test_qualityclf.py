"""Linear quality classifier (qualityclf.py) vs a pure-numpy GD twin."""

from __future__ import annotations

import hashlib

import numpy as np

from web_crawling_prj_spark.operators.qualityclf import (
    BIAS,
    doc_features,
    score_quality,
    train_logistic,
)

B = 64


def _bucket(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % B


def _py_features(text: str) -> dict[int, float]:
    toks = [t for t in text.lower().strip().split() if t]
    feats: dict[int, int] = {}
    for i, w in enumerate(toks):
        feats[_bucket(f"u:{w}")] = feats.get(_bucket(f"u:{w}"), 0) + 1
        if i > 0:
            bkey = _bucket(f"b:{toks[i - 1]} {w}")
            feats[bkey] = feats.get(bkey, 0) + 1
    n = sum(feats.values())
    out = {k: v / n for k, v in feats.items()}
    out[BIAS] = 1.0
    return out


def _py_train(pos, neg, steps=3, eta=1.0):
    rows = [(_py_features(t), 1.0) for t in pos] + [(_py_features(t), 0.0) for t in neg]
    n = len(rows)
    w: dict[int, float] = {}
    for _ in range(steps):
        grad: dict[int, float] = {}
        for feats, y in rows:
            m = sum(x * w.get(b, 0.0) for b, x in feats.items())
            p = 0.5 if not w else 1.0 / (1.0 + np.exp(-m))
            for b, x in feats.items():
                grad[b] = grad.get(b, 0.0) + x * (p - y) / n
        for b, g in grad.items():
            w[b] = round(w.get(b, 0.0) - eta * g, 6)
    return w


POS = ["excellent curated prose flows well", "curated prose reads very well indeed"]
NEG = ["buy now click here spam spam", "click click spam buy buy now"]


def _df(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_features_normalized_with_bias(spark):
    out = doc_features(_df(spark, ["a b a"]), "doc_id", "text", n_buckets=B).collect()
    by_bucket = {r.bucket: r.x for r in out}
    assert by_bucket[BIAS] == 1.0
    assert abs(sum(x for b, x in by_bucket.items() if b != BIAS) - 1.0) < 1e-12


def test_train_matches_numpy_twin(spark):
    w = train_logistic(
        _df(spark, POS), _df(spark, NEG, start=100), "doc_id", "text",
        n_buckets=B, steps=3,
    )
    got = {r.bucket: r.w for r in w.collect()}
    want = {b: v for b, v in _py_train(POS, NEG).items() if v != 0.0}
    assert got == want


def test_scores_separate_planted_classes(spark):
    w = train_logistic(
        _df(spark, POS), _df(spark, NEG, start=100), "doc_id", "text",
        n_buckets=B, steps=5,
    )
    test_docs = _df(spark, ["curated prose flows", "click here spam now"], start=500)
    s = {r.doc_id: r.score for r in score_quality(test_docs, w, "doc_id", "text", B).collect()}
    assert s[500] > 0.5 > s[501]


def test_train_deterministic_under_partitioning(spark):
    pos, neg = _df(spark, POS * 10), _df(spark, NEG * 10, start=100)
    w1 = train_logistic(pos.repartition(1), neg, "doc_id", "text", n_buckets=B)
    w2 = train_logistic(pos.repartition(7), neg.repartition(5), "doc_id", "text", n_buckets=B)
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w2.collect()))
