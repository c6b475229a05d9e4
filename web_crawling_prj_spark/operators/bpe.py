"""Byte-pair-encoding merge learning (Sennrich, Haddow, Birch — "Neural
Machine Translation of Rare Words with Subword Units", ACL'16), relational.

Real BPE training never iterates over the corpus: it iterates over the
WORD-FREQUENCY table (vocab-bounded — Zipf makes it millions of rows at
100 TB, broadcastable), and each merge step is (1) count adjacent symbol
pairs weighted by word frequency, (2) pick the most frequent pair, (3) merge
that pair everywhere. Segmenting the corpus afterward is one map-side join
word → segmentation.

Representation: a word's symbol sequence is a single string with every
symbol wrapped in ``|`` delimiters — ``the`` → ``|t||h||e||</w>|``. Merging
pair (a, b) is then a PLAIN (non-regex) replace of ``|a||b|`` with
``|a·b|``-style fusion: because each symbol carries its own delimiters, a
match consumes no character of the following pair, so builtin replace's
leftmost-non-overlapping semantics IS the BPE merge rule (``a a a`` with
pair (a,a) → ``aa a``, exactly once). Both Spark's ``replace`` and DuckDB's
``replace`` share these semantics, which makes the whole K-merge trajectory
value-replayable in SQL — no Python anywhere.

Determinism: the argmax pair breaks ties by (count DESC, pair-string ASC);
the per-step argmax is a 1-row collect off a vocab-bounded aggregate — the
standard driver-side decision of every BPE trainer.

Constraint: the delimiter ``|`` and the end-of-word token ``</w>`` must not
occur inside input words (true for whitespace-tokenized text after the
engine's normalization; asserted cheaply in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.lmquality import _tokens

END = "</w>"


def word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the whitespace-lowercase tokenization — the
    vocab-bounded table every later step runs on. Partial-aggregable."""
    return (
        docs.select(F.explode(_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _initial_seq(word) -> F.Column:
    """word → '|c1||c2||…||</w>|' (one codepoint per symbol + end marker)."""
    w = F.col(word) if isinstance(word, str) else word
    return F.concat(F.lit("|"), F.regexp_replace(w, "(.)", "$1||"), F.lit(END + "|"))


def _symbols(seq) -> F.Column:
    """wrapped seq → array of symbols."""
    c = F.col(seq) if isinstance(seq, str) else seq
    inner = F.regexp_replace(c, r"^\|(.*)\|$", "$1")
    return F.split(inner, r"\|\|")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(pair, cnt): adjacent symbol pairs weighted by word freq. The pair id
    is 'a||b' — unambiguous because symbols cannot contain '|'."""
    arr = _symbols("seq")
    # guard the 1-symbol (fully-merged) word: Spark's sequence(1, 0) counts
    # DOWN ([1, 0]) instead of yielding an empty array
    idx = F.when(
        F.size(arr) >= 2, F.sequence(F.lit(1), F.size(arr) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = vocab.select(
        "freq",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat(
                    F.element_at(arr, i), F.lit("||"), F.element_at(arr, i + 1)
                ),
            )
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(F.sum("freq").alias("cnt"))


def bpe_learn(
    docs: DataFrame, text_col: str, n_merges: int
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merges, vocab):
    merges = [(left, right, pair_count), …] in merge order; vocab = the
    word-frequency table with its final segmentation
    (word, freq, seq, n_symbols).

    Each step runs one vocab-bounded aggregate + a 1-row argmax collect;
    the vocab table is localCheckpointed per step so lineage stays flat."""
    vocab = (
        word_freqs(docs, text_col)
        .select("word", "freq", _initial_seq("word").alias("seq"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        left, right = pair.split("||")
        merges.append((left, right, cnt))
        vocab = vocab.withColumn(
            "seq",
            F.replace(
                F.col("seq"),
                F.lit(f"|{left}||{right}|"),
                F.lit(f"|{left}{right}|"),
            ),
        ).localCheckpoint(eager=True)
    vocab = vocab.withColumn("n_symbols", F.size(_symbols("seq")))
    return merges, vocab


def bpe_segment(
    words: DataFrame, merges: list[tuple[str, str, int]], word_col: str = "word"
) -> DataFrame:
    """Apply learned merges (in order) to any word table — the inference
    path: pure column replaces, map-side, no shuffle. Adds
    (bpe_tokens array<string>, n_bpe int)."""
    seq = _initial_seq(word_col)
    for left, right, _ in merges:
        seq = F.replace(seq, F.lit(f"|{left}||{right}|"), F.lit(f"|{left}{right}|"))
    toks = _symbols(seq)
    return words.withColumn("bpe_tokens", toks).withColumn("n_bpe", F.size(toks))
