"""Relational BPE merge learning (bpe.py) vs a pure-Python Sennrich twin."""

from __future__ import annotations

from web_crawling_prj_spark.operators.bpe import (
    END,
    bpe_learn,
    bpe_segment,
    word_freqs,
)


def _py_bpe(freqs: dict[str, int], n_merges: int):
    """Sennrich ACL'16 reference: greedy leftmost merges, tiebreak
    (count DESC, 'left||right' ASC) — the operator's exact rule."""
    vocab = {w: list(w) + [END] for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in freqs.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] + "||" + kv[0][1])
        )
        merges.append((a, b, cnt))
        for w, s in vocab.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower widest widest widest"),
    (3, "newest newest newest newest newest newest"),
]


def _freqs(rows):
    out: dict[str, int] = {}
    for _, text in rows:
        for w in text.split():
            out[w] = out.get(w, 0) + 1
    return out


def test_bpe_learn_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges, vocab = bpe_learn(docs, "text", n_merges=10)
    want_merges, want_vocab = _py_bpe(_freqs(CORPUS), 10)
    assert merges == want_merges
    got = {
        r.word: (r.freq, r.seq, r.n_symbols)
        for r in vocab.collect()
    }
    for w, syms in want_vocab.items():
        seq = "".join(f"|{s}|" for s in syms)
        assert got[w] == (_freqs(CORPUS)[w], seq, len(syms)), w


def test_bpe_overlapping_pair_merges_leftmost_once(spark):
    # 'aaa' with pair (a,a): leftmost merge once -> [aa, a, </w>]
    docs = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    merges, vocab = bpe_learn(docs, "text", n_merges=1)
    assert merges[0][:2] == ("a", "a")
    row = vocab.collect()[0]
    assert row.seq == f"|aa||a||{END}|"
    want_merges, want_vocab = _py_bpe({"aaa": 2}, 1)
    assert merges == want_merges and row.n_symbols == len(want_vocab["aaa"])


def test_bpe_deterministic_under_partitioning(spark):
    docs = spark.createDataFrame(
        [(i, f"token{i % 7} stream data data stream") for i in range(60)],
        "doc_id long, text string",
    )
    m1, v1 = bpe_learn(docs.repartition(1), "text", n_merges=6)
    m2, v2 = bpe_learn(docs.repartition(13), "text", n_merges=6)
    assert m1 == m2
    assert sorted(map(tuple, v1.collect())) == sorted(map(tuple, v2.collect()))


def test_bpe_segment_applies_learned_merges(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges, vocab = bpe_learn(docs, "text", n_merges=8)
    # segmenting the training words must reproduce the training segmentation
    words = word_freqs(docs, "text").select("word")
    seg = {r.word: (r.bpe_tokens, r.n_bpe) for r in bpe_segment(words, merges).collect()}
    for r in vocab.collect():
        toks = r.seq[1:-1].split("||")
        assert seg[r.word] == (toks, r.n_symbols)
    # an unseen word segments with the same merge table, deterministically
    new = spark.createDataFrame([("lowest",)], "word string")
    out = bpe_segment(new, merges).collect()[0]
    _, want_vocab = _py_bpe({**_freqs(CORPUS), "lowest": 0}, 8)
    assert out.bpe_tokens == want_vocab["lowest"]
