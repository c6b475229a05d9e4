"""Gopher repetition signals (repetition.py) vs a pure-Python twin."""

from __future__ import annotations

from web_crawling_prj_spark.operators.repetition import (
    DUP_NS,
    TOP_NS,
    gopher_repetition,
)


def _py_rep(text: str) -> dict:
    out = {}

    def unit_fracs(sep):
        units = [u for u in text.split(sep) if u.strip()]
        if not units:
            return 0.0, 0.0
        dup = [u for u in units if units.count(u) >= 2]
        total = sum(len(u) for u in units)
        return (
            round(len(dup) / len(units), 6),
            round(sum(len(u) for u in dup) / total, 6) if total else 0.0,
        )

    out["dup_line_frac"], out["dup_line_char_frac"] = unit_fracs("\n")
    out["dup_para_frac"], out["dup_para_char_frac"] = unit_fracs("\n\n")

    toks = [t for t in text.lower().strip().split() if t]
    offs, o = [], 0
    for t in toks:
        offs.append(o)
        o += len(t)
    total = o
    for n in TOP_NS + tuple(DUP_NS):
        grams: dict[str, list[tuple[int, int]]] = {}
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            grams.setdefault(g, []).append((offs[i], offs[i + n - 1] + len(toks[i + n - 1])))
        if n in TOP_NS:
            if not grams or total == 0:
                out[f"top{n}_gram_char_frac"] = 0.0
                continue
            best = min(grams.items(), key=lambda kv: (-len(kv[1]), kv[0]))
            g, occ = best
            glen = occ[0][1] - occ[0][0]
            out[f"top{n}_gram_char_frac"] = (
                round(len(occ) * glen / total, 6) if len(occ) >= 2 else 0.0
            )
        else:
            spans = sorted(
                s for g, occ in grams.items() if len(occ) >= 2 for s in occ
            )
            covered, mx = 0, 0
            for s, e in spans:
                covered += max(0, e - max(mx, s))
                mx = max(mx, e)
            out[f"dup{n}_gram_char_frac"] = (
                round(covered / total, 6) if total else 0.0
            )
    return out


DOCS = [
    (0, "spam spam spam spam spam spam"),                       # pure repetition
    (1, "a fresh doc with entirely distinct words only here"),  # clean
    (2, "one two three four five six one two three four five six tail words"),  # dup 6-gram
    (3, "line a\nline b\nline a\n\npara x\n\npara x"),          # dup lines + paras
    (4, ""),                                                    # empty
    (5, "ab cd ab cd ab cd xy"),                                # overlapping dup grams
]


def test_gopher_repetition_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in gopher_repetition(df, "doc_id", "text").collect()}
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        want = _py_rep(text)
        for k, v in want.items():
            assert got[doc_id][k] == v, f"doc {doc_id} {k}: {got[doc_id][k]} != {v}"
    # sanity on the planted structure
    assert got[0]["top2_gram_char_frac"] > 0.8     # 'spam spam' everywhere
    assert got[1]["dup5_gram_char_frac"] == 0.0
    assert got[2]["dup6_gram_char_frac"] > 0.7
    assert got[3]["dup_line_frac"] > 0 and got[3]["dup_para_frac"] > 0


def test_gopher_repetition_partition_independent(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    a = sorted(map(tuple, gopher_repetition(d.repartition(1), "doc_id", "text").collect()))
    b = sorted(map(tuple, gopher_repetition(d.repartition(7), "doc_id", "text").collect()))
    assert a == b and len(a) == 60
