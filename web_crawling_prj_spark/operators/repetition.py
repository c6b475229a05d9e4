"""The Gopher repetition-filter family (Rae et al. 2021, Appendix A1):
duplicate line / paragraph fractions, top n-gram character coverage
(n = 2..4), and duplicate n-gram character coverage (n = 5..10) — the
standard "remove repetitious documents" signals of public webtext pipelines
(Gopher, MassiveText, Dolma/DataTrove reproductions).

Definitions (documented conventions where the paper is loose — all exactly
mirrored by the DuckDB oracle):

* **dup_line_frac / dup_para_frac** — fraction of lines (paragraphs) whose
  exact text occurs more than once in the doc; *_char_frac — fraction of
  line (paragraph) characters belonging to such duplicates. Computed as
  array expressions (a doc's lines fit in one array; the O(L²) equality
  scan is per-doc-local and codegen'd).
* **top{n}_gram_char_frac** — characters covered by ALL occurrences of the
  single most frequent word n-gram (ties: lexicographically smallest gram;
  0 when even the top gram occurs only once — no repetition), over TOKEN
  characters (whitespace excluded from numerator and denominator — the
  length metric is invariant to whitespace runs).
* **dup{n}_gram_char_frac** — characters covered by the UNION of all
  positions lying inside some n-gram that occurs ≥ 2 times in the doc
  (positions never double-counted — the paper's "do not count characters
  twice"). Interval union = per-doc sort + running-max sweep, the same
  ONE-window pattern as textdedup.duplicate_ngram_spans.

Shape: one positional token table (1 window for char offsets), then per n
one lead()-built gram table + one (key, gram) count + either an argmax
(top) or an interval sweep (dup). Docs with < n tokens score 0. All
fractions rounded to 6.

Scale: everything is per-doc-partitioned — windows partition by the doc
key, groupBys key on (doc, gram); nothing crosses documents, so the op
shards perfectly at any corpus size (it is a profiling pass: ~13 narrow
aggregates over the token stream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.lmquality import _tokens

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)


def _dup_unit_fracs(units: Column) -> tuple[Column, Column]:
    """(dup fraction of units, dup fraction of unit characters) for an array
    of text units (lines or paragraphs). Empty/blank units dropped."""
    u = F.filter(units, lambda x: F.trim(x) != F.lit(""))
    is_dup = F.transform(
        u, lambda x: F.size(F.filter(u, lambda y: y == x)) >= 2
    )
    lens = F.transform(u, lambda x: F.length(x).cast("long"))
    dup_lens = F.zip_with(
        lens, is_dup, lambda l, d: F.when(d, l).otherwise(F.lit(0).cast("long"))
    )
    total = F.aggregate(lens, F.lit(0).cast("long"), lambda a, x: a + x)
    dup_chars = F.aggregate(dup_lens, F.lit(0).cast("long"), lambda a, x: a + x)
    n_dup = F.size(F.filter(is_dup, lambda d: d))
    frac = F.when(F.size(u) > 0, F.round(n_dup / F.size(u).cast("double"), 6)).otherwise(0.0)
    cfrac = F.when(total > 0, F.round(dup_chars / total.cast("double"), 6)).otherwise(0.0)
    return frac, cfrac


def _token_table(docs: DataFrame, key: str, text_col: str) -> DataFrame:
    """(key, pos, w, wlen, off): 1-based position, token-char offset
    (cumulative token lengths, whitespace excluded). One window."""
    tok = docs.select(
        F.col(key), F.posexplode(_tokens(text_col)).alias("_p0", "w")
    ).select(key, (F.col("_p0") + 1).alias("pos"), "w", F.length("w").cast("long").alias("wlen"))
    w = Window.partitionBy(key).orderBy("pos")
    off = F.coalesce(
        F.sum("wlen").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return tok.withColumn("off", off.cast("long"))


def _grams(tok: DataFrame, key: str, n: int) -> DataFrame:
    """(key, gram, start, end) for every n-gram start position — end is the
    exclusive token-char offset; rows with < n remaining tokens dropped."""
    w = Window.partitionBy(key).orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(w) for i in range(1, n)]
    last_off = F.lead("off", n - 1).over(w)
    last_len = F.lead("wlen", n - 1).over(w)
    return (
        tok.select(
            key,
            F.concat_ws(" ", *parts).alias("gram"),
            F.col("off").alias("start"),
            (last_off + last_len).alias("end"),
            last_off.isNotNull().alias("_full"),
        )
        .where("_full")
        .drop("_full")
    )


def _covered_union(spans: DataFrame, key: str) -> DataFrame:
    """(key, covered): total length of the union of [start, end) spans —
    one per-doc window sweep (running max end), never a per-doc collect."""
    w = Window.partitionBy(key).orderBy("start", "end")
    prev_max = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    gain = F.greatest(
        F.col("end") - F.greatest(F.coalesce(prev_max, F.lit(0)), F.col("start")),
        F.lit(0),
    )
    return spans.select(key, gain.alias("_g")).groupBy(key).agg(
        F.sum("_g").cast("long").alias("covered")
    )


def gopher_repetition(
    docs: DataFrame, key: str, text_col: str
) -> DataFrame:
    """All 13 Gopher repetition signals per doc:
    (key, dup_line_frac, dup_line_char_frac, dup_para_frac,
    dup_para_char_frac, top{2,3,4}_gram_char_frac,
    dup{5..10}_gram_char_frac). See module docstring for conventions."""
    from web_crawling_prj_spark.operators.textdedup import spread_if_narrow

    # all 13 signals are per-doc column math upstream of any exchange — a
    # single-split scan serializes them onto one core (guarded: identity at
    # real scale)
    docs = spread_if_narrow(docs)
    lines = F.split(F.col(text_col), "\n")
    paras = F.split(F.col(text_col), "\n\n")
    lf, lcf = _dup_unit_fracs(lines)
    pf, pcf = _dup_unit_fracs(paras)
    base = docs.select(
        key,
        lf.alias("dup_line_frac"),
        lcf.alias("dup_line_char_frac"),
        pf.alias("dup_para_frac"),
        pcf.alias("dup_para_char_frac"),
    )
    tok = _token_table(docs, key, text_col).localCheckpoint(eager=True)
    totals = tok.groupBy(key).agg(F.sum("wlen").cast("long").alias("_tot"))

    out = base.join(totals, key, "left")
    for n in TOP_NS:
        g = _grams(tok, key, n)
        counts = g.groupBy(key, "gram").agg(
            F.count("*").cast("long").alias("cnt"),
            F.min(F.col("end") - F.col("start")).alias("glen"),
        )
        # tie-break: highest cnt, then lexicographically SMALLEST gram —
        # min(struct(-cnt, gram)); a top gram occurring once scores 0 (no
        # repetition), mirrored in the oracle
        top = counts.groupBy(key).agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("gram").alias("g"), F.col("cnt").alias("c"), F.col("glen").alias("l"))).alias("_m")
        ).select(
            key,
            (F.col("_m.c") * F.col("_m.l")).alias(f"_topchars{n}"),
            F.col("_m.c").alias(f"_topcnt{n}"),
        )
        out = out.join(top, key, "left")
        frac = F.when(
            (F.col("_tot") > 0) & (F.col(f"_topcnt{n}") >= 2),
            F.round(F.col(f"_topchars{n}") / F.col("_tot").cast("double"), 6),
        ).otherwise(0.0)
        out = out.withColumn(f"top{n}_gram_char_frac", frac).drop(
            f"_topchars{n}", f"_topcnt{n}"
        )
    for n in DUP_NS:
        g = _grams(tok, key, n)
        dup_grams = g.groupBy(key, "gram").agg(F.count("*").cast("long").alias("cnt"))
        spans = g.join(
            dup_grams.where(F.col("cnt") >= 2).select(key, "gram"), [key, "gram"]
        ).select(key, "start", "end")
        cov = _covered_union(spans, key)
        out = out.join(cov, key, "left")
        frac = F.when(
            F.col("_tot") > 0,
            F.round(F.coalesce(F.col("covered"), F.lit(0)) / F.col("_tot").cast("double"), 6),
        ).otherwise(0.0)
        out = out.withColumn(f"dup{n}_gram_char_frac", frac).drop("covered")
    return out.drop("_tot")
