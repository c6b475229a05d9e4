"""Operator-level laws of the frontier event log (plans.crawl_round).

The tiered-fold machinery's correctness rests on two algebraic properties
that the e2e fold-schedule sweeps exercise only through run_crawl:

1. **Resolution ≡ the documented rule** (`_resolve_events` docstring): per
   key the winning event is ``max(evt_round, is_add, state…)`` — newest
   round wins, an add beats a del within its round, deterministic state
   tiebreak (struct comparison, NULL-first). Pinned here against an
   independent pure-Python reference over an adversarial event set.
2. **Fold associativity**: folding ANY round-prefix into a non-terminal
   (minor) tier and re-resolving it with the remaining window equals the
   single-shot resolve over the raw log — the increment ≡ full law that
   makes every fold schedule (terminal/minor/chained) safe. Checked for
   every split point and for a chained two-level fold.

The event set deterministically includes the tricky shapes: same-round
add+del, tombstone-before-any-add (a del targeting an older tier), re-add
after del, duplicate same-round adds differing only in state, and NULLs in
the optional state fields.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from web_crawling_prj_spark.plans.crawl_round import (
    FRONTIER_LOG_COLS,
    _STATE_COLS,
    resolve_frontier_log,
)

_SCHEMA = (
    "url string, url_canon string, url_hash long, host string, priority double, "
    "depth int, discovered_ts timestamp, src_url_hash long, attempt int, "
    "next_eligible_ts timestamp, evt_round int, is_del boolean"
)

_NEG_INF = float("-inf")


def _null_first(v):
    """Mirror Spark's struct-max NULL ordering: NULL sorts below any value."""
    return (0, _NEG_INF) if v is None else (1, v)


def _events():
    """Adversarial + seeded-random event list as FRONTIER_LOG_COLS dicts."""
    rng = random.Random(1337)

    def add(key, rnd, attempt=0, prio=None, src=None):
        return {
            "url": f"u{key}",
            "url_canon": f"u{key}",
            "url_hash": key,
            "host": f"h{key % 3}",
            "priority": float(prio if prio is not None else key % 5),
            "depth": key % 4,
            "discovered_ts": None,
            "src_url_hash": src,
            "attempt": attempt,
            "next_eligible_ts": None,
            "evt_round": rnd,
            "is_del": False,
        }

    def tomb(key, rnd):
        return {
            **{c: None for c in _STATE_COLS},
            "url_hash": key,
            "evt_round": rnd,
            "is_del": True,
        }

    ev = [
        # same-round add+del: the add must win (del tombstones OLDER versions)
        add(100, 2, attempt=1),
        tomb(100, 2),
        # tombstone before any add in this window (targets an older tier)
        tomb(101, 3),
        # re-add after del across rounds
        add(102, 1),
        tomb(102, 2),
        add(102, 4, attempt=2),
        # duplicate same-round adds differing only in state (tiebreak)
        add(103, 2, attempt=0, prio=1.0),
        add(103, 2, attempt=3, prio=1.0),
        add(103, 2, attempt=3, prio=0.5),
        # NULL vs non-NULL optional field at an otherwise-equal position
        add(104, 1, src=None),
        add(104, 1, src=77),
    ]
    for _ in range(150):
        key = rng.randrange(12)
        rnd = rng.randrange(1, 6)
        if rng.random() < 0.3:
            ev.append(tomb(key, rnd))
        else:
            ev.append(
                add(
                    key,
                    rnd,
                    attempt=rng.randrange(4),
                    prio=rng.choice([0.0, 0.5, 1.0, 2.5]),
                    src=rng.choice([None, 7, 8]),
                )
            )
    return ev


def _python_winners(events):
    """Independent reference: max(evt_round, is_add, state…) per key,
    NULL-first field ordering, exactly the `_resolve_events` contract."""
    best = {}
    for e in events:
        rank = (
            e["evt_round"],
            not e["is_del"],
            *[_null_first(e[c]) for c in _STATE_COLS],
        )
        k = e["url_hash"]
        if k not in best or rank > best[k][0]:
            best[k] = (rank, e)
    return {k: v[1] for k, v in best.items()}


def _rows(df):
    return {
        tuple(r[c] for c in FRONTIER_LOG_COLS) for r in df.select(*FRONTIER_LOG_COLS).collect()
    }


@pytest.fixture(scope="module")
def log_df(spark):
    return spark.createDataFrame(_events(), schema=_SCHEMA).persist()


def test_resolution_matches_python_reference(spark, log_df):
    winners = _python_winners(_events())
    expect_minor = {
        tuple(w[c] for c in FRONTIER_LOG_COLS) for w in winners.values()
    }
    got_minor = _rows(resolve_frontier_log(log_df, terminal=False))
    assert got_minor == expect_minor
    # terminal fold: tombstone winners are dropped outright
    expect_term = {t for t in expect_minor if not t[FRONTIER_LOG_COLS.index("is_del")]}
    got_term = _rows(resolve_frontier_log(log_df, terminal=True))
    assert got_term == expect_term
    # the adversarial shapes actually occurred
    assert not winners[100]["is_del"], "same-round add must beat its del"
    assert winners[101]["is_del"], "window-only tombstone must survive a minor fold"
    assert winners[102]["attempt"] == 2, "re-add after del must win"
    assert (winners[103]["attempt"], winners[103]["priority"]) == (3, 1.0)
    assert winners[104]["src_url_hash"] == 77, "non-NULL beats NULL at max"


def test_minor_fold_any_split_equals_single_resolve(spark, log_df):
    full = _rows(resolve_frontier_log(log_df, terminal=True))
    for split in range(1, 6):
        prefix = log_df.where(F.col("evt_round") <= split)
        suffix = log_df.where(F.col("evt_round") > split)
        tier = resolve_frontier_log(prefix, terminal=False)
        refolded = resolve_frontier_log(
            tier.unionByName(suffix.select(*FRONTIER_LOG_COLS)), terminal=True
        )
        assert _rows(refolded) == full, f"split at round {split} diverged"


def test_chained_minor_folds_equal_single_resolve(spark, log_df):
    """Two-level fold chain (≤2 → minor; that ∪ 3..4 → minor; ∪ 5 → final)."""
    full = _rows(resolve_frontier_log(log_df, terminal=True))
    t1 = resolve_frontier_log(log_df.where(F.col("evt_round") <= 2), terminal=False)
    t2 = resolve_frontier_log(
        t1.unionByName(
            log_df.where(F.col("evt_round").between(3, 4)).select(*FRONTIER_LOG_COLS)
        ),
        terminal=False,
    )
    final = resolve_frontier_log(
        t2.unionByName(log_df.where(F.col("evt_round") == 5).select(*FRONTIER_LOG_COLS)),
        terminal=True,
    )
    assert _rows(final) == full
