"""Redirect resolution laws: chains, terminal-at-cap, cycles, self-loops,
one row per source, partition independence."""

from __future__ import annotations

from web_crawling_prj_spark.operators.redirects import resolve_redirects


def _resolve(spark, edges, max_hops=8):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = resolve_redirects(df, max_hops=max_hops).collect()
    assert len({r["src"] for r in rows}) == len(rows)  # exactly one row per src
    return {r["src"]: (r["final"], r["hops"], r["terminated"]) for r in rows}


def test_chains_resolve_to_terminal(spark):
    # 1→2→3→4 (4 has no outgoing edge); 10→4 short chain
    got = _resolve(spark, [(1, 2), (2, 3), (3, 4), (10, 4)])
    assert got[1] == (4, 3, True)
    assert got[2] == (4, 2, True)
    assert got[3] == (4, 1, True)
    assert got[10] == (4, 1, True)


def test_terminal_landed_exactly_at_cap_counts_as_terminated(spark):
    # 0→1→2→3: from 0 that is 3 hops; with max_hops=3 it lands on the
    # terminal exactly at budget → terminated
    got = _resolve(spark, [(0, 1), (1, 2), (2, 3)], max_hops=3)
    assert got[0] == (3, 3, True)
    # max_hops=2 stops one short → not terminated
    got2 = _resolve(spark, [(0, 1), (1, 2), (2, 3)], max_hops=2)
    assert got2[0] == (2, 2, False)


def test_cycles_and_self_loops_never_terminate(spark):
    got = _resolve(spark, [(1, 2), (2, 1), (5, 5), (7, 1)], max_hops=4)
    assert not got[1][2] and not got[2][2] and not got[5][2] and not got[7][2]
    assert got[5][0] == 5 and got[5][1] == 4  # self-loop walks in place
    assert got[7][1] == 4  # entered the cycle, burned the budget


def test_partitioning_independent(spark):
    edges = [(i, i + 1) for i in range(20)]
    a = _resolve(spark, edges)
    df = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    b = {
        r["src"]: (r["final"], r["hops"], r["terminated"])
        for r in resolve_redirects(df).collect()
    }
    assert a == b
