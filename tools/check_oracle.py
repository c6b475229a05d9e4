"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and, where an
``oracle_sql()`` twin exists, the same SQL on DuckDB with the testdata parquet
registered as views; compares row count, column-name schema, and an
order-insensitive value hash (columns sorted by name, rows sorted, floats
rounded to 9 significant places before hashing).

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    # accept space- or comma-separated names; ignore a bare "--only" flag so
    # both `check_oracle.py a b` and `check_oracle.py --only a,b` select {a,b}
    only = {
        n
        for a in sys.argv[1:]
        if "/" not in a and a != "--only"
        for n in a.split(",")
        if n
    }

    import __spark_entry__ as entrymod
    from web_crawling_prj_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:  # a typo must be loud, not a vacuous "0 failures"
        print(f"ERROR: unknown query names: {sorted(unknown)}", file=sys.stderr)
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(ex).splitlines()[0][:200]}")
            continue
        took = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, {took:.1f}s")
            if len(srows) == 0 and name != "customers_no_orders":
                print(f"  WARN {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(ex).splitlines()[0][:200]}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema: spark={sorted(scols)} duckdb={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount: spark={len(srows)} duckdb={len(orows)}")
        if not problems:
            sh = value_hash(srows, scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append(f"valuehash: {sh} != {oh}")
                # show a diff sample
                sset = {tuple(_norm_cell(v) for v in r) for r in srows}
                oset = {tuple(_norm_cell(v) for v in r) for r in orows}
                for r in list(sset - oset)[:2]:
                    print(f"  spark-only: {r}")
                for r in list(oset - sset)[:2]:
                    print(f"  duckdb-only: {r}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name}: {len(srows)} rows, {took:.1f}s")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
