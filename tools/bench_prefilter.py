"""Threshold-prefilter crossover measurement (VERDICT r3 next-round #2).

Runs the bucketed steady-state frontier core with the politeness rank's
sampled top-k pushdown OFF and ON, at two sizes and two parallelism levels
(fresh subprocess JVM per level — the same two-cluster-size protocol as
bench.run_scaling). Emits one JSON file consumed by BENCH/SCALING.md and by
the CrawlConfig auto-enable heuristic.

Usage: PYTHONPATH=/root/repo python tools/bench_prefilter.py [out.json]
Env: PFX_SIZES (comma list, default "16000000,64000000"), PFX_LEVELS ("8,32").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def child(cores: int, sizes: list[int]) -> None:
    import bench
    from web_crawling_prj_spark.session import get_spark

    spark = get_spark(f"wcp-pfx-{cores}", cores=cores, shuffle_partitions=cores)
    bench.bench_frontier_core_bucketed(spark, 100_000, runs=1)  # warm JVM/codegen
    out: dict = {"cores": cores}
    for n in sizes:
        for pf in (False, True):
            r = bench.bench_frontier_core_bucketed(spark, n, runs=3, prefilter=pf)
            out[f"n{n}_pf{int(pf)}"] = r
            print(f"PROGRESS cores={cores} n={n} pf={pf} wall={r['wall_s']}", flush=True)
    print("PFX_RESULT " + json.dumps(out), flush=True)


def main() -> None:
    sizes = [int(x) for x in os.environ.get("PFX_SIZES", "16000000,64000000").split(",")]
    levels = [int(x) for x in os.environ.get("PFX_LEVELS", "8,32").split(",")]
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "BENCH", "prefilter.json")
    results: dict = {"sizes": sizes, "levels": levels}
    for cores in levels:
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                f"import sys; sys.path.insert(0, {ROOT!r}); "
                f"from tools.bench_prefilter import child; child({cores}, {sizes!r})",
            ],
            capture_output=True,
            text=True,
            cwd=ROOT,
            timeout=3600,
        )
        sys.stderr.write(proc.stderr[-2000:])
        for line in proc.stdout.splitlines():
            if line.startswith("PROGRESS"):
                print(line, flush=True)
            if line.startswith("PFX_RESULT "):
                results[f"local[{cores}]"] = json.loads(line[len("PFX_RESULT ") :])
    # derived: speedup of prefilter per (level, size) + scaling efficiency of
    # the better-of-both configuration between the two levels
    lo, hi = (f"local[{levels[0]}]", f"local[{levels[-1]}]")
    if lo in results and hi in results:
        ratio = levels[-1] / levels[0]
        derived: dict = {}
        for n in sizes:
            for lvl in (lo, hi):
                off = results[lvl][f"n{n}_pf0"]["wall_s"]
                on = results[lvl][f"n{n}_pf1"]["wall_s"]
                derived[f"{lvl}_n{n}_speedup"] = round(off / on, 3)
            for pf in (0, 1):
                r_lo = results[lo][f"n{n}_pf{pf}"]["rate"]
                r_hi = results[hi][f"n{n}_pf{pf}"]["rate"]
                derived[f"n{n}_pf{pf}_scaling_efficiency"] = round(r_hi / (r_lo * ratio), 4)
            best_lo = min(results[lo][f"n{n}_pf{p}"]["wall_s"] for p in (0, 1))
            best_hi = min(results[hi][f"n{n}_pf{p}"]["wall_s"] for p in (0, 1))
            derived[f"n{n}_best_scaling_efficiency"] = round(
                (n / best_hi) / ((n / best_lo) * ratio), 4
            )
        results["derived"] = derived
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results.get("derived", {}), indent=1))
    print(f"written: {out_path}")


if __name__ == "__main__":
    main()
