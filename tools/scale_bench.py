"""Spark-vs-DuckDB bench pair at an arbitrary scale directory.

VERDICT r3 item 1b: the engine's sequential-bench defense is that its
~0.3-0.9s/query planning + stage-scheduling constant amortizes with data
volume — argued but never measured, because every bench artifact is sf0.1.
This tool measures it: run the SAME bench-tagged catalog queries through
(a) bench.py (Spark, power + throughput methodology) and (b) a DuckDB twin
executing each query's own oracle SQL on the same parquet inputs, and print
one JSON object with both sides and the ratios.

DuckDB methodology mirrors the judge's remeasure and bench.py: one warmup
pass, then three sequential passes taking the per-query MIN (results fully
materialized via .arrow(); pass count matches bench.py so ratios compare
steady state to steady state), then a 16-thread throughput pass (best of
3, also matching bench.py) using one connection per thread.

Usage:
  python tools/make_scale.py --out /tmp/sf1 --k 10
  python tools/scale_bench.py --dir /tmp/sf1 --sf 1.0 [--out SF1_BENCH.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def duckdb_side(sf_dir: str, threads: int) -> dict:
    from dbt_demo_spark.queries import CATALOG
    from dbt_demo_spark.testing import duckdb_connection

    con = duckdb_connection(sf_dir)
    con.execute(f"SET threads TO {os.cpu_count()}")
    oracles = {n: s.oracle for n, s in CATALOG.items()
               if s.bench and s.oracle is not None}

    def run(cur, sql: str) -> float:
        t0 = time.perf_counter()
        cur.execute(sql).arrow()
        return time.perf_counter() - t0

    def named_pass(tag: str) -> dict:
        out = {}
        for n, sql in oracles.items():
            # progress names the query so a native crash is attributable
            print(f"duckdb {tag} {n}", file=sys.stderr, flush=True)
            out[n] = run(con, sql)
        return out

    named_pass("warmup")
    # min-of-3, matching bench.py's pass count (r6) so the cross-engine
    # sequential ratio compares steady state to steady state
    ps = [named_pass(f"p{i}") for i in (1, 2, 3)]
    timings = {n: round(min(p[n] for p in ps), 3) for n in oracles}

    # Throughput with one CONNECTION per worker thread (thread-local): 16
    # cursors multiplexed over a single native connection segfault under
    # concurrent load at this scale; independent connections are also how
    # concurrent clients actually drive DuckDB.  Split the core budget.
    import threading

    per_conn_threads = max(1, (os.cpu_count() or threads) // threads)
    print(f"duckdb throughput ({threads} thread-local connections x "
          f"{per_conn_threads} threads)", file=sys.stderr, flush=True)
    tls = threading.local()

    def tls_run(sql: str) -> float:
        c = getattr(tls, "con", None)
        if c is None:
            c = duckdb_connection(sf_dir)
            c.execute(f"SET threads TO {per_conn_threads}")
            c.execute("SET memory_limit = '6GB'")
            tls.con = c
        return run(c, sql)

    walls = []
    for _ in range(3):  # best-of-3, matching bench.py (r6)
        t0 = time.perf_counter()
        with ThreadPoolExecutor(threads) as ex:
            list(ex.map(tls_run, oracles.values()))
        walls.append(time.perf_counter() - t0)

    return {
        "queries": timings,
        "sequential_total_sec": round(sum(timings.values()), 3),
        "throughput_wall_sec": round(min(walls), 3),
        "threads": threads,
        "n_queries": len(oracles),
    }


def spark_side(sf_dir: str, threads: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_THREADS=str(threads))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True)
    # bench.py prints the FULL object first, then a minimal truncation-proof
    # headline line (r6) — take the line that carries the per-query map
    line = [l for l in out.stdout.splitlines()
            if l.startswith("{") and '"queries"' in l][-1]
    j = json.loads(line)
    return {
        "queries": j["queries"],
        "sequential_total_sec": j["sequential_total_sec"],
        "throughput_wall_sec": j["value"],
        "threads": j["throughput_threads"],
        "n_queries": len(j["queries"]),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--out", default=None)
    # sides run as separate invocations via --spark-json so a native crash in
    # one engine (DuckDB segfaults are real at this scale) can't lose the
    # other's completed measurement
    ap.add_argument("--side", choices=["both", "spark", "duckdb"], default="both")
    ap.add_argument("--spark-json", default=None,
                    help="with --side duckdb: reuse this spark result file")
    args = ap.parse_args()

    if args.side == "spark":
        spark = spark_side(args.dir, args.threads)
        text = json.dumps(spark, indent=1)
        if args.out:
            with open(args.out, "w") as f:
                f.write(text + "\n")
        print(text)
        return

    if args.side == "duckdb" and args.spark_json:
        with open(args.spark_json) as f:
            spark = json.load(f)
    else:
        spark = spark_side(args.dir, args.threads)
    duck = duckdb_side(args.dir, args.threads)

    common = sorted(set(spark["queries"]) & set(duck["queries"]))
    seq_spark = round(sum(spark["queries"][n] for n in common), 3)
    seq_duck = round(sum(duck["queries"][n] for n in common), 3)
    # RELATIONAL-ONLY subtotal (VERDICT r6 item 2, superseding the r4
    # two-row exclusion): the workload ratio is dominated by three
    # text/list rows where DuckDB collapses (together 72% of its sf0.1
    # total, 89% at sf1); excluding them gives the honest number for the
    # relational/bulk tail, the one the floor work has to move.  Both
    # ratios and both engines' subtotals are first-class fields.  The
    # exclusion set is defined ONCE, next to the catalog (shared with
    # bench.py).
    from dbt_demo_spark.queries.catalog import \
        NON_RELATIONAL_QUERIES as _excl
    bulk = [n for n in common if n not in _excl]
    adj_spark = round(sum(spark["queries"][n] for n in bulk), 3)
    adj_duck = round(sum(duck["queries"][n] for n in bulk), 3)
    result = {
        "sf": args.sf,
        "dir": args.dir,
        "spark": spark,
        "duckdb": duck,
        "common_queries": len(common),
        "sequential_ratio": round(seq_spark / seq_duck, 3),
        "sequential_relational_spark_sec": adj_spark,
        "sequential_relational_duckdb_sec": adj_duck,
        "sequential_ratio_relational": round(adj_spark / adj_duck, 3),
        "relational_note": (
            f"ratio over the {len(bulk)} relational/bulk queries, excluding "
            f"{sorted(_excl)} where DuckDB's text/list ops are the outlier; "
            f"spark {adj_spark}s vs duckdb {adj_duck}s"),
        "throughput_ratio": round(
            spark["throughput_wall_sec"] / duck["throughput_wall_sec"], 3),
        "per_query_ratio": {
            n: round(spark["queries"][n] / max(duck["queries"][n], 1e-4), 2)
            for n in common},
    }
    text = json.dumps(result, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
