"""Shared-scan multi-query execution, measured (SURVEY §8 "next levers"):
run the bench catalog twice — plain (every query decodes its own parquet)
and inside sources/parquet.shared_scans (each table decoded ONCE into a
column-pruned cached copy serving the whole batch) — and report both
sequential sums plus the cache-build cost, honestly included in the
shared total.

The per-table column sets are DERIVED FROM THE BATCH'S OWN PLANS: each
query's formatted explain is scanned for (Location, ReadSchema) pairs
under the target directory, and the union of read columns per table is
what gets cached — the same footprint a cluster-side workload manager
would compute.  `events` caches the full normalized loader output (its
scan schema differs from the served schema).

Usage: python tools/shared_scan_bench.py [--dir /tmp/sf1] [--sf 1.0]
           [--out SHARED_SCAN.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=os.path.join(REPO, "SHARED_SCAN.json"))
    args = ap.parse_args()
    sf_dir = args.dir

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from dbt_demo_spark.queries import CATALOG
    from dbt_demo_spark.session import LOCAL_BENCH_CONF, get_spark
    from dbt_demo_spark.sources.parquet import shared_scans
    from dbt_demo_spark.workload import batch_footprint

    spark = get_spark(app_name="shared-scan-bench", shuffle_partitions=8,
                      conf=LOCAL_BENCH_CONF)
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()

    names = [n for n, s in CATALOG.items() if s.bench]

    def build():
        return {n: CATALOG[n].fn(spark, sf_dir) for n in names}

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # codegen warmup off the clock (same discipline as bench.py)
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm) and warm != sf_dir:
        for n in names:
            CATALOG[n].fn(spark, warm).write.format("noop").mode(
                "overwrite").save()

    # ---- plain mode: min-of-2 sequential
    dfs = build()
    p = [{n: run(dfs[n]) for n in names} for _ in range(2)]
    plain = {n: round(min(pi[n] for pi in p), 3) for n in names}

    # column footprint of the whole batch, from the plans themselves
    # (dbt_demo_spark.workload is the library home of the derivation —
    # this tool is the receipts harness over the same API)
    columns = batch_footprint(dfs, sf_dir)
    if not columns:
        raise RuntimeError(f"scan_columns found no tables under {sf_dir} — "
                           "Location lines truncated or dir mismatch")
    print(f"cached footprint: {sorted(columns)}", file=sys.stderr)

    # ---- shared mode: queries CONSTRUCTED inside the block so they bind
    # to the cached tables; cache build (one decode per table) is timed
    # and reported as part of the shared total
    with shared_scans(spark, sf_dir, columns):
        t0 = time.perf_counter()
        from dbt_demo_spark.sources.parquet import load_table
        for t in columns:
            if t != "events":
                load_table(spark, sf_dir, t).count()
            else:
                from dbt_demo_spark.sources.events import load_events
                load_events(spark, sf_dir).count()
        cache_build = time.perf_counter() - t0
        sdfs = build()
        sp = [{n: run(sdfs[n]) for n in names} for _ in range(2)]
    shared = {n: round(min(pi[n] for pi in sp), 3) for n in names}

    plain_total = round(sum(plain.values()), 3)
    shared_total = round(sum(shared.values()), 3)
    result = {
        "what": ("shared-scan multi-query execution vs plain per-query "
                 "scans over the bench catalog; column footprint derived "
                 "from the batch's own plans; shared_total_incl_build "
                 "includes the one-time cache materialization"),
        "sf": args.sf,
        "dir": sf_dir,
        "columns_cached": {t: (c if c else "ALL") for t, c in columns.items()},
        "plain_sequential_sec": plain_total,
        "cache_build_sec": round(cache_build, 3),
        "shared_sequential_sec": shared_total,
        "shared_total_incl_build_sec": round(shared_total + cache_build, 3),
        "speedup_incl_build": round(plain_total / (shared_total + cache_build), 3),
        "per_query": {n: {"plain": plain[n], "shared": shared[n]}
                      for n in names},
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in result.items() if k != "per_query"}))
    spark.stop()


if __name__ == "__main__":
    main()
