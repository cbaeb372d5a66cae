"""Config-delta sweep for the sequential per-query floor (VERDICT r4 item 2).

The sf0.1 sequential gate residual is a ~0.2-0.4s/query constant — planning,
AQE stage materializations, task scheduling — not data volume (47 queries x
~0.25s ~= 12s of the 20s total).  Every named candidate from r3/r4 is
measured here instead of argued: each combo is ONE subprocess (its own JVM —
several candidates are core confs that cannot change on a live session)
running the same warmup + sequential min-of-2 power methodology as bench.py
over the same bench-tagged catalog.

Usage:
  python tools/floor_bench.py --dir /root/testdata/sf0.1            # all combos
  python tools/floor_bench.py --dir ... --combo no_aqe              # one combo
  python tools/floor_bench.py --run-one no_aqe --dir ...            # internal

Output: one JSON object per combo {combo, conf, sequential_total_sec,
queries}; the sweep driver prints a ranked summary table at the end.
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

from dbt_demo_spark.session import LOCAL_BENCH_CONF  # noqa: E402

# Each combo is a set of EXTRA confs layered on the engine's standard
# session (session.py).  Keys chosen from the candidates the r3/r4 verdicts
# named plus the obvious local-mode constants (compression, scheduling).
COMBOS: dict[str, dict[str, str]] = {
    # the shipping default: AQE on, shuffle=8 (bench.py's setting)
    "base": {},
    # AQE re-plans after every shuffle-stage materialization; at sub-second
    # query sizes each materialization is a full job submission
    "no_aqe": {"spark.sql.adaptive.enabled": "false"},
    # keep AQE but stop it from splitting output for parallelism: coalesce
    # purely by size, fewer post-shuffle tasks
    "pfirst_off": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false"},
    # shuffle/spill IO compression off: tiny local shuffles pay codec setup,
    # not bandwidth
    "no_compress": {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
        "spark.broadcast.compress": "false"},
    # fewer initial shuffle partitions than bench's 8
    "shuffle4": {"spark.sql.shuffle.partitions": "4"},
    # broadcast more aggressively (local memory is plentiful; at sf0.1 even
    # lineitem aggregates fit)
    "bcast64m": {"spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024)},
    # one scan task per file instead of byte-split scheduling
    "bigscan": {
        "spark.sql.files.maxPartitionBytes": str(512 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(16 * 1024 * 1024)},
    # the winning combo IS the shipped local bench conf — one source of truth
    # (session.LOCAL_BENCH_CONF), so bench numbers always match the sweep
    "combo_all": None,  # filled below from session.LOCAL_BENCH_CONF
    # --- second-pass hypotheses: per-STAGE overhead is task-count and
    # thread-count, not IO.  (First pass showed config IO deltas buy ~2.5s
    # of 23s; planning measured at ~0.05s/query, execution dominates.)
    "shuffle2": {"spark.sql.shuffle.partitions": "2"},
    "shuffle1": {"spark.sql.shuffle.partitions": "1"},
    # fewer executor threads: 32 task slots over <1 MB stages is pure
    # scheduling + GC churn; a right-sized engine matches slots to volume
    "cpus8": {"_cpus": "8"},
    "cpus16": {"_cpus": "16"},
    "cpus8_bcast": {
        "_cpus": "8",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(512 * 1024 * 1024)},
    # AQE kept ON (the 100 TB posture): the two best single deltas together
    "bigscan_bcast": {
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(512 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(16 * 1024 * 1024)},
    "combo_all2": {
        "_cpus": "16",
        "spark.sql.shuffle.partitions": "2",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(512 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(16 * 1024 * 1024)},
}

COMBOS["combo_all"] = dict(LOCAL_BENCH_CONF)


def run_one(combo: str, sf_dir: str) -> dict:
    """Execute one combo in THIS process (caller gives us a fresh JVM)."""
    conf = dict(COMBOS[combo])
    cpus = conf.pop("_cpus", None)
    os.environ["SPARK_GRAFT_EXTRA_CONF"] = ";".join(
        f"{k}={v}" for k, v in conf.items())
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    from dbt_demo_spark.queries import CATALOG
    from dbt_demo_spark.session import get_spark

    # _cpus must go through the master= arg: session.py binds DEFAULT_CPUS
    # at import time, so an env var set here is read too late (ADVICE r5 —
    # the original sweep's cpus combos silently ran at local[32])
    spark = get_spark(app_name=f"floor-{combo}", shuffle_partitions=8,
                      master=f"local[{cpus}]" if cpus else None)
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()

    names = [n for n, s in CATALOG.items() if s.bench]
    dfs = {n: CATALOG[n].fn(spark, sf_dir) for n in names}

    def run(name: str, at: str | None = None) -> float:
        df = dfs[name] if at is None else CATALOG[name].fn(spark, at)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm) and warm != sf_dir:
        with ThreadPoolExecutor(16) as ex:
            list(ex.map(lambda n: run(n, warm), names))

    spark._jvm.System.gc()
    time.sleep(1.0)
    p1 = {n: run(n) for n in names}
    spark._jvm.System.gc()
    time.sleep(1.0)
    p2 = {n: run(n) for n in names}
    timings = {n: round(min(p1[n], p2[n]), 3) for n in names}
    spark.stop()
    return {
        "combo": combo,
        "conf": COMBOS[combo],
        "sequential_total_sec": round(sum(timings.values()), 3),
        "queries": timings,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/testdata/sf0.1")
    ap.add_argument("--combo", default=None, help="run just this combo")
    ap.add_argument("--run-one", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.run_one:
        print(json.dumps(run_one(args.run_one, args.dir)))
        return

    combos = [args.combo] if args.combo else list(COMBOS)
    results = []
    for c in combos:
        print(f"== {c}", file=sys.stderr, flush=True)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--run-one", c, "--dir", args.dir],
            capture_output=True, text=True)
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            results.append({"combo": c, "error": out.returncode})
            continue
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        results.append(r)
        print(f"   {c}: {r['sequential_total_sec']}s", file=sys.stderr,
              flush=True)

    ranked = sorted((r for r in results if "error" not in r),
                    key=lambda r: r["sequential_total_sec"])
    summary = {
        "dir": args.dir,
        "ranked": [{"combo": r["combo"],
                    "sequential_total_sec": r["sequential_total_sec"]}
                   for r in ranked],
        "results": results,
    }
    text = json.dumps(summary, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
