"""Receipt for the r13 corpus_bm25_topk gate-row adoption: inline stats
(two corpus passes: the stats aggregate + the scoring scan) vs the
persisted-index serve (stats as plan literals: ONE corpus scan).
Interleaved min-of-N with the q6 control; results asserted identical
(bit-identity is separately pytest-pinned).  Writes
BM25_SERVE_RECEIPT.json.

Usage: python tools/bm25_serve_receipt.py [--dir /tmp/sf1] [--reps 7]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()

    from bench import loadavg

    waited = 0.0
    while loadavg()[0] > 2.0 and waited < 300:
        time.sleep(10.0)
        waited += 10.0
    load0 = list(loadavg())

    from dbt_demo_spark.queries.text_filters import (corpus_bm25_topk,
                                                     corpus_bm25_topk_inline)
    from dbt_demo_spark.queries.tpch import tpch_q6_forecast_revenue
    from dbt_demo_spark.session import LOCAL_BENCH_CONF, get_spark

    spark = get_spark(app_name="bm25-serve-receipt", shuffle_partitions=8,
                      conf=LOCAL_BENCH_CONF)
    frames = {
        "inline_two_pass": corpus_bm25_topk_inline(spark, args.dir),
        "index_served": corpus_bm25_topk(spark, args.dir),
        "q6_control": tpch_q6_forecast_revenue(spark, args.dir),
    }
    same = (sorted(map(tuple, frames["inline_two_pass"].collect()))
            == sorted(map(tuple, frames["index_served"].collect())))
    for df in frames.values():
        noop(df)
    os.sync()
    samples = {k: [] for k in frames}
    for _ in range(args.reps):
        for k, df in frames.items():
            samples[k].append(round(noop(df), 3))
    out = {"sf_dir": args.dir, "reps": args.reps, "interleaved": True,
           "results_identical": same,
           "loadavg_start": load0, "loadavg_end": list(loadavg()),
           "timings": {k: {"min": min(v),
                           "median": round(statistics.median(v), 3),
                           "samples": v}
                       for k, v in samples.items()},
           "finding": (
               "the index-served gate row replaces the inline stats "
               "aggregate (a second full corpus pass per execution) with "
               "a metadata-weight index read at plan-construction time; "
               "scores are bit-identical (pytest-pinned) and the serve "
               "plan has zero exchanges (plan-asserted)")}
    with open(os.path.join(REPO, "BM25_SERVE_RECEIPT.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote BM25_SERVE_RECEIPT.json", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
