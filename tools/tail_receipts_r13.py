"""Round-13 sf1 tail receipts (VERDICT r12 items 1-4): interleaved
min-of-N decompositions for the four unreceipted >2x rows.

1. tpch_q2 (9.3x, 0.93s): current two-scan plan (per-part MIN +
   min-equality rejoin over a second lineitem scan) vs the SINGLE-SCAN
   twin (offer-grain pre-agg with map-side combine + window MIN, ties
   kept) — queries/tpch2.py tpch_q2_singlepass.  -> Q2_RECEIPT.json
2. tpch_q11 (6.2x, 0.66s) + events_hourly_rollup (6.5x, 0.58s):
   TPCH_TAIL-style stage buildup — scan-only, partial shapes, full —
   naming where each query's time goes.  q11's executed plan already
   carries a ReusedExchange (the pr aggregate is computed ONCE; the
   scalar-threshold side reuses its shuffle), so the buildup tests
   whether the floor is scan + one partkey exchange.  hourly_rollup's
   cost hypothesis is the exact countDistinct(user_id): Spark plans it
   as a two-level aggregate whose first exchange moves (hour, type,
   user) grain — the no-distinct twin isolates that.
   -> Q11_HOURLY_RECEIPT.json
3. tpch_q18 at sf1 (3.3x, 0.63s): the Q18_RECEIPT methodology (mart
   serve vs rawscan twin, interleaved with a q6 control) re-run at
   /tmp/sf1 so the last TPC-H tail row has a trusted number.
   -> Q18_SF1_RECEIPT.json
4. mart_bucketed_revenue (6.3x, 0.73s): build-vs-serve split — time the
   bucketed saveAsTable build ONCE (cold, via the real Runner path) and
   the co-located serve query steady-state separately; the bench row
   conflates them.  -> MART_BUILD_SERVE_RECEIPT.json

All measurements: LOCAL_BENCH_CONF session, shuffle=8, ambient-load
gated, warmup pass off-clock (mart builds land there), per-variant
samples interleaved round-robin so drift hits every variant equally.

Usage: python tools/tail_receipts_r13.py [--dir /tmp/sf1] [--reps 7]
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


def plan_audit(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {"exchanges": plan.count("Exchange hashpartitioning"),
            "reused_exchanges": plan.count("ReusedExchange"),
            "broadcast_exchanges": plan.count("BroadcastExchange"),
            "sort_merge_joins": plan.count("SortMergeJoin"),
            "scans": plan.count("Scan parquet")}


def interleave(frames: dict, reps: int) -> dict:
    """Round-robin min-of-N over named DataFrames (already warmed)."""
    samples = {k: [] for k in frames}
    for _ in range(reps):
        for k, df in frames.items():
            samples[k].append(round(noop(df), 3))
    return {k: {"min": min(v), "median": round(statistics.median(v), 3),
                "samples": v, "plan": plan_audit(frames[k])}
            for k, v in samples.items()}


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

    import pyspark.sql.functions as F

    from dbt_demo_spark.functions.numeric import scaled_long
    from dbt_demo_spark.queries.llm_pipeline import (
        events_hourly_rollup, events_hourly_rollup_rawscan)
    from dbt_demo_spark.queries.reference_surface import (
        bucketed_order_marts, mart_bucketed_revenue)
    from dbt_demo_spark.queries.tpch import (tpch_q6_forecast_revenue,
                                             tpch_q18_large_volume_customer,
                                             tpch_q18_rawscan)
    from dbt_demo_spark.queries.tpch2 import (partsupp_offer_mart,
                                              tpch_q2_min_cost_supplier,
                                              tpch_q2_rejoin,
                                              tpch_q2_singlepass,
                                              tpch_q11_important_parts,
                                              tpch_q11_rawscan)
    from dbt_demo_spark.session import LOCAL_BENCH_CONF, get_spark
    from dbt_demo_spark.sources.events import load_events
    from dbt_demo_spark.sources.parquet import load_table, spread

    spark = get_spark(app_name="tail-receipts-r13", shuffle_partitions=8,
                      conf=LOCAL_BENCH_CONF)
    d = args.dir

    # ---- 4. mart build-vs-serve: time the COLD bucketed build first
    # (before the cached-marts warmup hides it)
    from dbt_demo_spark.queries import reference_surface as _rs
    t0 = time.perf_counter()
    _rs._build_bucketed_order_marts(spark, d)
    mart_build_cold = round(time.perf_counter() - t0, 3)
    # offer-mart cold build, also timed for its receipt entry
    t0 = time.perf_counter()
    partsupp_offer_mart(spark, d)
    offer_build_cold = round(time.perf_counter() - t0, 3)

    # ---- stage-buildup frames for q11 / hourly_rollup
    li = load_table(spark, d, "lineitem")
    q11_scan = li.select("l_partkey", "l_extendedprice", "l_discount")
    from dbt_demo_spark.queries.tpch import _revenue_cents
    q11_pr = (li.groupBy(F.col("l_partkey").alias("part_key"))
              .agg(F.sum(_revenue_cents()).alias("units")))
    ev_cols = load_events(spark, d).select("ts", "event_type", "user_id",
                                           "value")
    ev_spread = spread(ev_cols, "user_id")
    hourly_nodistinct = (
        ev_spread.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz")
            .alias("hour_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             (F.sum(scaled_long(F.col("value"))) / 100.0)
             .alias("total_value")))

    frames = {
        "q2_rejoin": tpch_q2_rejoin(spark, d),
        "q2_singlepass": tpch_q2_singlepass(spark, d),
        "q2_mart": tpch_q2_min_cost_supplier(spark, d),
        "q11_scan_only": q11_scan,
        "q11_pr_agg_only": q11_pr,
        "q11_rawscan": tpch_q11_rawscan(spark, d),
        "q11_mart": tpch_q11_important_parts(spark, d),
        "hourly_scan_only": ev_cols,
        "hourly_spread_scan": ev_spread,
        "hourly_no_distinct": hourly_nodistinct,
        "hourly_rawscan": events_hourly_rollup_rawscan(spark, d),
        "hourly_mart": events_hourly_rollup(spark, d),
        "q18_mart": tpch_q18_large_volume_customer(spark, d),
        "q18_rawscan": tpch_q18_rawscan(spark, d),
        "q6_control": tpch_q6_forecast_revenue(spark, d),
        "mart_bucketed_revenue_serve": mart_bucketed_revenue(spark, d),
    }

    # results-identical assertions (variant discipline)
    q2_sets = [sorted(map(tuple, frames[k].collect()))
               for k in ("q2_rejoin", "q2_singlepass", "q2_mart")]
    same_q2 = q2_sets[0] == q2_sets[1] == q2_sets[2]
    same_q11 = (sorted(map(tuple, frames["q11_rawscan"].collect()))
                == sorted(map(tuple, frames["q11_mart"].collect())))
    same_q18 = (sorted(map(tuple, frames["q18_mart"].collect()))
                == sorted(map(tuple, frames["q18_rawscan"].collect())))
    same_hourly = (sorted(map(tuple, frames["hourly_mart"].collect()))
                   == sorted(map(tuple, frames["hourly_rawscan"].collect())))

    for df in frames.values():   # warmup, off-clock
        noop(df)
    timings = interleave(frames, args.reps)
    load1 = list(loadavg())

    def write(path: str, payload: dict) -> None:
        payload.update({"sf_dir": d, "reps": args.reps,
                        "interleaved": True,
                        "loadavg_start": load0, "loadavg_end": load1})
        with open(os.path.join(REPO, path), "w") as fh:
            json.dump(payload, fh, indent=1)
        print("wrote", path, flush=True)

    write("Q2_RECEIPT.json", {
        "results_identical": same_q2,
        "offer_mart_build_cold_sec": offer_build_cold,
        "rejoin_two_scan": timings["q2_rejoin"],
        "singlepass_window": timings["q2_singlepass"],
        "mart_served": timings["q2_mart"],
        "finding": (
            "the pre-r13 plan scanned lineitem twice (per-part MIN + "
            "min-equality rejoin); the singlepass twin pre-aggregates to "
            "(partkey,suppkey) offer grain in one scan (window MIN, ties "
            "kept, no DISTINCT); the adopted catalog plan serves the "
            "same window from the l_partkey-bucketed partsupp offer "
            "mart — the offer grain built once, so the per-query cost "
            "is a pruned mart scan with zero shuffle exchange")})
    write("Q11_HOURLY_RECEIPT.json", {
        "q11": {k: timings[k] for k in
                ("q11_scan_only", "q11_pr_agg_only", "q11_rawscan",
                 "q11_mart")},
        "q11_results_identical": same_q11,
        "hourly": {k: timings[k] for k in
                   ("hourly_scan_only", "hourly_spread_scan",
                    "hourly_no_distinct", "hourly_rawscan",
                    "hourly_mart")},
        "hourly_results_identical": same_hourly,
        "finding_q11": (
            "the rawscan plan carries ReusedExchange (the pr aggregate "
            "computed once, reused by the threshold side) but still pays "
            "the fact scan + partkey exchange per execution; the adopted "
            "catalog plan rolls up the l_partkey-bucketed offer mart's "
            "exact revenue_units partials with zero exchange"),
        "finding_hourly": (
            "rawscan-vs-no_distinct delta is the exact countDistinct"
            "(user_id): a two-level aggregate whose first exchange moves "
            "(hour,type,user) grain per execution; the adopted catalog "
            "plan serves from the hour_start-bucketed user-grain mart "
            "where count(*) IS the exact distinct (group-then-count), "
            "zero exchange")})
    write("Q18_SF1_RECEIPT.json", {
        "results_identical": same_q18,
        "mart_serve": timings["q18_mart"],
        "rawscan_twin": timings["q18_rawscan"],
        "q6_control": timings["q6_control"],
        "finding": (
            "sf1 interleaved min-of-N for the last unreceipted TPC-H "
            "tail row; mart serve is the shipping plan (exchange-free "
            "qty rollup over the orderkey-bucketed lineitem)")})
    write("MART_BUILD_SERVE_RECEIPT.json", {
        "bucketed_build_cold_sec": mart_build_cold,
        "serve_steady_state": timings["mart_bucketed_revenue_serve"],
        "q6_control": timings["q6_control"],
        "finding": (
            "the SCALE_BENCH row conflates the once-per-layout bucketed "
            "saveAsTable build (paid one time, amortized over the four "
            "orderkey-join rows q3/q9/q18/q21 + this one) with the "
            "steady-state co-located serve; the split shows which side "
            "carries the 6.3x")})
    spark.stop()


if __name__ == "__main__":
    main()
