"""TPC-H tail endgame receipts (VERDICT r6 item 8): per-query breakdown
for the four persistent sub-second tail rows — q3, q4, q5, q21 — deciding
with measurements whether a rewrite moves them or they are
constants/scan-bound at local sf0.1.

Per query, warmed and min-of-N, same session conf as bench.py:

  * full        — the catalog query as benched (plain scans)
  * shared      — the same query served from cached column-pruned scans
                  (sources/parquet.shared_scans, footprint from the
                  query's own plan): FULL minus parquet decode
  * scan_floor  — sum of noop-writes of each base-table projection the
                  query reads, with its pushed filters: the pure
                  scan+decode share of FULL
  * stages      — cumulative sub-plan build-up (scan -> +joins -> +agg),
                  attributing the remainder

Verdict rule printed per query: if (full - shared)/full > 0.3 the row is
DECODE-BOUND (shared-scan workload mode is the answer — measured, opt-in
via SPARK_GRAFT_SHARED_SCAN=1); else if stage deltas are all < ~0.15s the
row is STAGE-CONSTANTS-BOUND (the irreducible ~2-4 stage launches of
local-mode Spark; amortized on a real cluster); else the named stage is
the target.

Usage: python tools/tpch_tail.py [--dir /root/testdata/sf0.1]
           [--out TPCH_TAIL.json] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

QUERIES = ("tpch_q3_shipping_priority", "tpch_q4_late_orders",
           "tpch_q5_local_supplier_volume", "tpch_q21_waiting_suppliers")


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def best(fn, reps: int) -> float:
    return round(min(fn() for _ in range(reps)), 3)


def scan_parts(spark, sf_dir):
    """Base-table projections + pushed filters per query (mirrors each
    query's scans; columns = what its plan reads)."""
    from dbt_demo_spark.sources.parquet import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return {
        "tpch_q3_shipping_priority": [
            cust.filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"),
            orders.filter(F.col("o_orderdate") < "1997-01-01")
            .select("o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"),
            li.filter(F.col("l_shipdate") > "1997-01-01")
            .select("l_orderkey", "l_extendedprice", "l_discount"),
        ],
        "tpch_q4_late_orders": [
            orders.filter((F.col("o_orderdate") >= "1996-01-01")
                          & (F.col("o_orderdate") < "1996-07-01"))
            .select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.select("l_orderkey", "l_shipdate"),
        ],
        "tpch_q5_local_supplier_volume": [
            cust.select("c_custkey", "c_nationkey"),
            orders.filter((F.col("o_orderdate") >= "1996-01-01")
                          & (F.col("o_orderdate") < "1997-01-01"))
            .select("o_orderkey", "o_custkey"),
            li.select("l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount"),
            supp.select("s_suppkey", "s_nationkey"),
        ],
        "tpch_q21_waiting_suppliers": [
            li.select("l_orderkey", "l_suppkey", "l_shipdate"),
            orders.filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey"),
            supp.select("s_suppkey", "s_name"),
        ],
    }


def stage_plans(spark, sf_dir):
    """Cumulative sub-plans per query: each entry materializes one more
    stage of the full pipeline."""
    from dbt_demo_spark.sources.parquet import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    # q3 build-up
    c3 = cust.filter(F.col("c_mktsegment") == "BUILDING")
    o3 = orders.filter(F.col("o_orderdate") < "1997-01-01")
    l3 = li.filter(F.col("l_shipdate") > "1997-01-01")
    q3_co = c3.join(o3, c3.c_custkey == o3.o_custkey)
    q3_col = q3_co.join(l3, l3.l_orderkey == o3.o_orderkey)

    # q4 build-up
    o4 = orders.filter((F.col("o_orderdate") >= "1996-01-01")
                       & (F.col("o_orderdate") < "1996-07-01"))
    q4_semi = o4.join(
        li, (li.l_orderkey == o4.o_orderkey)
        & (li.l_shipdate > o4.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi")

    return {
        "tpch_q3_shipping_priority": {
            "cust_x_orders": q3_co.select("o_orderkey"),
            "plus_lineitem": q3_col.select("l_orderkey", "l_extendedprice"),
        },
        "tpch_q4_late_orders": {
            "semi_join": q4_semi.select("o_orderpriority"),
        },
    }


def bucketed_variants(spark, sf_dir, reps: int) -> dict:
    """The OTHER endgame option, measured: q3/q21 rewritten over marts
    bucketed on the order key (shuffle paid at build), result-checked
    against the plain catalog rows.  Answers whether a layout rewrite
    moves the tail at sf0.1."""
    import hashlib
    import tempfile

    from dbt_demo_spark.core.model import ModelDef, ModelRegistry
    from dbt_demo_spark.core.runner import Runner
    from dbt_demo_spark.functions.numeric import scaled_long
    from dbt_demo_spark.queries import CATALOG
    from dbt_demo_spark.sources.parquet import load_table

    reg = ModelRegistry()
    reg.register(ModelDef(
        name="tail_orders_bk", deps=("orders",), materialized="table",
        fn=lambda refs: refs["orders"].select(
            "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority",
            "o_orderstatus"),
        bucket_by=("o_orderkey",), n_buckets=8))
    reg.register(ModelDef(
        name="tail_lineitem_bk", deps=("lineitem",), materialized="table",
        fn=lambda refs: refs["lineitem"].select(
            "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
            "l_discount"),
        bucket_by=("l_orderkey",), n_buckets=8))
    wh = tempfile.mkdtemp(prefix="tail_bk_")
    runner = Runner(spark, reg, warehouse_dir=wh)
    t0 = time.perf_counter()
    rels = runner.run({
        "orders": load_table(spark, sf_dir, "orders"),
        "lineitem": load_table(spark, sf_dir, "lineitem")})
    build_sec = round(time.perf_counter() - t0, 3)
    o, li = rels["tail_orders_bk"], rels["tail_lineitem_bk"]

    # q21 over the bucketed layout: the three orderkey joins (inner, semi,
    # anti) read co-located buckets; only the supplier join + agg shuffle
    s = load_table(spark, sf_dir, "supplier")
    late = li.filter(F.col("l_shipdate") > "1997-06-01").select(
        "l_orderkey", "l_suppkey")
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    of = o.filter(F.col("o_orderstatus") == "F")
    q21_bk = (
        l1.join(of, F.col("l1.l_orderkey") == of.o_orderkey)
        .join(l2, (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
              & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")), "left_semi")
        .join(l3, (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
              & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")), "left_anti")
        .join(s, s.s_suppkey == F.col("l1.l_suppkey"))
        .groupBy(F.col("s_name").alias("supplier_name"))
        .agg(F.count(F.lit(1)).alias("numwait")))

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    rev = (scaled_long(F.col("l_extendedprice"))
           * scaled_long(F.lit(1) - F.col("l_discount")))
    ob = o.filter(F.col("o_orderdate") < "1997-01-01")
    lb = li.filter(F.col("l_shipdate") > "1997-01-01")
    q3_bk = (
        cust.join(ob, cust.c_custkey == ob.o_custkey)
        .join(lb, lb.l_orderkey == ob.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("order_key"),
                 F.col("o_orderdate").cast("date").alias("order_date"),
                 F.col("o_orderpriority").alias("order_priority"))
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
        .select("order_key", "revenue", "order_date", "order_priority")
        .orderBy(F.desc("revenue"), F.asc("order_key"))
        .limit(10))

    out = {"mart_build_sec": build_sec}
    for name, bk in (("tpch_q21_waiting_suppliers", q21_bk),
                     ("tpch_q3_shipping_priority", q3_bk)):
        plain_df = CATALOG[name].fn(spark, sf_dir)
        same = sorted(map(tuple, bk.collect())) == \
            sorted(map(tuple, plain_df.collect()))
        noop(bk)  # warm
        out[name] = {
            "bucketed_sec": best(lambda: noop(bk), reps),
            "results_identical_to_plain": same,
        }
    runner.clean()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "TPCH_TAIL.json"))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--bucketed", action="store_true",
                    help="also measure q3/q21 over orderkey-bucketed marts")
    args = ap.parse_args()
    sf_dir = args.dir

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from dbt_demo_spark.queries import CATALOG
    from dbt_demo_spark.session import LOCAL_BENCH_CONF, get_spark
    from dbt_demo_spark.sources.parquet import shared_scans
    from dbt_demo_spark.workload import batch_footprint
    from dbt_demo_spark.queries.tpch2 import tpch_q22_global_sales_opportunity  # noqa: F401

    spark = get_spark(app_name="tpch-tail", shuffle_partitions=8,
                      conf=LOCAL_BENCH_CONF)
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite").save()

    dfs = {n: CATALOG[n].fn(spark, sf_dir) for n in QUERIES}
    # warmup every plan (codegen) + the scan parts and stage plans
    parts = scan_parts(spark, sf_dir)
    stages = stage_plans(spark, sf_dir)
    for df in dfs.values():
        noop(df)
    for ps in parts.values():
        for p in ps:
            noop(p)
    for st in stages.values():
        for p in st.values():
            noop(p)

    result = {"sf_dir": sf_dir, "reps_min_of": args.reps, "queries": {}}
    for name in QUERIES:
        full = best(lambda: noop(dfs[name]), args.reps)
        scan_floor = {f"scan_{i}": best(lambda p=p: noop(p), args.reps)
                      for i, p in enumerate(parts[name])}
        stage_t = {k: best(lambda p=p: noop(p), args.reps)
                   for k, p in stages.get(name, {}).items()}
        footprint = batch_footprint({name: dfs[name]}, sf_dir)
        with shared_scans(spark, sf_dir, footprint):
            inside = CATALOG[name].fn(spark, sf_dir)
            noop(inside)  # populate cache + warm
            shared = best(lambda: noop(inside), args.reps)
        sf_sum = round(sum(scan_floor.values()), 3)
        decode_share = round((full - shared) / full, 3) if full else 0.0
        if decode_share > 0.3:
            verdict = ("DECODE-BOUND: shared-scan workload mode removes "
                       f"{decode_share:.0%} — the measured answer is the "
                       "opt-in SPARK_GRAFT_SHARED_SCAN bench/workload mode")
        elif all(v < 0.15 for v in
                 ([full - sf_sum] if not stage_t else
                  [full - max(stage_t.values())])):
            verdict = ("STAGE-CONSTANTS-BOUND: residual past the largest "
                       "sub-plan is under 0.15s — local-mode stage-launch "
                       "constants, amortized on a cluster")
        else:
            verdict = ("SCAN+STAGE-BOUND: scan floor "
                       f"{sf_sum}s of {full}s; remainder is join/agg "
                       "stage work spread over 2-4 exchanges")
        result["queries"][name] = {
            "full_sec": full,
            "shared_scan_sec": shared,
            "decode_share_removed_by_shared": decode_share,
            "scan_floor_parts_sec": scan_floor,
            "scan_floor_total_sec": sf_sum,
            "stage_buildup_sec": stage_t,
            "verdict": verdict,
        }
        print(name, json.dumps(result["queries"][name], indent=1),
              file=sys.stderr)

    if args.bucketed:
        result["bucketed_layout"] = bucketed_variants(spark, sf_dir,
                                                      args.reps)
        print("bucketed", json.dumps(result["bucketed_layout"], indent=1),
              file=sys.stderr)

    with open(args.out, "w") as f:
        f.write(json.dumps(result, indent=1) + "\n")
    print(json.dumps({k: v["verdict"] for k, v in result["queries"].items()},
                     indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
