"""Physical-plan audits: the scale disciplines the engine claims are
asserted against the actual Catalyst output, so a regression (lost filter
pushdown, accidental cartesian product, de-broadcast dim join) fails CI
instead of surfacing as a 100x slowdown at 100 TB.
"""

from __future__ import annotations

import pytest

from dbt_demo_spark.queries import CATALOG
from tests.conftest import SF_GATE

# the one deliberate cross join: the exact brute-force baseline, broadcast
# nested-loop by construction (documented non-scalable)
CROSSJOIN_OK = {"sim_topk_bruteforce"}


def _plan(spark, name: str) -> str:
    df = CATALOG[name].fn(spark, SF_GATE)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_no_cartesian_product(spark, name):
    """No query may plan a shuffled CartesianProduct — the join key (or a
    broadcast) must always exist.  The brute-force baseline is allowed its
    BroadcastNestedLoopJoin; an actual CartesianProduct is wrong even
    there."""
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name


def test_q6_filters_reach_scan_and_columns_prune(spark):
    """TPC-H Q6 is the pushdown showcase: all predicates must arrive at the
    parquet scan as PushedFilters and the scan must read only the columns
    the query touches (4 of lineitem's 10)."""
    # q6 was demoted from the catalog in r13 (slot funds
    # corpus_bm25_topk); the pushdown showcase stays asserted on the
    # function directly
    from dbt_demo_spark.queries.tpch import tpch_q6_forecast_revenue

    plan = (tpch_q6_forecast_revenue(spark, SF_GATE)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"isnotnull({col}" in plan.lower() or col in plan.split(
            "PushedFilters", 1)[1][:400], col
    read = plan.split("ReadSchema", 1)[1][:300]
    assert "l_extendedprice" in read
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_dim_joins_broadcast(spark):
    """Fixed-size dims (nation/region) must plan as broadcast hash joins in
    the fct model — a sort-merge join on a 25-row dim means the hint (or
    AQE) regressed."""
    plan = _plan(spark, "fct_order_details")
    assert plan.count("BroadcastHashJoin") >= 2


def test_cohort_setops_is_one_shuffle_no_joins(spark):
    """VERDICT r9 item 5: the set-op family reduced to its algebraic core
    — exactly ONE fact-table Exchange (hashpartitioning on o_custkey), a
    metadata-sized SinglePartition gather for the global counts, and no
    join operators at all."""
    plan = _plan(spark, "cohort_setops")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange") <= 2  # + the SinglePartition gather
    assert "Join" not in plan


def test_heavy_hitters_small_route_has_no_arrow_pass(spark):
    """VERDICT r9 item 4: at gate scale text_heavy_hitters routes to the
    one-job naive aggregation — no mapInPandas (Arrow) boundary, no
    broadcast-semi candidate join in the plan."""
    plan = _plan(spark, "text_heavy_hitters")
    assert "MapInPandas" not in plan
    assert "BroadcastHashJoin" not in plan


def test_partitioned_mart_prunes(spark, tmp_path):
    """Month-partitioned marts must show PartitionFilters on filtered reads
    (also covered in test_incremental; kept here as the plan-audit home)."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.core.runner import Runner
    from dbt_demo_spark.models.fiction_bank import REGISTRY
    from dbt_demo_spark.models.seeds import load_seed_dataframes

    rel = Runner(spark, REGISTRY, str(tmp_path / "wh")).run(
        load_seed_dataframes(spark))
    pruned = rel["agg_monthly_loans"].filter(F.col("month") == "2023-02-01")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_mart_month_pruned_catalog_query_prunes(spark):
    """The catalog's mart_month_pruned query (the layout claim under the
    driver gate) must carry the month filter as a PartitionFilter at the
    scan and touch exactly one partition — a data-filter fallback means the
    partitioned layout regressed."""
    plan = _plan(spark, "mart_month_pruned")
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:300]
    assert "month_start" in pf
    # no residual data filter on the partition column after pruning
    assert "PushedFilters: []" in plan


def test_asof_catalog_query_is_join_free(spark):
    """events_asof_enrich must plan as union + one window over the user key
    (operators/asof.py's shape) — any *Join node means the operator
    regressed to a point-vs-point join."""
    plan = _plan(spark, "events_asof_enrich")
    assert "Join" not in plan
    assert "Window" in plan


def test_ngram_jaccard_query_side_broadcasts(spark):
    """The inverted-index join must build on the (small-by-contract) query
    side via an explicit broadcast hint — ADVICE r2: the comment promised a
    broadcast the code didn't request, leaving the exploded corpus free to
    shuffle whenever auto-broadcast declines."""
    plan = _plan(spark, "dedup_ngram_jaccard_guarded")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # exploded corpus must never shuffle-join
    assert "ShuffledHashJoin" not in plan


def test_no_accidental_caching(spark):
    """No catalog query may depend on InMemoryRelation state — results must
    be reproducible from the scans alone."""
    for name in sorted(CATALOG):
        assert "InMemoryRelation" not in _plan(spark, name), name


def test_approx_distinct_optin_accuracy_and_plan(spark):
    """The approx_count_distinct opt-in (functions/approx.py): within the
    declared error band on the real monthly-rollup shape, and its plan
    drops the exact path's Expand + second aggregation exchange — the
    100 TB trade documented for agg_monthly_* (VERDICT r2)."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.functions.approx import distinct_count
    from dbt_demo_spark.sources.parquet import load_table
    from tests.conftest import SF_GATE

    li = load_table(spark, SF_GATE, "lineitem")
    month = F.date_trunc("month", "l_shipdate").cast("date").alias("m")

    def rollup(approx):
        return li.groupBy(month).agg(
            distinct_count("l_orderkey", approx=approx).alias("d"))

    exact = {r.m: r.d for r in rollup(False).collect()}
    approx = {r.m: r.d for r in rollup(True).collect()}
    assert set(exact) == set(approx)
    for m, d in exact.items():
        assert abs(approx[m] - d) <= max(0.08 * d, 2), (m, d, approx[m])

    exact_plan = rollup(False)._jdf.queryExecution().executedPlan().toString()
    approx_plan = rollup(True)._jdf.queryExecution().executedPlan().toString()
    # the exact tax: a shuffle keyed on (group, VALUE) to deduplicate, then
    # the group shuffle; HLL++ keeps sketch state and shuffles once
    assert exact_plan.count("Exchange") == 2
    assert "l_orderkey" in exact_plan.split("Exchange", 2)[2]  # value shuffle
    assert approx_plan.count("Exchange") == 1
    assert approx_plan.count("HashAggregate") < exact_plan.count("HashAggregate")


def test_vocab_topk_uses_take_ordered_not_global_sort(spark):
    """vocab_topk must plan the top-k as TakeOrderedAndProject (per-
    partition k-heaps merged on the driver), never a single-partition sort
    of the FULL vocabulary: a web corpus has billions of distinct tokens.
    The ranking window may only see the k survivors."""
    from dbt_demo_spark.queries.text_filters import vocab_topk
    from tests.conftest import SF_GATE

    plan = (vocab_topk(spark, SF_GATE)._jdf.queryExecution()
            .executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    # no global-sort Exchange feeding a Sort over the aggregated vocab:
    # the only rangepartitioning-free single partition is the k-row window
    assert "rangepartitioning" not in plan.lower()


def test_spread_is_idempotent_on_wide_frames(spark):
    """spread() must be a no-op on frames already at pool width — both the
    second spread in a composed pipeline (the r6 code-review finding: the
    inputFiles()-only guard re-shuffled every derived frame) and a file
    scan already wider than the pool."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.sources.parquet import spread

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    mem = spark.range(1000).coalesce(1).select(F.col("id").alias("doc_id"))
    once = spread(mem, "doc_id")
    assert once.rdd.getNumPartitions() == target
    assert spread(once, "doc_id") is once  # identity, not another exchange


def test_spread_is_idempotent_on_file_backed_composed_pipelines(
        spark, tmp_path):
    """A FILE-BACKED frame derived past a repartition (spread -> transform
    -> spread) still reports the scan's file list via inputFiles(); the
    second spread must not add a redundant exchange on top of the first
    (ADVICE r6 — CollapseRepartition only merges adjacent repartitions)."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.sources.parquet import spread

    path = str(tmp_path / "one_file")
    spark.range(1000).select(F.col("id").alias("doc_id")).coalesce(1) \
        .write.parquet(path)
    scan = spark.read.parquet(path)
    assert len(scan.inputFiles()) == 1
    composed = spread(scan, "doc_id").withColumn(
        "doc_id2", F.col("doc_id") * 2)
    again = spread(composed, "doc_id")
    assert again is composed  # no second exchange
    # AQE prints Final + Initial plans; count only the final section
    plan = again._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, plan


def test_bucketed_mart_join_plans_without_exchange(spark):
    """mart_bucketed_revenue (the r6 bucketed-materialization gate row):
    with broadcast disabled, the fact-to-fact join over the same-key
    same-count bucketed marts must plan with exactly ONE exchange — the
    final 5-group aggregate; the join itself reads co-located buckets."""
    from dbt_demo_spark.queries.reference_surface import mart_bucketed_revenue
    from tests.conftest import SF_GATE

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (mart_bucketed_revenue(spark, SF_GATE)
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_layout_served_tpch_rows_plan_without_fact_shuffle(spark):
    """The r9 layout decision: q3/q18/q21 serve from orderkey-bucketed
    marts, so no FACT-side shuffle may survive — q3/q18 plan with zero
    shuffle exchanges (dims broadcast, group keys contain the bucket key),
    q21 with at most the one tiny final s_name aggregate exchange."""
    import re

    for name, max_shuffles in (("tpch_q3_shipping_priority", 0),
                               ("tpch_q18_large_volume_customer", 0),
                               ("tpch_q21_waiting_suppliers", 1)):
        plan = _plan(spark, name)
        shuffles = len(re.findall(
            r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)",
            plan))
        assert shuffles <= max_shuffles, (name, shuffles, plan[:2000])

    # r11 (the q3 sf1 anomaly): counting shuffle exchanges alone let a
    # broadcast-threshold drift slip through — Catalyst broadcast the
    # FILTERED LINEITEM FACT side, a per-execution multi-MB HashedRelation
    # build (sf1: 1.65s vs DuckDB 0.07).  The merge hints pin the
    # co-located sort-merge join; assert the shape under the DEFAULT
    # (broadcast-enabled) conf: q3's only BroadcastExchange is the
    # customer dim, and the orderkey join is a SortMergeJoin.
    q3_plan = _plan(spark, "tpch_q3_shipping_priority")
    assert "SortMergeJoin" in q3_plan, q3_plan[:2000]
    assert q3_plan.count("BroadcastExchange") == 1, q3_plan[:2000]
    mbr_plan = _plan(spark, "mart_bucketed_revenue")
    assert "SortMergeJoin" in mbr_plan, mbr_plan[:2000]
    assert "BroadcastExchange" not in mbr_plan, mbr_plan[:2000]

def test_r13_mart_served_rows_plan_without_shuffle_exchange(spark):
    """r13 mart adoptions (Q2_RECEIPT / Q11_HOURLY_RECEIPT): q2, q11 and
    events_hourly_rollup serve from bucketed marts whose bucket keys
    satisfy the downstream clustering (partition keys ⊆ group/window
    keys), so NO shuffle exchange may survive in any of the three —
    the per-query plan is scan + map-side work + broadcast dims.
    q11 keeps exactly ONE SinglePartition exchange — the global scalar
    threshold gathers the ~32 per-partition partial sums into one row
    (bytes, not data); no hash/range exchange may appear anywhere."""
    import re

    for name, single_ok in (("tpch_q2_min_cost_supplier", 0),
                            ("tpch_q11_important_parts", 1),
                            ("events_hourly_rollup", 0)):
        plan = _plan(spark, name)
        hashed = len(re.findall(
            r"Exchange (hashpartitioning|rangepartitioning)", plan))
        single = len(re.findall(r"Exchange SinglePartition", plan))
        assert hashed == 0, (name, hashed, plan[:2000])
        assert single <= single_ok, (name, single, plan[:2000])
