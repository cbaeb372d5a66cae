"""Local mirror of the driver's t2 gate: every oracled catalog query must
hash-match its DuckDB oracle on the same parquet inputs (strict value
equality after the queries' own explicit rounding, arrow types compared).

Runs at SF_GATE (sf0.01) — the driver's own scale — because round 1 proved
sf0.001 can green-light queries that fail at gate scale."""

from __future__ import annotations

import pytest

from dbt_demo_spark.queries import CATALOG
from dbt_demo_spark.testing import compare, duckdb_connection
from tests.conftest import SF_GATE

ORACLED = sorted(n for n, s in CATALOG.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def con():
    return duckdb_connection(SF_GATE)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, con, name):
    spec = CATALOG[name]
    res = compare(name, spec.fn(spark, SF_GATE), con, spec.oracle)
    assert res.ok, f"{name}: {res.detail}"


def test_demoted_queries_still_match_oracle(spark, con):
    """Queries displaced from the 50-entry catalog (the driver checks at
    most 50) keep their DuckDB differential here so correctness never
    lapses: stg_orders (slot funds events_asof_enrich, r4),
    text_token_count (slot funds mart_month_pruned, r4),
    tpch_q19 (slot funds text_repetition, r5),
    tpch_q12 (slot funds corpus_decontamination, r5),
    tpch_q20 (slot funds mart_bucketed_revenue, r6),
    tpch_q22 (slot funds corpus_shard_census, r7),
    tpch_q14 (slot funds cube_pricing_levels, r8),
    tpch_q17 (slot funds sim_topk_pq, r8),
    tpch_q7 (slot funds text_heavy_hitters, r9),
    tpch_q15 (slot funds events_range_join, r9),
    tpch_q13 (slot funds text_lm_quality, r9),
    tpch_q10 (slot funds events_pivot_daily, r9),
    tpch_q4 (slot funds events_gapfill_ffill, r9),
    tpch_q5 (slot funds dedup_passage_exact, r9),
    tpch_q16 (slot funds sim_topk_pq_residual, r10),
    tpch_q6 (slot funds corpus_bm25_topk, r13), and
    tpch_q1 (slot funds corpus_quality_classifier, r14)."""
    from dbt_demo_spark.queries.llm_pipeline import (TEXT_TOKEN_COUNT_ORACLE,
                                                     text_token_count)
    from dbt_demo_spark.queries.reference_surface import (STG_ORDERS_ORACLE,
                                                          stg_orders)
    from dbt_demo_spark.queries.text_filters import (
        CORPUS_LENGTH_QUANTILES_ORACLE, STRATIFIED_SAMPLE_ORACLE,
        corpus_length_quantiles, corpus_stratified_sample)
    from dbt_demo_spark.queries.tpch import (TPCH_Q1_ORACLE, TPCH_Q4_ORACLE,
                                             TPCH_Q5_ORACLE, TPCH_Q6_ORACLE,
                                             TPCH_Q10_ORACLE,
                                             tpch_q1_pricing_summary,
                                             tpch_q4_late_orders,
                                             tpch_q5_local_supplier_volume,
                                             tpch_q6_forecast_revenue,
                                             tpch_q10_returned_items)
    from dbt_demo_spark.queries.tpch2 import (
        TPCH_Q7_ORACLE, TPCH_Q12_ORACLE, TPCH_Q13_ORACLE, TPCH_Q14_ORACLE,
        TPCH_Q15_ORACLE, TPCH_Q16_ORACLE, TPCH_Q17_ORACLE, TPCH_Q19_ORACLE,
        TPCH_Q20_ORACLE, TPCH_Q22_ORACLE, tpch_q7_volume_shipping,
        tpch_q12_priority_shipping, tpch_q13_customer_distribution,
        tpch_q14_promo_revenue, tpch_q15_top_supplier,
        tpch_q16_supplier_part_counts, tpch_q17_small_quantity_revenue,
        tpch_q19_discounted_revenue, tpch_q20_part_promotion,
        tpch_q22_global_sales_opportunity)

    for fn, oracle in ((stg_orders, STG_ORDERS_ORACLE),
                       (text_token_count, TEXT_TOKEN_COUNT_ORACLE),
                       (tpch_q19_discounted_revenue, TPCH_Q19_ORACLE),
                       (tpch_q12_priority_shipping, TPCH_Q12_ORACLE),
                       (tpch_q20_part_promotion, TPCH_Q20_ORACLE),
                       (tpch_q22_global_sales_opportunity, TPCH_Q22_ORACLE),
                       (tpch_q14_promo_revenue, TPCH_Q14_ORACLE),
                       (tpch_q17_small_quantity_revenue, TPCH_Q17_ORACLE),
                       (tpch_q16_supplier_part_counts, TPCH_Q16_ORACLE),
                       (tpch_q7_volume_shipping, TPCH_Q7_ORACLE),
                       (tpch_q15_top_supplier, TPCH_Q15_ORACLE),
                       (tpch_q13_customer_distribution, TPCH_Q13_ORACLE),
                       (tpch_q10_returned_items, TPCH_Q10_ORACLE),
                       (tpch_q4_late_orders, TPCH_Q4_ORACLE),
                       (tpch_q6_forecast_revenue, TPCH_Q6_ORACLE),
                       (tpch_q1_pricing_summary, TPCH_Q1_ORACLE),
                       (tpch_q5_local_supplier_volume, TPCH_Q5_ORACLE),
                       (corpus_length_quantiles,
                        CORPUS_LENGTH_QUANTILES_ORACLE),
                       (corpus_stratified_sample,
                        STRATIFIED_SAMPLE_ORACLE)):
        res = compare(fn.__name__, fn(spark, SF_GATE), con, oracle)
        assert res.ok, f"{fn.__name__}: {res.detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
    # the driver checks at most 50 catalog entries in registration order;
    # entry #51 would be silently un-gated (round 2 shipped 53 and the last
    # 3 went unchecked) — adding a query MUST displace one
    assert len(e.queries()) <= 50, "catalog exceeds the driver's 50-entry window"
