"""Semantic-layer-lite (core/metrics.py): MetricFlow-shaped YAML compiled
to one Spark aggregation, DuckDB-differentialed on the orders table."""

from __future__ import annotations

import pytest

from dbt_demo_spark.core.metrics import parse_metric_layer
from dbt_demo_spark.sources.parquet import load_table
from dbt_demo_spark.testing import compare, duckdb_connection
from tests.conftest import SF_GATE

LAYER_YAML = """
semantic_models:
  - name: orders_sm
    model: ref('orders')
    dimensions:
      - name: order_month
        type: time
        expr: o_orderdate
        type_params: {time_granularity: month}
      - name: priority
        type: categorical
        expr: o_orderpriority
    measures:
      - name: order_total_units
        agg: sum
        expr: cast(floor(o_totalprice * 100 + 0.5) as bigint)
      - name: n_orders
        agg: count
        expr: 1
      - name: n_customers
        agg: count_distinct
        expr: o_custkey
metrics:
  - name: revenue_units
    type: simple
    type_params: {measure: order_total_units}
  - name: order_count
    type: simple
    type_params: {measure: n_orders}
  - name: urgent_orders
    type: simple
    type_params: {measure: n_orders}
    filter: "o_orderpriority = '1-URGENT'"
  - name: active_customers
    type: simple
    type_params: {measure: n_customers}
  - name: avg_units_per_order
    type: derived
    type_params: {expr: revenue_units / order_count}
"""


@pytest.fixture(scope="module")
def layer():
    return parse_metric_layer(LAYER_YAML)


def test_grouped_metrics_match_duckdb(spark, layer):
    """Simple + filtered + derived metrics grouped by a time dim at month
    grain — hash-identical to the hand-written DuckDB SQL."""
    rels = {"orders": load_table(spark, SF_GATE, "orders")}
    out = layer.query(rels,
                      ["revenue_units", "order_count", "urgent_orders",
                       "avg_units_per_order"],
                      group_by=["order_month"], grain="month")
    con = duckdb_connection(SF_GATE)
    r = compare("metrics_monthly", out, con, """
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                   AS order_month,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_units,
               COUNT(*) AS order_count,
               COUNT(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN 1 END) AS urgent_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) * 1.0 / COUNT(*) AS avg_units_per_order
        FROM orders GROUP BY 1
    """)
    assert r.ok, r.detail


def test_ungrouped_and_categorical_dim(spark, layer):
    rels = {"orders": load_table(spark, SF_GATE, "orders")}
    total = layer.query(rels, ["order_count"]).first().order_count
    assert total == rels["orders"].count()
    by_prio = layer.query(rels, ["active_customers"],
                          group_by=["priority"])
    con = duckdb_connection(SF_GATE)
    r = compare("metrics_prio", by_prio, con, """
        SELECT o_orderpriority AS priority,
               COUNT(DISTINCT o_custkey) AS active_customers
        FROM orders GROUP BY 1
    """)
    assert r.ok, r.detail


def test_lite_scope_raises(spark, layer):
    with pytest.raises(ValueError, match="unknown metric"):
        layer.query({}, ["ghost"])
    with pytest.raises(ValueError, match="unknown dimension"):
        layer.query({"orders": load_table(spark, SF_GATE, "orders")},
                    ["order_count"], group_by=["ghost_dim"])
    with pytest.raises(ValueError, match="unsupported agg"):
        parse_metric_layer("""
semantic_models:
  - name: s
    model: ref('t')
    measures: [{name: m, agg: median}]
""")
    with pytest.raises(ValueError, match="needs a measure"):
        parse_metric_layer("metrics: [{name: x, type: simple}]")


def test_saved_query_names_a_reusable_request(spark):
    layer = parse_metric_layer(LAYER_YAML + """
saved_queries:
  - name: monthly_kpis
    query_params:
      metrics: [revenue_units, order_count]
      group_by: [order_month]
      grain: month
""")
    rels = {"orders": load_table(spark, SF_GATE, "orders")}
    saved = layer.run_saved("monthly_kpis", rels)
    direct = layer.query(rels, ["revenue_units", "order_count"],
                         group_by=["order_month"], grain="month")
    assert sorted(map(tuple, saved.collect())) == \
        sorted(map(tuple, direct.collect()))
    with pytest.raises(ValueError, match="unknown saved query"):
        layer.run_saved("ghost", rels)


def test_one_shuffle_plan(spark, layer):
    """The compiled question is ONE aggregation: a single hash exchange
    (plus AQE bookkeeping), no joins, no per-metric scans."""
    rels = {"orders": load_table(spark, SF_GATE, "orders")}
    out = layer.query(rels, ["revenue_units", "urgent_orders"],
                      group_by=["order_month"], grain="month")
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
