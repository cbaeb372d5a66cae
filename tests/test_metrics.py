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


# ----------------------------------------- X84 cross-model metrics ----

CROSS_YAML = """
semantic_models:
  - name: orders_sm
    model: ref('orders')
    entities:
      - name: order
        type: primary
        expr: o_orderkey
    dimensions:
      - name: order_month
        type: time
        expr: o_orderdate
        type_params: {time_granularity: month}
    measures:
      - name: order_total_units
        agg: sum
        expr: cast(floor(o_totalprice * 100 + 0.5) as bigint)
  - name: shipments_sm
    model: ref('lineitem')
    entities:
      - name: order
        type: foreign
        expr: l_orderkey
    dimensions:
      - name: order_month
        type: time
        expr: l_shipdate
        type_params: {time_granularity: month}
    measures:
      - name: shipped_units
        agg: sum
        expr: cast(floor(l_extendedprice * 100 + 0.5) as bigint)
metrics:
  - name: revenue_units
    type: simple
    type_params: {measure: order_total_units}
  - name: shipped_units_m
    type: simple
    type_params: {measure: shipped_units}
  - name: ship_ratio
    type: derived
    type_params: {expr: shipped_units_m / cast(revenue_units as double)}
"""


def test_cross_model_metrics_match_duckdb(spark):
    """X84 done-criterion: a metric set spanning two semantic models
    that share an entity compiles to one aggregation per model + ONE
    full-outer join of the aggregated frames; DuckDB hash-match."""
    layer = parse_metric_layer(CROSS_YAML)
    assert "order" in layer.semantic_models["orders_sm"].entities
    rels = {"orders": load_table(spark, SF_GATE, "orders"),
            "lineitem": load_table(spark, SF_GATE, "lineitem")}
    out = layer.query(
        rels, ["revenue_units", "shipped_units_m", "ship_ratio"],
        group_by=["order_month"], grain="month")
    con = duckdb_connection(SF_GATE)
    r = compare("metrics_cross", out, con, """
        WITH o AS (
            SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS m,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS revenue_units
            FROM orders GROUP BY 1
        ),
        s AS (
            SELECT CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS m,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS shipped_units_m
            FROM lineitem GROUP BY 1
        )
        SELECT COALESCE(o.m, s.m) AS order_month,
               o.revenue_units,
               s.shipped_units_m,
               s.shipped_units_m / CAST(o.revenue_units AS DOUBLE)
                   AS ship_ratio
        FROM o FULL OUTER JOIN s ON o.m = s.m
    """)
    assert r.ok, r.detail

    # plan assert: exactly ONE join, of AGGREGATED (tiny) sides
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    import re as _re
    assert len(_re.findall(r"\bJoin\b|SortMergeJoin|BroadcastHashJoin",
                           plan)) <= 2, plan  # one join node +- its tag
    assert plan.count("FullOuter") == 1, plan


def test_cross_model_lite_errors(spark):
    """Unjoinable sets still raise: no shared entity, and >2 models."""
    layer = parse_metric_layer(CROSS_YAML.replace(
        "      - name: order\n        type: foreign\n"
        "        expr: l_orderkey\n", ""))
    rels = {"orders": load_table(spark, SF_GATE, "orders"),
            "lineitem": load_table(spark, SF_GATE, "lineitem")}
    with pytest.raises(ValueError, match="share no"):
        layer.query(rels, ["revenue_units", "shipped_units_m"],
                    group_by=["order_month"], grain="month")


# ------------------------------------- X90 ratio + cumulative metrics ----

_X90_YAML = LAYER_YAML + """
  - name: urgent_share
    type: ratio
    type_params: {numerator: urgent_orders, denominator: order_count}
  - name: revenue_to_date
    type: cumulative
    type_params: {measure: order_total_units}
  - name: revenue_trailing_3m
    type: cumulative
    type_params: {measure: order_total_units, window: 3 months}
"""


@pytest.fixture(scope="module")
def layer90():
    return parse_metric_layer(_X90_YAML)


def test_ratio_metric_matches_duckdb(spark, layer90):
    """ratio = numerator / denominator post-aggregation; constituents
    need not be requested."""
    rels = {"orders": load_table(spark, SF_GATE, "orders")}
    out = layer90.query(rels, ["urgent_share"],
                        group_by=["order_month"], grain="month")
    con = duckdb_connection(SF_GATE)
    r = compare("metrics_ratio", out, con, """
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                   AS order_month,
               CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN 1 END) AS DOUBLE) / COUNT(*)
                   AS urgent_share
        FROM orders GROUP BY 1
    """)
    assert r.ok, r.detail


def test_cumulative_metrics_match_duckdb(spark, layer90):
    """Unbounded running total and a trailing 3-month window, each as
    ONE window function over the aggregated month frame — DuckDB twin
    written with the same window semantics (RANGE over a month index,
    so calendar gaps age out correctly)."""
    rels = {"orders": load_table(spark, SF_GATE, "orders")}
    out = layer90.query(
        rels, ["revenue_to_date", "revenue_trailing_3m"],
        group_by=["order_month", "priority"], grain="month")
    con = duckdb_connection(SF_GATE)
    r = compare("metrics_cumulative", out, con, """
        WITH grain AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                       AS order_month,
                   o_orderpriority AS priority,
                   SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS bucket_units
            FROM orders GROUP BY 1, 2
        )
        SELECT order_month, priority,
               CAST(SUM(bucket_units) OVER (
                   PARTITION BY priority ORDER BY order_month
                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS revenue_to_date,
               CAST(SUM(bucket_units) OVER (
                   PARTITION BY priority
                   ORDER BY YEAR(order_month) * 12 + MONTH(order_month)
                   RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS revenue_trailing_3m
        FROM grain
    """)
    assert r.ok, r.detail


def test_x90_error_matrix(spark, layer90):
    rels = {"orders": load_table(spark, SF_GATE, "orders")}
    # cumulative needs exactly one time dim in group_by
    with pytest.raises(ValueError, match="exactly ONE time dimension"):
        layer90.query(rels, ["revenue_to_date"], group_by=["priority"])
    # window unit must equal the query grain
    with pytest.raises(ValueError, match="must equal the query grain"):
        layer90.query(rels, ["revenue_trailing_3m"],
                      group_by=["order_month"], grain="day")
    # count_distinct partials cannot accumulate
    bad = parse_metric_layer(_X90_YAML + """
  - name: cum_customers
    type: cumulative
    type_params: {measure: n_customers}
""")
    with pytest.raises(ValueError, match="cannot accumulate"):
        bad.query(rels, ["cum_customers"],
                  group_by=["order_month"], grain="month")
    # parse errors
    with pytest.raises(ValueError, match="needs numerator"):
        parse_metric_layer(
            "metrics:\n  - name: r\n    type: ratio\n")
    with pytest.raises(ValueError, match="needs a measure"):
        parse_metric_layer(
            "metrics:\n  - name: c\n    type: cumulative\n")
    # ratio legs must be simple metrics
    bad2 = parse_metric_layer(_X90_YAML + """
  - name: bad_ratio
    type: ratio
    type_params: {numerator: avg_units_per_order,
                  denominator: order_count}
""")
    with pytest.raises(ValueError, match="must be a defined SIMPLE"):
        bad2.query(rels, ["bad_ratio"], group_by=["order_month"],
                   grain="month")


# ----------------------------------------- X93 conversion metrics ----

_CONV_YAML = """
semantic_models:
  - name: events_sm
    model: ref('events')
    entities:
      - name: user
        expr: user_id
    dimensions:
      - name: event_month
        type: time
        expr: ts
        type_params: {time_granularity: month}
    measures:
      - name: n_events
        agg: count
        expr: 1
metrics:
  - name: view_to_purchase_7d
    type: conversion
    filter: "event_type = 'view'"
    type_params:
      entity: user
      calculation: conversion_rate
      base_measure: n_events
      conversion_measure: n_events
      conversion_filter: "event_type = 'purchase'"
      window: 7 days
  - name: view_conversions_ever
    type: conversion
    filter: "event_type = 'view'"
    type_params:
      entity: user
      calculation: conversions
      base_measure: n_events
      conversion_measure: n_events
      conversion_filter: "event_type = 'purchase'"
"""

# opt-out YAML: metric 1 gets the attribution line after its window;
# metric 2 (last block in the doc) gets it appended at the end
_CONV_YAML_UNATTR = (_CONV_YAML.replace(
    "      window: 7 days",
    "      window: 7 days\n      attribution: unattributed")
    + "      attribution: unattributed\n")

# the r13 deviation under its honest r14 name (earliest base event,
# counts distinct attributed base events)
_CONV_YAML_EARLIEST = (_CONV_YAML.replace(
    "      window: 7 days",
    "      window: 7 days\n      attribution: earliest_touch")
    + "      attribution: earliest_touch\n")

# the pre-r13 lite semantics (attribution: unattributed): EXISTS —
# every base event with >= 1 in-window conversion counts
_CONV_ORACLE = """
    WITH base AS (
        SELECT user_id, ts,
               CAST(date_trunc('month', ts) AS DATE) AS event_month
        FROM events WHERE event_type = 'view'
    ), conv AS (
        SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT event_month,
           {select}
    FROM base b GROUP BY 1
"""

# last_touch (the r14 default, MetricFlow semantics — ADVICE r13):
# each conversion EVENT attributes to the MOST RECENT in-window base
# event (ties on base ts broken by the largest dim tuple), dims come
# from that base event, and the metric counts attributed conversion
# events — duplicate identical conversion rows each count (cid gives
# every conversion row its own identity, MetricFlow's per-row uuid)
_CONV_LT_ORACLE = """
    WITH base AS (
        SELECT user_id, ts,
               CAST(date_trunc('month', ts) AS DATE) AS event_month
        FROM events WHERE event_type = 'view'
    ), conv AS (
        SELECT user_id, ts, ROW_NUMBER() OVER () AS cid
        FROM events WHERE event_type = 'purchase'
    ), pairs AS (
        SELECT c.cid, b.ts AS bts, b.event_month,
               ROW_NUMBER() OVER (PARTITION BY c.cid
                                  ORDER BY b.ts DESC,
                                           b.event_month DESC) AS rn
        FROM conv c JOIN base b
          ON b.user_id = c.user_id AND c.ts >= b.ts {window_pred}
    ), conv_counts AS (
        SELECT event_month, COUNT(*) AS n_conv FROM pairs
        WHERE rn = 1 GROUP BY 1
    ), totals AS (
        SELECT event_month, COUNT(*) AS n_base FROM base GROUP BY 1
    )
    SELECT t.event_month AS event_month, {select}
    FROM totals t LEFT JOIN conv_counts c USING (event_month)
"""

# earliest_touch (the r13 deviation, renamed): each conversion event
# attributes to the earliest in-window base event (ties on base ts
# broken by the dim tuple), a base event counts once, duplicate
# identical base rows collapse
_CONV_ET_ORACLE = """
    WITH base AS (
        SELECT user_id, ts,
               CAST(date_trunc('month', ts) AS DATE) AS event_month
        FROM events WHERE event_type = 'view'
    ), conv AS (
        SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ), pairs AS (
        SELECT c.user_id, c.ts AS cts, b.ts AS bts, b.event_month,
               ROW_NUMBER() OVER (PARTITION BY c.user_id, c.ts
                                  ORDER BY b.ts, b.event_month) AS rn
        FROM conv c JOIN base b
          ON b.user_id = c.user_id AND c.ts >= b.ts {window_pred}
    ), attributed AS (
        SELECT DISTINCT user_id, bts, event_month FROM pairs WHERE rn = 1
    ), conv_counts AS (
        SELECT event_month, COUNT(*) AS n_conv FROM attributed GROUP BY 1
    ), totals AS (
        SELECT event_month, COUNT(*) AS n_base FROM base GROUP BY 1
    )
    SELECT t.event_month AS event_month, {select}
    FROM totals t LEFT JOIN conv_counts c USING (event_month)
"""


def test_conversion_rate_matches_duckdb(spark):
    """last_touch default (MetricFlow semantics): the rate twin uses
    per-conversion-event ROW_NUMBER(... ORDER BY base ts DESC)
    attribution in DuckDB, counting conversion events."""
    layer = parse_metric_layer(_CONV_YAML)
    assert layer.metrics["view_to_purchase_7d"].attribution == \
        "last_touch"
    rels = {"events": load_table(spark, SF_GATE, "events")}
    out = layer.query(rels, ["view_to_purchase_7d"],
                      group_by=["event_month"], grain="month")
    con = duckdb_connection(SF_GATE)
    r = compare("metrics_conversion_rate", out, con,
                _CONV_LT_ORACLE.format(
                    window_pred="AND c.ts <= b.ts + INTERVAL 7 DAY",
                    select=("CAST(COALESCE(c.n_conv, 0) AS DOUBLE) "
                            "/ t.n_base AS view_to_purchase_7d")))
    assert r.ok, r.detail


def test_conversion_earliest_touch_matches_duckdb(spark):
    """attribution: earliest_touch keeps the r13 behavior (earliest
    base, distinct attributed base events) under its honest name."""
    layer = parse_metric_layer(_CONV_YAML_EARLIEST)
    assert layer.metrics["view_to_purchase_7d"].attribution == \
        "earliest_touch"
    rels = {"events": load_table(spark, SF_GATE, "events")}
    con = duckdb_connection(SF_GATE)
    out = layer.query(rels, ["view_to_purchase_7d"],
                      group_by=["event_month"], grain="month")
    r = compare("metrics_conv_rate_earliest", out, con,
                _CONV_ET_ORACLE.format(
                    window_pred="AND c.ts <= b.ts + INTERVAL 7 DAY",
                    select=("CAST(COALESCE(c.n_conv, 0) AS DOUBLE) "
                            "/ t.n_base AS view_to_purchase_7d")))
    assert r.ok, r.detail
    out = layer.query(rels, ["view_conversions_ever"],
                      group_by=["event_month"], grain="month")
    r = compare("metrics_conv_counts_earliest", out, con,
                _CONV_ET_ORACLE.format(
                    window_pred="",
                    select=("CAST(COALESCE(c.n_conv, 0) AS BIGINT) "
                            "AS view_conversions_ever")))
    assert r.ok, r.detail


def test_conversion_counts_match_duckdb(spark):
    layer = parse_metric_layer(_CONV_YAML)
    rels = {"events": load_table(spark, SF_GATE, "events")}
    out = layer.query(rels, ["view_conversions_ever"],
                      group_by=["event_month"], grain="month")
    con = duckdb_connection(SF_GATE)
    r = compare("metrics_conversions", out, con,
                _CONV_LT_ORACLE.format(
                    window_pred="",
                    select=("CAST(COALESCE(c.n_conv, 0) AS BIGINT) "
                            "AS view_conversions_ever")))
    assert r.ok, r.detail


def test_conversion_unattributed_optout_matches_duckdb(spark):
    """attribution: unattributed keeps the pre-r13 lite semantics
    (EXISTS — one conversion event may convert several base events),
    pinned against the original DuckDB twins."""
    layer = parse_metric_layer(_CONV_YAML_UNATTR)
    assert layer.metrics["view_to_purchase_7d"].attribution == \
        "unattributed"
    assert layer.metrics["view_conversions_ever"].attribution == \
        "unattributed"
    rels = {"events": load_table(spark, SF_GATE, "events")}
    con = duckdb_connection(SF_GATE)
    out = layer.query(rels, ["view_to_purchase_7d"],
                      group_by=["event_month"], grain="month")
    r = compare("metrics_conv_rate_unattr", out, con,
                _CONV_ORACLE.format(select="""
           CAST(COUNT(CASE WHEN EXISTS (
                    SELECT 1 FROM conv c
                    WHERE c.user_id = b.user_id AND c.ts >= b.ts
                      AND c.ts <= b.ts + INTERVAL 7 DAY) THEN 1 END)
                AS DOUBLE) / COUNT(*) AS view_to_purchase_7d"""))
    assert r.ok, r.detail
    out = layer.query(rels, ["view_conversions_ever"],
                      group_by=["event_month"], grain="month")
    r = compare("metrics_conv_counts_unattr", out, con,
                _CONV_ORACLE.format(select="""
           COUNT(CASE WHEN EXISTS (
                    SELECT 1 FROM conv c
                    WHERE c.user_id = b.user_id AND c.ts >= b.ts)
                 THEN 1 END) AS view_conversions_ever"""))
    assert r.ok, r.detail


def test_conversion_attribution_modes_differ(spark):
    """ADVICE r13 medium, the exact divergence frame: TWO purchases in
    one view's window.  last_touch (MetricFlow) counts conversion
    EVENTS → 2 (rate 2.0 — MetricFlow rates can exceed 1);
    earliest_touch counts distinct attributed BASE events → 1;
    unattributed counts base events with >= 1 in-window conversion
    → 1."""
    import datetime as _dt

    def rate_and_count(yaml_text, df):
        layer = parse_metric_layer(yaml_text)
        r = layer.query({"events": df}, ["view_to_purchase_7d"],
                        group_by=["event_month"],
                        grain="month").collect()[0].view_to_purchase_7d
        c = layer.query({"events": df}, ["view_conversions_ever"],
                        group_by=["event_month"],
                        grain="month").collect()[0].view_conversions_ever
        return r, c

    two_conv = spark.createDataFrame(
        [(7, "view", _dt.datetime(2024, 3, 1, 10)),
         (7, "purchase", _dt.datetime(2024, 3, 2, 10)),
         (7, "purchase", _dt.datetime(2024, 3, 3, 10))],
        "user_id long, event_type string, ts timestamp")
    assert rate_and_count(_CONV_YAML, two_conv) == (2.0, 2)
    assert rate_and_count(_CONV_YAML_EARLIEST, two_conv) == (1.0, 1)
    assert rate_and_count(_CONV_YAML_UNATTR, two_conv) == (1.0, 1)

    # one purchase in the window of TWO views: the attributed modes
    # agree on the count (1) but pick different base events; the
    # unattributed opt-out converts both views
    two_base = spark.createDataFrame(
        [(7, "view", _dt.datetime(2024, 3, 1, 10)),
         (7, "view", _dt.datetime(2024, 3, 2, 10)),
         (7, "purchase", _dt.datetime(2024, 3, 3, 10))],
        "user_id long, event_type string, ts timestamp")
    assert rate_and_count(_CONV_YAML, two_base) == (0.5, 1)
    assert rate_and_count(_CONV_YAML_EARLIEST, two_base) == (0.5, 1)
    assert rate_and_count(_CONV_YAML_UNATTR, two_base) == (1.0, 2)

    # duplicate identical base rows + same-timestamp conversion: one
    # conversion event attributes once under both attributed modes
    # (earliest_touch additionally collapses the duplicate bases)
    dup_base = spark.createDataFrame(
        [(9, "view", _dt.datetime(2024, 3, 1, 12)),
         (9, "view", _dt.datetime(2024, 3, 1, 12)),
         (9, "purchase", _dt.datetime(2024, 3, 1, 12))],
        "user_id long, event_type string, ts timestamp")
    for yaml_text, want in ((_CONV_YAML, 1), (_CONV_YAML_EARLIEST, 1),
                            (_CONV_YAML_UNATTR, 2)):
        got = parse_metric_layer(yaml_text).query(
            {"events": dup_base}, ["view_conversions_ever"],
            group_by=["event_month"], grain="month").collect()
        assert got[0].view_conversions_ever == want, yaml_text

    # duplicate identical CONVERSION rows: last_touch counts each
    # conversion event (MetricFlow's per-row identity), earliest_touch
    # still counts the single attributed base
    dup_conv = spark.createDataFrame(
        [(9, "view", _dt.datetime(2024, 3, 1, 12)),
         (9, "purchase", _dt.datetime(2024, 3, 2, 12)),
         (9, "purchase", _dt.datetime(2024, 3, 2, 12))],
        "user_id long, event_type string, ts timestamp")
    for yaml_text, want in ((_CONV_YAML, 2), (_CONV_YAML_EARLIEST, 1)):
        got = parse_metric_layer(yaml_text).query(
            {"events": dup_conv}, ["view_conversions_ever"],
            group_by=["event_month"], grain="month").collect()
        assert got[0].view_conversions_ever == want, yaml_text

    # bad attribution value raises at parse
    with pytest.raises(ValueError, match="last_touch | earliest_touch"):
        parse_metric_layer(_CONV_YAML.replace(
            "window: 7 days",
            "window: 7 days\n      attribution: linear"))

    # the r13 name is a hard migration error, never a silent reparse
    with pytest.raises(ValueError, match="renamed"):
        parse_metric_layer(_CONV_YAML.replace(
            "window: 7 days",
            "window: 7 days\n      attribution: first_touch"))


def test_conversion_error_matrix(spark):
    layer = parse_metric_layer(_CONV_YAML)
    rels = {"events": load_table(spark, SF_GATE, "events")}
    # conversion metrics compile alone
    with pytest.raises(ValueError, match="by itself"):
        layer.query(rels, ["view_to_purchase_7d",
                           "view_conversions_ever"],
                    group_by=["event_month"], grain="month")
    with pytest.raises(ValueError, match="needs entity"):
        parse_metric_layer("""
metrics:
  - name: broken
    type: conversion
    type_params: {calculation: conversions}
""")
    bad = parse_metric_layer(_CONV_YAML.replace(
        "calculation: conversion_rate", "calculation: pct"))
    with pytest.raises(ValueError, match="conversions | conversion_rate"):
        bad.query(rels, ["view_to_purchase_7d"],
                  group_by=["event_month"], grain="month")


def test_conversion_plan_is_entity_keyed(spark):
    """The range predicate rides the entity equi-join — never a
    cartesian or nested-loop plan (the 100 TB shape), in BOTH
    attribution modes.  last_touch's candidate-pair join is an inner
    equi-join; unattributed keeps the left-semi."""
    rels = {"events": load_table(spark, SF_GATE, "events")}
    for yaml_text, marker in ((_CONV_YAML, "Inner"),
                              (_CONV_YAML_UNATTR, "LeftSemi")):
        layer = parse_metric_layer(yaml_text)
        out = layer.query(rels, ["view_to_purchase_7d"],
                          group_by=["event_month"], grain="month")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, marker
        assert "BroadcastNestedLoopJoin" not in plan, marker
        assert marker in plan, plan[:2000]


def test_grain_to_date_cumulative_matches_duckdb(spark):
    """X90 extension: grain_to_date resets the running total at each
    boundary (month-to-date at day grain) — DuckDB twin partitions the
    window by the truncated month."""
    layer = parse_metric_layer(LAYER_YAML + """
  - name: revenue_mtd
    type: cumulative
    type_params: {measure: order_total_units, grain_to_date: month}
""")
    rels = {"orders": load_table(spark, SF_GATE, "orders")}
    out = layer.query(rels, ["revenue_mtd"],
                      group_by=["order_month"], grain="day")
    con = duckdb_connection(SF_GATE)
    r = compare("metrics_mtd", out, con, """
        WITH grain AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS DATE)
                       AS order_month,
                   SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS bucket_units
            FROM orders GROUP BY 1
        )
        SELECT order_month,
               CAST(SUM(bucket_units) OVER (
                   PARTITION BY date_trunc('month', order_month)
                   ORDER BY order_month
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS revenue_mtd
        FROM grain
    """)
    assert r.ok, r.detail
    # window and grain_to_date are mutually exclusive; bad grain raises
    bad = parse_metric_layer(LAYER_YAML + """
  - name: broken
    type: cumulative
    type_params: {measure: order_total_units, grain_to_date: month,
                  window: 3 months}
""")
    with pytest.raises(ValueError, match="mutually exclusive"):
        bad.query(rels, ["broken"], group_by=["order_month"],
                  grain="day")
    bad2 = parse_metric_layer(LAYER_YAML + """
  - name: broken2
    type: cumulative
    type_params: {measure: order_total_units, grain_to_date: fortnight}
""")
    with pytest.raises(ValueError, match="fortnight"):
        bad2.query(rels, ["broken2"], group_by=["order_month"],
                   grain="day")


def test_conversion_same_timestamp_counts(spark):
    """ADVICE r11: MetricFlow's conversion window is INCLUSIVE of the
    base timestamp — a purchase logged at the exact instant of the view
    converts it.  Pinned with a two-row frame where the strict `>` of
    r11 produced 0.0."""
    import datetime as _dt

    rows = [(7, "view", _dt.datetime(2024, 3, 1, 12, 0, 0)),
            (7, "purchase", _dt.datetime(2024, 3, 1, 12, 0, 0))]
    df = spark.createDataFrame(rows, "user_id long, event_type string, "
                                     "ts timestamp")
    layer = parse_metric_layer(_CONV_YAML)
    out = layer.query({"events": df}, ["view_to_purchase_7d"],
                      group_by=["event_month"], grain="month")
    [(month, rate)] = [(r.event_month, r.view_to_purchase_7d)
                       for r in out.collect()]
    assert month == _dt.date(2024, 3, 1)
    assert rate == 1.0


def test_fill_nulls_and_timespine(spark):
    """X100 [public MetricFlow surface: measure-input fill_nulls_with +
    join_to_timespine on simple metrics]: a month with no qualifying
    rows appears as an explicit row with the declared fill literal —
    hash-matched against a DuckDB generate_series spine twin."""
    import datetime as _dt

    yaml_text = """
semantic_models:
  - name: events_sm
    model: ref('events')
    dimensions:
      - name: event_month
        type: time
        expr: ts
        type_params: {time_granularity: month}
    measures:
      - name: n_purchases
        agg: count
        expr: 1
metrics:
  - name: purchases
    type: simple
    filter: "event_type = 'purchase'"
    type_params:
      measure:
        name: n_purchases
        fill_nulls_with: 0
        join_to_timespine: true
"""
    rows = [(1, "purchase", _dt.datetime(2024, 1, 5)),
            (1, "view",     _dt.datetime(2024, 2, 10)),   # gap month
            (2, "purchase", _dt.datetime(2024, 3, 20)),
            (2, "purchase", _dt.datetime(2024, 3, 21))]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp")
    layer = parse_metric_layer(yaml_text)
    out = layer.query({"events": df}, ["purchases"],
                      group_by=["event_month"], grain="month")
    got = {(str(r.event_month), r.purchases) for r in out.collect()}
    # NOTE the spine bounds are the AGGREGATED frame's min/max: the
    # filter keeps only purchase months (Jan, Mar), and the spine fills
    # Feb BETWEEN them with an explicit zero
    assert got == {("2024-01-01", 1), ("2024-02-01", 0),
                   ("2024-03-01", 2)}

    # error matrix
    import pytest as _pytest
    with _pytest.raises(ValueError, match="exactly ONE time dimension"):
        layer.query({"events": df}, ["purchases"], group_by=[],
                    grain="month")
    with _pytest.raises(ValueError, match="SIMPLE metrics"):
        parse_metric_layer(yaml_text.replace(
            "type: simple", "type: cumulative"))
    with _pytest.raises(ValueError, match="numeric literal"):
        parse_metric_layer(yaml_text.replace(
            "fill_nulls_with: 0", "fill_nulls_with: zero"))


def test_fill_nulls_timespine_matches_duckdb(spark):
    """The spine semantics differential on the real events table at the
    gate scale: purchases per month with gaps zero-filled, DuckDB twin
    via generate_series over the same aggregated bounds."""
    yaml_text = """
semantic_models:
  - name: events_sm
    model: ref('events')
    dimensions:
      - name: event_month
        type: time
        expr: ts
        type_params: {time_granularity: month}
    measures:
      - name: n_events
        agg: count
        expr: 1
metrics:
  - name: rare_events
    type: simple
    filter: "event_type = 'purchase' AND value > 450"
    type_params:
      measure:
        name: n_events
        fill_nulls_with: 0
        join_to_timespine: true
"""
    layer = parse_metric_layer(yaml_text)
    rels = {"events": load_table(spark, SF_GATE, "events")}
    out = layer.query(rels, ["rare_events"],
                      group_by=["event_month"], grain="month")
    con = duckdb_connection(SF_GATE)
    # the oracle mirrors the layer's documented filter semantics —
    # CONDITIONAL aggregation over all rows (count of CASE WHEN), not a
    # WHERE — then the same min..max month spine + zero-fill
    r = compare("metrics_timespine", out, con, """
        WITH agg AS (
            SELECT CAST(date_trunc('month', ts) AS DATE) AS event_month,
                   COUNT(CASE WHEN event_type = 'purchase'
                              AND value > 450 THEN 1 END) AS rare_events
            FROM events
            GROUP BY 1
        ), spine AS (
            SELECT CAST(unnest(generate_series(
                       (SELECT MIN(event_month) FROM agg),
                       (SELECT MAX(event_month) FROM agg),
                       INTERVAL 1 MONTH)) AS DATE) AS event_month
        )
        SELECT s.event_month AS event_month,
               COALESCE(a.rare_events, 0) AS rare_events
        FROM spine s LEFT JOIN agg a USING (event_month)
    """)
    assert r.ok, r.detail


def test_derived_metric_sees_filled_values_on_spine_rows(spark):
    """A derived metric computed over a timespine-joined, null-filled
    simple metric reads the FILLED value on gap rows (MetricFlow
    computes derived metrics over filled inputs)."""
    import datetime as _dt

    yaml_text = """
semantic_models:
  - name: events_sm
    model: ref('events')
    dimensions:
      - name: event_month
        type: time
        expr: ts
        type_params: {time_granularity: month}
    measures:
      - name: n_purchases
        agg: count
        expr: 1
metrics:
  - name: purchases
    type: simple
    filter: "event_type = 'purchase'"
    type_params:
      measure:
        name: n_purchases
        fill_nulls_with: 0
        join_to_timespine: true
  - name: purchases_plus_ten
    type: derived
    type_params: {expr: "purchases + 10"}
"""
    rows = [(1, "purchase", _dt.datetime(2024, 1, 5)),
            (2, "purchase", _dt.datetime(2024, 3, 20))]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp")
    layer = parse_metric_layer(yaml_text)
    out = layer.query({"events": df},
                      ["purchases", "purchases_plus_ten"],
                      group_by=["event_month"], grain="month")
    got = {(str(r.event_month), r.purchases, r.purchases_plus_ten)
           for r in out.collect()}
    assert got == {("2024-01-01", 1, 11),
                   ("2024-02-01", 0, 10),   # filled gap feeds derived
                   ("2024-03-01", 1, 11)}

def test_timespine_step_follows_declared_dim_grain(spark):
    """ADVICE r12 (medium): with no query grain, the spine step must be
    the dimension's DECLARED grain (the same value _dim_col truncates
    with) — a 'day' default would emit ~29 spurious zero rows per gap
    month; and an un-grained timestamp dim must raise instead of
    silently losing non-midnight rows to the midnight-valued spine."""
    import datetime as _dt

    import pytest as _pytest

    yaml_text = """
semantic_models:
  - name: events_sm
    model: ref('events')
    dimensions:
      - name: event_month
        type: time
        expr: ts
        type_params: {time_granularity: month}
    measures:
      - name: n_purchases
        agg: count
        expr: 1
metrics:
  - name: purchases
    type: simple
    filter: "event_type = 'purchase'"
    type_params:
      measure:
        name: n_purchases
        fill_nulls_with: 0
        join_to_timespine: true
"""
    rows = [(1, "purchase", _dt.datetime(2024, 1, 5)),
            (2, "purchase", _dt.datetime(2024, 3, 21))]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp")
    layer = parse_metric_layer(yaml_text)
    # grain=None → the declared month grain drives BOTH the truncation
    # and the spine step: exactly one gap row (Feb), not ~60 daily rows
    out = layer.query({"events": df}, ["purchases"],
                      group_by=["event_month"], grain=None)
    got = {(str(r.event_month), r.purchases) for r in out.collect()}
    assert got == {("2024-01-01", 1), ("2024-02-01", 0),
                   ("2024-03-01", 1)}

    # a time dim with NO declared grain and no query grain: raise —
    # an un-truncated timestamp has no spine step
    ungrained = yaml_text.replace(
        "\n        type_params: {time_granularity: month}", "")
    layer2 = parse_metric_layer(ungrained)
    with _pytest.raises(ValueError, match="no\\s+declared grain"):
        layer2.query({"events": df}, ["purchases"],
                     group_by=["event_month"], grain=None)

def test_conversion_attributed_global_and_empty(spark):
    """last_touch edge cases: empty group_by (global frame — the
    struct-MAX is single-field, the final agg is a 1-row global) and a
    frame with zero conversion events (coalesces to 0, never loses the
    totals row)."""
    import datetime as _dt

    layer = parse_metric_layer(_CONV_YAML)
    rows = [(7, "view", _dt.datetime(2024, 3, 1, 10)),
            (7, "view", _dt.datetime(2024, 3, 2, 10)),
            (7, "purchase", _dt.datetime(2024, 3, 3, 10))]
    df = spark.createDataFrame(rows, "user_id long, event_type string, "
                                     "ts timestamp")
    got = layer.query({"events": df}, ["view_conversions_ever"],
                      group_by=[], grain=None).collect()
    assert [r.view_conversions_ever for r in got] == [1]

    no_conv = spark.createDataFrame(
        [(7, "view", _dt.datetime(2024, 3, 1, 10))],
        "user_id long, event_type string, ts timestamp")
    got = layer.query({"events": no_conv}, ["view_conversions_ever"],
                      group_by=[], grain=None).collect()
    assert [r.view_conversions_ever for r in got] == [0]
