"""Same-text SQL differentials: the engine's `spark.sql` surface must
handle correlated subqueries — the ONE query family the DataFrame catalog
expresses only in pre-decorrelated join form (queries/tpch2.py Q17/Q20/Q21
docstrings).  Here the IDENTICAL SQL text runs on both engines: Spark
must plan the correlation (RewriteCorrelatedScalarSubquery /
RewriteExists) to the same decorrelated result DuckDB computes.

Dialect-intersection discipline: floor-trick rounding, exact-int
averages, CAST(... AS BIGINT) sums — the same portability rules the
catalog oracles follow (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from dbt_demo_spark.sources.parquet import register_views
from dbt_demo_spark.testing import compare, duckdb_connection
from tests.conftest import SF_GATE


@pytest.fixture(scope="module")
def con(spark):
    register_views(spark, SF_GATE, "lineitem", "part", "orders", "supplier")
    return duckdb_connection(SF_GATE)


def _diff(spark, con, name, sql):
    res = compare(name, spark.sql(sql), con, sql)
    assert res.ok, f"{name}: {res.detail}"


def test_correlated_scalar_subquery_same_text(spark, con):
    """TPC-H Q17's TRUE correlated form — per-part 0.2x average quantity
    threshold as a correlated scalar subquery, decorrelated by the
    optimizer, not by hand."""
    _diff(spark, con, "correlated_scalar", """
        SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#2'
          AND l.l_quantity < (
              SELECT 0.2 * (SUM(CAST(l2.l_quantity AS BIGINT)) * 1.0
                            / COUNT(*))
              FROM lineitem l2
              WHERE l2.l_partkey = l.l_partkey)
    """)


def test_correlated_exists_same_text(spark, con):
    """TPC-H Q21's correlated EXISTS / NOT EXISTS pair over the same
    relation — the multi-supplier-order shape."""
    _diff(spark, con, "correlated_exists", """
        SELECT l1.l_suppkey AS suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_sole_late
        FROM lineitem l1
        WHERE l1.l_shipdate > TIMESTAMP '1997-06-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > TIMESTAMP '1997-06-01')
        GROUP BY l1.l_suppkey
    """)


def test_correlated_quantified_in_same_text(spark, con):
    """Correlated grouped-HAVING IN — the Q20 availability shape with the
    per-(supplier, part) movement threshold correlated on the part's total
    shipped quantity (the partsupp-less analog of Q20's 0.5 * SUM
    correlation)."""
    _diff(spark, con, "correlated_in", """
        SELECT s.s_suppkey AS suppkey, s.s_name AS supplier_name
        FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l.l_suppkey, l.l_partkey
            HAVING SUM(CAST(l.l_quantity AS BIGINT)) * 2 > (
                  SELECT SUM(CAST(l4.l_quantity AS BIGINT))
                  FROM lineitem l4
                  WHERE l4.l_partkey = l.l_partkey))
    """)


def test_window_ranking_family_same_text(spark, con):
    """The ranking-window family beyond the catalog's row_number/lag/lead:
    rank, dense_rank, ntile, percent_rank, cume_dist — identical SQL text,
    deterministic (ts, event_id) ordering."""
    _diff(spark, con, "window_ranking", """
        SELECT o_orderkey,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               NTILE(4) OVER w AS quartile,
               CAST(PERCENT_RANK() OVER w AS DOUBLE) AS prank,
               CAST(CUME_DIST() OVER w AS DOUBLE) AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_orderdate, o_orderkey)
    """)


def test_window_value_frames_same_text(spark, con):
    """Value windows with explicit frames: first/last/nth value over ROWS
    frames, and a RANGE frame over an integer key — identical SQL text.
    Ordered on the UNIQUE o_orderkey: the synthetic lineitem table has
    duplicate (l_orderkey, l_linenumber) pairs, which makes ROWS-frame
    value functions tie-ambiguous across engines."""
    _diff(spark, con, "window_value_frames", """
        SELECT o_orderkey,
               FIRST_VALUE(o_totalprice) OVER w1 AS first_price,
               LAST_VALUE(o_totalprice) OVER w1 AS last_price,
               NTH_VALUE(o_totalprice, 2) OVER w1 AS second_price,
               CAST(COUNT(*) OVER (
                   PARTITION BY o_orderstatus ORDER BY o_orderkey
                   RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING
               ) AS BIGINT) AS near_orders
        FROM orders
        WINDOW w1 AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
    """)


def test_grouping_sets_rollup_cube_same_text(spark, con):
    """Multi-level aggregation: ROLLUP with GROUPING() disambiguation (a
    NULL key value vs a rollup total) and an explicit GROUPING SETS list —
    identical SQL text, exact-cents money."""
    _diff(spark, con, "rollup", """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """)
    _diff(spark, con, "grouping_sets", """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


def test_pivot_crosstab_matches_case_oracle(spark, con):
    """The pivot surface (DataFrame `groupBy().pivot()` — month x status
    cross-tab of exact order cents).  No same-text form: Spark's and
    DuckDB's PIVOT syntaxes differ, so the DuckDB oracle is the portable
    CASE-conditional aggregation the pivot desugars to."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.sources.parquet import load_table

    orders = load_table(spark, SF_GATE, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    got = (
        orders
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date")
                 .alias("month_start"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(cents))
        .select("month_start",
                F.col("F").cast("long").alias("cents_f"),
                F.col("O").cast("long").alias("cents_o"),
                F.col("P").cast("long").alias("cents_p")))
    res = compare("pivot_crosstab", got, con, """
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
               CAST(SUM(CASE WHEN o_orderstatus = 'F'
                        THEN CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)
                        END) AS BIGINT) AS cents_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O'
                        THEN CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)
                        END) AS BIGINT) AS cents_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'P'
                        THEN CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)
                        END) AS BIGINT) AS cents_p
        FROM orders
        GROUP BY 1
    """)
    assert res.ok, res.detail


def test_unpivot_melts_back_to_long(spark, con):
    """UNPIVOT (DataFrame ``unpivot`` — wide -> long melt), the inverse of
    the pivot above: melting the month x status cross-tab back and
    dropping the empty cells must equal the direct long-form aggregate.
    No same-text form (Spark UNPIVOT vs DuckDB UNPIVOT syntaxes differ);
    the oracle is the plain GROUP BY the melt desugars to."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.sources.parquet import load_table

    orders = load_table(spark, SF_GATE, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    wide = (
        orders
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date")
                 .alias("month_start"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(cents)))
    got = (
        wide.unpivot("month_start", ["F", "O", "P"], "status", "cents")
        .filter(F.col("cents").isNotNull())
        .select("month_start", "status", F.col("cents").cast("long")))
    res = compare("unpivot_melt", got, con, """
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
               o_orderstatus AS status,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        GROUP BY 1, 2
    """)
    assert res.ok, res.detail
