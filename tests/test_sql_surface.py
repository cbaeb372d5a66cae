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
