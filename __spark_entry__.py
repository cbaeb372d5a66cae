"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``dbt_demo_spark.queries`` — a catalog of
QuerySpecs (Spark callable + DuckDB oracle SQL) covering SURVEY.md §2's
operator inventory plus the LLM-pipeline extension operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_demo_spark.queries import get_oracles, get_queries
from dbt_demo_spark.session import configure_existing

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the full reference-mart shape (agg_monthly_loans without
    the fan-out bug): two monthly rollups FULL-OUTER aligned on month with
    the coalesce idiom (reference: models/marts/agg_monthly_loans.sql)."""
    configure_existing(spark)
    from dbt_demo_spark.queries import CATALOG

    return CATALOG["agg_monthly_combined"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible catalog query."""
    return get_oracles()
