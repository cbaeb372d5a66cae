"""Parquet source registry for the driver's synthetic test tables.

At 100 TB these reads stay exactly as written: `spark.read.parquet` is the
DataSource V1/V2 scan with column pruning + predicate pushdown built in —
downstream `.select`/`.filter` reach the scan via Catalyst, so narrow queries
read narrow bytes (verify with `.explain`: ReadSchema / PushedFilters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Scan-DataFrame memo: `spark.read.parquet` re-lists the path and re-reads
# the parquet footer on EVERY call (~0.1s driver-side), so a 50-query
# catalog pass pays seconds of pure constant re-deriving identical scan
# plans over the same immutable test tables.  DataFrames are immutable plan
# handles, so reusing one across queries is safe; keyed by applicationId so
# a restarted session never sees a handle from a dead JVM.  At 100 TB the
# same memo is simply "analyze each source once per session".
_SCANS: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _SCANS.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _SCANS[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view so `spark.sql` queries see the same
    catalog names the DuckDB oracle does."""
    for n in (names or TESTDATA_TABLES):
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
