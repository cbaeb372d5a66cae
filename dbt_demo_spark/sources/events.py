"""Events source — parquet with TIMESTAMP(NANOS), which Spark's vectorized
reader rejects outright ([PARQUET_TYPE_ILLEGAL]).  We read nanos as raw
int64 (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a microsecond
timestamp column — the same truncation DuckDB applies when casting its
TIMESTAMP_NS to TIMESTAMP, so derived values agree across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


_SCANS: dict[tuple[str, str], DataFrame] = {}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SCANS.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # integer DIV, not float division: epoch-nanos (~1.7e18) exceed double's
    # 53-bit integer range, so a float path would corrupt microseconds.
    # NTZ keeps the wall-clock semantics of the source (and of DuckDB's
    # TIMESTAMP), independent of any session timezone.
    out = ev.withColumn(
        "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
    _SCANS[key] = out
    return out
