"""Events source — the driver's parquet has shipped two timestamp layouts
across rounds: TIMESTAMP(NANOS), which Spark's vectorized reader rejects
outright ([PARQUET_TYPE_ILLEGAL]) and must be read as raw int64
(`spark.sql.legacy.parquet.nanosAsLong`) then truncated to micros, and a
plain TIMESTAMP(MICROS) Spark reads natively.  The loader probes the footer
type and normalizes EITHER layout to a microsecond TIMESTAMP_NTZ `ts` —
the same wall-clock value DuckDB produces for both (its TIMESTAMP_NS→
TIMESTAMP cast truncates identically), so every downstream query and
oracle is layout-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, TimestampNTZType


_SCANS: dict[tuple[str, str], DataFrame] = {}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SCANS.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = ev.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # nanos-as-long layout.  Integer DIV, not float division: epoch-nanos
        # (~1.7e18) exceed double's 53-bit integer range, so a float path
        # would corrupt microseconds.  NTZ keeps the wall-clock semantics of
        # the source (and of DuckDB's TIMESTAMP), independent of any session
        # timezone.
        out = ev.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
    elif isinstance(ts_type, TimestampNTZType):
        out = ev
    else:
        # TIMESTAMP (LTZ) — session runs UTC, so this is a pure type retag
        out = ev.withColumn("ts", F.col("ts").cast(TimestampNTZType()))
    _SCANS[key] = out
    return out
