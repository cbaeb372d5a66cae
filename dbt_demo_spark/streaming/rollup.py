"""Structured Streaming twin of the monthly/hourly rollup pattern.

The reference's only "window" is date_trunc + GROUP BY (reference:
models/marts/agg_monthly_loans.sql:10-18); its streaming twin is a tumbling
`F.window` aggregation with a watermark bounding state for late data
(SURVEY.md §2.9).  The same logical shape runs over any streaming source;
tests drive it with the parquet events table under trigger(availableNow),
which processes the backlog exactly once and stops — so the result is
directly comparable to the batch rollup.

Scale notes: state size = (#open windows x #event types); the watermark
closes windows so state is bounded regardless of stream length.  Exact
countDistinct is not available under incremental aggregation —
approx_count_distinct is the streaming-legal counterpart (and the same
opt-in we'd take for 100 TB batch).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampType)


def _events_schema(ts_is_long: bool) -> StructType:
    return StructType([
        StructField("event_id", LongType()),
        # nanos layout reads TIMESTAMP(NANOS) as long; micros layout reads
        # natively as a timestamp
        StructField("ts", LongType() if ts_is_long else TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])


def read_event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Streaming read of an events landing DIRECTORY (the file source tails
    a directory; in production this would be Kafka/Kinesis with the same
    downstream plan).  The driver's parquet has shipped both TIMESTAMP(NANOS)
    and TIMESTAMP(MICROS) layouts across rounds (see sources/events.py); a
    one-off batch footer probe picks the matching stream schema."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probed = spark.read.parquet(events_dir).schema["ts"].dataType
    ts_is_long = isinstance(probed, LongType)
    raw = (
        spark.readStream.schema(_events_schema(ts_is_long))
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    # LTZ, not NTZ: watermarks/event-time windows require TIMESTAMP type
    # ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]); the session runs UTC so the
    # wall-clock values line up with the batch (NTZ) path.
    if ts_is_long:
        return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return raw.withColumn("ts", F.col("ts").cast(TimestampType()))


def streaming_hourly_rollup(events: DataFrame,
                            watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windowed aggregation with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.sum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type",
                "n_events", "approx_users", "total_value")
    )


def session_rollup(events: DataFrame, gap: str = "30 minutes",
                   watermark: str | None = "2 hours") -> DataFrame:
    """Per-user session aggregation via ``session_window`` — the streaming
    counterpart of the gaps-and-islands sessionization in
    queries/windows.py.  Works identically as a batch plan (watermark=None)
    and as an incremental streaming plan: sessions merge while events arrive
    within ``gap`` of the window and close once the watermark passes the
    gap — closed-session state is dropped, so state stays bounded by the
    number of OPEN sessions regardless of stream length."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("total_value"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events", "total_value")
    )
