"""Stream-stream time-interval join — the remaining Structured Streaming
join family after stream-static enrichment (sink.py): correlate two event
streams on a key within an event-time window (click↔impression
attribution, request↔response latency pairing).

State-bounding is the whole design [public knowledge: Spark Structured
Streaming join docs]: BOTH sides are watermarked and the join condition
carries an event-time interval (`left.ts BETWEEN right.ts AND right.ts +
max_delay`), so Spark can prove when a buffered row can never match again
and evict it — without the interval the state grows forever.  At 100 TB
rates the state store holds only ``rate x (watermark + max_delay)`` rows
per side, independent of stream length.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(left: DataFrame, right: DataFrame, key: str,
                  max_delay: str = "10 minutes",
                  watermark: str = "30 minutes") -> DataFrame:
    """Inner-join two event streams on ``key`` where the left event lands
    in ``[right.ts, right.ts + max_delay]`` — e.g. left=conversion events
    matched to the right=trigger events they follow.  Output columns:
    (key, trigger_ts, follow_ts, trigger_type, follow_type, lag_seconds).

    Works identically on batch DataFrames (no watermark needed there),
    which is what the streaming==batch test exploits."""
    lhs = left.select(
        F.col(key).alias("k"),
        F.col("ts").alias("follow_ts"),
        F.col("event_type").alias("follow_type"))
    rhs = right.select(
        F.col(key).alias("k2"),
        F.col("ts").alias("trigger_ts"),
        F.col("event_type").alias("trigger_type"))
    if lhs.isStreaming or rhs.isStreaming:
        lhs = lhs.withWatermark("follow_ts", watermark)
        rhs = rhs.withWatermark("trigger_ts", watermark)
    joined = lhs.join(
        rhs,
        (F.col("k") == F.col("k2"))
        & (F.col("follow_ts") >= F.col("trigger_ts"))
        & (F.col("follow_ts")
           <= F.col("trigger_ts") + F.expr(f"INTERVAL {max_delay}")),
    )
    return joined.select(
        F.col("k").alias(key), "trigger_ts", "follow_ts",
        "trigger_type", "follow_type",
        ((F.unix_micros("follow_ts") - F.unix_micros("trigger_ts"))
         / 1e6).alias("lag_seconds"),
    )
