"""Skew-safe sessionization: time-range-salted gaps-and-islands.

The plain relational sessionization (queries/windows.py
events_sessionization) shuffles once on user_id — one partition holds one
user's WHOLE history.  At 100 TB a single power user (bot, load-test
account) serializes its entire event history through one task; SURVEY.md
§2.5 names this the window family's known hazard and this operator is the
documented mitigation:

  1. events shuffle on (user_id, time_bucket) — a hot user's history
     spreads across ceil(history / bucket_width) tasks, bounding any one
     task by events-per-user-per-bucket;
  2. gaps-and-islands runs WITHIN each (user, bucket) producing local
     sessions (exact: intra-bucket gaps are fully observed);
  3. local sessions — intervals, typically 4-6 orders of magnitude fewer
     rows than events — shuffle once on user_id alone, where a second
     gaps-and-islands pass merges sessions whose inter-session gap is
     within the threshold (a session straddling a bucket boundary is two
     local sessions whose gap <= threshold, so the merge rejoins exactly
     the sessions the unsalted pass would have built).

The reduction is EXACT, not approximate: sessions are equivalence classes
of the "within gap" chain relation, and the two-level pass computes the
same transitive closure.  tests/test_operators.py asserts bit-equality
with the unsalted catalog query on the driver data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DEFAULT_BUCKET_S = 6 * 3600  # >> gap; tune to events-per-user-per-bucket


def sessionize_salted(events: DataFrame, gap_s: int,
                      bucket_s: int = DEFAULT_BUCKET_S,
                      user_col: str = "user_id", ts_col: str = "ts",
                      order_col: str = "event_id") -> DataFrame:
    """(user_id, session_start, session_end, n_events) with the two-level
    salted plan.  ``bucket_s`` must be >= ``gap_s`` (a gap can span at most
    one bucket boundary chain, which the merge pass closes transitively —
    correct for any bucket_s, but buckets shorter than the gap degrade to
    one local session per bucket and push all work to the merge)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = F.lit(gap_s).cast("long") * 1_000_000

    # 1. local gaps-and-islands within (user, bucket)
    wb = (Window.partitionBy(user_col, "_bucket")
          .orderBy(ts_col, order_col))
    local = (
        events.withColumn("_us", us)
        .withColumn("_bucket", (F.col("_us")
                                / (F.lit(bucket_s).cast("long") * 1_000_000)
                                ).cast("long"))
        .withColumn("_prev", F.lag("_us").over(wb))
        .withColumn("_new", F.when(
            F.col("_prev").isNull()
            | ((F.col("_us") - F.col("_prev")) > gap_us), 1).otherwise(0))
        .withColumn("_sid", F.sum("_new").over(
            wb.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(user_col, "_bucket", "_sid")
        .agg(F.min("_us").alias("_start"), F.max("_us").alias("_end"),
             F.count(F.lit(1)).alias("_n"))
    )

    # 2. merge local sessions per user (interval-level, tiny vs events)
    wu = Window.partitionBy(user_col).orderBy("_start", "_end")
    merged = (
        local
        .withColumn("_prev_end", F.max("_end").over(
            wu.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("_new", F.when(
            F.col("_prev_end").isNull()
            | ((F.col("_start") - F.col("_prev_end")) > gap_us), 1)
            .otherwise(0))
        .withColumn("_mid", F.sum("_new").over(
            wu.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(user_col, "_mid")
        .agg(F.min("_start").alias("_start"), F.max("_end").alias("_end"),
             F.sum("_n").alias("n_events"))
    )
    return merged.select(
        user_col,
        F.timestamp_micros(F.col("_start")).alias("session_start"),
        F.timestamp_micros(F.col("_end")).alias("session_end"),
        "n_events",
    )
