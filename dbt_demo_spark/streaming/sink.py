"""Streaming → warehouse sink with exactly-once semantics on plain
parquet, plus the stream-static enrichment join.

``foreachBatch`` + dynamic partition overwrite is the exactly-once
recipe for a file warehouse [public knowledge: Spark Structured
Streaming docs]: the checkpoint gives at-least-once BATCH replay, and
overwriting exactly the partitions present in a batch makes replays
IDEMPOTENT — a re-run of batch N rewrites the same partitions with the
same rows instead of appending duplicates.  The partition key must equal
the aggregation group key (here (hour_start, event_type)): update-mode
emissions carry only the CHANGED groups, so each emission must replace
exactly its own partition, never a sibling group sharing a coarser
partition.

Stream-static joins need no watermark and no state: the static side is
(re)read per micro-batch and broadcast — the streaming twin of the
fct-model dimension join (reference: models/marts/fct_loan_details.sql
join to loan_types).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def stream_static_enrich(events: DataFrame, dim: DataFrame,
                         on: str = "event_type") -> DataFrame:
    """LEFT-enrich a stream with a broadcast static dimension — per-batch
    planning, no streaming state, unmatched keys keep NULL dim columns."""
    return events.join(F.broadcast(dim), on, "left")


def rollup_to_warehouse(rollup: DataFrame, path: str,
                        checkpoint: str) -> DataStreamWriter:
    """Exactly-once writer for a grouped rollup stream: update-mode
    emissions land as dynamic partition overwrites keyed by the FULL group
    key.  Returns the configured writer; caller picks the trigger.

    Usage::

        q = rollup_to_warehouse(hourly, path, ckpt) \\
            .trigger(availableNow=True).start()
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("hour_start", "event_type")
         .parquet(path))

    return (
        rollup.writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
