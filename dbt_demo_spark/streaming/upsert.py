"""Keyed last-write-wins materialized view over an append stream — the
consumer-side upsert the daily spine's OUTPUT CONTRACT prescribes
(streaming/spine.py: closed days emit once, the newest observed day may
re-emit refined across micro-batches; downstream applies last-write-wins
per (user, day)).  This operator IS that downstream: a parquet store
that always holds exactly one current row per key.

Mechanics (``foreachBatch`` + partition-scoped merge):

  1. within-batch LWW: one row per key, ties resolved by the max of
     ``tiebreak_cols`` as a struct (for the spine: ``("observed",)`` —
     an observed row beats a carried one);
  2. the batch's AFFECTED partitions (distinct ``partition_col`` values,
     collected — a micro-batch touches few) are read back from the
     store with partition pruning; store rows whose key appears in the
     batch are anti-joined away; the union lands as a DYNAMIC partition
     overwrite of exactly those partitions.

Scale posture: work per batch is O(affected partitions), not O(store) —
a day-partitioned spine store only ever rewrites its recent days.  The
merge is the same insert-overwrite MERGE shape the batch Runner's
incremental strategy uses, applied per micro-batch.

Replay convergence (the exactly-once argument): the merge is IDEMPOTENT
— replaying a batch against a store that already absorbed it anti-joins
its own rows out and re-adds them identically; replaying against a
PARTIALLY committed overwrite (dynamic overwrite is per-partition, not
atomic across partitions) still converges, because every affected
partition's content is a subset of {old rows not in batch} ∪ {batch
rows} at all times and the re-merge maps both endpoints to the same
result.  No row can be lost: an overwritten partition always carries
its non-batch rows forward.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def lww_upsert_batch(batch_df: DataFrame, store_dir: str,
                     key_cols: tuple[str, ...],
                     partition_col: str,
                     tiebreak_cols: tuple[str, ...] = ()) -> None:
    """Merge one micro-batch into the keyed store (module-level so the
    replay tests can re-invoke a batch exactly as the stream would)."""
    import os

    spark = batch_df.sparkSession
    keys = list(key_cols)
    if partition_col not in batch_df.columns:
        raise ValueError(f"partition_col {partition_col!r} not in batch")
    # within-batch LWW: max_by the tiebreak struct (deterministic; with
    # no tiebreak declared, any single row per key must already be
    # unique — enforced so silent nondeterminism can't slip through)
    others = [c for c in batch_df.columns if c not in keys]
    if tiebreak_cols:
        tb = F.struct(*[F.col(c) for c in tiebreak_cols])
        batch = (batch_df.groupBy(*keys)
                 .agg(F.max_by(F.struct(*others), tb).alias("_r"))
                 .select(*keys, *[F.col(f"_r.{c}") for c in others]))
    else:
        # actually enforce the contract (ADVICE r9): dropDuplicates would
        # pick an arbitrary survivor per key, and a replay could pick a
        # DIFFERENT one — breaking replay convergence silently.  With no
        # tiebreak declared, duplicate keys in a batch are an error.
        counts = batch_df.groupBy(*keys).count().filter("count > 1")
        dup = counts.select(*keys).first()
        if dup is not None:
            raise ValueError(
                f"batch has duplicate rows for key {tuple(dup)!r} and no "
                "tiebreak_cols — declare tiebreak_cols so last-write-wins "
                "is deterministic under replay")
        batch = batch_df
    batch = batch.localCheckpoint(eager=True)  # pin: read before overwrite

    affected = [r[0] for r in
                batch.select(partition_col).distinct().collect()]
    if not affected:
        return
    if os.path.isdir(store_dir) and any(
            not n.startswith(("_", ".")) for n in os.listdir(store_dir)):
        existing = (spark.read.parquet(store_dir)
                    .filter(F.col(partition_col).isin(affected))
                    .select(*batch.columns))
        merged = existing.join(batch.select(*keys), keys, "left_anti") \
            .unionByName(batch)
    else:
        merged = batch
    (merged.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(partition_col)
     .parquet(store_dir))


def lww_view(stream: DataFrame, store_dir: str, checkpoint: str,
             key_cols: tuple[str, ...], partition_col: str,
             tiebreak_cols: tuple[str, ...] = ()) -> DataStreamWriter:
    """Configured writer: every micro-batch upserts into ``store_dir``
    with last-write-wins per ``key_cols``.  Caller picks the trigger::

        q = lww_view(grid, store, ckpt, ("user_id", "day"), "day",
                     tiebreak_cols=("observed",)) \\
            .trigger(availableNow=True).start()
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        lww_upsert_batch(batch_df, store_dir, key_cols, partition_col,
                         tiebreak_cols)

    return (stream.writeStream
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(write_batch))


def spine_lww_view(grid: DataFrame, store_dir: str,
                   checkpoint: str) -> DataStreamWriter:
    """The daily spine's contract, materialized: keys (user_id, day),
    day-partitioned store, observed rows beat carried ones within a
    batch, later batches beat earlier (refinement replaces the carry)."""
    return lww_view(grid, store_dir, checkpoint,
                    key_cols=("user_id", "day"), partition_col="day",
                    tiebreak_cols=("observed",))
