"""Continuous corpus ingestion: the streaming twin of pipeline.clean_corpus.

Documents land as files; each micro-batch runs the full preparation funnel
(exact dedup -> hygiene filters -> PII redact -> incremental near-dup
against the PERSISTED fingerprint index -> split) via ``foreachBatch``, so
cross-batch dedup state is the index itself — no Spark streaming state, no
watermark, unbounded history [public knowledge: Spark Structured Streaming
foreachBatch docs].

Exactly-once on plain parquet, without a transactional table format:

  1. accepted rows are written FIRST, as a dynamic partition overwrite
     keyed by ``ingest_batch_id`` (the sink hook fires before the index
     commit — operators/dedup.incremental_minhash_dedup);
  2. the batch's fingerprints are committed to the index SECOND.

A replay after a crash between 1 and 2 reruns the batch against an index
that never saw it: the identical kept set overwrites its own partition
with identical rows.  A replay after 2 finds EVERY doc of the batch
already ingested — the identity-sentinel bands match by doc_id alone, so
short (< 3-token) docs self-match too, not just the shingled ones — and
an EMPTY dynamic overwrite touches no partitions while the index commit
skips every already-indexed id.  Either way the warehouse AND the index
converge to the no-crash result (tests/test_streaming_ingest.py replays
both crash windows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.types import StructType

from ..pipeline import clean_corpus

# the driver corpus's document schema — the default for landing dirs that
# carry the standard documents table
DOCUMENT_SCHEMA = ("doc_id long, text string, lang string, source string, "
                   "n_chars long")


def read_document_stream(spark: SparkSession, landing_dir: str,
                         max_files_per_trigger: int | None = None,
                         schema: StructType | str = DOCUMENT_SCHEMA) -> DataFrame:
    """File-source document stream with a DECLARED schema (default: the
    standard documents layout).  Streams need a schema up front; declaring
    it keeps setup free of the footer-probing inference pass a
    ``spark.read.parquet(landing_dir)`` probe would cost — the same
    no-inference discipline as the JSONL source."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(landing_dir)


def ingest_batch(batch_df: DataFrame, batch_id: int, index_dir: str,
                 out_dir: str, shard_spec=None, shards_dir: str | None = None,
                 **clean_kwargs) -> None:
    """One micro-batch of the ingestion funnel: clean_corpus with a sink
    that dynamic-partition-overwrites ``out_dir`` at this batch id, then
    the index commit.  Module-level so the crash-replay tests can re-invoke
    a batch exactly as the stream would.

    ``shard_spec`` + ``shards_dir``: additionally land the accepted rows
    as packed training shards under
    ``shards_dir/ingest_batch_id=N/split=.../shard=.../`` — the
    trainer-facing layout, continuously produced.  The shard write rides
    the same sink position (before the index commit) with a dynamic
    overwrite keyed by the batch id, so both replay windows converge
    exactly like the warehouse sink: a pre-commit replay rewrites
    identical shards, a post-commit replay's empty accepted set touches
    no partitions."""
    if (shard_spec is None) != (shards_dir is None):
        raise ValueError("shard_spec and shards_dir go together")

    def sink(clean: DataFrame) -> None:
        # with shards on, the accepted set feeds TWO writes — persist so
        # the dedup funnel upstream is executed once, not per sink
        if shard_spec is not None:
            clean = clean.persist()
        try:
            (clean.withColumn("ingest_batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("ingest_batch_id")
             .parquet(out_dir))
            if shard_spec is not None:
                from ..operators.shards import write_training_shards

                write_training_shards(
                    clean, shards_dir, shard_spec,
                    partition_literals={"ingest_batch_id": batch_id})
        finally:
            if shard_spec is not None:
                clean.unpersist()

    clean_corpus(batch_df, index_dir, sink=sink, **clean_kwargs)


def clean_ingest(stream_docs: DataFrame, index_dir: str, out_dir: str,
                 checkpoint: str, **clean_kwargs) -> DataStreamWriter:
    """Configured writer: each micro-batch flows through clean_corpus and
    lands in ``out_dir`` partitioned by ingest_batch_id.  Caller picks the
    trigger::

        q = clean_ingest(stream, idx, out, ckpt) \\
            .trigger(availableNow=True).start()
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(batch_df, batch_id, index_dir, out_dir, **clean_kwargs)

    return (
        stream_docs.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )


def aggregate_mart_maintenance(stream_rows: DataFrame, mdef,
                               source_name: str, warehouse_dir: str,
                               checkpoint: str) -> DataStreamWriter:
    """Streaming twin of the X107 ``aggregate`` incremental strategy
    (X112, r14): each micro-batch of source rows runs through the REAL
    Runner materialization path — the model fn emits batch partials at
    the mart grain, and the fold combines them with the stored partials
    on the grain key — so a grain mart (offer mins, hourly rollups) is
    maintained continuously without ever rebuilding.  Exactly-once
    under replay without streaming state: the micro-batch id rides
    ``Runner.run(batch_id=...)`` and commits INSIDE the mart's staged
    whole-directory swap (untouched partitions hardlinked, O(affected)
    data written) — a replayed batch either finds its id (no-op) or a
    mart that never counted it (identical fold); the two-rename window
    recovers from __old.  Identical convergence argument (and commit
    shape) to ``bm25_stats_maintenance`` / ``line_census_maintenance``
    below, lifted from a single index to ANY declared aggregate model.

    ``mdef`` is a ModelDef with materialized='incremental',
    incremental_strategy='aggregate' whose single dep is
    ``source_name``.  Caller picks the trigger::

        q = aggregate_mart_maintenance(stream, offer_model(), "lineitem",
                                       wh, ckpt) \\
            .trigger(availableNow=True).start()
    """
    from ..core.model import ModelRegistry
    from ..core.runner import Runner

    if getattr(mdef, "incremental_strategy", None) != "aggregate":
        raise ValueError(
            "aggregate_mart_maintenance needs an aggregate-strategy "
            f"model, got {getattr(mdef, 'incremental_strategy', None)!r}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        reg = ModelRegistry()
        reg.register(mdef)
        Runner(batch_df.sparkSession, reg,
               warehouse_dir=warehouse_dir).run(
            {source_name: batch_df}, batch_id=batch_id)

    return (
        stream_rows.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )


def line_census_maintenance(stream_docs: DataFrame, index_dir: str,
                            checkpoint: str,
                            text_col: str = "text") -> DataStreamWriter:
    """Streaming twin of the X109 hot-line census: each micro-batch of
    landing documents folds into the persisted (line_hash, n_docs)
    census (operators/boilerplate.ingest_line_census) — boilerplate
    stripping always serves CURRENT cross-corpus line heat without ever
    re-censusing the corpus.  Exactly-once under replay without
    streaming state: the micro-batch id commits INSIDE the census's
    staged swap — identical convergence argument (and identical code
    shape) to ``bm25_stats_maintenance`` below, including the
    two-rename-window __old recovery."""
    from ..operators.boilerplate import ingest_line_census

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        ingest_line_census(batch_df, index_dir, text_col=text_col,
                           batch_id=batch_id)

    return (
        stream_docs.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )


def bm25_stats_maintenance(stream_docs: DataFrame, index_dir: str,
                           checkpoint: str,
                           text_col: str = "text") -> DataStreamWriter:
    """Streaming twin of the X104 BM25 stats index: each micro-batch of
    landing documents folds into the persisted corpus statistics
    (operators/bm25.ingest_bm25_stats) — the retrieval scorer always
    serves CURRENT n_docs / avgdl / per-term df without ever re-scanning
    the corpus.  Exactly-once under replay without streaming state: the
    micro-batch id commits INSIDE the index's staged swap, so a replayed
    batch either finds its id (no-op) or an index that never counted it
    (identical merge) — the same two-window convergence argument as
    clean_ingest's warehouse/index pair, here collapsed into ONE atomic
    rename.  Caller picks the trigger::

        q = bm25_stats_maintenance(stream, idx_dir, ckpt) \\
            .trigger(availableNow=True).start()
    """
    from ..operators.bm25 import ingest_bm25_stats

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        ingest_bm25_stats(batch_df, index_dir, text_col=text_col,
                          batch_id=batch_id)

    return (
        stream_docs.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
