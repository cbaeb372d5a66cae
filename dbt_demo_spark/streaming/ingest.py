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
     append — operators/dedup.incremental_minhash_dedup);
  2. the batch's fingerprints are appended to the index SECOND.

A replay after a crash between 1 and 2 reruns the batch against an index
that never saw it: the identical kept set overwrites its own partition
with identical rows.  A replay after 2 finds every doc self-matching in
the index, and an EMPTY dynamic overwrite touches no partitions — the
already-written output survives.  Either way the warehouse converges to
the no-crash result.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter

from ..pipeline import clean_corpus


def read_document_stream(spark: SparkSession, landing_dir: str,
                         max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source document stream with the schema probed from the files
    already present (streams need a declared schema — no inference pass)."""
    reader = (spark.readStream
              .schema(spark.read.parquet(landing_dir).schema))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(landing_dir)


def clean_ingest(stream_docs: DataFrame, index_dir: str, out_dir: str,
                 checkpoint: str, **clean_kwargs) -> DataStreamWriter:
    """Configured writer: each micro-batch flows through clean_corpus and
    lands in ``out_dir`` partitioned by ingest_batch_id.  Caller picks the
    trigger::

        q = clean_ingest(stream, idx, out, ckpt) \\
            .trigger(availableNow=True).start()
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        def sink(clean: DataFrame) -> None:
            (clean.withColumn("ingest_batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("ingest_batch_id")
             .parquet(out_dir))

        clean_corpus(batch_df, index_dir, sink=sink, **clean_kwargs)

    return (
        stream_docs.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )
