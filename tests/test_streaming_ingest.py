"""Streaming corpus ingestion (streaming/ingest.py): micro-batched
ingestion through the full clean_corpus funnel must equal the batch
pipeline run (batch-split invariance extends to streaming), and restarts
must be exactly-once against the persisted index."""

from __future__ import annotations

from dbt_demo_spark.pipeline import clean_corpus
from dbt_demo_spark.sources.parquet import load_table
from dbt_demo_spark.streaming import clean_ingest, read_document_stream
from tests.conftest import SF_GATE


def _accepted_ids(out_dir, spark):
    return {r["doc_id"] for r in
            spark.read.parquet(out_dir).select("doc_id").collect()}


def _run_stream(spark, landing, idx, out, ckpt):
    stream = read_document_stream(spark, landing, max_files_per_trigger=1)
    q = (clean_ingest(stream, idx, out, ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)


def test_streamed_ingest_equals_batch_pipeline(spark, tmp_path):
    docs = load_table(spark, SF_GATE, "documents")
    landing = str(tmp_path / "landing")
    # two files -> two micro-batches (maxFilesPerTrigger=1)
    docs.filter("doc_id < 250").coalesce(1).write.parquet(
        landing, mode="append")
    docs.filter("doc_id >= 250").coalesce(1).write.parquet(
        landing, mode="append")

    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    _run_stream(spark, landing, idx, out, str(tmp_path / "ckpt"))
    streamed = _accepted_ids(out, spark)

    batch_clean, _ = clean_corpus(docs, str(tmp_path / "idx_batch"))
    want = {r["doc_id"] for r in batch_clean.select("doc_id").collect()}
    assert streamed == want

    # restart with no new files: no batches fire, output unchanged
    _run_stream(spark, landing, idx, out, str(tmp_path / "ckpt"))
    assert _accepted_ids(out, spark) == streamed


def test_late_file_dedupes_against_streamed_history(spark, tmp_path):
    """A file landing later must be deduped against everything the stream
    already indexed — including exact re-deliveries of old docs."""
    docs = load_table(spark, SF_GATE, "documents")
    landing = str(tmp_path / "landing")
    first = docs.filter("doc_id < 300")
    first.coalesce(1).write.parquet(landing, mode="append")

    idx, out, ckpt = (str(tmp_path / "idx"), str(tmp_path / "out"),
                      str(tmp_path / "ckpt"))
    _run_stream(spark, landing, idx, out, ckpt)
    n_first = len(_accepted_ids(out, spark))
    assert n_first > 0

    # redeliver the same texts under fresh ids: all near-dup, none admitted
    first.selectExpr("doc_id + 100000 AS doc_id", "text", "lang",
                     "source", "n_chars").coalesce(1).write.parquet(
        landing, mode="append")
    _run_stream(spark, landing, idx, out, ckpt)
    assert len(_accepted_ids(out, spark)) == n_first
