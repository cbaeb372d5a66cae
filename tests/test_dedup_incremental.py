"""Cross-batch incremental MinHash dedup (operators/dedup.py
incremental_minhash_dedup): batch-split invariance against the one-shot
pipeline, first-batch bootstrap, and re-ingest idempotence."""

from __future__ import annotations

from dbt_demo_spark.operators import dedup
from dbt_demo_spark.sources.parquet import load_table
from tests.conftest import SF_GATE

THRESHOLD = 0.5


def _ids(df, col="doc_id"):
    return {r[col] for r in df.select(col).distinct().collect()}


def test_two_batch_ingest_equals_oneshot(spark, tmp_path):
    docs = load_table(spark, SF_GATE, "documents")
    # one-shot semantics: drop any doc that matches an earlier (lower-id) doc
    pairs = dedup.minhash_near_dups(docs, THRESHOLD)
    oneshot_kept = _ids(docs) - _ids(pairs, "d2")

    idx = str(tmp_path / "mh_index")
    cut = 250
    k1 = dedup.incremental_minhash_dedup(
        docs.filter(f"doc_id < {cut}"), idx, THRESHOLD)
    k2 = dedup.incremental_minhash_dedup(
        docs.filter(f"doc_id >= {cut}"), idx, THRESHOLD)
    assert _ids(k1) | _ids(k2) == oneshot_kept
    # sanity: the corpus has planted dups, so the operator actually dropped
    assert len(oneshot_kept) < docs.count()


def test_reingest_is_fully_dropped(spark, tmp_path):
    """Re-ingesting an already-indexed batch must admit nothing: every doc
    self-matches its own fingerprints at Jaccard 1.0."""
    docs = load_table(spark, SF_GATE, "documents").filter("doc_id < 100")
    idx = str(tmp_path / "mh_index")
    first = dedup.incremental_minhash_dedup(docs, idx, THRESHOLD)
    assert first.count() > 0
    again = dedup.incremental_minhash_dedup(docs, idx, THRESHOLD)
    assert again.count() == 0
