"""Streaming corpus ingestion (streaming/ingest.py): micro-batched
ingestion through the full clean_corpus funnel must equal the batch
pipeline run (batch-split invariance extends to streaming), and restarts
must be exactly-once against the persisted index."""

from __future__ import annotations

import pytest

from dbt_demo_spark.pipeline import clean_corpus
from dbt_demo_spark.sources.parquet import load_table
from dbt_demo_spark.streaming import (clean_ingest, ingest_batch,
                                      read_document_stream)
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


def test_streamed_decontamination_matches_batch(spark, tmp_path):
    """clean_kwargs forward through foreachBatch: streaming with an eval
    set drops the same contaminated docs the batch funnel drops."""
    docs = load_table(spark, SF_GATE, "documents")
    ev = docs.filter("doc_id % 97 = 0")
    corpus = docs.filter("doc_id % 97 <> 0")
    landing = str(tmp_path / "landing")
    corpus.filter("doc_id < 250").coalesce(1).write.parquet(landing, mode="append")
    corpus.filter("doc_id >= 250").coalesce(1).write.parquet(landing, mode="append")

    idx, out, ckpt = (str(tmp_path / "idx"), str(tmp_path / "out"),
                      str(tmp_path / "ckpt"))
    stream = read_document_stream(spark, landing, max_files_per_trigger=1)
    q = (clean_ingest(stream, idx, out, ckpt, eval_docs=ev)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    batch_clean, _ = clean_corpus(corpus, str(tmp_path / "idx_b"), eval_docs=ev)
    want = {r["doc_id"] for r in batch_clean.select("doc_id").collect()}
    assert _accepted_ids(out, spark) == want


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


# --- crash-replay: the two windows of the exactly-once protocol -------------

# short (< 3-token) docs ride along deliberately: they have no shingles, so
# only the identity sentinels make their replay inert (ADVICE r4 — replays
# used to re-keep them and dynamic-overwrite the partition down to JUST them)
CRASH_ROWS = [
    (1, "hi", "en", "s", 2),
    (2, "", "en", "s", 0),
    (3, "the quick brown fox jumps over the lazy dog today", "en", "s", 49),
    (4, "a completely different longer sentence about engines", "en", "s", 52),
    (5, "the quick brown fox jumps over the lazy dog today!", "en", "s", 50),
]


def _crash_batch(spark):
    return spark.createDataFrame(
        CRASH_ROWS,
        "doc_id long, text string, lang string, source string, n_chars long")


def _index_ids(spark, idx):
    from dbt_demo_spark.operators.dedup import read_index

    rows = read_index(spark, idx).groupBy("doc_id").count().collect()
    return {r["doc_id"]: r["count"] for r in rows}


def test_replay_after_commit_is_inert(spark, tmp_path):
    """Crash AFTER the index commit but before the checkpoint records the
    batch: the replayed batch finds every id already indexed — kept set
    empty, the dynamic overwrite touches no partitions, and the index
    commit appends nothing.  Output and index equal the no-crash run."""
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    ingest_batch(_crash_batch(spark), 7, idx, out)
    accepted = _accepted_ids(out, spark)
    assert {1, 2} <= accepted          # short docs are accepted rows
    index_before = _index_ids(spark, idx)

    ingest_batch(_crash_batch(spark), 7, idx, out)  # the replay
    assert _accepted_ids(out, spark) == accepted    # nothing clobbered
    assert _index_ids(spark, idx) == index_before   # no duplicate entries


def test_replay_after_sink_before_commit_converges(spark, tmp_path):
    """Crash BETWEEN the output write and the index commit: the replay runs
    against an index that never saw the batch, recomputes the identical
    kept set, overwrites the partition with identical rows, and commits the
    fingerprints once."""
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")

    class Boom(RuntimeError):
        pass

    def crashing_sink(clean):
        import pyspark.sql.functions as F

        (clean.withColumn("ingest_batch_id", F.lit(7))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("ingest_batch_id").parquet(out))
        raise Boom("crash between sink and index commit")

    with pytest.raises(Boom):
        clean_corpus(_crash_batch(spark), idx, sink=crashing_sink)
    crashed_output = _accepted_ids(out, spark)
    assert crashed_output                 # the sink DID land rows
    assert _index_ids(spark, idx) == {}   # ...but nothing was committed

    ingest_batch(_crash_batch(spark), 7, idx, out)  # the replay
    assert _accepted_ids(out, spark) == crashed_output
    assert set(_index_ids(spark, idx)) == {1, 2, 3, 4, 5}
    assert all(c == 1 for c in _index_ids(spark, idx).values())


def test_streamed_shard_output_replay_safe_and_matches_batch(spark, tmp_path):
    """Continuous shard production (r7): shard_spec/shards_dir forward
    through foreachBatch; each micro-batch lands
    shards_dir/ingest_batch_id=N/split=... shards over exactly its
    accepted docs, and replaying a batch converges (dynamic overwrite)."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.operators.shards import ShardSpec

    spec = ShardSpec(chunk_tokens=16, budget=64, overlap=0, n_shards=2)
    docs = load_table(spark, SF_GATE, "documents")
    landing = str(tmp_path / "landing")
    docs.filter("doc_id < 250").coalesce(1).write.parquet(
        landing, mode="append")
    docs.filter("doc_id >= 250").coalesce(1).write.parquet(
        landing, mode="append")

    idx, out, shards = (str(tmp_path / "idx"), str(tmp_path / "out"),
                        str(tmp_path / "shards"))
    stream = read_document_stream(spark, landing, max_files_per_trigger=1)
    q = (clean_ingest(stream, idx, out, str(tmp_path / "ckpt"),
                      shard_spec=spec, shards_dir=shards)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = spark.read.parquet(shards)
    assert {r.ingest_batch_id for r in
            got.select("ingest_batch_id").distinct().collect()} == {0, 1}
    # shard doc provenance == the accepted warehouse rows, per batch
    accepted = spark.read.parquet(out)
    for b in (0, 1):
        shard_docs = {d for r in got.filter(F.col("ingest_batch_id") == b)
                      .select("doc_ids").collect() for d in r.doc_ids}
        warehouse = {r.doc_id for r in accepted.filter(
            F.col("ingest_batch_id") == b).collect()}
        assert shard_docs == warehouse, b

    before = sorted(
        (r.ingest_batch_id, r.split, r.shard, r.bin_id, tuple(r.doc_ids))
        for r in got.collect())
    # post-commit replay of batch 0: empty accepted set, shards untouched
    first_file = spark.read.parquet(landing).filter("doc_id < 250")
    ingest_batch(first_file, 0, idx, out, shard_spec=spec,
                 shards_dir=shards)
    after = sorted(
        (r.ingest_batch_id, r.split, r.shard, r.bin_id, tuple(r.doc_ids))
        for r in spark.read.parquet(shards).collect())
    assert after == before


def test_line_census_maintenance_converges_and_replays(spark, tmp_path):
    """streaming/ingest.line_census_maintenance (X109): micro-batches of
    landing documents fold into the persisted hot-line census; the final
    census equals the one-shot build, and a replayed committed batch id
    no-ops — the bm25_stats_maintenance contract on the line census."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.operators.boilerplate import (LineCensusIndex,
                                                      build_line_census,
                                                      ingest_line_census)
    from dbt_demo_spark.streaming.ingest import (line_census_maintenance,
                                                 read_document_stream)

    docs = load_table(spark, SF_GATE, "documents")
    landing = str(tmp_path / "landing")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    a.write.parquet(landing + "/batch_a")
    b.write.parquet(landing + "/batch_b")

    idx_dir = str(tmp_path / "census")
    stream = read_document_stream(spark, landing + "/*",
                                  max_files_per_trigger=1)
    q = (line_census_maintenance(stream, idx_dir, str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    one = build_line_census(docs.select("doc_id", "text"),
                            str(tmp_path / "one"))
    rows = lambda i: sorted(map(tuple, spark.read.parquet(  # noqa: E731
        i.census_path).collect()))
    streamed = LineCensusIndex(idx_dir)
    assert rows(streamed) == rows(one)
    assert len(streamed.ingested_batches()) >= 1

    # post-commit replay: no double count
    before = rows(streamed)
    ingest_line_census(b, idx_dir,
                       batch_id=max(streamed.ingested_batches()))
    assert rows(streamed) == before


def test_aggregate_mart_maintenance_converges_and_replays(spark, tmp_path):
    """streaming/ingest.aggregate_mart_maintenance (X112): micro-batches
    of fact rows fold into a persisted grain mart through the real
    Runner aggregate path; the final mart equals the one-shot aggregate
    over all rows, and a replayed committed batch id no-ops — the
    bm25/census maintenance contract lifted to ANY declared aggregate
    model."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.core.model import ModelDef, ModelRegistry
    from dbt_demo_spark.core.runner import Runner
    from dbt_demo_spark.streaming.ingest import aggregate_mart_maintenance

    def offer_model():
        return ModelDef(
            name="offers", deps=("li",), materialized="incremental",
            incremental_strategy="aggregate", unique_key=("pk", "sk"),
            partition_by=("pk",),
            combine=(("min_cost", "min"), ("rev", "sum"), ("n", "count")),
            fn=lambda refs: (
                refs["li"].groupBy("pk", "sk")
                .agg(F.min("cost").alias("min_cost"),
                     F.sum("cost").alias("rev"),
                     F.count(F.lit(1)).alias("n"))))

    schema = "pk long, sk long, cost long"
    landing = str(tmp_path / "landing")
    a = [(1, 10, 500), (2, 20, 900)]
    b = [(2, 20, 100), (3, 30, 700), (1, 10, 200)]
    spark.createDataFrame(a, schema).write.parquet(landing + "/batch_a")
    spark.createDataFrame(b, schema).write.parquet(landing + "/batch_b")

    wh = str(tmp_path / "wh")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(landing + "/*"))
    q = (aggregate_mart_maintenance(stream, offer_model(), "li", wh,
                                    str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    mart = spark.read.parquet(wh + "/offers")
    got = sorted(map(tuple, mart.select(
        "pk", "sk", "min_cost", "rev", "n").collect()))
    # one-shot ground truth over all rows
    reg = ModelRegistry()
    reg.register(offer_model())
    r2 = Runner(spark, reg, str(tmp_path / "wh2"))
    try:
        one = r2.run({"li": spark.createDataFrame(a + b, schema)})["offers"]
        want = sorted(map(tuple, one.select(
            "pk", "sk", "min_cost", "rev", "n").collect()))
    finally:
        r2.clean()
    assert got == want
    ids = Runner._ingested_batch_ids(wh + "/offers")
    assert len(ids) >= 1

    # post-commit replay of the highest committed id: mart unchanged
    reg3 = ModelRegistry()
    reg3.register(offer_model())
    r3 = Runner(spark, reg3, wh)
    r3.run({"li": spark.createDataFrame(b, schema)},
           batch_id=max(ids))
    again = sorted(map(tuple, spark.read.parquet(wh + "/offers").select(
        "pk", "sk", "min_cost", "rev", "n").collect()))
    assert again == got

    # a non-aggregate model rejects the maintenance wrapper loudly
    import pytest as _pytest
    bad = ModelDef(name="x", deps=("li",), materialized="table",
                   fn=lambda refs: refs["li"])
    with _pytest.raises(ValueError, match="aggregate-strategy"):
        aggregate_mart_maintenance(stream, bad, "li", wh,
                                   str(tmp_path / "ckpt2"))
