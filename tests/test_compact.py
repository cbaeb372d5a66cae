"""Small-file compaction (operators/compact.py): exact row preservation,
file-count reduction, idempotence, partition-leaf independence, and
crash-leftover tolerance."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from dbt_demo_spark.operators.compact import (_leaf_dirs, compact_parquet,
                                              plan_compaction)


def _rows(spark, path):
    from collections import Counter
    return Counter(tuple(r) for r in
                   spark.read.parquet(path).collect())


def _fragmented(spark, path, parts=16, partitioned=True):
    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") % 4).alias("k"),
        F.sha1(F.col("id").cast("string")).alias("payload"))
    w = df.repartition(parts).write.mode("overwrite")
    if partitioned:
        w = w.partitionBy("k")
    w.parquet(path)
    return df


def test_partitioned_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _fragmented(spark, path, parts=16)
    before = _rows(spark, path)
    plan = plan_compaction(path, target_bytes=1 << 30)
    assert all(l["rewrite"] for l in plan["leaves"])
    rec = compact_parquet(spark, path, target_bytes=1 << 30)
    assert rec["leaves_rewritten"] == 4          # one leaf per k
    assert rec["files_after"] == 4               # one file per leaf
    assert rec["files_before"] > rec["files_after"]
    assert _rows(spark, path) == before
    # partition column survives (it lives in the dir names)
    assert set(r.k for r in spark.read.parquet(path).select("k")
               .distinct().collect()) == {0, 1, 2, 3}


def test_unpartitioned_root_leaf(spark, tmp_path):
    path = str(tmp_path / "flat")
    _fragmented(spark, path, parts=12, partitioned=False)
    before = _rows(spark, path)
    rec = compact_parquet(spark, path, target_bytes=1 << 30)
    assert rec["leaves_rewritten"] == 1 and rec["files_after"] == 1
    assert _rows(spark, path) == before


def test_idempotent_second_pass_rewrites_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    _fragmented(spark, path)
    compact_parquet(spark, path, target_bytes=1 << 30)
    rec2 = compact_parquet(spark, path, target_bytes=1 << 30)
    assert rec2["leaves_rewritten"] == 0
    assert rec2["files_after"] == rec2["files_before"]


def test_target_bytes_bins_files(spark, tmp_path):
    """A small target must yield multiple output files per leaf —
    ceil(leaf_bytes / target)."""
    path = str(tmp_path / "flat")
    _fragmented(spark, path, parts=12, partitioned=False)
    total = sum(sz for l in plan_compaction(path)["leaves"]
                for sz in [l["bytes"]])
    target = max(1, total // 3)
    rec = compact_parquet(spark, path, target_bytes=target)
    got = plan_compaction(path)["leaves"][0]["files"]
    assert 2 <= got <= 5
    assert rec["files_after"] == got


def test_crash_leftover_dirs_are_ignored(spark, tmp_path):
    """Stale *.__compact_old__ / *.__compact_new__ dirs from a crashed run
    must be invisible to planning (never treated as leaves)."""
    path = str(tmp_path / "t")
    _fragmented(spark, path)
    leaf = os.path.join(path, "k=0")
    os.makedirs(leaf + ".__compact_old__")
    with open(os.path.join(leaf + ".__compact_old__", "junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    plan = plan_compaction(path)
    assert all("__compact_" not in l["leaf"] for l in plan["leaves"])
    assert len(_leaf_dirs(path)) == 4


def test_compaction_after_streaming_ingest(spark, tmp_path):
    """The maintenance pass composes with the ingestion warehouse: each
    ingest_batch_id leaf compacts independently, rows and the partition
    column survive exactly, and a restart with no new files still sees
    the compacted layout untouched (exactly-once unaffected — a replayed
    batch would dynamic-overwrite its own leaf wholesale anyway)."""
    from dbt_demo_spark.sources.parquet import load_table
    from dbt_demo_spark.streaming import clean_ingest, read_document_stream
    from tests.conftest import SF_GATE

    docs = load_table(spark, SF_GATE, "documents")
    landing = str(tmp_path / "landing")
    docs.filter("doc_id < 250").coalesce(1).write.parquet(landing, mode="append")
    docs.filter("doc_id >= 250").coalesce(1).write.parquet(landing, mode="append")

    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    stream = read_document_stream(spark, landing, max_files_per_trigger=1)
    q = (clean_ingest(stream, idx, out, str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    before = _rows(spark, out)
    batches = {r.ingest_batch_id for r in
               spark.read.parquet(out).select("ingest_batch_id")
               .distinct().collect()}
    assert len(batches) == 2

    # locally AQE coalesces each micro-batch to one file; a cluster write
    # lands tasks-many files per leaf — simulate that fragmentation
    for leaf in [l["leaf"] for l in plan_compaction(out)["leaves"]]:
        lp = os.path.join(out, leaf)
        frag = spark.read.parquet(lp).repartition(5)
        frag.write.mode("overwrite").parquet(lp + ".__frag__")
        import shutil
        shutil.rmtree(lp)
        os.rename(lp + ".__frag__", lp)
    assert all(l["files"] == 5 for l in plan_compaction(out)["leaves"])
    assert _rows(spark, out) == before

    rec = compact_parquet(spark, out, target_bytes=1 << 30)
    assert rec["leaves_rewritten"] == 2
    assert rec["files_after"] == 2
    assert _rows(spark, out) == before

    # restart with no new landing files: nothing fires, layout untouched
    files_now = plan_compaction(out)["leaves"]
    q = (clean_ingest(read_document_stream(spark, landing,
                                           max_files_per_trigger=1),
                      idx, out, str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert plan_compaction(out)["leaves"] == files_now
    assert _rows(spark, out) == before
