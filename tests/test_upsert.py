"""Keyed LWW materialized view (streaming/upsert.py): the consumer-side
upsert the daily spine's append-mode OUTPUT CONTRACT prescribes —
batch-level merge semantics, replay convergence, and the end-to-end
foreachBatch stream."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest

from dbt_demo_spark.streaming.upsert import lww_upsert_batch, spine_lww_view

D = datetime.date
SCHEMA = "user_id long, day date, gauge double, observed boolean"


def _store(spark, path):
    return {((r.user_id), r.day): (r.gauge, r.observed)
            for r in spark.read.parquet(path).collect()}


def test_lww_upsert_merges_and_replays_convergently(spark, tmp_path):
    store = str(tmp_path / "store")
    b1 = spark.createDataFrame(
        [(1, D(2024, 1, 1), 5.0, True), (1, D(2024, 1, 2), 5.0, False),
         (2, D(2024, 1, 1), 3.0, True)], SCHEMA)
    lww_upsert_batch(b1, store, ("user_id", "day"), "day",
                     tiebreak_cols=("observed",))
    assert _store(spark, store) == {
        (1, D(2024, 1, 1)): (5.0, True), (1, D(2024, 1, 2)): (5.0, False),
        (2, D(2024, 1, 1)): (3.0, True)}

    # batch 2: cross-batch refinement of (1, Jan-2) + a new day — the
    # refined row REPLACES the carry (the spine contract), other users'
    # rows in the same partition survive the overwrite
    b2 = spark.createDataFrame(
        [(1, D(2024, 1, 2), 9.0, True), (2, D(2024, 1, 2), 4.0, True)],
        SCHEMA)
    lww_upsert_batch(b2, store, ("user_id", "day"), "day",
                     tiebreak_cols=("observed",))
    want = {(1, D(2024, 1, 1)): (5.0, True), (1, D(2024, 1, 2)): (9.0, True),
            (2, D(2024, 1, 1)): (3.0, True), (2, D(2024, 1, 2)): (4.0, True)}
    assert _store(spark, store) == want

    # replay of batch 2 (crash-after-commit window): idempotent
    lww_upsert_batch(b2, store, ("user_id", "day"), "day",
                     tiebreak_cols=("observed",))
    assert _store(spark, store) == want


def test_lww_within_batch_tiebreak_prefers_observed(spark, tmp_path):
    store = str(tmp_path / "store")
    b = spark.createDataFrame(
        [(1, D(2024, 1, 1), 2.0, False), (1, D(2024, 1, 1), 7.0, True)],
        SCHEMA)
    lww_upsert_batch(b, store, ("user_id", "day"), "day",
                     tiebreak_cols=("observed",))
    assert _store(spark, store) == {(1, D(2024, 1, 1)): (7.0, True)}


def test_spine_lww_view_end_to_end(spark, tmp_path):
    """File-stream the spine's output-contract shape (one file per
    micro-batch, maxFilesPerTrigger=1) through spine_lww_view: the store
    holds exactly the LWW-collapsed grid."""
    land = tmp_path / "landing"
    land.mkdir()
    batches = [
        [(1, D(2024, 1, 1), 5.0, True), (2, D(2024, 1, 1), 1.0, True)],
        [(1, D(2024, 1, 1), 8.0, True), (1, D(2024, 1, 2), 8.0, False)],
        [(2, D(2024, 1, 2), 2.0, True)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.parquet(str(land / f"b{i}"))
    files = sorted(str(p) for p in land.rglob("*.parquet")
                   if not p.name.startswith("_"))
    # one landing dir the file source tails; files arrive in batch order
    flat = tmp_path / "flat"
    flat.mkdir()
    import os
    import shutil
    for i, f in enumerate(files):
        dst = flat / f"part-{i}.parquet"
        shutil.copy(f, dst)
        # distinct mtimes pin arrival order: the file source orders by
        # (timestamp, path), and copies can land within one clock tick
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(flat)))
    store = str(tmp_path / "store")
    q = (spine_lww_view(stream, store, str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = _store(spark, store)
    assert got[(1, D(2024, 1, 1))] == (8.0, True)     # refined won
    assert got[(1, D(2024, 1, 2))] == (8.0, False)    # carry present
    assert got[(2, D(2024, 1, 2))] == (2.0, True)
    assert len(got) == 4
    # day partitioning on disk -> consumer reads prune by day
    import os
    assert any(d.startswith("day=") for d in os.listdir(store))


def test_lww_without_tiebreak_dedups_keys(spark, tmp_path):
    store = str(tmp_path / "store")
    b = spark.createDataFrame([(1, D(2024, 1, 1), 2.0, True)], SCHEMA)
    lww_upsert_batch(b, store, ("user_id", "day"), "day")
    assert _store(spark, store) == {(1, D(2024, 1, 1)): (2.0, True)}
    with pytest.raises(ValueError, match="partition_col"):
        lww_upsert_batch(b.drop("day"), store, ("user_id",), "day")


def test_lww_without_tiebreak_rejects_duplicate_keys(spark, tmp_path):
    """ADVICE r9: with no tiebreak_cols, a duplicate-key batch must raise
    — dropDuplicates would pick an arbitrary survivor, and a replay could
    pick a DIFFERENT one, silently breaking replay convergence."""
    store = str(tmp_path / "store")
    dup = spark.createDataFrame(
        [(1, D(2024, 1, 1), 2.0, True), (1, D(2024, 1, 1), 3.0, False)],
        SCHEMA)
    with pytest.raises(ValueError, match="tiebreak_cols"):
        lww_upsert_batch(dup, store, ("user_id", "day"), "day")
    # the same batch is fine once a tiebreak makes the winner explicit
    lww_upsert_batch(dup, store, ("user_id", "day"), "day",
                     tiebreak_cols=("gauge",))
    assert _store(spark, store) == {(1, D(2024, 1, 1)): (3.0, False)}
