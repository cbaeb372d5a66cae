"""Parallel DAG execution (core/runner.py threads>1, the dbt `threads`
profile analog): independent branches overlap wall-clock, dependency
order is still honored, outputs are identical to the sequential run, and
a failing model propagates."""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from dbt_demo_spark.core.model import ModelRegistry
from dbt_demo_spark.core.runner import Runner


def _diamond_registry(sleep_sec: float, log: list | None = None):
    """src -> (left, right) -> joined: the classic diamond.  left/right
    sleep in the model fn so a parallel runner overlaps them."""
    reg = ModelRegistry()

    def mark(name):
        if log is not None:
            log.append((name, time.perf_counter()))

    @reg.model("left", deps=("src",))
    def left(refs):
        mark("left")
        time.sleep(sleep_sec)
        mark("left_end")
        return refs["src"].withColumn("l", F.col("k") * 2)

    @reg.model("right", deps=("src",))
    def right(refs):
        mark("right")
        time.sleep(sleep_sec)
        mark("right_end")
        return refs["src"].withColumn("r", F.col("k") * 3)

    @reg.model("joined", deps=("left", "right"), materialized="table")
    def joined(refs):
        mark("joined")
        return refs["left"].join(refs["right"], "k")

    return reg


def test_parallel_diamond_overlaps_and_matches_sequential(spark, tmp_path):
    src = spark.range(100).select(F.col("id").alias("k"))

    seq = Runner(spark, _diamond_registry(0.0),
                 warehouse_dir=str(tmp_path / "seq")).run({"src": src})
    want = sorted(map(tuple, seq["joined"].collect()))

    log: list = []
    par = Runner(spark, _diamond_registry(1.0, log),
                 warehouse_dir=str(tmp_path / "par")).run(
        {"src": src}, threads=4)

    # identical outputs
    assert sorted(map(tuple, par["joined"].collect())) == want
    # the two 1s sleeps OVERLAPPED: each branch started before the other
    # finished.  (Interval overlap, not a total-wall bound — a wall bound
    # flakes under ambient host load, which delays job submission but
    # cannot forge an overlap.)
    starts0 = dict()
    for name, t in log:
        starts0.setdefault(name, t)
    assert starts0["left"] < starts0["right_end"], log
    assert starts0["right"] < starts0["left_end"], log
    # dependency gate held: joined started after both branch fns began
    starts = dict()
    for name, t in log:
        starts.setdefault(name, t)
    assert starts["joined"] >= max(starts["left"], starts["right"])


def test_parallel_matches_sequential_on_fiction_bank_shapes(spark, tmp_path):
    """A wider registry: two independent staging views + two marts, one of
    them depending on both staging models."""
    reg = ModelRegistry()

    @reg.model("stg_a", deps=("raw_a",))
    def stg_a(refs):
        return refs["raw_a"].select("k", (F.col("k") + 1).alias("a"))

    @reg.model("stg_b", deps=("raw_b",))
    def stg_b(refs):
        return refs["raw_b"].select("k", (F.col("k") + 2).alias("b"))

    @reg.model("mart_a", deps=("stg_a",), materialized="table")
    def mart_a(refs):
        return refs["stg_a"].groupBy().agg(F.sum("a").alias("sa"))

    @reg.model("mart_ab", deps=("stg_a", "stg_b"), materialized="table")
    def mart_ab(refs):
        return refs["stg_a"].join(refs["stg_b"], "k")

    raw_a = spark.range(50).select(F.col("id").alias("k"))
    raw_b = spark.range(50).select(F.col("id").alias("k"))
    seq = Runner(spark, reg, warehouse_dir=str(tmp_path / "s")).run(
        {"raw_a": raw_a, "raw_b": raw_b})
    par = Runner(spark, reg, warehouse_dir=str(tmp_path / "p")).run(
        {"raw_a": raw_a, "raw_b": raw_b}, threads=3)
    for m in ("mart_a", "mart_ab"):
        assert sorted(map(tuple, par[m].collect())) == \
            sorted(map(tuple, seq[m].collect()))


def test_parallel_propagates_model_errors(spark, tmp_path):
    reg = ModelRegistry()

    @reg.model("ok", deps=("src",))
    def ok(refs):
        return refs["src"]

    @reg.model("boom", deps=("src",))
    def boom(refs):
        raise RuntimeError("model exploded")

    src = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(RuntimeError, match="model exploded"):
        Runner(spark, reg, warehouse_dir=str(tmp_path)).run(
            {"src": src}, threads=2)


def test_parallel_unresolved_refs_raise(spark, tmp_path):
    reg = ModelRegistry()

    @reg.model("m", deps=("missing_src",))
    def m(refs):
        return refs["missing_src"]

    with pytest.raises(KeyError, match="missing_src"):
        Runner(spark, reg, warehouse_dir=str(tmp_path)).run({}, threads=2)


def test_cache_sources_identity_and_release(spark, tmp_path):
    """run(cache_sources=True): identical outputs, and the source cache is
    released after the run (no lingering cache dependence — the same
    contract as shared_scans)."""
    from pyspark import StorageLevel

    reg = ModelRegistry()

    @reg.model("m1", deps=("src",), materialized="table")
    def m1(refs):
        return refs["src"].groupBy().agg(F.sum("k").alias("s"))

    @reg.model("m2", deps=("src",), materialized="table")
    def m2(refs):
        return refs["src"].groupBy().agg(F.count(F.lit(1)).alias("c"))

    src = spark.range(1000).select(F.col("id").alias("k"))
    plain = Runner(spark, reg, warehouse_dir=str(tmp_path / "a")).run(
        {"src": src})
    cached = Runner(spark, reg, warehouse_dir=str(tmp_path / "b")).run(
        {"src": src}, cache_sources=True, threads=2)
    for m in ("m1", "m2"):
        assert cached[m].collect() == plain[m].collect()
    # cache released: storage level back to NONE
    assert src.storageLevel == StorageLevel.NONE

    # released on error too
    @reg.model("boom2", deps=("src",))
    def boom2(refs):
        raise RuntimeError("nope")

    with pytest.raises(RuntimeError):
        Runner(spark, reg, warehouse_dir=str(tmp_path / "c")).run(
            {"src": src}, cache_sources=True)
    assert src.storageLevel == StorageLevel.NONE
