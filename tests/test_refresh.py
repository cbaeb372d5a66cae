"""refresh="changed" — source-file-watermark mart refresh (core/runner.py).

The contract: a materialized model rebuilds IFF anything in its upstream
cone changed — its fn's code, its materialization params, an upstream
model, or any file its sources scan.  Unknowable inputs (in-memory
sources) always rebuild; the default refresh="full" never skips.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from dbt_demo_spark.core.model import ModelRegistry
from dbt_demo_spark.core.runner import Runner


def _write_src(spark, path: str, days):
    (spark.createDataFrame([(d, d * 10 + i) for d in days for i in range(3)],
                           "day int, v long")
     .coalesce(1).write.mode("overwrite").parquet(path))


def _registry():
    reg = ModelRegistry()

    @reg.model("stg_a", deps=("src_a",), materialized="view")
    def stg_a(refs):
        return refs["src_a"].filter(F.col("v") >= 0)

    @reg.model("mart_a", deps=("stg_a",), materialized="table")
    def mart_a(refs):
        return refs["stg_a"].groupBy("day").agg(F.sum("v").alias("total"))

    @reg.model("mart_b", deps=("src_b",), materialized="table")
    def mart_b(refs):
        return refs["src_b"].groupBy("day").agg(F.count(F.lit(1)).alias("n"))

    return reg


def _mtimes(path: str) -> dict[str, float]:
    return {f: os.path.getmtime(os.path.join(path, f))
            for f in os.listdir(path) if f.endswith(".parquet")}


def test_changed_refresh_skips_unchanged_and_rebuilds_touched(spark, tmp_path):
    src_a, src_b = str(tmp_path / "src_a"), str(tmp_path / "src_b")
    _write_src(spark, src_a, [1, 2])
    _write_src(spark, src_b, [1, 2, 3])
    wh = str(tmp_path / "wh")

    def sources():
        return {"src_a": spark.read.parquet(src_a),
                "src_b": spark.read.parquet(src_b)}

    r1 = Runner(spark, _registry(), wh)
    rel1 = r1.run(sources(), refresh="changed")
    assert set(r1.last_refresh_report["built"]) == {"stg_a", "mart_a", "mart_b"}
    assert r1.last_refresh_report["skipped"] == []
    before_a = _mtimes(os.path.join(wh, "mart_a"))
    before_b = _mtimes(os.path.join(wh, "mart_b"))
    want_a = {(r.day, r.total) for r in rel1["mart_a"].collect()}

    # nothing changed: a FRESH runner over the same warehouse skips both
    # marts (views are lazy plans, always "rebuilt" for free)
    r2 = Runner(spark, _registry(), wh)
    rel2 = r2.run(sources(), refresh="changed")
    assert set(r2.last_refresh_report["skipped"]) == {"mart_a", "mart_b"}
    assert _mtimes(os.path.join(wh, "mart_a")) == before_a
    assert _mtimes(os.path.join(wh, "mart_b")) == before_b
    assert {(r.day, r.total) for r in rel2["mart_a"].collect()} == want_a

    # touch ONE source: only its dependents rebuild
    _write_src(spark, src_b, [1, 2, 3, 4])
    r3 = Runner(spark, _registry(), wh)
    rel3 = r3.run(sources(), refresh="changed")
    assert "mart_b" in r3.last_refresh_report["built"]
    assert "mart_a" in r3.last_refresh_report["skipped"]
    assert _mtimes(os.path.join(wh, "mart_a")) == before_a
    assert {r.day for r in rel3["mart_b"].collect()} == {1, 2, 3, 4}


def test_changed_refresh_rebuilds_on_model_code_change(spark, tmp_path):
    """The fingerprint chains the model fn's SOURCE TEXT (dbt's
    state:modified checksum analog): redefining the model logic over the
    same warehouse and unchanged data must rebuild."""
    src = str(tmp_path / "src")
    _write_src(spark, src, [1, 2])
    wh = str(tmp_path / "wh")

    reg1 = ModelRegistry()

    @reg1.model("m", deps=("src",), materialized="table")
    def m_v1(refs):
        return refs["src"].groupBy("day").agg(F.sum("v").alias("total"))

    r1 = Runner(spark, reg1, wh)
    r1.run({"src": spark.read.parquet(src)}, refresh="changed")
    assert r1.last_refresh_report["built"] == ["m"]

    reg2 = ModelRegistry()

    @reg2.model("m", deps=("src",), materialized="table")
    def m_v2(refs):
        return refs["src"].groupBy("day").agg(F.max("v").alias("total"))

    r2 = Runner(spark, reg2, wh)
    rel = r2.run({"src": spark.read.parquet(src)}, refresh="changed")
    assert r2.last_refresh_report["built"] == ["m"]
    assert {(r.day, r.total) for r in rel["m"].collect()} == {(1, 12), (2, 22)}

    # and the SAME definition text skips again
    r3 = Runner(spark, reg2, wh)
    r3.run({"src": spark.read.parquet(src)}, refresh="changed")
    assert r3.last_refresh_report["skipped"] == ["m"]


def test_changed_refresh_never_skips_in_memory_sources(spark, tmp_path):
    reg = ModelRegistry()

    @reg.model("m", deps=("src",), materialized="table")
    def m(refs):
        return refs["src"].groupBy("day").agg(F.sum("v").alias("total"))

    wh = str(tmp_path / "wh")
    src = spark.createDataFrame([(1, 10)], "day int, v long")
    for _ in range(2):
        r = Runner(spark, reg, wh)
        r.run({"src": src}, refresh="changed")
        assert r.last_refresh_report == {"built": ["m"], "skipped": []}


def test_full_refresh_never_skips(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_src(spark, src, [1])
    wh = str(tmp_path / "wh")
    reg = _registry()
    _write_src(spark, str(tmp_path / "src_b"), [1])
    srcs = {"src_a": spark.read.parquet(src),
            "src_b": spark.read.parquet(str(tmp_path / "src_b"))}
    Runner(spark, reg, wh).run(srcs, refresh="changed")
    r = Runner(spark, reg, wh)
    r.run(srcs)  # default refresh="full"
    assert r.last_refresh_report["skipped"] == []
    assert set(r.last_refresh_report["built"]) == {"stg_a", "mart_a", "mart_b"}


def test_changed_refresh_parallel_matches_sequential(spark, tmp_path):
    src_a, src_b = str(tmp_path / "src_a"), str(tmp_path / "src_b")
    _write_src(spark, src_a, [1, 2])
    _write_src(spark, src_b, [3])
    wh = str(tmp_path / "wh")
    srcs = lambda: {"src_a": spark.read.parquet(src_a),
                    "src_b": spark.read.parquet(src_b)}
    Runner(spark, _registry(), wh).run(srcs(), refresh="changed")
    r = Runner(spark, _registry(), wh)
    rel = r.run(srcs(), refresh="changed", threads=4)
    assert set(r.last_refresh_report["skipped"]) == {"mart_a", "mart_b"}
    assert {x.day for x in rel["mart_a"].collect()} == {1, 2}


def test_changed_refresh_rebuilds_on_source_plan_change(spark, tmp_path):
    """The fingerprint includes each source's CANONICALIZED plan, not just
    its files: re-filtering the same files is a changed source (r8
    self-review — file stats alone would stale-skip and serve wrong
    data)."""
    src = str(tmp_path / "src")
    _write_src(spark, src, [1, 2])
    wh = str(tmp_path / "wh")
    reg = ModelRegistry()

    @reg.model("m", deps=("src",), materialized="table")
    def m(refs):
        return refs["src"].groupBy("day").agg(F.sum("v").alias("total"))

    r1 = Runner(spark, reg, wh)
    r1.run({"src": spark.read.parquet(src).filter("v > 0")},
           refresh="changed")
    r2 = Runner(spark, reg, wh)
    rel = r2.run({"src": spark.read.parquet(src).filter("v > 11")},
                 refresh="changed")
    assert r2.last_refresh_report["built"] == ["m"]
    assert {r.day for r in rel["m"].collect()} == {1, 2}
    # identical plan text skips again
    r3 = Runner(spark, reg, wh)
    r3.run({"src": spark.read.parquet(src).filter("v > 11")},
           refresh="changed")
    assert r3.last_refresh_report["skipped"] == ["m"]


def test_changed_refresh_handles_percent_encoded_paths(spark, tmp_path):
    """inputFiles() returns percent-encoded URIs; a space in the source
    directory must not kill skipping (r8 self-review: os.stat on the raw
    encoded path failed and silently disabled the feature)."""
    src = str(tmp_path / "my dir" / "src")
    _write_src(spark, src, [1])
    wh = str(tmp_path / "wh")
    reg = ModelRegistry()

    @reg.model("m", deps=("src",), materialized="table")
    def m(refs):
        return refs["src"].groupBy("day").agg(F.sum("v").alias("total"))

    Runner(spark, reg, wh).run({"src": spark.read.parquet(src)},
                               refresh="changed")
    r = Runner(spark, reg, wh)
    r.run({"src": spark.read.parquet(src)}, refresh="changed")
    assert r.last_refresh_report["skipped"] == ["m"]
