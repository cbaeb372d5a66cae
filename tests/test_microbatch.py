"""X96 microbatch incremental strategy (core/runner.py
_materialize_microbatch) [public dbt surface: dbt-core 1.9 —
incremental_strategy='microbatch', event_time / batch_size / lookback /
begin]: per-period batches, upstream event-time filtering, dynamic
partition overwrite per batch, late-data lookback, deterministic
data-driven bounds (no wall clock)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from dbt_demo_spark.core.model import ModelDef, ModelRegistry
from dbt_demo_spark.core.runner import Runner


def _events(spark, rows):
    return spark.createDataFrame(
        [(uid, dt.datetime.fromisoformat(ts), amt) for uid, ts, amt in rows],
        "user_id long, ts timestamp, amount long")


def _dim(spark):
    return spark.createDataFrame([(1, "gold"), (2, "basic")],
                                 "user_id long, tier string")


def _mb_model(**over):
    base = dict(
        name="daily_rollup", deps=("ev", "dim"),
        materialized="incremental", incremental_strategy="microbatch",
        event_time="ts", batch_size="day", begin="2024-03-01",
        partition_by=("day",),
        fn=lambda refs: (
            refs["ev"].join(F.broadcast(refs["dim"]), "user_id")
            .groupBy(F.col("ts").cast("date").alias("day"),
                     F.col("tier"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("amount").alias("amt"),
                 F.max("ts").alias("ts"))))
    base.update(over)
    return ModelDef(**base)


def test_microbatch_first_build_backfills_from_begin(spark, tmp_path):
    """First build enumerates day batches from `begin` through the max
    upstream event_time; the dim (no event_time) joins fully in every
    batch; per-batch windows are reported."""
    reg = ModelRegistry()
    reg.register(_mb_model())
    r = Runner(spark, reg, str(tmp_path / "wh"),
               source_event_time={"ev": "ts"})
    ev = _events(spark, [
        (1, "2024-03-01T05:00:00", 10),
        (1, "2024-03-01T06:00:00", 5),
        (2, "2024-03-02T09:00:00", 7),
        (1, "2024-03-04T01:00:00", 3),   # gap: 03-03 has no rows
    ])
    try:
        rels = r.run({"ev": ev, "dim": _dim(spark)})
        got = {(str(x.day), x.tier, x.n, x.amt)
               for x in rels["daily_rollup"].collect()}
        assert got == {("2024-03-01", "gold", 2, 15),
                       ("2024-03-02", "basic", 1, 7),
                       ("2024-03-04", "gold", 1, 3)}
        # 4 batches enumerated (01..04 inclusive), empty day included
        assert len(r.last_microbatch_report["daily_rollup"]) == 4
    finally:
        r.clean()


def test_microbatch_refresh_reprocesses_lookback_only(spark, tmp_path):
    """A refresh rebuilds from (existing max event_time - lookback)
    periods: a late-arriving row inside the lookback window lands; rows
    before the window keep their original values (their batch was not
    re-run); new periods append."""
    reg = ModelRegistry()
    reg.register(_mb_model(lookback=1))
    r = Runner(spark, reg, str(tmp_path / "wh"),
               source_event_time={"ev": "ts"})
    try:
        first = [
            (1, "2024-03-01T05:00:00", 10),
            (2, "2024-03-02T09:00:00", 7),
        ]
        r.run({"ev": _events(spark, first), "dim": _dim(spark)})
        # refresh: late row for 03-02 (inside lookback=1 of max=03-02),
        # a MUTATED 03-01 row (outside the window — must NOT land),
        # and a new day 03-03
        second = [
            (1, "2024-03-01T05:00:00", 999),  # outside lookback: ignored
            (2, "2024-03-02T09:00:00", 7),
            (2, "2024-03-02T23:00:00", 100),  # late arrival: lands
            (1, "2024-03-03T08:00:00", 1),    # new period
        ]
        rels = r.run({"ev": _events(spark, second), "dim": _dim(spark)})
        got = {(str(x.day), x.tier, x.n, x.amt)
               for x in rels["daily_rollup"].collect()}
        assert got == {("2024-03-01", "gold", 1, 10),     # untouched
                       ("2024-03-02", "basic", 2, 107),   # re-batched
                       ("2024-03-03", "gold", 1, 1)}      # appended
        # start = min(bookmark 03-02, now 03-03 - lookback 1) = 03-02;
        # batches 03-02 and 03-03 -> two windows, 03-01 untouched
        assert len(r.last_microbatch_report["daily_rollup"]) == 2
    finally:
        r.clean()


def test_microbatch_upstream_model_event_time(spark, tmp_path):
    """An upstream registry MODEL declaring event_time is filtered per
    batch, exactly like a source with source_event_time."""
    reg = ModelRegistry()
    reg.register(ModelDef(
        name="staged", deps=("ev",), materialized="view",
        event_time="ts",
        fn=lambda refs: refs["ev"].withColumn(
            "amount2", F.col("amount") * 2)))
    reg.register(_mb_model(
        deps=("staged", "dim"),
        fn=lambda refs: (
            refs["staged"].join(F.broadcast(refs["dim"]), "user_id")
            .groupBy(F.col("ts").cast("date").alias("day"), F.col("tier"))
            .agg(F.sum("amount2").alias("amt"),
                 F.max("ts").alias("ts")))))
    r = Runner(spark, reg, str(tmp_path / "wh"))
    ev = _events(spark, [(1, "2024-03-01T05:00:00", 10),
                         (2, "2024-03-02T09:00:00", 7)])
    try:
        rels = r.run({"ev": ev, "dim": _dim(spark)})
        got = {(str(x.day), x.tier, x.amt)
               for x in rels["daily_rollup"].collect()}
        assert got == {("2024-03-01", "gold", 20),
                       ("2024-03-02", "basic", 14)}
    finally:
        r.clean()


def test_microbatch_month_batches_and_gap(spark, tmp_path):
    """Month-size batches enumerate calendar months (not 30-day hops)."""
    reg = ModelRegistry()
    reg.register(_mb_model(batch_size="month", begin="2024-01-01",
                           partition_by=("day",)))
    r = Runner(spark, reg, str(tmp_path / "wh"),
               source_event_time={"ev": "ts"})
    ev = _events(spark, [(1, "2024-01-15T00:00:00", 1),
                         (1, "2024-03-02T00:00:00", 2)])
    try:
        r.run({"ev": ev, "dim": _dim(spark)})
        assert r.last_microbatch_report["daily_rollup"] == [
            "[2024-01-01 00:00:00 .. 2024-02-01 00:00:00)",
            "[2024-02-01 00:00:00 .. 2024-03-01 00:00:00)",
            "[2024-03-01 00:00:00 .. 2024-04-01 00:00:00)"]
    finally:
        r.clean()


def test_microbatch_error_matrix(spark, tmp_path):
    """Config and runtime errors fail loud with the documented reasons."""
    reg = ModelRegistry()
    # registration-time matrix
    with pytest.raises(ValueError, match="requires event_time"):
        reg.register(_mb_model(event_time=""))
    with pytest.raises(ValueError, match="hour | day | month | year"):
        reg.register(_mb_model(batch_size="week"))
    with pytest.raises(ValueError, match="requires partition_by"):
        reg.register(_mb_model(partition_by=()))
    with pytest.raises(ValueError, match="only applies to incremental"):
        reg.register(_mb_model(materialized="table"))
    with pytest.raises(ValueError, match="batch_size/begin only apply"):
        reg.register(ModelDef(name="x", deps=("s",), materialized="table",
                              fn=lambda r: r["s"], batch_size="day"))
    with pytest.raises(ValueError, match="lookback only applies"):
        reg.register(ModelDef(name="x", deps=("s",), materialized="table",
                              fn=lambda r: r["s"], lookback=2))
    with pytest.raises(ValueError, match="mutually exclusive"):
        reg.register(_mb_model(watermark_col="ts"))

    # run-time matrix
    reg2 = ModelRegistry()
    reg2.register(_mb_model(begin=""))
    r = Runner(spark, reg2, str(tmp_path / "wh1"),
               source_event_time={"ev": "ts"})
    ev = _events(spark, [(1, "2024-03-01T05:00:00", 10)])
    with pytest.raises(ValueError, match="requires\\s+begin"):
        r.run({"ev": ev, "dim": _dim(spark)})

    reg3 = ModelRegistry()
    reg3.register(_mb_model())
    r3 = Runner(spark, reg3, str(tmp_path / "wh2"))  # no event_time map
    with pytest.raises(ValueError, match="no upstream with an\\s+event_time"):
        r3.run({"ev": ev, "dim": _dim(spark)})

    # model output must carry the declared event_time column
    reg4 = ModelRegistry()
    reg4.register(_mb_model(fn=lambda refs: (
        refs["ev"].groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n")))))
    r4 = Runner(spark, reg4, str(tmp_path / "wh3"),
                source_event_time={"ev": "ts"})
    with pytest.raises(RuntimeError, match="missing the declared event_time"):
        r4.run({"ev": ev, "dim": _dim(spark)})


def test_microbatch_sql_model_via_port(spark, tmp_path):
    """The config plumbs through a ported SQL model's {{ config(...) }}
    — the dbt spelling end-to-end."""
    import textwrap

    (tmp_path / "dbt_project.yml").write_text(textwrap.dedent("""\
        name: 'p'
        model-paths: ["models"]
        """))
    mdir = tmp_path / "models"
    mdir.mkdir()
    (mdir / "mb.sql").write_text(
        "{{ config(materialized='incremental', "
        "incremental_strategy='microbatch', event_time='ts', "
        "batch_size='day', begin='2024-03-01', partition_by='day') }}\n"
        "select cast(ts as date) as day, count(*) as n, max(ts) as ts "
        "from {{ source('raw', 'ev') }} group by 1")
    from dbt_demo_spark.core.project import port_dbt_project

    p = port_dbt_project(spark, str(tmp_path))
    assert p.registry["mb"].incremental_strategy == "microbatch"
    assert p.registry["mb"].batch_size == "day"
    r = Runner(spark, p.registry, str(tmp_path / "wh"),
               source_event_time={"ev": "ts"})
    ev = _events(spark, [(1, "2024-03-01T05:00:00", 1),
                         (2, "2024-03-02T05:00:00", 2)])
    try:
        rels = r.run({"ev": ev})
        got = {(str(x.day), x.n) for x in rels["mb"].collect()}
        assert got == {("2024-03-01", 1), ("2024-03-02", 1)}
    finally:
        r.clean()
