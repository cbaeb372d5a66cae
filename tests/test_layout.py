"""Z-order layout (operators/layout.py): Morton math, row preservation,
and the data-skipping receipt — a Z-ordered table must let a box predicate
skip most files where the unsorted layout reads ~all of them."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dbt_demo_spark.operators.layout import (morton_expr, skipping_receipt,
                                             write_zordered, zorder_column)


def test_morton_interleaves_bits(spark):
    """morton(x, y) with 4 bits: known hand-computed values."""
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], ["x", "y"])
    out = df.select(
        morton_expr([F.col("x").cast("long"), F.col("y").cast("long")], 4)
        .alias("z")).collect()
    got = [r.z for r in out]
    # bit i of x -> output bit 2i; bit i of y -> output bit 2i+1
    assert got == [0, 1, 2, 0b100111]  # x=3(0b11),y=5(0b101) -> 39


def test_zorder_write_preserves_rows(spark, tmp_path):
    df = spark.range(0, 4000).select(
        (F.col("id") % 63).alias("x"),
        ((F.col("id") * 7919) % 61).alias("y"),
        F.col("id").alias("payload"))
    path = str(tmp_path / "z")
    write_zordered(df, path, ["x", "y"], n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 4000
    assert ({tuple(r) for r in back.collect()}
            == {tuple(r) for r in df.collect()})


def test_skipping_receipt_zorder_beats_unsorted(spark, tmp_path):
    """Uniform 2-D grid, box = ~1/64 of the space: the unsorted layout
    reads every file; the Z-ordered one reads a small fraction."""
    df = spark.range(0, 60_000).select(
        (F.col("id") % 251).alias("x"),
        ((F.col("id") * 104729) % 241).alias("y"),
        F.sha1(F.col("id").cast("string")).alias("pad"))
    flat = str(tmp_path / "flat")
    df.repartition(16).write.mode("overwrite").parquet(flat)
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, ["x", "y"], n_files=16)

    box = {"x": (0, 31), "y": (0, 30)}  # ~1/64 of the (251 x 241) space
    r_flat = skipping_receipt(flat, box)
    r_z = skipping_receipt(zpath, box)
    assert r_flat["files"] == 16 and r_z["files"] == 16
    assert r_flat["frac_read"] == 1.0, "random layout cannot prune"
    assert r_z["frac_read"] <= 0.25, r_z
    # and the receipt agrees with ground truth: matching rows exist
    n = (spark.read.parquet(zpath)
         .filter((F.col("x") <= 31) & (F.col("y") <= 30)).count())
    assert n > 0


def test_single_and_degenerate_columns(spark, tmp_path):
    df = spark.range(0, 1000).select(
        (F.col("id") % 97).alias("x"), F.lit(5).alias("c"))
    # degenerate column ranks to 0 and must not break anything
    z = zorder_column(df, ["x", "c"], bits=8)
    assert df.select(z.alias("z")).distinct().count() > 1
    with pytest.raises(ValueError):
        zorder_column(df, [], bits=8)
    with pytest.raises(ValueError):
        zorder_column(df, ["x", "c"], bits=32)


def test_runner_zorder_materialization(spark, tmp_path):
    """A table model with zorder_by writes a Morton-clustered layout: rows
    identical to the plain build, and the skipping receipt shows real
    pruning for a box predicate while a random layout reads everything."""
    import pyspark.sql.functions as F
    from dbt_demo_spark.core.model import ModelRegistry
    from dbt_demo_spark.core.runner import Runner

    reg = ModelRegistry()

    @reg.model("pts_z", deps=("raw",), materialized="table",
               zorder_by=("x", "y"), zorder_files=16)
    def pts_z(refs):
        return refs["raw"].repartition(16)

    src = spark.range(0, 60_000).select(
        (F.col("id") % 251).alias("x"),
        ((F.col("id") * 104729) % 241).alias("y"),
        F.sha1(F.col("id").cast("string")).alias("pad"))
    wh = str(tmp_path / "wh")
    runner = Runner(spark, reg, warehouse_dir=wh, catalog_namespace="zt")
    out = runner.run({"raw": src})["pts_z"]
    assert out.count() == 60_000
    import os
    rec = skipping_receipt(os.path.join(wh, "pts_z"),
                           {"x": (0, 31), "y": (0, 30)})
    assert rec["files"] == 16
    assert rec["frac_read"] <= 0.25, rec


def test_zorder_bucket_conflict_rejected():
    from dbt_demo_spark.core.model import ModelRegistry
    import pytest as _pytest

    reg = ModelRegistry()
    with _pytest.raises(ValueError, match="mutually exclusive"):
        @reg.model("bad", materialized="table", zorder_by=("x",),
                   bucket_by=("x",), n_buckets=4)
        def bad(refs):
            return None
    with _pytest.raises(ValueError, match="table materialization"):
        @reg.model("bad2", materialized="view", zorder_by=("x",))
        def bad2(refs):
            return None
