"""Bucketed table materialization (core/runner.py): same-key same-count
bucketed marts join with ZERO exchanges, contents round-trip exactly, and
the manifest carries the layout."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dbt_demo_spark.core.model import ModelRegistry
from dbt_demo_spark.core.runner import Runner


@pytest.fixture
def bucketed_rels(spark, tmp_path):
    reg = ModelRegistry()

    @reg.model("fact_sales", deps=("src_sales",), materialized="table",
               bucket_by=("cust_id",), n_buckets=4)
    def fact_sales(refs):
        return refs["src_sales"]

    @reg.model("fact_visits", deps=("src_visits",), materialized="table",
               bucket_by=("cust_id",), n_buckets=4)
    def fact_visits(refs):
        return refs["src_visits"]

    sales = spark.range(2000).select(
        (F.col("id") % 500).alias("cust_id"), F.col("id").alias("amt"))
    visits = spark.range(3000).select(
        (F.col("id") % 500).alias("cust_id"), F.col("id").alias("visit"))
    runner = Runner(spark, reg, warehouse_dir=str(tmp_path))
    rels = runner.run({"src_sales": sales, "src_visits": visits})
    yield rels, sales, visits, reg
    for t in ("fact_sales", "fact_visits"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_rels):
    rels, sales, visits, _ = bucketed_rels
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (rels["fact_sales"].join(rels["fact_visits"], "cust_id")
                  .groupBy("cust_id").agg(F.count(F.lit(1)).alias("n")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the whole point of the layout: fact-to-fact join, zero shuffles
        # up to the join (the final single-key agg rides the same
        # clustering, so no exchange anywhere before the result)
        assert "Exchange" not in plan, plan
        # and it computes the right thing: 4 sales x 6 visits per cust
        rows = {r.cust_id: r.n for r in joined.collect()}
        assert rows[0] == 24 and len(rows) == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_contents_round_trip(spark, bucketed_rels):
    rels, sales, _, _ = bucketed_rels
    assert sorted(map(tuple, rels["fact_sales"].collect())) == \
        sorted(map(tuple, sales.collect()))


def test_manifest_carries_bucket_layout(bucketed_rels):
    _, _, _, reg = bucketed_rels
    node = reg.manifest()["nodes"]["fact_sales"]
    assert node["bucket_by"] == ["cust_id"] and node["n_buckets"] == 4


def test_bucket_by_requires_n_buckets(spark, tmp_path):
    reg = ModelRegistry()

    @reg.model("bad", deps=("src",), materialized="table",
               bucket_by=("k",))
    def bad(refs):
        return refs["src"]

    runner = Runner(spark, reg, warehouse_dir=str(tmp_path))
    src = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="n_buckets"):
        runner.run({"src": src})


def test_n_buckets_without_bucket_by_rejected(spark, tmp_path):
    """The inverse typo must fail loudly too — silently materializing a
    plain table would leave every downstream join paying the shuffle the
    declared layout was supposed to eliminate."""
    reg = ModelRegistry()

    @reg.model("bad2", deps=("src",), materialized="table", n_buckets=8)
    def bad2(refs):
        return refs["src"]

    runner = Runner(spark, reg, warehouse_dir=str(tmp_path))
    src = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="bucket_by"):
        runner.run({"src": src})


def test_clean_drops_catalog_tables(spark, tmp_path):
    """clean() must drop the bucketed models' session-catalog entries along
    with the warehouse files — a stranded name would resolve to deleted
    paths."""
    reg = ModelRegistry()

    @reg.model("fact_clean_check", deps=("src",), materialized="table",
               bucket_by=("k",), n_buckets=2)
    def fact_clean_check(refs):
        return refs["src"]

    runner = Runner(spark, reg, warehouse_dir=str(tmp_path / "wh"))
    src = spark.range(10).select(F.col("id").alias("k"))
    runner.run({"src": src})
    assert spark.catalog.tableExists("fact_clean_check")
    runner.clean()
    assert not spark.catalog.tableExists("fact_clean_check")
