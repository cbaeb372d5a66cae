"""Column-level lineage (core/lineage.py) — the metadata-platform
extension the reference repo exists to demo (its README walks dbt docs +
lineage ingestion).  What must hold:

  * derivation is by expression REFERENCE: aggregated/arithmetic columns
    map to their source columns, literals map to nothing, and a filter
    on a column does not parent every output;
  * join provenance splits by side; union provenance merges positionally;
    explode maps generator outputs to the generator's references;
  * SELF-JOINED refs keep their lineage — Catalyst re-mints exprIds on
    one side (DeduplicateRelations), which the canonical-subtree anchor
    must survive (the reference's fan-out bug is exactly this shape);
  * registry-level extraction runs NO Spark jobs (plan analysis only)
    and yields the dep-relative edges the manifest's table edges compose
    over: the buggy mart's month column traces to fct loan_start_date
    AND payment_date, and composing stg edges reaches the raw seeds.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from dbt_demo_spark.core.lineage import column_lineage, registry_column_lineage


@pytest.fixture
def ab(spark):
    a = spark.createDataFrame([(1, 2.0, "x")], "k long, v double, s string")
    b = spark.createDataFrame([(1, "y")], "k long, t string")
    return a, b


def test_expression_reference_derivation(spark, ab):
    a, b = ab
    df = (a.join(b, "k").filter(F.col("t") != "zz").groupBy("s")
          .agg(F.sum(F.col("v") * 2).alias("sv"), F.max("t").alias("mt"),
               F.lit(1).alias("one")))
    lin = column_lineage(df, {"a": a, "b": b})
    assert lin == {"s": [("a", "s")], "sv": [("a", "v")],
                   "mt": [("b", "t")], "one": []}


def test_union_merges_positionally_and_explode_tracks_generator(spark, ab):
    a, b = ab
    u = a.select("k", "v").unionByName(
        b.select("k", F.col("k").cast("double").alias("v")))
    assert column_lineage(u, {"a": a, "b": b}) == {
        "k": [("a", "k"), ("b", "k")], "v": [("a", "v"), ("b", "k")]}
    e = a.select("k", F.explode(F.split("s", " ")).alias("w"))
    assert column_lineage(e, {"a": a}) == {"k": [("a", "k")],
                                           "w": [("a", "s")]}


def test_cube_expand_keeps_provenance(spark, ab):
    a, _ = ab
    c = a.cube("s").agg(F.sum("v").alias("sv"))
    assert column_lineage(c, {"a": a}) == {"s": [("a", "s")],
                                           "sv": [("a", "v")]}


def test_self_join_survives_exprid_reminting(spark, ab):
    a, _ = ab
    sj = (a.groupBy("s").agg(F.sum("v").alias("tv")).alias("l")
          .join(a.alias("r"), F.col("l.s") == F.col("r.s"), "left")
          .select(F.col("l.s").alias("s"), "tv",
                  F.col("r.k").alias("rk")))
    assert column_lineage(sj, {"a": a}) == {
        "s": [("a", "s")], "tv": [("a", "v")], "rk": [("a", "k")]}


def test_registry_lineage_fiction_bank(spark):
    from dbt_demo_spark.models.fiction_bank import REGISTRY
    from dbt_demo_spark.models.seeds import load_seed_dataframes

    lin = registry_column_lineage(REGISTRY, load_seed_dataframes(spark))
    json.dumps(lin)  # manifest companion must be JSON-able as returned

    # staging: pure rename/cast — 1:1 to the seed columns
    assert lin["stg_loans"]["loan_start_date"] == [["raw_loans",
                                                    "loan_start_date"]]
    # the buggy mart: month coalesces both sides of the full outer join
    assert lin["agg_monthly_loans"]["month"] == [
        ["fct_loan_details", "loan_start_date"],
        ["stg_loan_payments", "payment_date"]]
    # the fan-out column rides the SELF-JOINED detail branch
    assert lin["agg_monthly_loans"]["customer_id"] == [
        ["fct_loan_details", "customer_id"]]

    # composing model edges reaches the seeds: avg_loan_size <- fct
    # loan_amount <- stg_loans loan_amount <- raw_loans loan_amount
    assert lin["agg_monthly_loans_fixed"]["avg_loan_size"] == [
        ["fct_loan_details", "loan_amount"]]
    assert lin["fct_loan_details"]["loan_amount"] == [["stg_loans",
                                                       "loan_amount"]]
