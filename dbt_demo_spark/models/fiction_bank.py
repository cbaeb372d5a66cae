"""The Fiction Bank models — the reference's four models plus the documented
fixed variant, re-expressed as DataFrame dataflows (one CTE = one DataFrame
assignment, SURVEY.md §2.2 P6).

Faithfulness notes:
  * `agg_monthly_loans` reproduces the reference's DELIBERATE fan-out bug
    (models/marts/agg_monthly_loans.sql:48-49; analysis in
    docs/bug-analysis.md:36-58): the month×type aggregate is LEFT-joined
    back to loan-level rows on the non-unique `loan_type_name`.
  * `agg_monthly_loans_fixed` is the corrected model per
    docs/bug-analysis.md:161-174 (drop the loan-level join and its
    customer_id column).
  * The 3-row `loan_types` dim is broadcast (J1) — at 100 TB the dim stays
    broadcastable while loans shard freely.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..core.datatests import (DataTest, accepted_values, not_null,
                              relationships, unique)
from ..core.model import ModelRegistry
from ..core.runner import Runner
from ..core.snapshot import SnapshotDef
from .seeds import load_seed_dataframes

REGISTRY = ModelRegistry()
_model = REGISTRY.model


@_model("stg_loans", deps=("raw_loans",), materialized="view",
        tags=("staging",))
def stg_loans(refs: dict[str, DataFrame]) -> DataFrame:
    """Staging view: rename + date cast over raw_loans
    (models/staging/stg_loans.sql:5-17)."""
    return refs["raw_loans"].select(
        "loan_id",
        "customer_id",
        "loan_type_id",
        "loan_amount",
        "interest_rate",
        F.col("loan_start_date").cast("date").alias("loan_start_date"),
        "loan_term_months",
        "property_address",
        "property_value",
    )


@_model("stg_loan_payments", deps=("raw_loan_payments",),
        materialized="view", tags=("staging",),
        tests=(accepted_values("stg_loan_payments", "payment_status",
                               ["completed"]),),
        contract=(("payment_id", "string"), ("loan_id", "string"),
                  ("payment_date", "date"), ("payment_amount", "double"),
                  ("principal_paid", "double"),
                  ("interest_paid", "double"),
                  ("payment_status", "string")))
def stg_loan_payments(refs: dict[str, DataFrame]) -> DataFrame:
    """Staging view: rename + date cast over raw_loan_payments
    (models/staging/stg_loan_payments.sql:5-15)."""
    return refs["raw_loan_payments"].select(
        "payment_id",
        "loan_id",
        F.col("payment_date").cast("date").alias("payment_date"),
        "payment_amount",
        "principal_paid",
        "interest_paid",
        "payment_status",
    )


@_model("fct_loan_details", deps=("stg_loans", "loan_types"),
        materialized="table", tags=("mart",),
        tests=(unique("fct_loan_details", ["loan_id"]),
               not_null("fct_loan_details",
                        ["loan_id", "customer_id", "loan_amount"])),
        # dbt model contract (enforced): the mart's public schema —
        # schema drift fails the build, not a downstream consumer
        contract=(("loan_id", "string"), ("customer_id", "string"),
                  ("loan_type_id", "bigint"), ("loan_type_name", "string"),
                  ("loan_type_description", "string"),
                  ("loan_amount", "bigint"), ("interest_rate", "double"),
                  ("loan_start_date", "date"),
                  ("loan_term_months", "bigint"),
                  ("typical_term_months", "bigint"),
                  ("property_address", "string"),
                  ("property_value", "bigint"), ("ltv_ratio", "double"),
                  ("estimated_monthly_payment", "double")))
def fct_loan_details(refs: dict[str, DataFrame]) -> DataFrame:
    """Dimension join + LTV + amortization
    (models/marts/fct_loan_details.sql:8-36).

    ltv_ratio (:23-27): round(loan_amount / property_value * 100, 2) when
    property_value > 0 else NULL — NULL property_value falls through the
    3-valued `>` to the ELSE branch, exactly as in SQL.
    estimated_monthly_payment (:28-33): standard amortization with
    r = interest_rate/100/12, n = loan_term_months."""
    loans = refs["stg_loans"]
    loan_types = refs["loan_types"]

    r = F.col("interest_rate") / 100 / 12
    growth = F.pow(F.lit(1) + r, F.col("loan_term_months"))

    return (
        loans.join(F.broadcast(loan_types), "loan_type_id", "left")
        .select(
            loans["loan_id"],
            loans["customer_id"],
            loans["loan_type_id"],
            loan_types["loan_type_name"],
            loan_types["description"].alias("loan_type_description"),
            loans["loan_amount"],
            loans["interest_rate"],
            loans["loan_start_date"],
            loans["loan_term_months"],
            loan_types["typical_term_months"],
            loans["property_address"],
            loans["property_value"],
            F.when(
                F.col("property_value") > 0,
                F.round(F.col("loan_amount") / F.col("property_value") * 100, 2),
            ).otherwise(F.lit(None)).alias("ltv_ratio"),
            F.round(
                F.col("loan_amount") * r * growth / (growth - 1), 2
            ).alias("estimated_monthly_payment"),
        )
    )


def _monthly_originations(loans: DataFrame) -> DataFrame:
    """monthly_originations CTE (agg_monthly_loans.sql:10-18)."""
    return (
        loans.groupBy(
            F.date_trunc("month", "loan_start_date").cast("date").alias("month_start"),
            "loan_type_name",
        )
        .agg(
            F.countDistinct("loan_id").alias("loans_originated"),
            F.sum("loan_amount").alias("total_amount_originated"),
            F.avg("loan_amount").alias("avg_loan_amount"),
            F.avg("interest_rate").alias("avg_interest_rate"),
        )
    )


def _monthly_payments(payments: DataFrame) -> DataFrame:
    """monthly_payments CTE (agg_monthly_loans.sql:21-29)."""
    return (
        payments.groupBy(
            F.date_trunc("month", "payment_date").cast("date").alias("month_start"))
        .agg(
            F.countDistinct("payment_id").alias("total_payments"),
            F.sum("payment_amount").alias("total_payment_amount"),
            F.sum("principal_paid").alias("total_principal_paid"),
            F.sum("interest_paid").alias("total_interest_paid"),
        )
    )


def _combined_cols() -> list:
    """Shared projection list for the combined CTE
    (agg_monthly_loans.sql:32-44), referencing the `orig`/`pay` aliases."""
    return [
        F.coalesce(F.col("orig.month_start"), F.col("pay.month_start")).alias("month"),
        F.col("orig.loan_type_name").alias("loan_type_name"),
        F.coalesce(F.col("orig.loans_originated"), F.lit(0)).alias("new_loans"),
        F.coalesce(F.col("orig.total_amount_originated"), F.lit(0)).alias("amount_originated"),
        F.coalesce(F.col("orig.avg_loan_amount"), F.lit(0)).alias("avg_loan_size"),
        F.coalesce(F.col("orig.avg_interest_rate"), F.lit(0)).alias("avg_rate"),
        F.coalesce(F.col("pay.total_payments"), F.lit(0)).alias("payments_received"),
        F.coalesce(F.col("pay.total_payment_amount"), F.lit(0)).alias("payment_volume"),
        F.coalesce(F.col("pay.total_principal_paid"), F.lit(0)).alias("principal_collected"),
        F.coalesce(F.col("pay.total_interest_paid"), F.lit(0)).alias("interest_collected"),
    ]


@_model("agg_monthly_loans", deps=("fct_loan_details", "stg_loan_payments"),
        materialized="table", partition_by=("month",), tags=("mart", "nightly"),
        # the prose-specified grain test (docs/bug-analysis.md:139-157)
        # attached WHERE dbt would attach it — on the buggy model, where
        # `Runner.build` surfaces the fan-out as a per-node test failure
        tests=(DataTest("grain_agg_monthly_loans",
                        lambda rel: _grain_violations(
                            rel["agg_monthly_loans"])),))
def agg_monthly_loans(refs: dict[str, DataFrame]) -> DataFrame:
    """REFERENCE-FAITHFUL (buggy) monthly rollup
    (models/marts/agg_monthly_loans.sql:1-53), including the fan-out join
    at :48-49 and its customer_id column at :35."""
    loans = refs["fct_loan_details"]
    orig = _monthly_originations(loans).alias("orig")
    pay = _monthly_payments(refs["stg_loan_payments"]).alias("pay")
    detail = loans.alias("loans")

    cols = _combined_cols()
    cols.insert(2, F.col("loans.customer_id").alias("customer_id"))
    return (
        orig
        .join(pay, F.col("orig.month_start") == F.col("pay.month_start"), "full_outer")
        .join(detail,
              F.col("orig.loan_type_name") == F.col("loans.loan_type_name"),
              "left")
        .select(*cols)
        .orderBy(F.desc("month"), F.asc("loan_type_name"))
    )


@_model("agg_monthly_loans_fixed",
        deps=("fct_loan_details", "stg_loan_payments"),
        materialized="incremental", partition_by=("month",),
        tags=("mart", "nightly"),
        tests=(DataTest("grain_agg_monthly_loans_fixed",
                        lambda rel: _grain_violations(
                            rel["agg_monthly_loans_fixed"])),
               unique("agg_monthly_loans_fixed",
                      ["month", "loan_type_name"])),
        contract=(("loan_type_name", "string"), ("new_loans", "bigint"),
                  ("amount_originated", "bigint"),
                  ("avg_loan_size", "double"), ("avg_rate", "double"),
                  ("payments_received", "bigint"),
                  ("payment_volume", "double"),
                  ("principal_collected", "double"),
                  ("interest_collected", "double"), ("month", "date")))
def agg_monthly_loans_fixed(refs: dict[str, DataFrame]) -> DataFrame:
    """The corrected rollup per docs/bug-analysis.md:161-174: no loan-level
    join, grain is exactly one row per (month, loan_type_name).

    Materialized INCREMENTALLY, month-partitioned: a run fed only new
    payments/loans overwrites just the emitted month partitions — the
    100 TB scale posture for the reference's table-rebuild policy (SURVEY.md
    §7.1 M6); downstream month-filtered reads partition-prune."""
    orig = _monthly_originations(refs["fct_loan_details"]).alias("orig")
    pay = _monthly_payments(refs["stg_loan_payments"]).alias("pay")
    return (
        orig
        .join(pay, F.col("orig.month_start") == F.col("pay.month_start"), "full_outer")
        .select(*_combined_cols())
        .orderBy(F.desc("month"), F.asc("loan_type_name"))
    )


def _grain_violations(df: DataFrame) -> DataFrame:
    """Rows violating the (month, loan_type_name) grain — the data-quality
    test proposed at docs/bug-analysis.md:139-157."""
    return (
        df.groupBy("month", "loan_type_name")
        .agg(F.count(F.lit(1)).alias("row_count"))
        .filter(F.col("row_count") > 1)
    )


# Snapshot declarations — the project's snapshots/ dir analog (reference
# configures the path at dbt_project.yml:7 but ships none; this completes
# the surface).  stg_loans is the natural snapshot target: loan terms
# mutate in place upstream, and the SCD2 history preserves what each loan
# looked like when each month's mart was built.
FICTION_BANK_SNAPSHOTS = [
    SnapshotDef("loans_snapshot", unique_key="loan_id", strategy="check",
                check_cols=("loan_amount", "loan_term_months", "property_value")),
]


def snapshot_grain_tests(name: str = "loans_snapshot") -> list[DataTest]:
    """Data tests every SCD2 table must satisfy: version grain is unique
    and each key has exactly one current row."""
    return [
        unique(name, ["loan_id", "dbt_valid_from"]),
        DataTest(f"single_current__{name}",
                 lambda rel: (rel[name].filter(F.col("dbt_is_current") == 1)
                              .groupBy("loan_id")
                              .agg(F.count(F.lit(1)).alias("n_current"))
                              .filter(F.col("n_current") != 1))),
    ]


FICTION_BANK_TESTS = [
    DataTest("grain_agg_monthly_loans",
             lambda rel: _grain_violations(rel["agg_monthly_loans"])),
    DataTest("grain_agg_monthly_loans_fixed",
             lambda rel: _grain_violations(rel["agg_monthly_loans_fixed"])),
    # generic schema tests — the dbt test surface README.md:53-54 advertises
    unique("fct_loan_details", ["loan_id"]),
    not_null("fct_loan_details", ["loan_id", "customer_id", "loan_amount"]),
    unique("agg_monthly_loans_fixed", ["month", "loan_type_name"]),
    accepted_values("stg_loan_payments", "payment_status", ["completed"]),
    relationships("stg_loan_payments", "loan_id", "stg_loans", "loan_id"),
]


def build_fiction_bank(spark: SparkSession,
                       warehouse_dir: str | None = None) -> dict[str, DataFrame]:
    """`dbt seed && dbt run` end-to-end: load seeds, run all models."""
    runner = Runner(spark, REGISTRY, warehouse_dir)
    return runner.run(load_seed_dataframes(spark))
