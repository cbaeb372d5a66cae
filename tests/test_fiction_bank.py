"""Reference-fidelity tests for the Fiction Bank models (SURVEY.md §5.2):

1. Hand-checkable goldens on the exact reference seeds (FIXTURES.md §A5).
2. Grain tests: FAIL on the faithful-buggy agg model, PASS on the fixed one
   (docs/bug-analysis.md:139-157), incl. the Feb-2023 fan-out shape
   (docs/bug-analysis.md:84-98).
3. Full differential vs DuckDB executing the dbt-compiled SQL of each model
   on the same seed data.
4. The CSV seed-reader path: quoted embedded commas + empty->NULL.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from dbt_demo_spark.models.fiction_bank import (FICTION_BANK_TESTS,
                                                build_fiction_bank)
from dbt_demo_spark.models.seeds import (SEED_SCHEMAS, load_seed_dataframes,
                                         seed_csv_text, seed_rows)
from dbt_demo_spark.core.datatests import run_data_tests
from dbt_demo_spark.sources.csv import read_seed_csv


@pytest.fixture(scope="module")
def relations(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    return build_fiction_bank(spark, warehouse_dir=wh)


def test_fct_loan_details_goldens(relations):
    fct = {r["loan_id"]: r for r in relations["fct_loan_details"].collect()}
    assert len(fct) == 10  # one row per loan: the dim join is 1:1
    # L001: round(250000/300000*100, 2) = 83.33 (fct_loan_details.sql:23-27)
    assert fct["L001"]["ltv_ratio"] == 83.33
    # L004/L008 have NULL property_value -> CASE falls to ELSE NULL
    assert fct["L004"]["ltv_ratio"] is None
    assert fct["L008"]["ltv_ratio"] is None
    # amortization at P=250000, r=3.5%/12, n=360 (FIXTURES.md §A5)
    assert fct["L001"]["estimated_monthly_payment"] == pytest.approx(1122.61, abs=0.01)
    # dim enrichment carried through
    assert fct["L001"]["loan_type_name"] == "Mortgage"
    assert fct["L004"]["loan_type_name"] == "Personal"


def test_grain_tests_distinguish_buggy_from_fixed(relations):
    results = {r.name: r for r in run_data_tests(FICTION_BANK_TESTS, relations)}
    assert not results["grain_agg_monthly_loans"].passed  # bug present by design
    assert results["grain_agg_monthly_loans_fixed"].passed
    # generic schema tests (dbt unique/not_null/accepted_values/relationships)
    # all pass on the clean reference seeds
    for name, r in results.items():
        if name.startswith(("unique__", "not_null__", "accepted_values__",
                            "relationships__")):
            assert r.passed, name


def test_generic_tests_catch_seeded_violations(spark, relations):
    """Each generic test builder fails on a deliberately corrupted relation
    and passes on the clean one (dbt test contract: violations -> fail)."""
    from dbt_demo_spark.core.datatests import (accepted_values, not_null,
                                               relationships, unique)

    clean = relations["fct_loan_details"]
    dup = clean.unionByName(clean.limit(1))                       # duplicate key
    nulled = clean.unionByName(
        clean.limit(1).withColumn("customer_id", F.lit(None).cast("string")))
    rel = dict(relations)
    rel["fct_dup"] = dup
    rel["fct_nulled"] = nulled
    # orphan payment: loan_id not present in stg_loans
    rel["orphan_payments"] = relations["stg_loan_payments"].limit(1).withColumn(
        "loan_id", F.lit("L999"))
    rel["bad_status"] = relations["stg_loan_payments"].withColumn(
        "payment_status", F.lit("exploded"))

    assert not run_data_tests([unique("fct_dup", ["loan_id"])], rel)[0].passed
    assert run_data_tests([unique("fct_loan_details", ["loan_id"])], rel)[0].passed
    # dbt's unique test filters `where column is not null` before grouping:
    # two NULL-keyed rows are NOT a uniqueness violation (ADVICE r2)
    rel["fct_null_keys"] = clean.unionByName(
        clean.limit(2).withColumn("loan_id", F.lit(None).cast("string")))
    assert run_data_tests([unique("fct_null_keys", ["loan_id"])], rel)[0].passed
    # multi-column GRAIN keys do NOT null-filter (dbt_utils
    # unique_combination_of_columns semantics): two rows sharing
    # (NULL, customer) ARE a grain violation — NULLs group together
    rel["fct_null_grain"] = clean.unionByName(
        clean.limit(2).withColumn("loan_id", F.lit(None).cast("string"))
        .withColumn("customer_id", F.lit("C900")))
    assert not run_data_tests(
        [unique("fct_null_grain", ["loan_id", "customer_id"])], rel)[0].passed
    assert run_data_tests(
        [unique("fct_loan_details", ["loan_id", "customer_id"])], rel)[0].passed
    assert not run_data_tests(
        [not_null("fct_nulled", ["customer_id"])], rel)[0].passed
    assert not run_data_tests(
        [relationships("orphan_payments", "loan_id", "stg_loans", "loan_id")],
        rel)[0].passed
    assert not run_data_tests(
        [accepted_values("bad_status", "payment_status", ["completed"])],
        rel)[0].passed


def test_fiction_bank_snapshot_end_to_end(spark, relations, tmp_path):
    """dbt snapshot over stg_loans: run 1 seeds the SCD2 table, a loan
    amount mutates upstream, run 2 versions exactly that loan; the SCD2
    grain data tests pass on the result."""
    from dbt_demo_spark.core.datatests import run_data_tests
    from dbt_demo_spark.core.snapshot import SnapshotRunner
    from dbt_demo_spark.models.fiction_bank import (FICTION_BANK_SNAPSHOTS,
                                                    snapshot_grain_tests)

    sdef = FICTION_BANK_SNAPSHOTS[0]
    sr = SnapshotRunner(spark, str(tmp_path / "wh"))
    t1, t2 = F.lit("2023-06-01 00:00:00"), F.lit("2023-07-01 00:00:00")

    loans = relations["stg_loans"]
    sr.run(sdef, loans, as_of=t1)
    mutated = loans.withColumn(
        "loan_amount",
        F.when(F.col("loan_id") == "L001", F.col("loan_amount") + 50000)
         .otherwise(F.col("loan_amount")))
    snap = sr.run(sdef, mutated, as_of=t2)

    n_loans = loans.count()
    assert snap.count() == n_loans + 1          # one closed version added
    l1 = {r.dbt_is_current: r for r in
          snap.filter("loan_id = 'L001'").collect()}
    assert str(l1[0].dbt_valid_to) == "2023-07-01 00:00:00"
    assert l1[1].loan_amount == l1[0].loan_amount + 50000

    results = run_data_tests(snapshot_grain_tests(), {"loans_snapshot": snap})
    assert all(r.passed for r in results), [r.name for r in results
                                            if not r.passed]


def test_feb_2023_fanout_shape(relations):
    """docs/bug-analysis.md:84-98: in the buggy model each (month, type) row
    is multiplied by the number of loans of that type; in the fixed model
    Feb-2023 Mortgage is exactly one row."""
    buggy = relations["agg_monthly_loans"].filter(
        "month = DATE'2023-02-01' AND loan_type_name = 'Mortgage'").collect()
    fixed = relations["agg_monthly_loans_fixed"].filter(
        "month = DATE'2023-02-01' AND loan_type_name = 'Mortgage'").collect()
    n_mortgage_loans = relations["fct_loan_details"].filter(
        "loan_type_name = 'Mortgage'").count()
    assert len(fixed) == 1
    assert len(buggy) == n_mortgage_loans  # fan-out x (#loans of that type)
    # every fanned row repeats the same aggregate values
    assert {r["amount_originated"] for r in buggy} == {450000}


def test_payment_only_month_survives_full_outer(relations):
    """2023-09 has payments but no originations (raw_loan_payments.csv:16) —
    the FULL OUTER + coalesce idiom must keep it with zero-filled
    origination metrics and NULL loan_type_name."""
    rows = relations["agg_monthly_loans_fixed"].filter("month = DATE'2023-09-01'").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["loan_type_name"] is None
    assert r["new_loans"] == 0 and r["amount_originated"] == 0
    assert r["payments_received"] == 1
    assert r["payment_volume"] == pytest.approx(610.54)


# --- differential vs DuckDB running the dbt-compiled SQL on the same seeds --

_STG_LOANS_SQL = """
    SELECT loan_id, customer_id, loan_type_id, loan_amount, interest_rate,
           CAST(loan_start_date AS DATE) AS loan_start_date,
           loan_term_months, property_address, property_value
    FROM raw_loans
"""

_FCT_SQL = """
    SELECT loans.loan_id, loans.customer_id, loans.loan_type_id,
           loan_types.loan_type_name,
           loan_types.description AS loan_type_description,
           loans.loan_amount, loans.interest_rate, loans.loan_start_date,
           loans.loan_term_months, loan_types.typical_term_months,
           loans.property_address, loans.property_value,
           CASE WHEN loans.property_value > 0
                THEN ROUND((CAST(loans.loan_amount AS DOUBLE)
                            / CAST(loans.property_value AS DOUBLE)) * 100, 2)
                ELSE NULL END AS ltv_ratio,
           ROUND(loans.loan_amount * (loans.interest_rate / 100 / 12) *
                 POWER(1 + (loans.interest_rate / 100 / 12), loans.loan_term_months) /
                 (POWER(1 + (loans.interest_rate / 100 / 12), loans.loan_term_months) - 1),
                 2) AS estimated_monthly_payment
    FROM (SELECT * FROM stg_loans) loans
    LEFT JOIN loan_types ON loans.loan_type_id = loan_types.loan_type_id
"""

_AGG_SQL = """
    WITH loans AS (SELECT * FROM fct_loan_details),
    payments AS (
        SELECT payment_id, loan_id, CAST(payment_date AS DATE) AS payment_date,
               payment_amount, principal_paid, interest_paid, payment_status
        FROM raw_loan_payments
    ),
    monthly_originations AS (
        SELECT CAST(DATE_TRUNC('month', loan_start_date) AS DATE) AS month_start,
               loan_type_name,
               COUNT(DISTINCT loan_id) AS loans_originated,
               -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT; Spark sums long
               CAST(SUM(loan_amount) AS BIGINT) AS total_amount_originated,
               AVG(loan_amount) AS avg_loan_amount,
               AVG(interest_rate) AS avg_interest_rate
        FROM loans GROUP BY 1, 2
    ),
    monthly_payments AS (
        SELECT CAST(DATE_TRUNC('month', payment_date) AS DATE) AS month_start,
               COUNT(DISTINCT payment_id) AS total_payments,
               SUM(payment_amount) AS total_payment_amount,
               SUM(principal_paid) AS total_principal_paid,
               SUM(interest_paid) AS total_interest_paid
        FROM payments GROUP BY 1
    )
    SELECT COALESCE(orig.month_start, pay.month_start) AS month,
           orig.loan_type_name,
           loans.customer_id,
           COALESCE(orig.loans_originated, 0) AS new_loans,
           COALESCE(orig.total_amount_originated, 0) AS amount_originated,
           COALESCE(orig.avg_loan_amount, 0) AS avg_loan_size,
           COALESCE(orig.avg_interest_rate, 0) AS avg_rate,
           COALESCE(pay.total_payments, 0) AS payments_received,
           COALESCE(pay.total_payment_amount, 0) AS payment_volume,
           COALESCE(pay.total_principal_paid, 0) AS principal_collected,
           COALESCE(pay.total_interest_paid, 0) AS interest_collected
    FROM monthly_originations orig
    FULL OUTER JOIN monthly_payments pay ON orig.month_start = pay.month_start
    LEFT JOIN loans ON orig.loan_type_name = loans.loan_type_name
"""


@pytest.fixture(scope="module")
def duck_fb():
    """DuckDB warehouse seeded with the same data, models compiled the way
    dbt-duckdb would run them (views for staging, tables for marts)."""
    con = duckdb.connect()
    for name in ("loan_types", "raw_loans", "raw_loan_payments"):
        cols = ", ".join(f.name for f in SEED_SCHEMAS[name].fields)
        placeholders = ", ".join("?" for _ in SEED_SCHEMAS[name].fields)
        typed = ", ".join(
            f"{f.name} {'DOUBLE' if f.dataType.typeName() == 'double' else 'BIGINT' if f.dataType.typeName() == 'long' else 'VARCHAR'}"
            for f in SEED_SCHEMAS[name].fields)
        con.execute(f"CREATE TABLE {name} ({typed})")
        con.executemany(f"INSERT INTO {name} ({cols}) VALUES ({placeholders})",
                        seed_rows(name))
    con.execute(f"CREATE VIEW stg_loans AS {_STG_LOANS_SQL}")
    con.execute(f"CREATE TABLE fct_loan_details AS {_FCT_SQL}")
    con.execute(f"CREATE TABLE agg_monthly_loans AS {_AGG_SQL}")
    return con


@pytest.mark.parametrize("model_name,sql", [
    ("stg_loans", "SELECT * FROM stg_loans"),
    ("fct_loan_details", "SELECT * FROM fct_loan_details"),
    ("agg_monthly_loans", "SELECT * FROM agg_monthly_loans"),
])
def test_models_match_duckdb(relations, duck_fb, model_name, sql):
    from dbt_demo_spark.testing import compare

    res = compare(model_name, relations[model_name], duck_fb, sql)
    assert res.ok, f"{model_name}: {res.detail}"


# --- CSV seed-reader path (S1) ---------------------------------------------

def test_csv_seed_reader_quoting_and_nulls(spark, tmp_path):
    p = tmp_path / "raw_loans.csv"
    p.write_text(seed_csv_text("raw_loans"))
    df = read_seed_csv(spark, str(p), SEED_SCHEMAS["raw_loans"])
    rows = {r["loan_id"]: r for r in df.collect()}
    assert len(rows) == 10
    # embedded comma inside quotes survives (raw_loans.csv:2)
    assert rows["L001"]["property_address"] == "123 Main St, Austin TX"
    # empty CSV fields -> NULL for both string and numeric columns (:5,:9)
    assert rows["L004"]["property_address"] is None
    assert rows["L004"]["property_value"] is None
    # matches the embedded-seed DataFrame exactly
    embedded = load_seed_dataframes(spark)["raw_loans"]
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, embedded.collect()))


def test_manifest_export_is_json_and_consistent():
    """dbt docs analog: the manifest serializes, its edges match the
    registry, seeds surface as sources, and execution_order is a valid
    topological order of the declared DAG."""
    import json

    from dbt_demo_spark.models.fiction_bank import REGISTRY

    m = REGISTRY.manifest()
    json.dumps(m)  # must be JSON-able as-is

    assert set(m["nodes"]) == set(REGISTRY.names())
    assert m["nodes"]["fct_loan_details"]["materialized"] == "table"
    assert "loan_types" in m["sources"]          # seed ref'd directly
    assert "raw_loans" in m["sources"]

    order = m["execution_order"]
    assert sorted(order) == sorted(REGISTRY.names())
    pos = {n: i for i, n in enumerate(order)}
    for name, node in m["nodes"].items():
        for dep in node["depends_on"]:
            if dep in pos:
                assert pos[dep] < pos[name], (dep, name)
