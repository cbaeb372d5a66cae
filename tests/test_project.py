"""Wholesale dbt-project porting (core/project.py): dbt_project.yml is
the single source of policy — model-paths, seed-paths, +materialized
folder tree, vars — plus schema.yml properties attachment (tests /
contracts / exposures) onto registered models."""

from __future__ import annotations

import datetime
import os
import textwrap

import pytest

from dbt_demo_spark.core.model import ModelRegistry
from dbt_demo_spark.core.project import (attach_properties,
                                         port_dbt_project,
                                         read_seed_csv_inferred)
from dbt_demo_spark.core.runner import Runner
from dbt_demo_spark.core.sqlmodel import register_sql_model

REFERENCE = "/root/reference"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "models")),
    reason="reference repo not mounted")


# ------------------------------------------------------------- seeds ----

def test_seed_inference_ladder(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text(
        "flag,n,x,d,s,gap\n"
        'true,10,1.5,2024-01-31,"a, quoted",\n'
        "false,20,2,2024-02-29,plain,9\n")
    df = read_seed_csv_inferred(spark, str(p))
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types == {"flag": "boolean", "n": "bigint", "x": "double",
                     "d": "date", "s": "string", "gap": "bigint"}
    rows = sorted(df.collect(), key=lambda r: r.n)
    assert rows[0].flag is True and rows[0].gap is None  # empty -> NULL
    assert rows[0].s == "a, quoted"                      # quoted comma
    assert rows[0].d == datetime.date(2024, 1, 31)
    assert rows[1].x == 2.0  # whole-column vote: one float -> double


# ----------------------------------------------- reference wholesale ----

@needs_reference
def test_port_reference_project_from_its_yaml_alone(spark, tmp_path):
    """VERDICT r9 item 2's done-criterion: the reference checkout ports
    end-to-end from dbt_project.yml alone — folder policy, seed CSVs,
    models — and every relation is byte-identical to the hand-written
    DataFrame twins (models/fiction_bank.py)."""
    from dbt_demo_spark.models.fiction_bank import REGISTRY as PY_REGISTRY

    p = port_dbt_project(spark, REFERENCE)
    assert p.name == "fiction_bank"
    assert sorted(p.model_names) == ["agg_monthly_loans",
                                     "fct_loan_details",
                                     "stg_loan_payments", "stg_loans"]
    # the policy came from dbt_project.yml:17-22, not a Python restatement
    assert p.registry["stg_loans"].materialized == "view"
    assert p.registry["stg_loan_payments"].materialized == "view"
    assert p.registry["fct_loan_details"].materialized == "table"
    assert p.registry["agg_monthly_loans"].materialized == "table"
    assert p.clean_targets == ("target", "dbt_packages")

    # seeds from seeds/*.csv with dbt-seed semantics
    assert sorted(p.seeds) == ["loan_types", "raw_loan_payments",
                               "raw_loans"]
    loans = p.seeds["raw_loans"].collect()
    assert len(loans) == 10
    l004 = next(r for r in loans if r.loan_id == "L004")
    assert l004.property_address is None          # empty -> NULL
    assert l004.property_value is None
    l001 = next(r for r in loans if r.loan_id == "L001")
    assert l001.property_address == "123 Main St, Austin TX"
    assert len(p.seeds["loan_types"].collect()) == 3
    assert len(p.seeds["raw_loan_payments"].collect()) == 15

    ported = Runner(spark, p.registry,
                    warehouse_dir=str(tmp_path / "port_wh"))
    twins = Runner(spark, PY_REGISTRY,
                   warehouse_dir=str(tmp_path / "twin_wh"))
    try:
        got_rels = ported.run(dict(p.seeds))
        from dbt_demo_spark.models.seeds import load_seed_dataframes
        want_rels = twins.run(load_seed_dataframes(spark))
        for name in p.model_names:
            got, want = got_rels[name], want_rels[name]
            got_t = {f.name: f.dataType.simpleString()
                     for f in got.schema.fields}
            want_t = {f.name: f.dataType.simpleString()
                      for f in want.schema.fields}
            assert got_t == want_t, name
            cols = sorted(got_t)
            assert sorted(map(tuple, got.select(cols).collect())) == \
                sorted(map(tuple, want.select(cols).collect())), name
    finally:
        ported.clean()
        twins.clean()


# ------------------------------------- synthetic: policy/config/vars ----

def _write_project(root, yml: str, files: dict[str, str]) -> None:
    (root / "dbt_project.yml").write_text(textwrap.dedent(yml))
    for rel, text in files.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(textwrap.dedent(text))


def test_port_nested_policy_config_override_and_vars(spark, tmp_path):
    _write_project(tmp_path, """\
        name: 'proj'
        model-paths: ["m"]
        seed-paths: ["s"]
        vars:
          proj:
            cutoff: 15
        models:
          proj:
            +materialized: table
            deep:
              nested:
                +materialized: view
        """, {
        "s/nums.csv": "k,v\n1,10\n2,20\n3,30\n",
        "m/top_model.sql": "select * from {{ ref('nums') }}",
        "m/deep/nested/leaf.sql":
            "select * from {{ ref('top_model') }} "
            "where v > {{ var('cutoff') }}",
        "m/deep/other.sql":
            "{{ config(materialized='ephemeral') }}\n"
            "select v + {{ var('missing', 0) }} as v2 "
            "from {{ ref('top_model') }}",
    })
    p = port_dbt_project(spark, str(tmp_path))
    # nested folder policy: deepest prefix wins; config() beats both
    assert p.registry["top_model"].materialized == "table"
    assert p.registry["leaf"].materialized == "view"
    assert p.registry["other"].materialized == "ephemeral"
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run(dict(p.seeds))
        # var('cutoff') resolved from the project-scoped vars block
        assert {r.v for r in rels["leaf"].collect()} == {20, 30}
        assert {r.v2 for r in rels["other"].collect()} == {10, 20, 30}
    finally:
        runner.clean()


def test_undeclared_var_without_default_raises(spark, tmp_path):
    _write_project(tmp_path, """\
        name: 'proj'
        model-paths: ["m"]
        seed-paths: ["s"]
        """, {
        "s/nums.csv": "k\n1\n",
        "m/bad.sql": "select {{ var('nope') }} from {{ ref('nums') }}",
    })
    with pytest.raises(ValueError, match="nope"):
        port_dbt_project(spark, str(tmp_path))


# --------------------------------------------------------- schema.yml ---

_FIXED_ROLLUP_SQL = """
-- bug-analysis.md:161-174 Option 1: the aggregation stays pure — no
-- loan-level join, grain exactly (month, loan_type_name)
with monthly_originations as (
    select
        cast({{ date_trunc('month', 'loan_start_date') }} as date)
            as month_start,
        loan_type_name,
        count(distinct loan_id) as loans_originated
    from {{ ref('fct_loan_details') }}
    group by 1, 2
),
monthly_payments as (
    select
        cast({{ date_trunc('month', 'payment_date') }} as date)
            as month_start,
        count(distinct payment_id) as total_payments
    from {{ ref('stg_loan_payments') }}
    group by 1
)
select
    coalesce(orig.month_start, pay.month_start) as month,
    orig.loan_type_name,
    coalesce(orig.loans_originated, 0) as new_loans,
    coalesce(pay.total_payments, 0) as payments_received
from monthly_originations orig
full outer join monthly_payments pay
    on orig.month_start = pay.month_start
"""

_PROPERTIES_YML = """
models:
  - name: agg_monthly_loans
    description: reference-faithful monthly rollup (fan-out bug intact)
    tests:
      - unique:
          combination_of_columns: [month, loan_type_name]
  - name: agg_monthly_loans_fixed
    tests:
      - unique:
          combination_of_columns: [month, loan_type_name]
    columns:
      - name: month
        tests: [not_null]
  - name: stg_loans
    config:
      contract:
        enforced: true
    columns:
      - name: loan_id
        data_type: string
        tests: [unique, not_null]
      - name: customer_id
        data_type: string
      - name: loan_type_id
        data_type: bigint
        tests:
          - relationships:
              to: ref('loan_types')
              field: loan_type_id
      - name: loan_amount
        data_type: bigint
      - name: interest_rate
        data_type: double
      - name: loan_start_date
        data_type: date
      - name: loan_term_months
        data_type: bigint
      - name: property_address
        data_type: string
      - name: property_value
        data_type: bigint
exposures:
  - name: loan_dashboard
    type: dashboard
    owner:
      name: fiction-bank-bi
    depends_on:
      - ref('agg_monthly_loans_fixed')
"""


@needs_reference
def test_schema_yml_grain_test_fails_buggy_passes_fixed(spark, tmp_path):
    """VERDICT r9 item 7's done-criterion: the bug-analysis grain test
    (docs/bug-analysis.md:139-157) declared in standard schema.yml form
    fails on the reference-faithful agg_monthly_loans and passes on the
    fixed variant, through Runner.build."""
    p = port_dbt_project(spark, REFERENCE)
    register_sql_model(p.registry, "agg_monthly_loans_fixed",
                       _FIXED_ROLLUP_SQL, materialized="table")
    applied = attach_properties(p.registry, _PROPERTIES_YML)
    assert "unique__agg_monthly_loans__month_loan_type_name" \
        in applied["tests"]
    assert applied["exposures"] == ["loan_dashboard"]
    # contract landed on stg_loans from the YAML columns
    assert ("loan_id", "string") in p.registry["stg_loans"].contract

    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        res = runner.build(dict(p.seeds))
        assert res.nodes["agg_monthly_loans"].status == "fail"
        failed = [t.name for t in res.nodes["agg_monthly_loans"].tests
                  if not t.passed]
        assert failed == ["unique__agg_monthly_loans__month_loan_type_name"]
        assert res.nodes["agg_monthly_loans_fixed"].status == "success"
        assert res.nodes["stg_loans"].status == "success"
    finally:
        runner.clean()


# docs/bug-analysis.md:139-157 VERBATIM — the reference specifies its
# intended data test as prose SQL; the singular-test path runs it as-is
_BUG_ANALYSIS_SINGULAR_SQL = """
-- Test: Row count should match expected monthly periods
with expected_months as (
    select distinct
        date_trunc('month', loan_start_date)::date as month,
        loan_type_name
    from {{ ref('fct_loan_details') }}
),
actual_months as (
    select distinct month, loan_type_name
    from {{ ref('agg_monthly_loans') }}
)
select
    count(*) as expected_rows,
    (select count(*) from actual_months) as actual_rows,
    (select count(*) from actual_months) - count(*) as extra_rows
from expected_months
having (select count(*) from actual_months) != count(*)
"""


@needs_reference
def test_singular_sql_test_runs_verbatim_through_build(spark, tmp_path):
    """dbt singular tests (test-paths/*.sql, SELECT-returning-violations):
    the reference's prose-specified grain test (docs/bug-analysis.md:
    139-157) registers VERBATIM as a test node and fails the
    reference-faithful rollup through Runner.build; its twin over the
    fixed variant passes."""
    from dbt_demo_spark.core.sqlmodel import register_test_dir

    p = port_dbt_project(spark, REFERENCE)
    register_sql_model(p.registry, "agg_monthly_loans_fixed",
                       _FIXED_ROLLUP_SQL, materialized="table")
    tdir = tmp_path / "tests"
    tdir.mkdir()
    (tdir / "grain_months_match.sql").write_text(
        _BUG_ANALYSIS_SINGULAR_SQL)
    # NOTE: the verbatim count-comparison test would fail even the truly
    # fixed rollup — payment-only months carry a NULL loan_type_name row
    # that expected_months (origination-derived) never has; the reference
    # prose overlooks it.  The passing twin is the grain-UNIQUENESS form
    # (what the bug actually violates).
    (tdir / "grain_months_match_fixed.sql").write_text("""
        select month, loan_type_name, count(*) as row_count
        from {{ ref('agg_monthly_loans_fixed') }}
        group by month, loan_type_name
        having count(*) > 1
    """)
    names = register_test_dir(p.registry, str(tdir))
    assert names == ["grain_months_match", "grain_months_match_fixed"]
    assert p.registry["grain_months_match"].deps == \
        ("fct_loan_details", "agg_monthly_loans")
    assert p.registry["grain_months_match"].materialized == "ephemeral"

    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        res = runner.build(dict(p.seeds))
        assert res.nodes["grain_months_match"].status == "fail"
        assert not res.nodes["grain_months_match"].tests[0].passed
        assert res.nodes["grain_months_match_fixed"].status == "success"
    finally:
        runner.clean()


def test_unit_tests_mock_inputs_and_compare_expected_rows(spark):
    """dbt 1.8-style unit_tests: the model's LOGIC runs against mocked
    ref inputs (no warehouse), expected rows compared on exactly the
    expected columns; a wrong expectation fails with a diff, an
    unmocked dep raises."""
    from dbt_demo_spark.core.project import run_unit_tests

    reg = ModelRegistry()
    register_sql_model(reg, "monthly", """
        select cast(substr(d, 1, 7) || '-01' as date) as month,
               sum(v) as total
        from {{ ref('payments') }}
        where status = 'ok'
        group by 1
    """)
    results = run_unit_tests(spark, reg, """
unit_tests:
  - name: sums_only_ok_rows
    model: monthly
    given:
      - input: ref('payments')
        rows:
          - {d: "2024-01-03", v: 5, status: ok}
          - {d: "2024-01-20", v: 7, status: bad}
          - {d: "2024-02-01", v: 2, status: ok}
    expect:
      rows:
        - {month: "2024-01-01", total: 5}
        - {month: "2024-02-01", total: 2}
  - name: wrong_expectation_fails_with_diff
    model: monthly
    given:
      - input: ref('payments')
        rows: [{d: "2024-01-03", v: 5, status: ok}]
    expect:
      rows: [{month: "2024-01-01", total: 999}]
""")
    assert [(r.name, r.passed) for r in results] == [
        ("sums_only_ok_rows", True),
        ("wrong_expectation_fails_with_diff", False)]
    assert "999" in results[1].detail

    with pytest.raises(ValueError, match="must be mocked"):
        run_unit_tests(spark, reg, """
unit_tests:
  - name: missing_mock
    model: monthly
    expect: {rows: []}
""")


def test_unit_tests_incremental_override(spark):
    """overrides: {is_incremental: true} runs the incremental branch
    against a mocked {{ this }}."""
    from dbt_demo_spark.core.project import run_unit_tests

    reg = ModelRegistry()
    register_sql_model(reg, "incr_rollup", """
        {{ config(materialized='incremental', partition_by='day') }}
        select day, sum(v) as total from {{ ref('src') }}
        {% if is_incremental() %}
        where day > (select max(day) from {{ this }})
        {% endif %}
        group by day
    """)
    yaml_text = """
unit_tests:
  - name: first_build_takes_everything
    model: incr_rollup
    given:
      - input: ref('src')
        rows: [{day: 1, v: 2}, {day: 2, v: 3}]
    expect:
      rows: [{day: 1, total: 2}, {day: 2, total: 3}]
  - name: refresh_only_past_watermark
    model: incr_rollup
    overrides: {is_incremental: true}
    given:
      - input: ref('src')
        rows: [{day: 1, v: 2}, {day: 2, v: 3}]
      - input: this
        rows: [{day: 1, total: 2}]
    expect:
      rows: [{day: 2, total: 3}]
"""
    results = run_unit_tests(spark, reg, yaml_text)
    assert all(r.passed for r in results), [
        (r.name, r.detail) for r in results]


def test_project_level_run_hooks(spark, tmp_path):
    """dbt on-run-start / on-run-end: run once around the pass; the end
    hook fires even when a node fails (audit hooks must see failures)."""
    _write_project(tmp_path, """\
        name: 'proj'
        model-paths: ["m"]
        seed-paths: ["s"]
        on-run-start: "select 'start' as phase"
        on-run-end:
          - "select 'end' as phase"
        """, {
        "s/nums.csv": "k,v\n1,10\n",
        "m/ok.sql": "select * from {{ ref('nums') }}",
    })
    p = port_dbt_project(spark, str(tmp_path))
    assert p.on_run_start == ("select 'start' as phase",)
    calls = []
    runner = Runner(
        spark, p.registry, str(tmp_path / "wh"),
        on_run_start=p.on_run_start + (
            lambda s, rel: calls.append(("start", sorted(rel))),),
        on_run_end=p.on_run_end + (
            lambda s, rel: calls.append(("end", sorted(rel))),))
    try:
        runner.run(dict(p.seeds))
        assert calls == [("start", ["nums"]), ("end", ["nums", "ok"])]
        calls.clear()
        runner.build(dict(p.seeds))
        assert [c[0] for c in calls] == ["start", "end"]
    finally:
        runner.clean()

    # end hook still fires when a model raises mid-build
    reg = ModelRegistry()
    register_sql_model(reg, "boom", "select undefined_col "
                                    "from {{ ref('nums') }}")
    calls.clear()
    r2 = Runner(spark, reg, str(tmp_path / "wh2"),
                on_run_end=(lambda s, rel: calls.append("end"),))
    try:
        res = r2.build(dict(p.seeds))
        assert res.nodes["boom"].status == "fail"
        assert calls == ["end"]
    finally:
        r2.clean()


def test_warn_severity_records_without_gating(spark, tmp_path):
    """dbt test severity: a failing warn-severity test records its
    violations but the node stays success and descendants build; the
    same test at error severity poisons."""
    _write_project(tmp_path, """\
        name: 'proj'
        model-paths: ["m"]
        seed-paths: ["s"]
        """, {
        "s/dups.csv": "k,v\n1,a\n1,b\n",
        "m/keyed.sql": "select * from {{ ref('dups') }}",
        "m/downstream.sql": "select count(*) as n from {{ ref('keyed') }}",
        "m/keyed.yml": """
models:
  - name: keyed
    columns:
      - name: k
        tests:
          - unique:
              config: {severity: warn}
""",
    })
    p = port_dbt_project(spark, str(tmp_path))
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        res = runner.build(dict(p.seeds))
        assert res.nodes["keyed"].status == "success"
        t = res.nodes["keyed"].tests[0]
        assert not t.passed and t.severity == "warn" and t.violations == 1
        assert res.nodes["downstream"].status == "success"
    finally:
        runner.clean()

    from dbt_demo_spark.core.datatests import unique
    from dbt_demo_spark.core.project import attach_properties as _  # noqa
    reg2 = ModelRegistry()
    register_sql_model(reg2, "keyed", "select * from {{ ref('dups') }}",
                       tests=(unique("keyed", ["k"]),))
    register_sql_model(reg2, "downstream",
                       "select count(*) as n from {{ ref('keyed') }}")
    r2 = Runner(spark, reg2, str(tmp_path / "wh2"))
    try:
        res2 = r2.build(dict(p.seeds))
        assert res2.nodes["keyed"].status == "fail"
        assert res2.nodes["downstream"].status == "skipped"
    finally:
        r2.clean()


def test_full_refresh_rebuilds_incremental_from_scratch(spark, tmp_path):
    """dbt --full-refresh: the incremental model runs its first-build
    branch (is_incremental() false) and the EXISTING table is replaced
    whole — every partition rewritten, stale partitions gone."""
    import os as _os

    from dbt_demo_spark.core.sqlmodel import register_sql_model as _reg

    reg = ModelRegistry()
    _reg(reg, "rollup", """
        {{ config(materialized='incremental', partition_by='day') }}
        select day, sum(v) as total from {{ ref('src') }}
        {% if is_incremental() %}
        where day > (select max(day) from {{ this }})
        {% endif %}
        group by day
    """)

    def events(days):
        return spark.createDataFrame(
            [(d, d * 10 + i) for d in days for i in range(2)],
            "day int, v long")

    wh = str(tmp_path / "wh")
    Runner(spark, reg, wh).run({"src": events([1, 2, 3])})
    path = _os.path.join(wh, "rollup")
    mtimes = {d: _os.path.getmtime(_os.path.join(path, d))
              for d in _os.listdir(path) if d.startswith("day=")}
    assert set(mtimes) == {"day=1", "day=2", "day=3"}

    # full refresh fed a DIFFERENT source slice: day=3 must disappear
    # (whole-table replace), days 1-2 must be rewritten bytes
    out = Runner(spark, reg, wh).run({"src": events([1, 2])},
                                     full_refresh=True)["rollup"]
    dirs = {d for d in _os.listdir(path) if d.startswith("day=")}
    assert dirs == {"day=1", "day=2"}
    assert {(r.day, r.total) for r in out.collect()} == \
        {(1, 10 * 1 * 2 + 1), (2, 2 * 10 * 2 + 1)}


def test_analyses_compile_but_never_run(spark, tmp_path):
    """dbt analysis-paths: SQL compiles with refs validated and vars
    substituted, is returned as runnable text, and no model node is
    registered for it."""
    _write_project(tmp_path, """\
        name: 'proj'
        model-paths: ["m"]
        seed-paths: ["s"]
        vars: {floor: 5}
        """, {
        "s/nums.csv": "k,v\n1,10\n2,3\n",
        "m/base.sql": "select * from {{ ref('nums') }}",
        "analyses/big_rows.sql":
            "select k from {{ ref('base') }} where v > {{ var('floor') }}",
    })
    p = port_dbt_project(spark, str(tmp_path))
    assert list(p.analyses) == ["big_rows"]
    assert "big_rows" not in p.registry.names()
    assert "{{" not in p.analyses["big_rows"]
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        runner.run(dict(p.seeds))  # registers base as a temp view
        assert [r.k for r in spark.sql(p.analyses["big_rows"]).collect()] \
            == [1]
    finally:
        runner.clean()

    # unknown ref fails at port time, like dbt's manifest validation
    (tmp_path / "analyses" / "bad.sql").write_text(
        "select * from {{ ref('ghost') }}")
    with pytest.raises(ValueError, match="ghost"):
        port_dbt_project(spark, str(tmp_path))


def test_store_failures_persists_violating_rows(spark, tmp_path):
    """dbt store_failures: a failing test's violating rows land under
    <warehouse>/_test_failures/<test_name> for post-mortem reads."""
    import os as _os

    _write_project(tmp_path, """\
        name: 'proj'
        model-paths: ["m"]
        seed-paths: ["s"]
        """, {
        "s/dups.csv": "k,v\n7,a\n7,b\n8,c\n",
        "m/keyed.sql": "select * from {{ ref('dups') }}",
        "m/keyed.yml": """
models:
  - name: keyed
    columns:
      - name: k
        tests: [unique]
""",
    })
    p = port_dbt_project(spark, str(tmp_path))
    wh = str(tmp_path / "wh")
    runner = Runner(spark, p.registry, wh, store_failures=True)
    try:
        res = runner.build(dict(p.seeds))
        assert res.nodes["keyed"].status == "fail"
        stored = spark.read.parquet(
            _os.path.join(wh, "_test_failures", "unique__keyed__k"))
        assert [(r.k, r.n_rows) for r in stored.collect()] == [(7, 2)]
    finally:
        runner.clean()


def test_sources_yaml_freshness_specs(spark, tmp_path):
    """dbt sources: YAML freshness -> FreshnessSpec list, loaded_at_field
    inherited from the source block, per-table override wins."""
    import datetime as _dt

    from dbt_demo_spark.core.freshness import check_freshness

    reg = ModelRegistry()
    applied = attach_properties(reg, """
sources:
  - name: raw
    loaded_at_field: loaded_at
    freshness:
      warn_after: {count: 1, period: hour}
      error_after: {count: 1, period: day}
    tables:
      - name: payments
      - name: loans
        loaded_at_field: updated_at
        freshness:
          warn_after: {count: 30, period: minute}
""")
    specs = {s.source: s for s in applied["freshness"]}
    assert specs["payments"].loaded_at_col == "loaded_at"
    assert specs["payments"].warn_after_s == 3600
    assert specs["payments"].error_after_s == 86400
    assert specs["loans"].loaded_at_col == "updated_at"
    assert specs["loans"].warn_after_s == 1800
    assert specs["loans"].error_after_s is None

    now = _dt.datetime(2024, 1, 1, 12, 0, 0)
    rels = {
        "payments": spark.createDataFrame(
            [(now - _dt.timedelta(hours=2),)], "loaded_at timestamp"),
        "loans": spark.createDataFrame(
            [(now - _dt.timedelta(minutes=5),)], "updated_at timestamp"),
    }
    results = {r.source: r.status
               for r in check_freshness(rels, applied["freshness"], now)}
    assert results == {"payments": "warn", "loans": "pass"}

    with pytest.raises(ValueError, match="loaded_at_field"):
        attach_properties(reg, """
sources:
  - name: raw
    tables:
      - name: t
        freshness: {warn_after: {count: 1, period: hour}}
""")


def test_snapshot_sql_files_port_and_capture_changes(spark, tmp_path):
    """dbt snapshots/*.sql blocks port through the project file and run
    through SnapshotRunner: two runs over a mutated source capture the
    SCD2 change; check_cols='all' refuses."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.core.snapshot import SnapshotRunner
    from dbt_demo_spark.core.sqlmodel import parse_snapshot_sql

    _write_project(tmp_path, """\
        name: 'proj'
        model-paths: ["m"]
        seed-paths: ["s"]
        snapshot-paths: ["snaps"]
        """, {
        "s/items.csv": "id,amount,updated_at\n"
                       "1,10,2024-01-01\n2,20,2024-01-01\n",
        "m/stg_items.sql": "select * from {{ ref('items') }}",
        "snaps/items_snapshot.sql": """
{% snapshot items_snapshot %}
{{ config(strategy='timestamp', unique_key='id',
          updated_at='updated_at') }}
select * from {{ ref('stg_items') }}
{% endsnapshot %}
""",
    })
    p = port_dbt_project(spark, str(tmp_path))
    assert list(p.snapshots) == ["items_snapshot"]
    sdef, fn, deps = p.snapshots["items_snapshot"]
    assert (sdef.strategy, sdef.unique_key, sdef.updated_at) == \
        ("timestamp", "id", "updated_at")
    assert deps == ("stg_items",)

    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    srunner = SnapshotRunner(spark, str(tmp_path / "snap_wh"))
    try:
        rels = runner.run(dict(p.seeds))
        srunner.run(sdef, fn({"stg_items": rels["stg_items"]}))
        # second run: item 1 mutated with a later updated_at
        changed = (rels["stg_items"]
                   .withColumn("amount", F.when(F.col("id") == 1, 99)
                               .otherwise(F.col("amount")))
                   .withColumn("updated_at",
                               F.when(F.col("id") == 1,
                                      F.lit(datetime.date(2024, 2, 1)))
                               .otherwise(F.col("updated_at"))))
        snap = srunner.run(sdef, changed)
        one = sorted(((r.amount, r.dbt_is_current)
                      for r in snap.filter("id = 1").collect()))
        assert one == [(10, 0), (99, 1)]  # history + current
    finally:
        runner.clean()

    with pytest.raises(ValueError, match="check_cols='all'"):
        parse_snapshot_sql("""
{% snapshot s %}
{{ config(strategy='check', unique_key='id', check_cols='all') }}
select 1 as id from {{ ref('x') }}
{% endsnapshot %}
""")


def test_review_fixes_round11(spark, tmp_path):
    """r11 code-review batch: (a) schema.yml descriptions replace the
    SQL-model length placeholder; (b) ported freshness specs surface on
    PortedProject; (c) relationships to: source(...) resolves; (d) vars
    substitute RAW (model text supplies quotes, identifier vars work);
    (e) full_refresh beats refresh='changed' false-skips; (f) build's
    end hook fires even on a selector error; (g) unit-test expectations
    compare values, not renderings; (h) bare-string check_cols is one
    column."""
    import pyspark.sql.functions as F  # noqa: F401

    from dbt_demo_spark.core.project import run_unit_tests
    from dbt_demo_spark.core.sqlmodel import parse_snapshot_sql

    _write_project(tmp_path, """\
        name: 'proj'
        model-paths: ["m"]
        seed-paths: ["s"]
        vars: {status_ok: ok, sort_col: v}
        """, {
        "s/pay.csv": "k,v,status,loaded_at\n"
                     "1,10,ok,2024-01-01\n2,20,bad,2024-01-01\n",
        "m/filtered.sql":
            "select k, v from {{ ref('pay') }} "
            "where status = '{{ var('status_ok') }}' "
            "order by {{ var('sort_col') }}",
        "m/filtered.yml": """
models:
  - name: filtered
    description: only the ok rows
sources:
  - name: raw
    loaded_at_field: loaded_at
    freshness: {warn_after: {count: 1, period: day}}
    tables: [{name: pay}]
""",
    })
    p = port_dbt_project(spark, str(tmp_path))
    # (a) the YAML description IS the doc, placeholder replaced
    assert p.registry["filtered"].doc == "only the ok rows"
    # (b) freshness specs ride the ported project
    assert [s.source for s in p.freshness] == ["pay"]
    # (d) raw var substitution: dbt's own-quotes idiom + identifier var
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run(dict(p.seeds))
        assert [(r.k, r.v) for r in rels["filtered"].collect()] == [(1, 10)]
    finally:
        runner.clean()

    # (c) relationships to: source('raw','pay')
    reg = ModelRegistry()
    register_sql_model(reg, "child", "select * from {{ ref('pay') }}")
    applied = attach_properties(reg, """
models:
  - name: child
    columns:
      - name: k
        tests:
          - relationships:
              to: source('raw', 'pay')
              field: k
""")
    runner = Runner(spark, reg, str(tmp_path / "wh_rel"))
    try:
        res = runner.build(dict(p.seeds))
        assert res.nodes["child"].status == "success"
    finally:
        runner.clean()

    # (e) full_refresh beats a refresh="changed" fingerprint skip
    reg2 = ModelRegistry()
    register_sql_model(reg2, "inc", """
        {{ config(materialized='incremental', partition_by='k') }}
        select k, v from {{ ref('pay') }}
        {% if is_incremental() %}
        where k > (select max(k) from {{ this }})
        {% endif %}
    """)
    import os as _os
    wh2 = str(tmp_path / "wh_fr")
    r2 = Runner(spark, reg2, wh2)
    r2.run(dict(p.seeds), refresh="changed")
    path = _os.path.join(wh2, "inc")
    before = max(_os.path.getmtime(_os.path.join(path, d))
                 for d in _os.listdir(path) if d.startswith("k="))
    Runner(spark, reg2, wh2).run(dict(p.seeds), refresh="changed",
                                 full_refresh=True)
    after = max(_os.path.getmtime(_os.path.join(path, d))
                for d in _os.listdir(path) if d.startswith("k="))
    assert after > before, "full_refresh was false-skipped"

    # (f) build's end hook fires even when the pass ABORTS (here: an
    # unresolved ref raises out of the scheduling loop) — the audit hook
    # contract; a selector typo still raises before any hook runs
    fired = []
    r3 = Runner(spark, reg, str(tmp_path / "wh_hook"),
                on_run_end=(lambda s, rel: fired.append(True),))
    with pytest.raises(KeyError, match="unresolved"):
        r3.build({})  # 'pay' missing: child can never resolve
    assert fired == [True]

    # (g) unit-test value comparison: int expectation vs double column
    reg4 = ModelRegistry()
    register_sql_model(reg4, "m4",
                       "select avg(v) as mean from {{ ref('pay') }}")
    results = run_unit_tests(spark, reg4, """
unit_tests:
  - name: mean_is_fifteen
    model: m4
    given:
      - input: ref('pay')
        rows: [{v: 10}, {v: 20}]
    expect:
      rows: [{mean: 15}]
""")
    assert results[0].passed, results[0].detail

    # (h) check_cols='status' is ONE column
    sdef, _fn, _deps = parse_snapshot_sql("""
{% snapshot s %}
{{ config(strategy='check', unique_key='id', check_cols='status') }}
select 1 as id, 'x' as status from {{ ref('pay') }}
{% endsnapshot %}
""")
    assert sdef.check_cols == ("status",)


def test_seed_column_types_override_inference(spark, tmp_path):
    """dbt +column_types: an overridden column skips inference and casts
    the RAW string — a varchar override on an all-digit column keeps its
    leading zeros; project-level defaults apply where the column exists,
    per-seed overrides for missing columns raise."""
    _write_project(tmp_path, """\
        name: 'proj'
        model-paths: ["m"]
        seed-paths: ["s"]
        seeds:
          proj:
            +column_types: {zip: varchar}
            accounts:
              +column_types: {balance: 'decimal(10,2)'}
        """, {
        "s/accounts.csv": "id,zip,balance\n1,02134,10.5\n2,90210,3\n",
        "s/lookup.csv": "code,label\n7,x\n",
        "m/base.sql": "select * from {{ ref('accounts') }}",
    })
    p = port_dbt_project(spark, str(tmp_path))
    acc = p.seeds["accounts"]
    types = {f.name: f.dataType.simpleString() for f in acc.schema.fields}
    assert types == {"id": "bigint", "zip": "string",
                     "balance": "decimal(10,2)"}
    rows = {r.id: (r.zip, str(r.balance)) for r in acc.collect()}
    assert rows[1] == ("02134", "10.50")  # leading zero survives
    # the project-level default named a column lookup.csv lacks: ignored
    assert [f.name for f in p.seeds["lookup"].schema.fields] == \
        ["code", "label"]

    from dbt_demo_spark.core.project import read_seed_csv_inferred
    with pytest.raises(ValueError, match="unknown columns"):
        read_seed_csv_inferred(
            spark, str(tmp_path / "s" / "lookup.csv"), {"ghost": "string"})


def test_attach_properties_unknown_model_or_test_raises():
    reg = ModelRegistry()
    with pytest.raises(ValueError, match="unknown model"):
        attach_properties(reg, "models:\n  - name: ghost\n")

# ------------------------------------------------ ADVICE r10 fixes -----

def test_seed_inference_is_agate_strict(spark, tmp_path):
    """ADVICE r10: bare int()/float() accepted '1_0' (-> 10), 'nan',
    'inf', and whitespace-padded values — all must stay text; plain
    and signed integers, decimals, and scientific notation still type."""
    p = tmp_path / "strict.csv"
    p.write_text(
        "u,nan_c,inf_c,pad,ok_i,ok_f\n"
        "1_0,nan,inf,\" 5\",-7,1.5e3\n"
        "22,2.5,Infinity,6 ,+8,.25\n")
    df = read_seed_csv_inferred(spark, str(p))
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types == {"u": "string", "nan_c": "string", "inf_c": "string",
                     "pad": "string", "ok_i": "bigint", "ok_f": "double"}
    r = sorted(df.collect(), key=lambda r: r.u)[0]
    assert r.u == "1_0" and r.pad == " 5" and r.ok_f == 1500.0


def test_unit_test_all_none_mock_row_constructs(spark):
    """ADVICE r10 (medium): the documented empty-input pattern — one
    all-None row carrying column names — must build (explicit schema,
    all-None -> string), and a malformed mock must come back as a
    FAILED result, not abort the suite."""
    from dbt_demo_spark.core.project import run_unit_tests

    reg = ModelRegistry()
    register_sql_model(reg, "totals", """
        select count(*) as n, sum(v) as total
        from {{ ref('payments') }} where v is not null
    """)
    results = run_unit_tests(spark, reg, """
unit_tests:
  - name: empty_input_yields_zero
    model: totals
    given:
      - input: ref('payments')
        rows: [{v: null}]
    expect:
      rows: [{n: 0, total: null}]
  - name: mixed_type_mock_fails_not_aborts
    model: totals
    given:
      - input: ref('payments')
        rows: [{v: 1}, {v: "oops"}]
    expect:
      rows: [{n: 1}]
""")
    assert [(r.name, r.passed) for r in results] == [
        ("empty_input_yields_zero", True),
        ("mixed_type_mock_fails_not_aborts", False)]
    assert "mixes types" in results[1].detail


def test_freshness_error_after_only(spark):
    """ADVICE r10: dbt accepts warn_after and/or error_after
    independently — error_after-only loads, never warns, still errors."""
    import datetime as _dt

    from dbt_demo_spark.core.freshness import check_freshness

    reg = ModelRegistry()
    applied = attach_properties(reg, """
sources:
  - name: raw
    loaded_at_field: loaded_at
    tables:
      - name: t
        freshness: {error_after: {count: 1, period: hour}}
""")
    (spec,) = applied["freshness"]
    assert spec.warn_after_s is None and spec.error_after_s == 3600

    now = _dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda h: spark.createDataFrame(  # noqa: E731
        [(now - _dt.timedelta(hours=h),)], "loaded_at timestamp")
    assert check_freshness({"t": mk(0.5)}, [spec], now)[0].status == "pass"
    assert check_freshness({"t": mk(2)}, [spec], now)[0].status == "error"

    # an empty/null freshness block is DISABLED (dbt: freshness: null),
    # but a non-empty block missing both thresholds is a config error
    with pytest.raises(ValueError, match="warn_after and/or error_after"):
        attach_properties(reg, """
sources:
  - name: raw
    loaded_at_field: loaded_at
    tables:
      - name: t
        freshness: {filter: "1=1"}
""")


def test_properties_yaml_extension_also_discovered(spark, tmp_path):
    """ADVICE r10: dbt accepts .yaml as well as .yml — a schema.yaml's
    tests must attach through port_dbt_project."""
    (tmp_path / "dbt_project.yml").write_text(
        "name: yamlproj\nmodel-paths: ['models']\nseed-paths: ['seeds']\n")
    m = tmp_path / "models"
    m.mkdir()
    (m / "pass_through.sql").write_text(
        "select id from {{ ref('items') }}")
    (m / "schema.yaml").write_text("""
models:
  - name: pass_through
    columns:
      - name: id
        tests: [not_null, unique]
""")
    s = tmp_path / "seeds"
    s.mkdir()
    (s / "items.csv").write_text("id\n1\n2\n")
    p = port_dbt_project(spark, str(tmp_path))
    assert p.registry["pass_through"].tests, \
        "schema.yaml tests were not attached"


# ------------------------------------------- X82 user-defined macros ----

def test_macro_parse_and_expand_unit():
    """Macro-lite surface: positional/keyword/default binding, string
    values render unquoted, ref() args re-wrap for the downstream
    render, nested macros expand, dynamic constructs raise."""
    from dbt_demo_spark.core.macros import expand_macros, parse_macro_text

    macros = parse_macro_text("""
{% macro cents_to_dollars(column_name, scale=2) %}
round({{ column_name }} / 100.0, {{ scale }})
{% endmacro %}
{% macro money(col) %}
{{ cents_to_dollars(col, scale=4) }}
{% endmacro %}
""")
    out = expand_macros(
        "select {{ cents_to_dollars('amount_cents') }} as amount,\n"
        "       {{ money('fee_cents') }} as fee\n"
        "from {{ ref('payments') }}", macros)
    assert "round(amount_cents / 100.0, 2)" in out
    assert "round(fee_cents / 100.0, 4)" in out  # nested + kwarg
    assert "{{ ref('payments') }}" in out        # untouched

    # a ref() argument re-wraps so parse_deps sees the edge
    m2 = parse_macro_text(
        "{% macro latest(rel) %}select max(ts) from {{ rel }}"
        "{% endmacro %}")
    out2 = expand_macros("{{ latest(ref('events')) }}", m2)
    assert out2 == "select max(ts) from {{ ref('events') }}"

    with pytest.raises(ValueError, match="control flow"):
        parse_macro_text(
            "{% macro bad() %}{% if x %}1{% endif %}{% endmacro %}")
    with pytest.raises(ValueError, match="shadows a built-in"):
        parse_macro_text("{% macro ref(x) %}{{ x }}{% endmacro %}")
    with pytest.raises(ValueError, match="unsupported argument"):
        expand_macros("{{ latest(1 + 2) }}", m2)
    with pytest.raises(ValueError, match="too many arguments"):
        expand_macros("{{ latest(ref('a'), ref('b')) }}", m2)
    with pytest.raises(ValueError, match="did not terminate"):
        expand_macros("{{ loop_a() }}", parse_macro_text(
            "{% macro loop_a() %}{{ loop_b() }}{% endmacro %}"
            "{% macro loop_b() %}{{ loop_a() }}{% endmacro %}"))


def test_project_macros_port_end_to_end(spark, tmp_path):
    """VERDICT r10 item 2 'done' criterion: a synthetic project with a
    project-defined macro used by a model ports through
    port_dbt_project and its relation matches a hand-expanded twin;
    an unknown macro call still raises."""
    (tmp_path / "dbt_project.yml").write_text(
        "name: macproj\nmodel-paths: ['models']\nseed-paths: ['seeds']\n"
        "macro-paths: ['macros']\n")
    (tmp_path / "macros").mkdir()
    (tmp_path / "macros" / "helpers.sql").write_text("""
{% macro cents_to_dollars(column_name, scale=2) %}
round({{ column_name }} / 100.0, {{ scale }})
{% endmacro %}
""")
    m = tmp_path / "models"
    m.mkdir()
    (m / "dollars.sql").write_text(
        "select id, {{ cents_to_dollars('cents') }} as amount\n"
        "from {{ ref('pays') }}")
    s = tmp_path / "seeds"
    s.mkdir()
    (s / "pays.csv").write_text("id,cents\n1,150\n2,99\n")

    p = port_dbt_project(spark, str(tmp_path))
    assert p.registry["dollars"].deps == ("pays",)  # macro-introduced dep OK
    runner = Runner(spark, p.registry, warehouse_dir=str(tmp_path / "wh"))
    try:
        out = runner.run(p.seeds)["dollars"]
        # Spark parses the 100.0 literal as DECIMAL(4,1), so round()
        # yields decimal — hand-expanded twin semantics, value-compared
        got = {r.id: float(r.amount) for r in out.collect()}
        assert got == {1: 1.5, 2: 0.99}
        twin = {r.id: float(r.amount) for r in p.seeds["pays"]
                .selectExpr("id", "round(cents / 100.0, 2) as amount")
                .collect()}
        assert got == twin
    finally:
        runner.clean()

    # unknown macro call fails loud through the standard leftover check
    (m / "broken.sql").write_text(
        "select {{ not_a_macro('x') }} from {{ ref('pays') }}")
    with pytest.raises(ValueError, match="unsupported Jinja"):
        port_dbt_project(spark, str(tmp_path))


# ------------------------------------ X83 env_var + vars overrides ----

def test_env_var_and_vars_overrides(spark, tmp_path):
    """env_var() renders from the EXPLICIT env_vars mapping (never
    os.environ), defaults apply, missing-with-no-default raises;
    vars_overrides take dbt's CLI --vars precedence over project vars."""
    (tmp_path / "dbt_project.yml").write_text(
        "name: envproj\nmodel-paths: ['models']\nseed-paths: ['seeds']\n"
        "vars:\n  status_filter: ok\n")
    m = tmp_path / "models"
    m.mkdir()
    (m / "filtered.sql").write_text(
        "select id from {{ ref('items') }}\n"
        "where status = '{{ var(\"status_filter\") }}'\n"
        "  and region = '{{ env_var(\"REGION\", \"emea\") }}'\n"
        "  and tier >= {{ env_var('MIN_TIER') }}")
    s = tmp_path / "seeds"
    s.mkdir()
    (s / "items.csv").write_text(
        "id,status,region,tier\n1,ok,emea,5\n2,ok,apac,9\n3,bad,emea,9\n")

    # missing env_var with no default raises at registration
    with pytest.raises(ValueError, match="MIN_TIER"):
        port_dbt_project(spark, str(tmp_path))

    p = port_dbt_project(spark, str(tmp_path), env_vars={"MIN_TIER": 4})
    runner = Runner(spark, p.registry, warehouse_dir=str(tmp_path / "wh"))
    try:
        out = runner.run(p.seeds)["filtered"]
        assert {r.id for r in out.collect()} == {1}
    finally:
        runner.clean()

    # CLI --vars precedence: override flips the status filter
    p2 = port_dbt_project(spark, str(tmp_path),
                          env_vars={"MIN_TIER": 4, "REGION": "emea"},
                          vars_overrides={"status_filter": "bad"})
    assert p2.vars["status_filter"] == "bad"
    runner2 = Runner(spark, p2.registry, warehouse_dir=str(tmp_path / "wh2"))
    try:
        out2 = runner2.run(p2.seeds)["filtered"]
        assert {r.id for r in out2.collect()} == {3}
    finally:
        runner2.clean()


# --------------------------------------------- X85 packages (dbt deps) ----

def _write_package(root, name: str, yml: str, files: dict[str, str]) -> None:
    pkg = root / "dbt_packages" / name
    pkg.mkdir(parents=True, exist_ok=True)
    _write_project(pkg, yml, {k: textwrap.dedent(v)
                              for k, v in files.items()})


def test_port_with_vendored_package(spark, tmp_path):
    """X85 end-to-end: a package vendored under dbt_packages/ loads as a
    full dbt project — its macro is callable from root models (bare and
    qualified), its model registers on the flat namespace and is
    reachable via both ref forms, root's models:<pkg> tree overrides the
    package's own materialization policy, and a root-scoped vars block
    wins inside the package's models."""
    _write_project(tmp_path, """\
        name: 'rootp'
        model-paths: ["models"]
        seed-paths: ["seeds"]
        vars:
          util_pkg:
            rate_mult: 3
        models:
          rootp:
            +materialized: view
          util_pkg:
            +materialized: table
        """, {
        "seeds/nums.csv": "k,cents\n1,150\n2,99\n",
        "models/dollars.sql":
            "select k, {{ cents_to_dollars('cents') }} as usd "
            "from {{ ref('nums') }}",
        "models/enriched.sql":
            "select r.k, r.rate, "
            "{{ util_pkg.cents_to_dollars('r.rate', 0) }} as rate_usd "
            "from {{ ref('util_pkg', 'pkg_rates') }} r",
    })
    _write_package(tmp_path, "util_pkg", """\
        name: 'util_pkg'
        model-paths: ["models"]
        macro-paths: ["macros"]
        models:
          util_pkg:
            +materialized: ephemeral
        """, {
        "macros/money.sql": """\
            {% macro cents_to_dollars(col, precision=2) %}
            round({{ col }} / 100.0, {{ precision }})
            {% endmacro %}
        """,
        "models/pkg_rates.sql":
            "select k, cents * {{ var('rate_mult', 1) }} as rate "
            "from {{ ref('nums') }}",
    })
    p = port_dbt_project(spark, str(tmp_path))
    assert p.packages == ("util_pkg",)
    # root models:<pkg> tree beats the package's own ephemeral default
    assert p.registry["pkg_rates"].materialized == "table"
    assert p.registry["dollars"].materialized == "view"
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run(dict(p.seeds))
        # bare macro call, root model over a root seed
        assert {(r.k, float(r.usd)) for r in rels["dollars"].collect()} \
            == {(1, 1.5), (2, 0.99)}
        # package model: scoped vars block (rate_mult=3) applied
        assert {(r.k, r.rate) for r in rels["pkg_rates"].collect()} \
            == {(1, 450), (2, 297)}
        # two-arg ref + qualified macro call with a positional override
        assert {(r.k, float(r.rate_usd))
                for r in rels["enriched"].collect()} == {(1, 5.0), (2, 3.0)}
    finally:
        runner.clean()


def test_packages_yml_local_entry_and_network_raise(spark, tmp_path):
    """packages.yml local: entries read a checkout in place; hub/git
    entries raise with the vendoring instruction (no network here)."""
    ext = tmp_path / "elsewhere" / "extras"
    ext.mkdir(parents=True)
    _write_project(ext, """\
        name: 'extras'
        model-paths: ["models"]
        """, {"models/doubled.sql":
              "select k, cents * 2 as c2 from {{ ref('nums') }}"})
    (tmp_path / "proj").mkdir()
    _write_project(tmp_path / "proj", """\
        name: 'rootp'
        model-paths: ["models"]
        seed-paths: ["seeds"]
        """, {
        "seeds/nums.csv": "k,cents\n1,150\n",
        "models/top.sql": "select k from {{ ref('doubled') }}",
        "packages.yml": "packages:\n  - local: ../elsewhere/extras\n",
    })
    p = port_dbt_project(spark, str(tmp_path / "proj"))
    assert p.packages == ("extras",)
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run(dict(p.seeds))
        assert [r.c2 for r in rels["doubled"].collect()] == [300]
    finally:
        runner.clean()

    (tmp_path / "proj" / "packages.yml").write_text(
        "packages:\n  - package: dbt-labs/dbt_utils\n    version: 1.1.1\n")
    with pytest.raises(ValueError, match="vendor"):
        port_dbt_project(spark, str(tmp_path / "proj"))
    (tmp_path / "proj" / "packages.yml").write_text(
        "packages:\n  - git: https://example.com/x.git\n")
    with pytest.raises(ValueError, match="vendor"):
        port_dbt_project(spark, str(tmp_path / "proj"))
    # dependencies.yml AND packages.yml both declaring packages: raises
    (tmp_path / "proj" / "packages.yml").write_text(
        "packages:\n  - local: ../elsewhere/extras\n")
    (tmp_path / "proj" / "dependencies.yml").write_text(
        "packages:\n  - local: ../elsewhere/extras\n")
    with pytest.raises(ValueError, match="keep one"):
        port_dbt_project(spark, str(tmp_path / "proj"))


def test_package_namespace_collisions(spark, tmp_path):
    """dbt's namespace is flat: a package model named like a root model
    raises; two packages sharing a macro name keep only the qualified
    forms (a bare call fails loud); a root macro beats a package macro
    for the bare name; colliding seeds raise."""
    _write_project(tmp_path, """\
        name: 'rootp'
        model-paths: ["models"]
        seed-paths: ["seeds"]
        macro-paths: ["macros"]
        """, {
        "seeds/nums.csv": "k\n1\n",
        "macros/tag.sql":
            "{% macro tag() %}'root'{% endmacro %}",
        "models/who.sql":
            "select {{ tag() }} as src, {{ a_pkg.tag() }} as a_src, "
            "{{ b_pkg.tag() }} as b_src from {{ ref('nums') }}",
    })
    pkg_yml = "name: '%s'\nmodel-paths: [\"models\"]\n" \
              "macro-paths: [\"macros\"]\n"
    for pkg in ("a_pkg", "b_pkg"):
        _write_package(tmp_path, pkg, pkg_yml % pkg, {
            "macros/tag.sql":
                "{%% macro tag() %%}'%s'{%% endmacro %%}" % pkg,
        })
    p = port_dbt_project(spark, str(tmp_path))
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        row = runner.run(dict(p.seeds))["who"].collect()[0]
        assert (row.src, row.a_src, row.b_src) == ("root", "a_pkg", "b_pkg")
    finally:
        runner.clean()

    # cross-package macro collision WITHOUT a root macro: bare call
    # is ambiguous -> only qualified resolves, bare raises loud
    (tmp_path / "macros" / "tag.sql").unlink()
    (tmp_path / "models" / "who.sql").write_text(
        "select {{ tag() }} as src from {{ ref('nums') }}")
    with pytest.raises(ValueError, match="unsupported Jinja"):
        port_dbt_project(spark, str(tmp_path))

    # model-name collision across projects raises
    (tmp_path / "models" / "who.sql").write_text(
        "select k from {{ ref('nums') }}")
    (tmp_path / "dbt_packages" / "a_pkg" / "models").mkdir(exist_ok=True)
    (tmp_path / "dbt_packages" / "a_pkg" / "models" / "who.sql").write_text(
        "select k from {{ ref('nums') }}")
    with pytest.raises(ValueError, match="duplicate model"):
        port_dbt_project(spark, str(tmp_path))
    (tmp_path / "dbt_packages" / "a_pkg" / "models" / "who.sql").unlink()

    # seed collision across projects raises
    (tmp_path / "dbt_packages" / "b_pkg" / "seeds").mkdir()
    (tmp_path / "dbt_packages" / "b_pkg" / "dbt_project.yml").write_text(
        pkg_yml % "b_pkg" + "seed-paths: [\"seeds\"]\n")
    (tmp_path / "dbt_packages" / "b_pkg" / "seeds" / "nums.csv").write_text(
        "k\n9\n")
    with pytest.raises(ValueError, match="collide"):
        port_dbt_project(spark, str(tmp_path))


def test_models_tree_unknown_project_raises(spark, tmp_path):
    """A root models: tree naming neither the project nor an installed
    package is a typo or a missing install — raise, don't silently
    drop the config (VERDICT r10 'What's wrong' #4)."""
    _write_project(tmp_path, """\
        name: 'rootp'
        model-paths: ["models"]
        seed-paths: ["seeds"]
        models:
          rootp:
            +materialized: view
          dbt_utils:
            +materialized: table
        """, {
        "seeds/nums.csv": "k\n1\n",
        "models/top.sql": "select k from {{ ref('nums') }}",
    })
    with pytest.raises(ValueError, match="dbt_utils"):
        port_dbt_project(spark, str(tmp_path))


# ------------------------------------------ X87 model versions ----

def test_model_versions_end_to_end(spark, tmp_path):
    """dbt model versions [dbt-core 1.5 public surface]: versioned
    files register as <name>_v<N> (defined_in honored), an unpinned
    ref takes latest_version, a pinned ref('m', v=N) takes exactly
    that version, properties fan out to every version, and
    deprecation_date is recorded inertly."""
    _write_project(tmp_path, """\
        name: 'vproj'
        model-paths: ["models"]
        seed-paths: ["seeds"]
        """, {
        "seeds/nums.csv": "k,v\n1,10\n2,20\n",
        "models/dim_k_v1.sql":
            "select k, v from {{ ref('nums') }}",
        "models/dim_k_next.sql":
            "select k, v * 100 as v from {{ ref('nums') }}",
        "models/latest_user.sql":
            "select sum(v) as tot from {{ ref('dim_k') }}",
        "models/pinned_user.sql":
            "select sum(v) as tot from {{ ref('dim_k', v=1) }}",
        "models/schema.yml": """\
            models:
              - name: dim_k
                latest_version: 2
                description: versioned dimension
                versions:
                  - v: 1
                    deprecation_date: 2099-01-01
                  - v: 2
                    defined_in: dim_k_next
                columns:
                  - name: k
                    tests: [not_null]
        """,
    })
    p = port_dbt_project(spark, str(tmp_path))
    assert "dim_k_v1" in p.registry.names()
    assert "dim_k_v2" in p.registry.names()
    assert "dim_k" not in p.registry.names()
    # properties fanned out: both versions carry the column test + doc
    assert [t.name for t in p.registry["dim_k_v1"].tests]
    assert [t.name for t in p.registry["dim_k_v2"].tests]
    assert p.registry["dim_k_v2"].doc == "versioned dimension"
    assert p.deprecations == {"dim_k_v1": "2099-01-01"}
    # dep edges landed on the resolved nodes
    assert p.registry["latest_user"].deps == ("dim_k_v2",)
    assert p.registry["pinned_user"].deps == ("dim_k_v1",)
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run(dict(p.seeds))
        assert rels["latest_user"].collect()[0].tot == 3000
        assert rels["pinned_user"].collect()[0].tot == 30
    finally:
        runner.clean()


def test_model_version_errors(spark, tmp_path):
    """Pinning a version on an unversioned model, pinning an
    undeclared version, a latest_version outside the declared set,
    and per-version override keys all raise."""
    files = {
        "seeds/nums.csv": "k\n1\n",
        "models/dim_k_v1.sql": "select k from {{ ref('nums') }}",
        "models/user.sql": "select k from {{ ref('dim_k') }}",
        "models/schema.yml": """\
            models:
              - name: dim_k
                versions:
                  - v: 1
        """,
    }
    yml = """\
        name: 'vproj'
        model-paths: ["models"]
        seed-paths: ["seeds"]
        """
    # baseline: latest_version defaults to the max declared v
    _write_project(tmp_path, yml, files)
    p = port_dbt_project(spark, str(tmp_path))
    assert p.registry["user"].deps == ("dim_k_v1",)

    (tmp_path / "models" / "user.sql").write_text(
        "select k from {{ ref('dim_k', v=7) }}")
    with pytest.raises(ValueError, match="no such version"):
        port_dbt_project(spark, str(tmp_path))

    (tmp_path / "models" / "user.sql").write_text(
        "select k from {{ ref('nums', version=1) }}")
    with pytest.raises(ValueError, match="not a versioned model"):
        port_dbt_project(spark, str(tmp_path))

    (tmp_path / "models" / "user.sql").write_text(
        "select k from {{ ref('dim_k') }}")
    (tmp_path / "models" / "schema.yml").write_text(
        "models:\n  - name: dim_k\n    latest_version: 3\n"
        "    versions:\n      - v: 1\n")
    with pytest.raises(ValueError, match="latest_version=3"):
        port_dbt_project(spark, str(tmp_path))

    (tmp_path / "models" / "schema.yml").write_text(
        "models:\n  - name: dim_k\n"
        "    versions:\n      - v: 1\n        config: {alias: z}\n")
    with pytest.raises(ValueError, match="unsupported keys"):
        port_dbt_project(spark, str(tmp_path))


# ------------------------------------- X88 groups + access governance ----

_GOV_YML = """\
    name: 'govproj'
    model-paths: ["models"]
    seed-paths: ["seeds"]
    """

_GOV_SCHEMA = """\
    groups:
      - name: finance
        owner: {name: fin team, email: fin@example.com}
      - name: ops
        owner: {name: ops team}
    models:
      - name: fin_core
        group: finance
        access: private
      - name: fin_report
        group: finance
"""


def test_groups_and_private_access(spark, tmp_path):
    """dbt model governance: a private model is referable inside its
    group, a cross-group ref raises, groups collect owner metadata."""
    _write_project(tmp_path, _GOV_YML, {
        "seeds/nums.csv": "k\n1\n2\n",
        "models/fin_core.sql": "select k from {{ ref('nums') }}",
        "models/fin_report.sql":
            "select count(*) as n from {{ ref('fin_core') }}",
        "models/schema.yml": _GOV_SCHEMA,
    })
    p = port_dbt_project(spark, str(tmp_path))
    assert p.groups["finance"]["email"] == "fin@example.com"
    assert p.registry["fin_core"].access == "private"
    assert p.registry["fin_report"].group == "finance"
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        assert runner.run(dict(p.seeds))["fin_report"].collect()[0].n == 2
    finally:
        runner.clean()

    # cross-group ref of a private model raises at port time
    (tmp_path / "models" / "ops_report.sql").write_text(
        "select k from {{ ref('fin_core') }}")
    (tmp_path / "models" / "schema.yml").write_text(
        textwrap.dedent(_GOV_SCHEMA)
        + "  - name: ops_report\n    group: ops\n")
    with pytest.raises(ValueError, match="same-group-only"):
        port_dbt_project(spark, str(tmp_path))
    # ...but a singular TEST may observe it (tests are not models)
    (tmp_path / "models" / "ops_report.sql").unlink()
    (tmp_path / "models" / "schema.yml").write_text(
        textwrap.dedent(_GOV_SCHEMA))
    (tmp_path / "tests").mkdir()
    (tmp_path / "tests" / "fin_core_nonempty.sql").write_text(
        "select * from {{ ref('fin_core') }} where k is null")
    p2 = port_dbt_project(spark, str(tmp_path))
    assert "fin_core_nonempty" in p2.model_names


def test_governance_error_matrix(spark, tmp_path):
    files = {
        "seeds/nums.csv": "k\n1\n",
        "models/m.sql": "select k from {{ ref('nums') }}",
    }
    # undeclared group
    _write_project(tmp_path, _GOV_YML, {
        **files,
        "models/schema.yml":
            "models:\n  - name: m\n    group: nosuch\n",
    })
    with pytest.raises(ValueError, match="no\n*.*groups: entry|no groups"):
        port_dbt_project(spark, str(tmp_path))
    # private without a group
    (tmp_path / "models" / "schema.yml").write_text(
        "models:\n  - name: m\n    access: private\n")
    with pytest.raises(ValueError, match="has no group"):
        port_dbt_project(spark, str(tmp_path))
    # bad access value
    (tmp_path / "models" / "schema.yml").write_text(
        "models:\n  - name: m\n    access: internal\n")
    with pytest.raises(ValueError, match="public/protected/private"):
        port_dbt_project(spark, str(tmp_path))


def test_restrict_access_package_boundary(spark, tmp_path):
    """A package declaring restrict-access: true blocks cross-project
    refs of its protected (default) models; access: public opens the
    model; without restrict-access packages interoperate freely (the
    dbt opt-in)."""
    _write_project(tmp_path, _GOV_YML, {
        "seeds/nums.csv": "k\n1\n",
        "models/top.sql": "select k from {{ ref('inner_m') }}",
    })
    pkg_yml = ("name: 'locked'\nmodel-paths: [\"models\"]\n"
               "restrict-access: true\n")
    _write_package(tmp_path, "locked", pkg_yml, {
        "models/inner_m.sql": "select k from {{ ref('nums') }}",
    })
    with pytest.raises(ValueError, match="restrict-access"):
        port_dbt_project(spark, str(tmp_path))

    # access: public exposes it across the boundary
    (tmp_path / "dbt_packages" / "locked" / "models" / "schema.yml"
     ).write_text("models:\n  - name: inner_m\n    access: public\n")
    p = port_dbt_project(spark, str(tmp_path))
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        assert runner.run(dict(p.seeds))["top"].collect()[0].k == 1
    finally:
        runner.clean()

    # without restrict-access the protected default interoperates
    (tmp_path / "dbt_packages" / "locked" / "models" / "schema.yml"
     ).unlink()
    (tmp_path / "dbt_packages" / "locked" / "dbt_project.yml").write_text(
        "name: 'locked'\nmodel-paths: [\"models\"]\n")
    p2 = port_dbt_project(spark, str(tmp_path))
    assert "inner_m" in p2.model_names


# ------------------------------------------ X89 run-operation ----

def test_run_operation(spark, tmp_path):
    """dbt run-operation analog: a macro invoked standalone — args
    bind, refs in the expansion bind to passed relations, the SQL runs
    and returns its result; unknown macro / missing relation raise."""
    from dbt_demo_spark.core.macros import parse_macro_text, run_operation

    macros = parse_macro_text("""
        {% macro audit_above(threshold=100) %}
        select k, cents from {{ ref('pays') }}
        where cents > {{ threshold }}
        {% endmacro %}
    """)
    pays = spark.createDataFrame(
        [(1, 150), (2, 99), (3, 500)], "k int, cents int")
    out = run_operation(spark, macros, "audit_above",
                        relations={"pays": pays})
    assert {r.k for r in out.collect()} == {1, 3}
    out2 = run_operation(spark, macros, "audit_above",
                         args={"threshold": 200},
                         relations={"pays": pays})
    assert {r.k for r in out2.collect()} == {3}
    with pytest.raises(ValueError, match="unknown macro"):
        run_operation(spark, macros, "nope")
    with pytest.raises(ValueError, match="no such relations"):
        run_operation(spark, macros, "audit_above")


# --------------------------------- X92 csv-format unit-test fixtures ----

def test_unit_test_csv_fixtures(spark):
    """dbt unit-test format: csv — inline CSV given/expect rows parse
    with the seed type ladder (typed values, empty -> NULL) and compare
    exactly like dict rows; sql format and fixture: files raise."""
    from dbt_demo_spark.core.project import run_unit_tests

    reg = ModelRegistry()
    register_sql_model(
        reg, "doubled",
        "select k, v * 2 as v2 from {{ ref('nums') }} where v is not null")
    results = run_unit_tests(spark, reg, """
unit_tests:
  - name: csv_fixture_types
    model: doubled
    given:
      - input: ref('nums')
        format: csv
        rows: |
          k,v
          1,10
          2,
          3,30
    expect:
      format: csv
      rows: |
        k,v2
        1,20
        3,60
""")
    assert [r.passed for r in results] == [True], results[0].detail

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsupported"):
        run_unit_tests(spark, reg, """
unit_tests:
  - name: bad
    model: doubled
    given:
      - input: ref('nums')
        format: sql
        rows: select 1
    expect: {rows: []}
""")
    with _pytest.raises(ValueError, match="inline"):
        run_unit_tests(spark, reg, """
unit_tests:
  - name: bad2
    model: doubled
    given:
      - input: ref('nums')
        fixture: my_fixture
    expect: {rows: []}
""")


# --------------------------------- r12 self-review regression tests ----

def test_self_recursive_macro_raises_not_hangs():
    """Review r12: a macro whose body calls itself must hit the
    max_depth recursion guard, not loop forever."""
    from dbt_demo_spark.core.macros import expand_macros, parse_macro_text

    macros = parse_macro_text(
        "{% macro r(x) %}{{ r(x) }}{% endmacro %}")
    with pytest.raises(ValueError, match="did not terminate"):
        expand_macros("{{ r(1) }}", macros, max_depth=3)
    # mutual recursion hits the same guard
    macros2 = parse_macro_text(
        "{% macro a(x) %}{{ b(x) }}{% endmacro %}"
        "{% macro b(x) %}{{ a(x) }}{% endmacro %}")
    with pytest.raises(ValueError, match="did not terminate"):
        expand_macros("{{ a(1) }}", macros2, max_depth=4)


def test_unparseable_macro_definition_raises():
    """Review r12: a {% macro %} opener the definition regex cannot
    consume (parens in a default) must raise at parse, not silently
    skip the macro."""
    from dbt_demo_spark.core.macros import parse_macro_text

    with pytest.raises(ValueError, match="could not be parsed"):
        parse_macro_text("{% macro f(x=('a')) %}{{ x }}{% endmacro %}")


def test_ragged_csv_fixture_raises(spark):
    """Review r12: a short CSV fixture row must raise, not silently
    truncate every row's trailing columns."""
    from dbt_demo_spark.core.project import _fixture_rows

    with pytest.raises(ValueError, match="csv line 3 has 1 fields"):
        _fixture_rows({"format": "csv", "rows": "id,amt\n1,2\n3\n"},
                      "t")
    # well-formed parses typed
    rows = _fixture_rows({"format": "csv", "rows": "id,amt\n1,2\n3,4\n"},
                         "t")
    assert rows == [{"id": 1, "amt": 2}, {"id": 3, "amt": 4}]


def test_root_global_default_beats_package_tree(spark, tmp_path):
    """Review r12: dbt precedence — the ROOT project's models-level
    +materialized cascades over an installed package at every depth,
    beating the package's own tree config."""
    _write_project(tmp_path, """\
        name: 'rootp'
        model-paths: ["models"]
        seed-paths: ["seeds"]
        models:
          +materialized: view
        """, {
        "seeds/nums.csv": "k\n1\n",
        "models/top.sql": "select k from {{ ref('pkg_m') }}",
    })
    _write_package(tmp_path, "util_pkg", """\
        name: 'util_pkg'
        model-paths: ["models"]
        models:
          util_pkg:
            +materialized: table
        """, {
        "models/pkg_m.sql": "select k from {{ ref('nums') }}",
    })
    p = port_dbt_project(spark, str(tmp_path))
    assert p.registry["pkg_m"].materialized == "view"   # root cascade wins
    assert p.registry["top"].materialized == "view"


def test_per_version_column_overrides(spark, tmp_path):
    """dbt versioned-model columns: a version's include/exclude element
    pulls the model-level columns minus the dropped one, plain defs add
    or override — tests attach per-version accordingly."""
    _write_project(tmp_path, """\
        name: 'vproj'
        model-paths: ["models"]
        seed-paths: ["seeds"]
        """, {
        "seeds/nums.csv": "k,legacy\n1,a\n2,b\n",
        "models/dim_k_v1.sql":
            "select k, legacy from {{ ref('nums') }}",
        "models/dim_k_v2.sql":
            "select k, k * 2 as fresh from {{ ref('nums') }}",
        "models/schema.yml": """\
            models:
              - name: dim_k
                columns:
                  - name: k
                    tests: [not_null]
                  - name: legacy
                    tests: [not_null]
                versions:
                  - v: 1
                  - v: 2
                    columns:
                      - include: '*'
                        exclude: [legacy]
                      - name: fresh
                        tests: [not_null]
        """,
    })
    p = port_dbt_project(spark, str(tmp_path))
    v1 = {t.name for t in p.registry["dim_k_v1"].tests}
    v2 = {t.name for t in p.registry["dim_k_v2"].tests}
    assert any("legacy" in t for t in v1)
    assert not any("legacy" in t for t in v2)
    assert any("fresh" in t for t in v2)
    # the attached tests actually run green on the per-version shapes
    from dbt_demo_spark.core.runner import Runner
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        assert runner.build(dict(p.seeds)).ok
    finally:
        runner.clean()

    # unknown exclude name raises
    (tmp_path / "models" / "schema.yml").write_text(textwrap.dedent("""\
        models:
          - name: dim_k
            columns: [{name: k}]
            versions:
              - v: 1
              - v: 2
                columns:
                  - {include: '*', exclude: [nope]}
    """))
    with pytest.raises(ValueError, match="nope"):
        port_dbt_project(spark, str(tmp_path))


def test_version_columns_override_position_independent():
    """Review r12: a plain per-version column def beats the inherited
    def of the same name no matter where it sits relative to the
    include element; scalar exclude strings mean one NAME, never their
    characters."""
    from dbt_demo_spark.core.project import _version_columns

    base = [{"name": "k", "tests": ["not_null"]},
            {"name": "legacy", "tests": ["not_null"]}]
    # override BEFORE the include element
    out = _version_columns(
        base, [{"name": "k", "tests": ["unique"]}, {"include": "*"}],
        "m_v2")
    ks = [c for c in out if c["name"] == "k"]
    assert len(ks) == 1 and ks[0]["tests"] == ["unique"]
    # scalar exclude = one name
    out2 = _version_columns(
        base, [{"include": "*", "exclude": "legacy"}], "m_v2")
    assert [c["name"] for c in out2] == ["k"]
    # scalar include = one name
    out3 = _version_columns(
        base, [{"include": "legacy"}], "m_v2")
    assert [c["name"] for c in out3] == ["legacy"]


# --------------------------------------------------- ADVICE r11 fixes ----

def test_dict_valued_root_var_propagates_to_packages():
    """ADVICE r11: a dict-valued root var whose key is NOT a project
    name is an ordinary global value — dbt propagates it to package
    models like any other; only project-named dicts are scope blocks."""
    from dbt_demo_spark.core.project import _project_vars

    out = _project_vars(
        {"vars": {"rate": 1}}, "pkg",
        {"thresholds": {"a": 1, "b": 2},   # plain dict var — propagates
         "pkg": {"rate": 9},               # scope block — unpacks
         "other_pkg": {"rate": 5}},        # other scope — dropped
        None, {"rootp", "pkg", "other_pkg"})
    assert out["thresholds"] == {"a": 1, "b": 2}
    assert out["rate"] == 9
    assert "other_pkg" not in out


def test_package_local_macro_beats_root_for_package_nodes(spark, tmp_path):
    """ADVICE r11: dbt resolves a bare macro name inside a package's own
    nodes package-local FIRST, then root — a root macro sharing the name
    must not change the package's compiled SQL.  Root nodes still get
    the root macro."""
    _write_project(tmp_path, """\
        name: 'rootp'
        model-paths: ["models"]
        macro-paths: ["macros"]
        seed-paths: ["seeds"]
        """, {
        "seeds/nums.csv": "k,v\n1,10\n2,20\n",
        "macros/fmt.sql":
            "{% macro scale(col) %}{{ col }} * 100{% endmacro %}",
        "models/root_scaled.sql":
            "select k, {{ scale('v') }} as sv from {{ ref('nums') }}",
    })
    _write_package(tmp_path, "pkgm", """\
        name: 'pkgm'
        model-paths: ["models"]
        macro-paths: ["macros"]
        """, {
        "macros/fmt.sql":
            "{% macro scale(col) %}{{ col }} * 2{% endmacro %}",
        "models/pkg_scaled.sql":
            "select k, {{ scale('v') }} as sv from {{ ref('nums') }}",
    })
    p = port_dbt_project(spark, str(tmp_path))
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run(dict(p.seeds))
        # package node: its OWN scale() (×2), not root's (×100)
        assert {(r.k, r.sv) for r in rels["pkg_scaled"].collect()} \
            == {(1, 20), (2, 40)}
        # root node: root's scale()
        assert {(r.k, r.sv) for r in rels["root_scaled"].collect()} \
            == {(1, 1000), (2, 2000)}
    finally:
        runner.clean()


def test_macro_body_containing_macro_literal_parses():
    """ADVICE r11: the dangling-opener guard must count only openers
    OUTSIDE matched definition spans — a body that legitimately contains
    the literal text `{% macro` (a usage note, a string) is a file dbt
    accepts."""
    from dbt_demo_spark.core.macros import parse_macro_text

    text = (
        "{% macro marker() %}\n"
        "select '{% macro' as opener_text\n"
        "{% endmacro %}\n")
    out = parse_macro_text(text)
    assert set(out) == {"marker"}
    # a genuinely dangling opener still raises
    import pytest as _pytest
    with _pytest.raises(ValueError, match="could not be parsed"):
        parse_macro_text("{% macro broken(a=f(1)) %}x{% endmacro %}")


# -------------------------------- r12: sources-YAML identifier/quoting ----

def test_source_identifier_override_resolves(spark, tmp_path):
    """r12 (VERDICT r11 item 5): a source table declaring `identifier:`
    resolves source() calls to the PHYSICAL relation — dep edges, the
    rendered SQL, freshness specs, and the recorded metadata all land on
    the identifier, while models keep the declared name."""
    _write_project(tmp_path, """\
        name: 'p'
        model-paths: ["models"]
        """, {
        "models/props.yml": """\
            sources:
              - name: raw
                database: prod
                quoting: {database: false, schema: false}
                tables:
                  - name: loans
                    identifier: loans_v2
                    freshness: {warn_after: {count: 1, period: day}}
                    loaded_at_field: updated_at
                  - name: rates
        """,
        "models/staged.sql":
            "select k, v from {{ source('raw', 'loans') }}",
        "models/rates_used.sql":
            "select k from {{ source('raw', 'rates') }}",
    })
    p = port_dbt_project(spark, str(tmp_path))
    # dep edge lands on the physical name; unmapped source keeps its own
    assert p.registry["staged"].deps == ("loans_v2",)
    assert p.registry["rates_used"].deps == ("rates",)
    # freshness keys the physical relation
    assert [f.source for f in p.freshness] == ["loans_v2"]
    # metadata recorded inertly (schema defaults to the source name)
    assert p.sources["raw.loans"] == {
        "database": "prod", "schema": "raw", "identifier": "loans_v2",
        "quoting": {"database": False, "schema": False}}
    # and the project RUNS against the physical relation
    phys = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    rates = spark.createDataFrame([(1,)], "k long")
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run({"loans_v2": phys, "rates": rates})
        assert {(r.k, r.v) for r in rels["staged"].collect()} \
            == {(1, 10), (2, 20)}
    finally:
        runner.clean()


def test_source_quoting_and_identifier_error_matrix(spark, tmp_path):
    """Quoting flags are inert for plain names; a QUOTED identifier that
    is not a plain SQL identifier raises at port (the renderer cannot
    backtick-quote substitution sites), as does any non-identifier
    physical name, and conflicting duplicate declarations."""
    def _port(props_yaml):
        import shutil
        root = tmp_path / "m"
        if root.exists():
            shutil.rmtree(root)
        _write_project(tmp_path, """\
            name: 'p'
            model-paths: ["m"]
            """, {"m/props.yml": props_yaml,
                  "m/use.sql":
                  "select 1 as x from {{ source('raw', 't') }}"})
        return port_dbt_project(spark, str(tmp_path))

    # inert: identifier-quoting on a plain name is a no-op
    p = _port("""\
        sources:
          - name: raw
            tables:
              - name: t
                identifier: t_real
                quoting: {identifier: true}
        """)
    assert p.registry["use"].deps == ("t_real",)

    with pytest.raises(ValueError, match="not a plain SQL identifier"):
        _port("""\
            sources:
              - name: raw
                tables:
                  - name: t
                    identifier: "t-with-dashes"
                    quoting: {identifier: true}
            """)
    with pytest.raises(ValueError, match="not a plain SQL identifier"):
        _port("""\
            sources:
              - name: raw
                tables:
                  - name: t
                    identifier: "has space"
            """)
    with pytest.raises(ValueError, match="declared twice"):
        _port("""\
            sources:
              - name: raw
                tables:
                  - name: t
                    identifier: a1
              - name: raw
                tables:
                  - name: t
                    identifier: a2
            """)


# ------------------------- r12: real-world macro-package raise surface ----

def test_vendored_dbt_utils_style_package(spark, tmp_path):
    """VERDICT r11 item 7: a vendored package in the shape of a real
    macro hub package (dbt_utils' documented surface [public knowledge:
    dbt-utils macro signatures]) — one substitution-style macro expands
    end-to-end through a root model; the control-flow and adapter-call
    macros raise the X82 engine's DOCUMENTED messages instead of
    miscompiling."""
    import shutil

    def _fresh(pkg_files, model_sql):
        for d in ("models", "seeds", "dbt_packages"):
            shutil.rmtree(tmp_path / d, ignore_errors=True)
        _write_project(tmp_path, """\
            name: 'rootp'
            model-paths: ["models"]
            seed-paths: ["seeds"]
            """, {
            "seeds/nums.csv": "k,num,den\n1,10,4\n2,7,0\n",
            "models/m.sql": model_sql,
        })
        _write_package(tmp_path, "dbt_utils_lite", """\
            name: 'dbt_utils_lite'
            macro-paths: ["macros"]
            """, pkg_files)
        return port_dbt_project(spark, str(tmp_path))

    # 1. safe_divide — pure parameter substitution, expands and RUNS
    # (dbt-utils semantics: NULL on zero denominator, never a div error)
    good = {"macros/math.sql": """\
        {% macro safe_divide(numerator, denominator) %}
        ( {{ numerator }} ) / nullif(( {{ denominator }} ), 0)
        {% endmacro %}
    """}
    p = _fresh(good,
               "select k, {{ dbt_utils_lite.safe_divide('num', 'den') }}"
               " as ratio from {{ ref('nums') }}")
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run(dict(p.seeds))
        got = {(r.k, r.ratio) for r in rels["m"].collect()}
        assert got == {(1, 2.5), (2, None)}
    finally:
        runner.clean()

    # 2. generate_surrogate_key — control flow ({% for %}) in the body:
    # the parse-time guard names the limitation, the port never
    # half-loads the package
    with pytest.raises(ValueError,
                       match="control flow in macro bodies is unsupported"):
        _fresh({"macros/surrogate_key.sql": """\
            {% macro generate_surrogate_key(field_list) %}
            md5({% for f in field_list %}coalesce(cast({{ f }} as string), '')
                {% if not loop.last %} || '-' || {% endif %}{% endfor %})
            {% endmacro %}
        """, **good},
               "select 1 as x from {{ ref('nums') }}")

    # 3. star — adapter-call in the body parses (no control flow) but
    # the expansion leaves {{ adapter.quote(...) }} behind, and the
    # renderer's leftover-Jinja check raises its documented message at
    # the CALLING model
    with pytest.raises(ValueError, match="unsupported Jinja construct"):
        _fresh({"macros/star.sql": """\
            {% macro star(relation) %}
            {{ adapter.quote(relation) }}.*
            {% endmacro %}
        """, **good},
               "select {{ dbt_utils_lite.star('nums') }} "
               "from {{ ref('nums') }}")


def test_yaml_defined_snapshots(spark, tmp_path):
    """X103 [public dbt surface: dbt-core 1.9 YAML snapshots]: a
    snapshots: block with relation + config ports like the SQL-block
    form — the relation resolves through the sources identifier map,
    and two runs capture changes via SnapshotRunner; error matrix for
    missing keys."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.core.snapshot import SnapshotRunner

    _write_project(tmp_path, """\
        name: 'p'
        model-paths: ["models"]
        snapshot-paths: ["snapshots"]
        """, {
        "models/props.yml": """\
            sources:
              - name: raw
                tables:
                  - name: loans
                    identifier: loans_v2
        """,
        "snapshots/snaps.yml": """\
            snapshots:
              - name: loans_snapshot
                relation: source('raw', 'loans')
                config:
                  unique_key: loan_id
                  strategy: timestamp
                  updated_at: updated_at
                  hard_deletes: invalidate
        """,
        "models/any.sql": "select 1 as one from {{ source('raw', 'loans') }}",
    })
    p = port_dbt_project(spark, str(tmp_path))
    assert set(p.snapshots) == {"loans_snapshot"}
    sdef, fn, deps = p.snapshots["loans_snapshot"]
    assert deps == ("loans_v2",)          # identifier-resolved
    assert sdef.hard_deletes == "invalidate"

    sr = SnapshotRunner(spark, str(tmp_path / "wh"))
    src1 = spark.createDataFrame(
        [("L1", 100, "2023-01-01 00:00:00")],
        "loan_id string, amount long, updated_at string")
    sr.run(sdef, fn({"loans_v2": src1}))
    src2 = spark.createDataFrame(
        [("L1", 150, "2023-02-01 00:00:00")],
        "loan_id string, amount long, updated_at string")
    snap = sr.run(sdef, fn({"loans_v2": src2}))
    rows = {(r.loan_id, str(r.dbt_valid_from), r.dbt_is_current)
            for r in snap.collect()}
    assert rows == {("L1", "2023-01-01 00:00:00", 0),
                    ("L1", "2023-02-01 00:00:00", 1)}

    # error matrix: missing relation / unique_key
    (tmp_path / "snapshots" / "snaps.yml").write_text(textwrap.dedent("""\
        snapshots:
          - name: broken
            config: {unique_key: k}
        """))
    with pytest.raises(ValueError, match="needs name and relation"):
        port_dbt_project(spark, str(tmp_path))
    (tmp_path / "snapshots" / "snaps.yml").write_text(textwrap.dedent("""\
        snapshots:
          - name: broken
            relation: ref('any')
            config: {strategy: check, check_cols: [amount]}
        """))
    with pytest.raises(ValueError, match="needs unique_key"):
        port_dbt_project(spark, str(tmp_path))


def test_source_without_override_keeps_pre_r12_behavior(spark, tmp_path):
    """A declared source table with an odd (non-plain-identifier) NAME
    and no identifier override still ports — only overrides and quoting
    flags gate (the run path substitutes prefixed temp-view names, never
    the bare token)."""
    _write_project(tmp_path, """\
        name: 'p'
        model-paths: ["models"]
        """, {
        "models/props.yml": """\
            sources:
              - name: raw
                tables:
                  - name: 2024_data
        """,
        "models/m.sql": "select k from {{ source('raw', '2024_data') }}",
    })
    p = port_dbt_project(spark, str(tmp_path))
    assert p.registry["m"].deps == ("2024_data",)
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run(
            {"2024_data": spark.createDataFrame([(1,)], "k long")})
        assert rels["m"].count() == 1
    finally:
        runner.clean()
