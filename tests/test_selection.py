"""dbt node-selection grammar (core/selection.py) — pure-DAG tests over a
diamond registry, plus a runner integration on the Fiction Bank project."""

from __future__ import annotations

import pytest

from dbt_demo_spark.core.model import ModelRegistry
from dbt_demo_spark.core.selection import select_nodes


def _diamond() -> ModelRegistry:
    r"""raw -> a -> (b, c) -> d -> e, with tags:
        a,b: staging;  d: mart,nightly;  e: mart."""
    reg = ModelRegistry()
    for name, deps, tags in [
        ("a", ("raw",), ("staging",)),
        ("b", ("a",), ("staging",)),
        ("c", ("a",), ()),
        ("d", ("b", "c"), ("mart", "nightly")),
        ("e", ("d",), ("mart",)),
    ]:
        reg.register(__import__("dbt_demo_spark.core.model", fromlist=["ModelDef"])
                     .ModelDef(name=name, deps=deps, materialized="view",
                               fn=lambda refs: None, tags=tags))
    return reg


@pytest.mark.parametrize("spec,expected", [
    ("d", {"d"}),
    ("+d", {"a", "b", "c", "d"}),
    ("d+", {"d", "e"}),
    ("+d+", {"a", "b", "c", "d", "e"}),
    ("1+d", {"b", "c", "d"}),
    ("a+1", {"a", "b", "c"}),
    ("a+2", {"a", "b", "c", "d"}),
    ("@b", {"a", "b", "c", "d", "e"}),  # b, desc {d,e}, + their ancestors
    ("tag:staging", {"a", "b"}),
    ("tag:mart", {"d", "e"}),
    ("tag:night*", {"d"}),
    ("tag:staging+1", {"a", "b", "c", "d"}),
    ("source:raw", {"a"}),
    ("source:raw+", {"a", "b", "c", "d", "e"}),
    ("b c", {"b", "c"}),                 # union
    ("tag:mart,d+", {"d", "e"}),         # intersection
    ("tag:mart,tag:nightly", {"d"}),
    ("*", {"a", "b", "c", "d", "e"}),
])
def test_grammar(spec, expected):
    assert set(select_nodes(_diamond(), spec)) == expected


def test_exclude_and_default_all():
    reg = _diamond()
    assert set(select_nodes(reg, None)) == {"a", "b", "c", "d", "e"}
    assert set(select_nodes(reg, None, exclude="tag:mart")) == {"a", "b", "c"}
    assert set(select_nodes(reg, "+d+", exclude="tag:staging")) == {"c", "d", "e"}


def test_unmatched_selector_fails_loud():
    with pytest.raises(ValueError, match="matched no models"):
        select_nodes(_diamond(), "typo_model")
    with pytest.raises(ValueError, match="matched no models"):
        select_nodes(_diamond(), "tag:nope")


def test_at_cannot_combine_with_plus():
    with pytest.raises(ValueError, match="cannot combine"):
        select_nodes(_diamond(), "+@b")


def test_runner_select_string(spark, tmp_path):
    """Runner.run(select=...) with the grammar: selecting the buggy mart by
    tag intersection builds it plus required ancestors, and exclude
    subtracts; results identical to the exact-name path."""
    from dbt_demo_spark.models.fiction_bank import REGISTRY
    from dbt_demo_spark.models.seeds import load_seed_dataframes
    from dbt_demo_spark.core.runner import Runner

    seeds = load_seed_dataframes(spark)
    r1 = Runner(spark, REGISTRY, warehouse_dir=str(tmp_path / "w1"),
                catalog_namespace="sel1")
    rels = r1.run(seeds, select="tag:mart,+agg_monthly_loans")
    # target set = {fct_loan_details, agg_monthly_loans}; staging ancestors
    # are built as required parents
    assert "agg_monthly_loans" in rels and "fct_loan_details" in rels
    assert "agg_monthly_loans_fixed" not in rels

    r2 = Runner(spark, REGISTRY, warehouse_dir=str(tmp_path / "w2"),
                catalog_namespace="sel2")
    rels2 = r2.run(seeds, select=["agg_monthly_loans"])
    a = {tuple(row) for row in rels["agg_monthly_loans"].collect()}
    b = {tuple(row) for row in rels2["agg_monthly_loans"].collect()}
    assert a == b

    r3 = Runner(spark, REGISTRY, warehouse_dir=str(tmp_path / "w3"),
                catalog_namespace="sel3")
    rels3 = r3.run(seeds, select="tag:mart", exclude="tag:nightly")
    assert "fct_loan_details" in rels3
    assert "agg_monthly_loans" not in rels3


# ---------------------------------------------------------------------------
# state:modified / state:new — the slim-CI workflow
# ---------------------------------------------------------------------------


def _proj(beta_body: int, extra: bool = False):
    from dbt_demo_spark.core.model import ModelRegistry

    reg = ModelRegistry()

    @reg.model("alpha", deps=("src",))
    def alpha(refs):
        return refs["src"]

    if beta_body == 1:
        @reg.model("beta", deps=("alpha",))
        def beta(refs):
            return refs["alpha"]
    else:
        @reg.model("beta", deps=("alpha",))
        def beta(refs):
            return refs["alpha"].limit(10)

    @reg.model("gamma", deps=("beta",))
    def gamma(refs):
        return refs["beta"]

    if extra:
        @reg.model("delta", deps=("src",))
        def delta(refs):
            return refs["src"]

    return reg


def test_state_modified_and_new(tmp_path):
    from dbt_demo_spark.core.selection import (load_state, save_state,
                                               select_nodes)

    state_file = str(tmp_path / "state.json")
    save_state(_proj(1), state_file)
    state = load_state(state_file)

    # nothing changed: empty selection is the slim-CI success case
    assert select_nodes(_proj(1), "state:modified", state=state) == []

    # beta's body changed; delta is new
    reg2 = _proj(2, extra=True)
    assert select_nodes(reg2, "state:modified", state=state) == \
        ["beta", "delta"]
    assert select_nodes(reg2, "state:new", state=state) == ["delta"]
    # graph suffix composes: modified plus descendants
    assert select_nodes(reg2, "state:modified+", state=state) == \
        ["beta", "gamma", "delta"]


def test_state_intersection_with_typo_atom_fails_loud(tmp_path):
    """ADVICE r9: 'typo,state:modified' must raise on the typo'd atom,
    not silently select zero models — only an empty set attributable to
    the STATE atom itself is the slim-CI success case."""
    from dbt_demo_spark.core.selection import (load_state, save_state,
                                               select_nodes)

    state_file = str(tmp_path / "state.json")
    save_state(_proj(1), state_file)
    state = load_state(state_file)

    with pytest.raises(ValueError, match="typo_model"):
        select_nodes(_proj(1), "typo_model,state:modified", state=state)
    # a real atom intersected with nothing-changed stays the success case
    assert select_nodes(_proj(1), "alpha,state:modified", state=state) == []


def test_state_selector_requires_state():
    import pytest

    from dbt_demo_spark.core.selection import select_nodes

    with pytest.raises(ValueError, match="needs state="):
        select_nodes(_proj(1), "state:modified")
    with pytest.raises(ValueError, match="state method"):
        select_nodes(_proj(1), "state:nonsense", state={})


def test_sql_model_text_change_is_modified(tmp_path):
    """The adapter blind spot: all SQL models share the factory's Python
    source, so the SQL TEXT itself must drive the fingerprint."""
    from dbt_demo_spark.core.model import ModelRegistry
    from dbt_demo_spark.core.selection import node_code_state

    def reg_with(sql):
        reg = ModelRegistry()
        reg.sql_model("m", sql)
        return reg

    a = node_code_state(reg_with("select 1 as x from {{ ref('s') }}"))
    b = node_code_state(reg_with("select 2 as x from {{ ref('s') }}"))
    same = node_code_state(reg_with("select 1 as x from {{ ref('s') }}"))
    assert a["m"] == same["m"]
    assert a["m"] != b["m"]


def test_slim_ci_build_flow(spark, tmp_path):
    """End-to-end: green build -> save state -> edit one model -> build
    select='state:modified+' runs exactly the edited node and its
    descendants."""
    from dbt_demo_spark.core.runner import Runner
    from dbt_demo_spark.core.selection import load_state, save_state

    src = {"src": spark.range(5).selectExpr("id as k")}
    state_file = str(tmp_path / "state.json")
    r1 = Runner(spark, _proj(1), str(tmp_path / "wh1"))
    assert r1.build(src).ok
    save_state(_proj(1), state_file)

    reg2 = _proj(2)
    r2 = Runner(spark, reg2, str(tmp_path / "wh2"))
    res = r2.build(src, select="state:modified+",
                   state=load_state(state_file))
    # unselected ancestors rebuild by default (in-memory view layer)
    assert set(res.nodes) == {"alpha", "beta", "gamma"}
    assert res.ok

    # dbt --defer: seed the unmodified ancestor's PRIOR relation as a
    # pre-built artifact — only the modified node and its descendants run
    prior = Runner(spark, _proj(1), str(tmp_path / "wh3")).build(src)
    r3 = Runner(spark, reg2, str(tmp_path / "wh4"))
    res = r3.build({**src, "alpha": prior.relations["alpha"]},
                   select="state:modified+", state=load_state(state_file))
    assert set(res.nodes) == {"beta", "gamma"}
    assert res.ok


# ---------------------------------------------- X86 YAML selectors ----

def _book(yml: str, tmp_path):
    from dbt_demo_spark.core.selection import load_selectors
    import textwrap

    p = tmp_path / "selectors.yml"
    p.write_text(textwrap.dedent(yml))
    return load_selectors(str(p))


def test_yaml_selector_forms(tmp_path):
    """Every definition form: CLI string, method block with graph
    modifiers, union with an exclude member, intersection."""
    from dbt_demo_spark.core.selection import eval_selector

    book = _book("""\
        selectors:
          - name: as_string
            definition: "tag:staging c"
          - name: nightly_up
            description: the nightly mart and everything it needs
            definition:
              method: fqn
              value: d
              parents: true
          - name: staging_kids
            definition:
              method: tag
              value: staging
              children_depth: 1
          - name: at_form
            definition:
              method: fqn
              value: b
              childrens_parents: true
          - name: marts_minus_e
            default: true
            definition:
              union:
                - method: tag
                  value: mart
                - method: fqn
                  value: c
                - exclude:
                    - method: fqn
                      value: e
          - name: both
            definition:
              intersection:
                - method: tag
                  value: mart
                - method: tag
                  value: nightly
        """, tmp_path)
    reg = _diamond()
    assert set(eval_selector(reg, book, "as_string")) == {"a", "b", "c"}
    assert set(eval_selector(reg, book, "nightly_up")) == {"a", "b", "c", "d"}
    assert set(eval_selector(reg, book, "staging_kids")) == {"a", "b", "c", "d"}
    assert set(eval_selector(reg, book, "at_form")) == {"a", "b", "c", "d", "e"}
    assert set(eval_selector(reg, book, "both")) == {"d"}
    # default: true resolves when no name is given
    assert book.default == "marts_minus_e"
    assert set(eval_selector(reg, book)) == {"c", "d"}


def test_yaml_selector_errors(tmp_path):
    from dbt_demo_spark.core.selection import eval_selector

    reg = _diamond()
    book = _book("""\
        selectors:
          - name: bad_method
            definition:
              method: config
              value: x
          - name: bare_exclude
            definition:
              exclude:
                - method: fqn
                  value: e
          - name: unknown_key
            definition:
              method: fqn
              value: d
              indirect: buildable
          - name: empty
            definition: { union: [ {method: tag, value: nosuch} ] }
        """, tmp_path)
    with pytest.raises(ValueError, match="unsupported selector method"):
        eval_selector(reg, book, "bad_method")
    with pytest.raises(ValueError, match="only valid as a member"):
        eval_selector(reg, book, "bare_exclude")
    with pytest.raises(ValueError, match="unknown keys"):
        eval_selector(reg, book, "unknown_key")
    with pytest.raises(ValueError, match="matched no models"):
        eval_selector(reg, book, "empty")
    with pytest.raises(ValueError, match="unknown selector"):
        eval_selector(reg, book, "nope")
    # no default declared -> nameless evaluation raises
    with pytest.raises(ValueError, match="no default"):
        eval_selector(reg, _book(
            "selectors:\n  - name: x\n    definition: d\n", tmp_path))
    with pytest.raises(ValueError, match="duplicate selector"):
        _book("selectors:\n"
              "  - {name: x, definition: d}\n"
              "  - {name: x, definition: e}\n", tmp_path)
    with pytest.raises(ValueError, match="claim default"):
        _book("selectors:\n"
              "  - {name: x, definition: d, default: true}\n"
              "  - {name: y, definition: e, default: true}\n", tmp_path)


def test_yaml_selector_state_empty_is_ok(tmp_path):
    """slim CI through a YAML selector: state:modified over an unchanged
    registry selects nothing WITHOUT raising (the one legitimate empty),
    while a non-state empty selector still raises."""
    from dbt_demo_spark.core.selection import (eval_selector,
                                               node_code_state)

    reg = _diamond()
    book = _book("""\
        selectors:
          - name: ci
            definition:
              union:
                - method: state
                  value: modified
                  children: true
        """, tmp_path)
    state = node_code_state(reg)
    assert eval_selector(reg, book, "ci", state=state) == []


def test_ported_project_selectors(spark, tmp_path):
    """port_dbt_project picks up selectors.yml; the evaluated target
    list drives Runner.run(select=...)."""
    import textwrap

    from dbt_demo_spark.core.project import port_dbt_project
    from dbt_demo_spark.core.runner import Runner
    from dbt_demo_spark.core.selection import eval_selector

    (tmp_path / "dbt_project.yml").write_text(
        "name: selproj\nmodel-paths: ['models']\nseed-paths: ['seeds']\n")
    (tmp_path / "models").mkdir()
    (tmp_path / "models" / "base.sql").write_text(
        "select k from {{ ref('nums') }}")
    (tmp_path / "models" / "wide.sql").write_text(
        "select k, k * 2 as k2 from {{ ref('base') }}")
    (tmp_path / "seeds").mkdir()
    (tmp_path / "seeds" / "nums.csv").write_text("k\n1\n2\n")
    (tmp_path / "selectors.yml").write_text(textwrap.dedent("""\
        selectors:
          - name: tip
            default: true
            definition:
              method: fqn
              value: wide
        """))
    p = port_dbt_project(spark, str(tmp_path))
    assert p.selectors.default == "tip"
    targets = eval_selector(p.registry, p.selectors)
    assert targets == ["wide"]
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run(dict(p.seeds), select=targets)
        assert {r.k2 for r in rels["wide"].collect()} == {2, 4}
    finally:
        runner.clean()


# -------------------------------------------- X89 dbt ls analog ----

def test_ls_lists_selected_nodes():
    from dbt_demo_spark.core.selection import ls

    reg = _diamond()
    rows = ls(reg, "tag:mart")
    assert [r["name"] for r in rows] == ["d", "e"]
    assert rows[0]["deps"] == ["b", "c"]
    assert rows[0]["access"] == "protected"  # the dbt default
    assert {r["name"] for r in ls(reg, None, exclude="tag:mart")} \
        == {"a", "b", "c"}
    with pytest.raises(ValueError, match="matched no models"):
        ls(reg, "typo")


def test_package_selector_method():
    """X92: package: selects by owning project; needs the owners map
    (PortedProject.owner_of) and raises without one."""
    from dbt_demo_spark.core.selection import ls, select_nodes

    reg = _diamond()
    owners = {"a": "rootp", "b": "rootp", "c": "util_pkg",
              "d": "util_pkg", "e": "rootp"}
    assert set(select_nodes(reg, "package:util_pkg", owners=owners)) \
        == {"c", "d"}
    assert set(select_nodes(reg, "package:util_pkg+", owners=owners)) \
        == {"c", "d", "e"}
    assert [r["name"] for r in ls(reg, "package:rootp",
                                  owners=owners)] == ["a", "b", "e"]
    with pytest.raises(ValueError, match="owners="):
        select_nodes(reg, "package:util_pkg")


def test_package_selector_from_ported_project(spark, tmp_path):
    import textwrap

    from dbt_demo_spark.core.project import port_dbt_project
    from dbt_demo_spark.core.selection import select_nodes

    root = tmp_path
    (root / "dbt_project.yml").write_text(
        "name: rootp\nmodel-paths: ['models']\nseed-paths: ['seeds']\n")
    (root / "models").mkdir()
    (root / "models" / "top.sql").write_text(
        "select k from {{ ref('pkg_m') }}")
    (root / "seeds").mkdir()
    (root / "seeds" / "nums.csv").write_text("k\n1\n")
    pkg = root / "dbt_packages" / "util_pkg"
    (pkg / "models").mkdir(parents=True)
    (pkg / "dbt_project.yml").write_text(
        "name: util_pkg\nmodel-paths: ['models']\n")
    (pkg / "models" / "pkg_m.sql").write_text(
        "select k from {{ ref('nums') }}")
    p = port_dbt_project(spark, str(root))
    assert p.owner_of == {"top": "rootp", "pkg_m": "util_pkg"}
    assert select_nodes(p.registry, "package:util_pkg",
                        owners=p.owner_of) == ["pkg_m"]


def test_yaml_exclude_applies_after_all_members(tmp_path):
    """Review r12: an exclude member subtracts from the union of ALL
    other members (dbt semantics), regardless of position — and an
    exclude-first intersection must not seed the set with empty."""
    from dbt_demo_spark.core.selection import eval_selector

    reg = _diamond()
    book = _book("""\
        selectors:
          - name: exclude_mid
            definition:
              union:
                - method: tag
                  value: staging
                - exclude:
                    - method: fqn
                      value: b
                - method: fqn
                  value: b
          - name: exclude_first_intersection
            definition:
              intersection:
                - exclude:
                    - method: fqn
                      value: d
                - method: tag
                  value: mart
        """, tmp_path)
    # b re-matched by a LATER member still ends up excluded
    assert set(eval_selector(reg, book, "exclude_mid")) == {"a"}
    # exclude-first intersection: mart minus d = {e}, not empty
    assert set(eval_selector(reg, book,
                             "exclude_first_intersection")) == {"e"}
