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
