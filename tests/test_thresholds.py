"""X102 warn_if / error_if conditional test thresholds [public dbt
surface: test configs compared against the failure count, defaults
'!=0'] — tolerance contracts: a count satisfying neither condition
PASSES even with violations."""

from __future__ import annotations

import pytest

from dbt_demo_spark.core import datatests
from dbt_demo_spark.core.datatests import (DataTest, eval_threshold,
                                           run_data_tests)


def test_threshold_parser():
    assert eval_threshold("!=0", 1) and not eval_threshold("!=0", 0)
    assert eval_threshold("> 10", 11) and not eval_threshold(">10", 10)
    assert eval_threshold(">=10", 10)
    assert eval_threshold("<5", 4) and eval_threshold("<=4", 4)
    assert eval_threshold("=3", 3)
    with pytest.raises(ValueError, match="unparseable test threshold"):
        eval_threshold("10", 1)
    with pytest.raises(ValueError, match="unparseable test threshold"):
        DataTest("t", lambda r: None, warn_if="about 10")


def test_thresholds_grade_results(spark):
    """Three duplicate keys: error_if '>5' tolerates them (pass),
    warn_if '>1' flags a warn without gating, defaults fail."""
    df = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k long")
    rel = {"t": df}

    tolerant = datatests.unique("t", ["k"], error_if=">5", warn_if=">5")
    [r] = run_data_tests([tolerant], rel)
    assert r.passed and r.violations == 1       # 1 violating key group

    warny = datatests.unique("t", ["k"], error_if=">5", warn_if=">0")
    [r] = run_data_tests([warny], rel)
    assert not r.passed and r.severity == "warn" and r.gating

    strict = datatests.unique("t", ["k"])
    [r] = run_data_tests([strict], rel)
    assert not r.passed and r.severity == "error" and not r.gating

    # severity=warn only consults warn_if
    warn_sev = datatests.unique("t", ["k"], severity="warn",
                                error_if=">0", warn_if=">5")
    [r] = run_data_tests([warn_sev], rel)
    assert r.passed


def test_thresholds_from_schema_yaml(spark, tmp_path):
    """The schema.yml spelling plumbs through attach_properties and the
    build: a tolerated duplicate passes the node, a warn-threshold
    records without gating descendants."""
    import textwrap

    from dbt_demo_spark.core.project import port_dbt_project
    from dbt_demo_spark.core.runner import Runner

    (tmp_path / "dbt_project.yml").write_text(
        "name: 'p'\nmodel-paths: [\"models\"]\nseed-paths: [\"seeds\"]\n")
    (tmp_path / "seeds").mkdir()
    (tmp_path / "seeds" / "src.csv").write_text("k\n1\n1\n2\n")
    (tmp_path / "models").mkdir()
    (tmp_path / "models" / "m.sql").write_text(
        "select k from {{ ref('src') }}")
    (tmp_path / "models" / "down.sql").write_text(
        "select k from {{ ref('m') }}")
    (tmp_path / "models" / "props.yml").write_text(textwrap.dedent("""\
        models:
          - name: m
            columns:
              - name: k
                tests:
                  - unique:
                      config: {error_if: ">5", warn_if: ">0"}
        """))
    p = port_dbt_project(spark, str(tmp_path))
    r = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        res = r.build(dict(p.seeds))
        node = res.nodes["m"]
        # warn fired, node still succeeds, descendant built
        assert node.status == "success"
        [t] = node.tests
        assert not t.passed and t.severity == "warn" and t.violations == 1
        assert res.nodes["down"].status == "success"
    finally:
        r.clean()
