"""dbt compile analog (core/compilation.py): per-model rendered SQL +
manifest.json under target/, round-tripped against the in-memory
expansion — the compiled text must RUN and produce the same rows the
Runner built (VERDICT r11 item 4)."""

from __future__ import annotations

import json
import os
import textwrap

import pytest

from dbt_demo_spark.core.compilation import (compile_model_sql,
                                             compile_project)
from dbt_demo_spark.core.project import port_dbt_project
from dbt_demo_spark.core.runner import Runner


def _write_project(root, yml: str, files: dict[str, str]) -> None:
    (root / "dbt_project.yml").write_text(textwrap.dedent(yml))
    for rel, text in files.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(textwrap.dedent(text))


def _round_trip(spark, p, relations, target) -> None:
    """Execute every compiled SQL file against the built relations
    (registered under their relation names, exactly what the compiled
    refs resolved to) and compare rows to the in-memory build."""
    art = compile_project(p, str(target))
    registered = []
    try:
        for name, df in relations.items():
            df.createOrReplaceTempView(name)
            registered.append(name)
        for name, rel in art["compiled"].items():
            if name.startswith("analysis:"):
                continue
            sql = open(os.path.join(str(target), rel)).read()
            got = sorted(map(tuple, spark.sql(sql).collect()))
            want = sorted(map(tuple, relations[name].collect()))
            assert got == want, f"{name}: compiled SQL diverged from build"
    finally:
        for name in registered:
            spark.catalog.dropTempView(name)


def test_compile_round_trips_reference_project(spark, tmp_path):
    """The ported reference project's compiled SQL reproduces the
    Runner's results model-for-model — including the deliberate fan-out
    bug's rows."""
    if not os.path.isdir("/root/reference/models"):
        pytest.skip("reference repo not mounted")
    p = port_dbt_project(spark, "/root/reference")
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run(dict(p.seeds))
        _round_trip(spark, p, rels, tmp_path / "target")
    finally:
        runner.clean()


def test_compile_expands_user_macros_and_writes_manifest(spark, tmp_path):
    """X82 macros land in the compiled text fully expanded (no Jinja
    left), the manifest carries checksums / owner / compiled paths /
    groups, package models file under their own project dir, and two
    compiles are byte-identical (the CI artifact-diff property)."""
    _write_project(tmp_path, """\
        name: 'rootp'
        model-paths: ["models"]
        macro-paths: ["macros"]
        seed-paths: ["seeds"]
        """, {
        "seeds/nums.csv": "k,cents\n1,150\n2,99\n",
        "macros/money.sql": """\
            {% macro cents_to_dollars(col, precision=2) %}
            round({{ col }} / 100.0, {{ precision }})
            {% endmacro %}
        """,
        "models/dollars.sql":
            "select k, {{ cents_to_dollars('cents') }} as usd "
            "from {{ ref('nums') }}",
    })
    pkg = tmp_path / "dbt_packages" / "extras"
    pkg.mkdir(parents=True)
    _write_project(pkg, """\
        name: 'extras'
        model-paths: ["models"]
        """, {"models/doubled.sql":
              "select k, cents * 2 as c2 from {{ ref('nums') }}"})
    p = port_dbt_project(spark, str(tmp_path))
    art = compile_project(p, str(tmp_path / "target"))

    dollars_sql = open(os.path.join(
        str(tmp_path / "target"), art["compiled"]["dollars"])).read()
    assert "{{" not in dollars_sql and "{%" not in dollars_sql
    assert "round" in dollars_sql and "/ 100.0" in dollars_sql
    assert "from nums" in dollars_sql
    # package model compiles under ITS project dir, root under its own
    assert art["compiled"]["doubled"].startswith(
        os.path.join("compiled", "extras", "models"))
    assert art["compiled"]["dollars"].startswith(
        os.path.join("compiled", "rootp", "models"))

    man = json.load(open(art["manifest_path"]))
    for node in ("dollars", "doubled"):
        assert man["nodes"][node]["checksum"]
        assert man["nodes"][node]["compiled_path"] == art["compiled"][node]
    assert man["nodes"]["dollars"]["package_name"] == "rootp"
    assert man["nodes"]["doubled"]["package_name"] == "extras"
    assert man["project"] == "rootp" and man["packages"] == ["extras"]
    assert "groups" in man and man["snapshots"] == {}

    # determinism: recompile -> byte-identical manifest + SQL
    bytes1 = open(art["manifest_path"], "rb").read()
    sql1 = open(os.path.join(
        str(tmp_path / "target"), art["compiled"]["dollars"]), "rb").read()
    compile_project(p, str(tmp_path / "target"))
    assert open(art["manifest_path"], "rb").read() == bytes1
    assert open(os.path.join(
        str(tmp_path / "target"),
        art["compiled"]["dollars"]), "rb").read() == sql1

    # and the compiled text round-trips through the engine
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run(dict(p.seeds))
        _round_trip(spark, p, rels, tmp_path / "target2")
    finally:
        runner.clean()


def test_compile_python_models_reported_not_silently_skipped(spark):
    """A Python-function model has no SQL text: compile_model_sql raises
    with the reason, and compile_project lists it under python_models."""
    from types import SimpleNamespace

    from dbt_demo_spark.core.model import ModelDef, ModelRegistry

    reg = ModelRegistry()
    reg.register(ModelDef(name="pymodel", deps=("src",),
                          materialized="view",
                          fn=lambda refs: refs["src"]))
    with pytest.raises(ValueError, match="Python-function model"):
        compile_model_sql(reg, "pymodel")
    with pytest.raises(ValueError, match="unknown model"):
        compile_model_sql(reg, "nope")
    fake = SimpleNamespace(registry=reg, owner_of={}, name="p",
                           analyses={}, packages=(), groups={},
                           snapshots={})
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        art = compile_project(fake, td)
    assert art["python_models"] == ["pymodel"]
    assert art["compiled"] == {}


def test_docs_site_links_compiled_sql(spark, tmp_path):
    """The docs site renders each node's compiled_path as a link when
    the manifest came through compile_project."""
    _write_project(tmp_path, """\
        name: 'p'
        model-paths: ["models"]
        seed-paths: ["seeds"]
        """, {
        "seeds/nums.csv": "k,v\n1,2\n",
        "models/m1.sql": "select k, v from {{ ref('nums') }}",
    })
    p = port_dbt_project(spark, str(tmp_path))
    art = compile_project(p, str(tmp_path / "target"))
    from dbt_demo_spark.core.docs import generate_docs_site

    path = generate_docs_site(art["manifest"], str(tmp_path / "site"))
    page = open(path).read()
    assert "compiled/p/models/m1.sql" in page and "compiled:" in page


def test_catalog_json_artifact(spark, tmp_path):
    """X101 catalog.json: built relations' analyzed schemas land under
    target/, sources filed separately, byte-deterministic."""
    from dbt_demo_spark.core.compilation import write_catalog

    _write_project(tmp_path, """\
        name: 'p'
        model-paths: ["models"]
        seed-paths: ["seeds"]
        """, {
        "seeds/nums.csv": "k,v\n1,2\n",
        "models/m1.sql":
            "select k, cast(v as double) as vd from {{ ref('nums') }}",
    })
    p = port_dbt_project(spark, str(tmp_path))
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run(dict(p.seeds))
        path = write_catalog(rels, str(tmp_path / "target"),
                             sources=tuple(p.seeds))
        cat = json.load(open(path))
        assert cat["sources"]["nums"]["columns"]["k"]["type"] == "bigint"
        m1 = cat["nodes"]["m1"]["columns"]
        assert m1["vd"] == {"type": "double", "index": 1,
                            "nullable": True}
        b1 = open(path, "rb").read()
        write_catalog(rels, str(tmp_path / "target"),
                      sources=tuple(p.seeds))
        assert open(path, "rb").read() == b1
    finally:
        runner.clean()


def test_docs_site_joins_catalog_types(spark, tmp_path):
    """generate_docs_site(catalog=...) renders a type column in each
    card's columns table — the manifest+catalog join dbt docs does."""
    from dbt_demo_spark.core.compilation import write_catalog
    from dbt_demo_spark.core.docs import generate_docs_site
    from dbt_demo_spark.core.lineage import manifest_with_lineage

    _write_project(tmp_path, """\
        name: 'p'
        model-paths: ["models"]
        seed-paths: ["seeds"]
        """, {
        "seeds/nums.csv": "k,v\n1,2\n",
        "models/m1.sql":
            "select k, cast(v as double) as vd from {{ ref('nums') }}",
    })
    p = port_dbt_project(spark, str(tmp_path))
    runner = Runner(spark, p.registry, str(tmp_path / "wh"))
    try:
        rels = runner.run(dict(p.seeds))
        cpath = write_catalog(rels, str(tmp_path / "target"),
                              sources=tuple(p.seeds))
        man = manifest_with_lineage(p.registry, p.seeds)
        site = generate_docs_site(man, str(tmp_path / "site"),
                                  catalog=json.load(open(cpath)))
        page = open(site).read()
        assert "<th>type</th>" in page
        assert "<code>double</code>" in page
    finally:
        runner.clean()


def test_manifest_carries_snapshot_nodes(spark, tmp_path):
    """The compile manifest records ported snapshots' definition facts
    beside the model nodes (dbt's manifest node types)."""
    _write_project(tmp_path, """\
        name: 'p'
        model-paths: ["models"]
        snapshot-paths: ["snapshots"]
        seeds-paths: ["seeds"]
        """, {
        "models/m.sql": "select 1 as k from {{ ref('src') }}",
        "snapshots/s.yml": """\
            snapshots:
              - name: src_snap
                relation: ref('src')
                config:
                  unique_key: k
                  strategy: check
                  check_cols: [k]
                  hard_deletes: new_record
        """,
    })
    p = port_dbt_project(spark, str(tmp_path))
    art = compile_project(p, str(tmp_path / "target"))
    snap = art["manifest"]["snapshots"]["src_snap"]
    assert snap == {"unique_key": "k", "strategy": "check",
                    "updated_at": None, "check_cols": ["k"],
                    "hard_deletes": "new_record", "depends_on": ["src"]}
