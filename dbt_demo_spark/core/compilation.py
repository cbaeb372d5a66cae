"""``dbt compile`` analog (r12, VERDICT r11 item 4) [public knowledge:
dbt-core's compile verb renders every model's Jinja to runnable SQL
under ``target/compiled/<project>/`` and writes ``target/manifest.json``
— the artifacts CI diffing, lineage tooling, and warehouse review flows
consume without running anything].

What "compiled" means here: a SQL model registers with its macro / var /
env_var / version-ref expansion already applied (core/sqlmodel.py stores
that text on ``fn.__sql_text__``); compile finishes the job by resolving
``ref()`` / ``source()`` calls to the RELATION NAMES the Runner
materializes under — the model's own namespace names, exactly what a
reader runs against the warehouse.  Incremental models compile their
FIRST-BUILD branch (dbt renders ``is_incremental() = false`` when no
prior state exists); ``{{ this }}`` therefore never appears in compiled
output.

The manifest written here is ``ModelRegistry.manifest()`` plus the
compile-layer facts: per-node content checksums (the same
``selection.node_code_state`` fingerprints ``state:modified`` compares),
each node's owning project, its compiled-SQL path, and the project's
group declarations — nodes/deps/fingerprints/group/access in one
artifact, the manifest.json analog.

Python-function models (registered directly, no SQL text) have no text
to render; they are listed under ``python_models`` in the return value
rather than silently skipped.  Reference workflow parity:
`/root/reference/README.md:42-55` (the dbt verb sequence this engine
mirrors: deps -> seed -> run -> test; compile sits beside run).
"""

from __future__ import annotations

import json
import os

from .model import ModelRegistry
from .selection import node_code_state
from .sqlmodel import render_sql


def compile_model_sql(registry: ModelRegistry, name: str) -> str:
    """One model's compiled SQL: the registered (macro/var-expanded)
    text with every ref()/source() resolved to its relation name.
    Raises for unknown models and for Python-function models (no SQL
    text to compile)."""
    if name not in registry.names():
        raise ValueError(f"compile: unknown model {name!r}")
    m = registry[name]
    sql_text = getattr(m.fn, "__sql_text__", None)
    if sql_text is None:
        raise ValueError(
            f"compile: model {name!r} is a Python-function model — "
            "no SQL text to compile")
    return render_sql(sql_text, {d: d for d in m.deps},
                      incremental=False).strip() + "\n"


def compile_project(ported, target_dir: str) -> dict:
    """Write the full compile artifact set for a PortedProject under
    ``target_dir`` (dbt's ``target/``):

      * ``compiled/<owning-project>/models/<name>.sql`` — per SQL model
        (package models land under THEIR project dir, as dbt does);
      * ``compiled/<project>/analyses/<name>.sql`` — the never-run
        analyses, already compiled by the port;
      * ``manifest.json`` — nodes + deps + checksums + owner project +
        compiled paths + groups + packages.

    Returns ``{"manifest_path", "compiled": {node: path},
    "python_models": [...], "manifest": {...}}``.  Writing is
    deterministic (sorted iteration) so two compiles of the same project
    are byte-identical — the property CI artifact-diffing rests on."""
    registry = ported.registry
    checksums = node_code_state(registry)
    compiled: dict[str, str] = {}
    python_models: list[str] = []
    for name in sorted(registry.names()):
        m = registry[name]
        if getattr(m.fn, "__sql_text__", None) is None:
            python_models.append(name)
            continue
        proj = ported.owner_of.get(name, ported.name)
        rel = os.path.join("compiled", proj, "models", f"{name}.sql")
        path = os.path.join(target_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(compile_model_sql(registry, name))
        compiled[name] = rel
    for aname in sorted(ported.analyses):
        rel = os.path.join("compiled", ported.name, "analyses",
                           f"{aname}.sql")
        path = os.path.join(target_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(ported.analyses[aname].strip() + "\n")
        compiled[f"analysis:{aname}"] = rel

    manifest = registry.manifest()
    for name, node in manifest["nodes"].items():
        node["checksum"] = checksums.get(name)
        node["package_name"] = ported.owner_of.get(name, ported.name)
        if name in compiled:
            node["compiled_path"] = compiled[name]
    manifest["project"] = ported.name
    manifest["packages"] = list(ported.packages)
    manifest["groups"] = dict(ported.groups)
    # dbt's manifest carries snapshot nodes too [public knowledge:
    # manifest.json node types]; ours records each ported snapshot's
    # definition facts beside the model nodes
    manifest["snapshots"] = {
        name: {"unique_key": sdef.unique_key,
               "strategy": sdef.strategy,
               "updated_at": sdef.updated_at,
               "check_cols": list(sdef.check_cols),
               "hard_deletes": sdef.hard_deletes,
               "depends_on": list(deps)}
        for name, (sdef, _fn, deps)
        in sorted(getattr(ported, "snapshots", {}).items())}
    mpath = os.path.join(target_dir, "manifest.json")
    os.makedirs(target_dir, exist_ok=True)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True, default=str)
    os.replace(tmp, mpath)
    return {"manifest_path": mpath, "compiled": compiled,
            "python_models": python_models, "manifest": manifest}


def write_catalog(relations: dict, target_dir: str,
                  sources: tuple = ()) -> str:
    """``target/catalog.json`` analog (X101 [public knowledge: dbt docs
    generate writes catalog.json — per-relation column names/types/
    positions read from the WAREHOUSE, the artifact the docs site joins
    onto manifest.json]).  ``relations`` is what Runner.run/build
    returns (sources + built models); each relation's ANALYZED schema is
    recorded — no data is read (schema comes from the plan), so this
    costs nothing at any scale.  ``sources`` optionally names which keys
    are sources (dbt files them under a separate section).  Output is
    deterministic (sorted) for CI artifact diffing."""
    src = set(sources)
    nodes: dict = {}
    srcs: dict = {}
    for name in sorted(relations):
        df = relations[name]
        entry = {
            "columns": {
                f.name: {"type": f.dataType.simpleString(),
                         "index": i, "nullable": f.nullable}
                for i, f in enumerate(df.schema.fields)
            }
        }
        (srcs if name in src else nodes)[name] = entry
    path = os.path.join(target_dir, "catalog.json")
    os.makedirs(target_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"nodes": nodes, "sources": srcs}, fh, indent=1,
                  sort_keys=True)
    os.replace(tmp, path)
    return path
