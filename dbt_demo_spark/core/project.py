"""Wholesale dbt project porting — `dbt_project.yml` + schema.yml
properties (VERDICT r9 items 2 and 7).

``port_dbt_project`` reads everything a porting user's project file
already says — `model-paths`, `seed-paths`, the `models:` tree's
``+materialized`` folder policy, `vars:`, `clean-targets`
(reference: `/root/reference/dbt_project.yml:6,9,17-22`) — loads the
seeds from ``seeds/*.csv`` with agate-like type inference
(`sources/csv.py` semantics: quoted commas, empty -> NULL), registers
every SQL model through `core/sqlmodel.py`, and attaches any
schema.yml-style properties files found alongside the models.  Nothing
about the project is re-stated in Python.

Seeds are loaded DRIVER-side: dbt's own seed contract is "small fixture
CSVs" (version-controlled lookup tables), and driver-side parsing is
what makes the agate type ladder deterministic — a 100 TB pipeline's
big inputs come through `sources/`, never seeds.

schema.yml properties (`attach_properties`) cover the standard dbt
shapes: per-column `tests:` (unique / not_null / accepted_values /
relationships), model-level `tests:`, `contract: enforced` columns with
`data_type`, and top-level `exposures:` — all mapped onto the existing
ModelDef machinery (`core/datatests.py`, `ModelDef.contract`,
`ModelRegistry.exposure`).
"""

from __future__ import annotations

import csv
import datetime
import glob
import os
import re
from dataclasses import dataclass, field, replace

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (BooleanType, DateType, DoubleType, LongType,
                               StringType, StructField, StructType)

from . import datatests
from .model import ModelRegistry
from .sqlmodel import register_sql_dir, register_test_dir


# --------------------------------------------------------------- seeds --

# Strict numeric shapes (ADVICE r10): Python's bare int()/float() accept
# '1_0', 'nan', 'inf'/'Infinity', and whitespace-padded values — looser
# than agate, so seed values dbt loads as text silently coerced.  The
# regexes admit only plain decimal integers and decimal/scientific
# floats; underscores, nan/inf, and padding fall through to text.
_LONG_RE = re.compile(r"^[+-]?\d+$")
_DOUBLE_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _infer(values: list[str]):
    """Agate-like type ladder over one column's non-empty strings:
    bool -> long -> double -> date -> text.  Deterministic (whole-column
    vote, not first-row guess)."""
    def all_match(conv) -> bool:
        try:
            for v in values:
                conv(v)
            return True
        except (ValueError, TypeError):
            return False

    if not values:
        return StringType(), lambda v: v
    low = {v.lower() for v in values}
    if low <= {"true", "false"}:
        return BooleanType(), lambda v: v.lower() == "true"
    if all(_LONG_RE.fullmatch(v) for v in values):
        return LongType(), int
    if all(_DOUBLE_RE.fullmatch(v) for v in values):
        return DoubleType(), float
    if all_match(datetime.date.fromisoformat):
        return DateType(), datetime.date.fromisoformat
    return StringType(), lambda v: v


# dbt +column_types spellings -> Spark cast targets; anything not here
# (decimal(p,s), date, timestamp, boolean, ...) passes through to
# Spark's own DDL parser, which raises clearly on garbage
_SEED_TYPE_ALIASES = {
    "varchar": "string", "text": "string", "char": "string",
    "integer": "int", "real": "double", "float8": "double",
    "number": "double",
}


def read_seed_csv_inferred(spark: SparkSession, path: str,
                           column_types: dict[str, str] | None = None
                           ) -> DataFrame:
    """One seed CSV -> typed DataFrame, dbt-seed semantics: header row,
    quoted fields with embedded commas, empty field -> NULL for EVERY
    type (sources/csv.py module docstring), agate-like column typing.

    ``column_types`` is dbt's ``+column_types`` override [public
    knowledge: dbt seed configs]: an overridden column SKIPS inference —
    it loads as the raw string and casts to the declared type, so a
    ``varchar`` override on an all-digit column keeps its leading zeros
    (the exact failure the dbt config exists to prevent)."""
    column_types = column_types or {}
    with open(path, newline="") as fh:
        rows = list(csv.reader(fh))
    if not rows:
        raise ValueError(f"seed {path}: empty file (no header)")
    header, body = rows[0], rows[1:]
    unknown = [c for c in column_types if c not in header]
    if unknown:
        raise ValueError(
            f"seed {path}: +column_types for unknown columns {unknown} "
            f"(header: {header})")
    cols = list(zip(*body)) if body else [()] * len(header)
    fields, convs = [], []
    for name, col in zip(header, cols):
        if name in column_types:
            dtype, conv = StringType(), (lambda v: v)
        else:
            dtype, conv = _infer([v for v in col if v != ""])
        fields.append(StructField(name, dtype))
        convs.append(conv)
    data = [tuple(conv(v) if v != "" else None
                  for v, conv in zip(r, convs)) for r in body]
    df = spark.createDataFrame(data, StructType(fields))
    for name, t in column_types.items():
        t = _SEED_TYPE_ALIASES.get(t.lower(), t)
        df = df.withColumn(name, F.col(name).cast(t))
    return df


def load_seeds(spark: SparkSession, seed_dirs: list[str],
               column_types: dict[str, dict[str, str]] | None = None
               ) -> dict[str, DataFrame]:
    """Every ``*.csv`` under the project's seed-paths, keyed by stem —
    the relations a Runner takes as sources.  ``column_types`` maps
    seed name -> its +column_types override dict ("" keys the
    project-level default applied to every seed)."""
    column_types = column_types or {}
    default = column_types.get("", {})
    out: dict[str, DataFrame] = {}
    for d in seed_dirs:
        for p in sorted(glob.glob(os.path.join(d, "*.csv"))):
            stem = os.path.splitext(os.path.basename(p))[0]
            header = set(_csv_header(p))
            # project-level defaults apply only where the column exists;
            # a PER-SEED override naming a missing column still raises
            # (read_seed_csv_inferred's unknown-column check)
            merged = {**{k: v for k, v in default.items() if k in header},
                      **column_types.get(stem, {})}
            out[stem] = read_seed_csv_inferred(spark, p, merged)
    return out


def _csv_header(path: str) -> list[str]:
    with open(path, newline="") as fh:
        for row in csv.reader(fh):
            return row
    return []


# ------------------------------------------------- dbt_project.yml -----

def _walk_policy(tree: dict, prefix: str, out: dict[str, str]) -> None:
    for k, v in tree.items():
        if k == "+materialized":
            out[prefix] = v
        elif isinstance(v, dict):
            _walk_policy(v, f"{prefix}/{k}" if prefix else k, out)


@dataclass
class PortedProject:
    """What `port_dbt_project` hands back: run it with
    ``Runner(spark, p.registry, on_run_start=p.on_run_start,
    on_run_end=p.on_run_end).run(p.seeds)``."""
    name: str
    registry: ModelRegistry
    seeds: dict[str, DataFrame]
    model_names: list[str]
    clean_targets: tuple[str, ...]
    vars: dict
    on_run_start: tuple[str, ...] = ()
    on_run_end: tuple[str, ...] = ()
    # compiled (never-run) analyses: name -> runnable Spark SQL text
    analyses: dict = field(default_factory=dict)
    # ported snapshot blocks: name -> (SnapshotDef, source_fn, deps);
    # run one with SnapshotRunner.run(sdef, fn({d: relations[d] ...}))
    snapshots: dict = field(default_factory=dict)
    # FreshnessSpec list the properties files declared (check_freshness)
    freshness: tuple = ()
    # installed package names, load order (X85)
    packages: tuple = ()
    # parsed selectors.yml (X86): selection.SelectorBook | None;
    # evaluate with selection.eval_selector(p.registry, p.selectors, name)
    selectors: object = None
    # X87: declared deprecation_dates (versioned-model name -> date
    # string), recorded inertly — never evaluated against a wall clock
    deprecations: dict = field(default_factory=dict)
    # X88: declared groups (name -> owner metadata)
    groups: dict = field(default_factory=dict)
    # X92: model name -> owning project (root or package) — feeds the
    # `package:` selector method (selection owners=)
    owner_of: dict = field(default_factory=dict)
    # r12: sources-YAML metadata — "<source>.<table>" -> {database,
    # schema, identifier, quoting}; database/schema/quoting recorded
    # INERTLY (flat relation namespace), identifier drives source()
    sources: dict = field(default_factory=dict)


def _project_vars(own_cfg: dict, own_name: str, root_vars_raw: dict,
                  overrides: dict | None,
                  project_names: set | frozenset = frozenset()) -> dict:
    """var() namespace for one PACKAGE's models — dbt precedence
    [public knowledge: dbt package vars]: the package's own ``vars:``
    are defaults, the root project's plain vars override them globally,
    a root ``vars: {<package>: {...}}`` scoped block wins for this
    package, CLI-style overrides win over everything.  A dict-valued
    root var is a SCOPE BLOCK only when its key names a known
    project/package; any other dict var (``vars: {thresholds: {a: 1}}``)
    is an ordinary global value and propagates like one (ADVICE r11)."""
    own = dict(own_cfg.get("vars", {}) or {})
    if isinstance(own.get(own_name), dict):
        own = {**{k: v for k, v in own.items() if k != own_name},
               **own[own_name]}
    root_plain = {k: v for k, v in root_vars_raw.items()
                  if not (isinstance(v, dict) and k in project_names)}
    scoped = root_vars_raw.get(own_name)
    scoped = scoped if isinstance(scoped, dict) else {}
    return {**own, **root_plain, **scoped, **(overrides or {})}


def _scan_model_versions(model_dirs: list[str]
                         ) -> tuple[dict, dict, dict]:
    """Pre-scan a project's properties files for ``versions:`` blocks
    (X87 [public dbt surface: model versions, dbt-core 1.5]).  Returns
    ``(versions, rename, deprecations)``: ``versions`` maps each bare
    versioned-model name to ``(latest_registered_name,
    {v: registered_name})`` for ref resolution; ``rename`` maps a
    version's FILE stem (``defined_in`` or the default ``<name>_v<N>``)
    to its canonical registered name; ``deprecations`` records declared
    deprecation_dates INERTLY (never evaluated against a wall clock —
    determinism; callers decide what stale means)."""
    import yaml

    versions: dict = {}
    rename: dict = {}
    deprecations: dict = {}
    for mdir in model_dirs:
        if not os.path.isdir(mdir):
            continue
        for props in sorted(
                glob.glob(os.path.join(mdir, "**", "*.yml"),
                          recursive=True)
                + glob.glob(os.path.join(mdir, "**", "*.yaml"),
                            recursive=True)):
            with open(props) as fh:
                doc = yaml.safe_load(fh) or {}
            for m in doc.get("models", []) or []:
                if "versions" not in m:
                    continue
                nm = m["name"]
                if nm in versions:
                    raise ValueError(
                        f"{props}: versioned model {nm!r} declared twice")
                by_v: dict[int, str] = {}
                for ventry in m["versions"] or []:
                    unknown = set(ventry) - {"v", "defined_in",
                                             "deprecation_date",
                                             "columns"}
                    if unknown:
                        raise ValueError(
                            f"{props}: model {nm!r} version entry has "
                            f"unsupported keys {sorted(unknown)} — "
                            "per-version config overrides are out of "
                            "the lite scope (columns: is supported)")
                    v = int(ventry["v"])
                    if v in by_v:
                        raise ValueError(
                            f"{props}: model {nm!r} declares v={v} twice")
                    reg_name = f"{nm}_v{v}"
                    by_v[v] = reg_name
                    rename[ventry.get("defined_in", reg_name)] = reg_name
                    if ventry.get("deprecation_date"):
                        deprecations[reg_name] = str(
                            ventry["deprecation_date"])
                if not by_v:
                    raise ValueError(f"{props}: model {nm!r} has an "
                                     "empty versions: list")
                # dbt defaults latest_version to the largest declared v
                latest = int(m.get("latest_version", max(by_v)))
                if latest not in by_v:
                    raise ValueError(
                        f"{props}: model {nm!r} latest_version={latest} "
                        f"is not a declared version {sorted(by_v)}")
                versions[nm] = (by_v[latest], by_v)
    return versions, rename, deprecations


def _project_policy(own_cfg: dict, own_name: str, root_models: dict
                    ) -> tuple[dict, str]:
    """(policy path map, default materialization) for one project.

    dbt precedence [public knowledge: config precedence — root project
    configs override installed-package configs at EVERY depth, because
    each project file's folder cascade applies wholesale and the root's
    applies last]: when the ROOT declares a default that cascades over
    this project (a ``models: <name>: +materialized`` or a top-level
    ``models: +materialized``), the package's own file contributes
    NOTHING — only root keys refine the root default (review r12: the
    old merge let a package's tree default beat the root's global
    default).  Without a root default, root keys override the package's
    path-by-path and the package default stands."""
    own_tree: dict[str, str] = {}
    _walk_policy((own_cfg.get("models", {}) or {}).get(own_name, {}) or {},
                 "", own_tree)
    root_tree: dict[str, str] = {}
    _walk_policy(root_models.get(own_name, {}) or {}, "", root_tree)
    own_default = own_tree.pop(
        "", (own_cfg.get("models", {}) or {}).get("+materialized"))
    root_default = root_tree.pop("", root_models.get("+materialized"))
    if root_default is not None:
        return root_tree, root_default
    policy = {**own_tree, **root_tree}
    return policy, (own_default if own_default is not None else "view")


def port_dbt_project(spark: SparkSession, project_dir: str,
                     registry: ModelRegistry | None = None,
                     env_vars: dict | None = None,
                     vars_overrides: dict | None = None) -> PortedProject:
    """Port a dbt project end-to-end from its own ``dbt_project.yml`` —
    no hand-stated policy (VERDICT r9 "What's missing" #1).

    ``env_vars`` (X83) is the EXPLICIT mapping ``{{ env_var(...) }}``
    calls resolve from — never implicit os.environ (determinism; the
    caller decides what the project sees).  ``vars_overrides`` (X83)
    merges OVER the project's ``vars:`` block with dbt's CLI ``--vars``
    precedence.  ``{% macro %}`` files under ``macro-paths`` (X82)
    load into a project-wide namespace and expand in every model,
    singular test, analysis, and snapshot body.

    Installed PACKAGES (X85 — core/packages.py documents the discovery
    contract) load after the root project, each a full dbt project:
    their macros join the namespace (qualified ``pkg.macro`` always;
    unqualified when nothing shadows — root macros win, a cross-package
    collision keeps only the qualified forms), their models/seeds/
    tests/snapshots/analyses register under dbt's FLAT global
    namespace (collisions raise), the root ``models: <pkg>:`` tree
    overrides the package's own policy, and root vars override package
    vars (scoped ``vars: {<pkg>: {...}}`` wins for that package)."""
    import yaml

    from .macros import load_macro_dirs
    from .packages import discover_packages

    with open(os.path.join(project_dir, "dbt_project.yml")) as fh:
        cfg = yaml.safe_load(fh)
    name = cfg["name"]
    packages = discover_packages(project_dir, cfg)

    root_models = cfg.get("models", {}) or {}
    known = {name, *(p.name for p in packages)}
    unknown = [k for k in root_models
               if not k.startswith("+") and k not in known]
    if unknown:
        raise ValueError(
            f"dbt_project.yml models: tree names {sorted(unknown)} — "
            f"neither this project ({name!r}) nor an installed package "
            f"({sorted(p.name for p in packages)}); a config that "
            "applies to nothing is a typo or a missing package")

    vars_ = cfg.get("vars", {}) or {}
    root_vars_raw = dict(vars_)
    if isinstance(vars_.get(name), dict):  # project-scoped vars block
        vars_ = {**{k: v for k, v in vars_.items() if k != name},
                 **vars_[name]}
    vars_ = {**vars_, **(vars_overrides or {})}  # CLI --vars precedence

    # ---- macro namespace: root first (wins unqualified), then packages
    macros = load_macro_dirs(
        [os.path.join(project_dir, mp)
         for mp in cfg.get("macro-paths", ["macros"])])
    macros.update({f"{name}.{n}": m for n, m in macros.items()
                   if "." not in n})
    pkg_claims: dict[str, str] = {}  # unqualified name -> claiming pkg
    own_macros: dict[str, dict] = {name: dict(macros)}  # per-project
    for pkg in packages:
        pkg_macros = load_macro_dirs(
            [os.path.join(pkg.path, mp)
             for mp in pkg.cfg.get("macro-paths", ["macros"])])
        own_macros[pkg.name] = pkg_macros
        for n, m in pkg_macros.items():
            macros[f"{pkg.name}.{n}"] = m
            if n in pkg_claims:
                # two packages define it: only qualified calls resolve
                macros.pop(n, None)
            elif n not in macros:  # root macro keeps the bare name
                macros[n] = m
                pkg_claims[n] = pkg.name

    def _macro_view(pname: str) -> dict:
        """dbt macro resolution order for a project's OWN nodes
        [public knowledge: dbt macro dispatch — package-local first,
        then root/global, ADVICE r11]: a bare macro name inside a
        package's models/tests/snapshots resolves to that package's
        own macro even when the root project defines the same name;
        qualified ``pkg.macro`` calls are unaffected."""
        local = own_macros.get(pname, {})
        return {**macros,
                **{n: m for n, m in local.items() if "." not in n}}

    registry = registry if registry is not None else ModelRegistry()
    model_names: list[str] = []
    freshness: list = []
    seeds: dict[str, DataFrame] = {}
    snapshots: dict = {}
    analyses_dirs: list[tuple[str, dict]] = []  # deferred to phase 2
    hooks = {"on-run-start": [], "on-run-end": []}

    all_project_names = {name} | {p.name for p in packages}
    proj_list = ([(cfg, project_dir, vars_)]
                 + [(p.cfg, p.path,
                     _project_vars(p.cfg, p.name, root_vars_raw,
                                   vars_overrides, all_project_names))
                    for p in packages])

    # X87 pre-scan: version maps must cover EVERY project before any
    # model registers — a root model may pin a package model's version
    versions: dict = {}
    deprecations: dict = {}
    renames: list[dict] = []
    for proj_cfg, proj_dir, _pv in proj_list:
        v, r, d = _scan_model_versions(
            [os.path.join(proj_dir, mp)
             for mp in proj_cfg.get("model-paths", ["models"])])
        dup_v = set(v) & set(versions)
        if dup_v:
            raise ValueError(
                f"versioned models {sorted(dup_v)} declared by more "
                "than one project — dbt's namespace is flat")
        versions.update(v)
        deprecations.update(d)
        renames.append(r)

    # r12 pre-scan: sources-YAML identifier/quoting — the source()
    # rewrite map must cover every project before any model registers
    # (dbt's source namespace is global across a project + packages)
    source_map: dict = {}
    sources_meta: dict = {}
    for proj_cfg, proj_dir, _pv in proj_list:
        sm, meta = _scan_sources(
            [os.path.join(proj_dir, mp)
             for mp in proj_cfg.get("model-paths", ["models"])])
        dup = {k for k in sm
               if k in source_map and source_map[k] != sm[k]}
        if dup:
            raise ValueError(
                f"sources {sorted(dup)} declared by more than one "
                "project with different identifiers — dbt's source "
                "namespace is global")
        source_map.update(sm)
        sources_meta.update(meta)

    # root project first, then packages in name order — dbt's flat
    # global namespace means later collisions raise, and root-first
    # makes the raise name the package as the newcomer
    owner_of: dict = {}      # model name -> owning project (X88)
    groups: dict = {}        # declared groups across all projects
    restricted: set = set()  # projects opting into restrict-access
    for (proj_cfg, proj_dir, proj_vars), rename in zip(proj_list,
                                                       renames):
        pname = proj_cfg["name"]
        if proj_cfg.get("restrict-access"):
            restricted.add(pname)
        names_before = len(model_names)
        pmacros = _macro_view(pname)
        policy, default_mat = _project_policy(proj_cfg, pname,
                                              root_models)
        for mp in proj_cfg.get("model-paths", ["models"]):
            mdir = os.path.join(proj_dir, mp)
            if os.path.isdir(mdir):
                model_names += register_sql_dir(
                    registry, mdir, materialized_by_subdir=policy,
                    default_materialized=default_mat, vars=proj_vars,
                    macros=pmacros, env=env_vars,
                    versions=versions, rename=rename,
                    source_map=source_map)
                # dbt accepts both .yml and .yaml properties files;
                # globbing only one silently drops the other's
                # tests/contracts (ADVICE r10)
                for props in sorted(
                        glob.glob(os.path.join(mdir, "**", "*.yml"),
                                  recursive=True)
                        + glob.glob(os.path.join(mdir, "**", "*.yaml"),
                                    recursive=True)):
                    props_applied = attach_properties(registry, props)
                    freshness += props_applied.get("freshness", [])
                    groups.update(props_applied.get("groups", {}))

        for tp in proj_cfg.get("test-paths", ["tests"]):
            tdir = os.path.join(proj_dir, tp)
            if os.path.isdir(tdir):
                model_names += register_test_dir(
                    registry, tdir, vars=proj_vars,
                    macros=pmacros, env=env_vars, versions=versions,
                    source_map=source_map)

        # seeds: config tree — `+column_types` at the project level keys
        # "" (applies to every seed where the column exists), per-seed
        # blocks key the seed name (dbt seed configs [public knowledge]);
        # the ROOT seeds: tree may also scope a package's seeds
        seed_types: dict[str, dict[str, str]] = {}
        for scope_cfg in ([proj_cfg] if proj_cfg is cfg
                          else [proj_cfg, cfg]):  # root overrides pkg
            seeds_cfg = ((scope_cfg.get("seeds", {}) or {})
                         .get(pname, {}) or {})
            if "+column_types" in seeds_cfg:
                seed_types[""] = {**seed_types.get("", {}),
                                  **seeds_cfg["+column_types"]}
            for k, v in seeds_cfg.items():
                if isinstance(v, dict) and "+column_types" in v:
                    seed_types[k] = {**seed_types.get(k, {}),
                                     **v["+column_types"]}

        proj_seeds = load_seeds(
            spark, [os.path.join(proj_dir, sp)
                    for sp in proj_cfg.get("seed-paths", ["seeds"])],
            column_types=seed_types)
        dup_seeds = set(proj_seeds) & set(seeds)
        if dup_seeds:
            raise ValueError(
                f"project {pname!r} seeds {sorted(dup_seeds)} collide "
                "with seeds loaded earlier — dbt's seed namespace is "
                "flat across a project and its packages")
        seeds.update(proj_seeds)

        for spath in proj_cfg.get("snapshot-paths", ["snapshots"]):
            sdir = os.path.join(proj_dir, spath)
            if os.path.isdir(sdir):
                from .sqlmodel import parse_snapshot_sql

                for dirpath, _dn, fns in sorted(os.walk(sdir)):
                    for f in sorted(fns):
                        if f.endswith(".sql"):
                            with open(os.path.join(dirpath, f)) as fh:
                                sdef, fn, deps = parse_snapshot_sql(
                                    fh.read(), vars=proj_vars,
                                    macros=pmacros, env=env_vars,
                                    versions=versions,
                                    source_map=source_map)
                            if sdef.name in snapshots:
                                raise ValueError(
                                    f"duplicate snapshot {sdef.name!r}")
                            snapshots[sdef.name] = (sdef, fn, deps)
                        elif f.endswith((".yml", ".yaml")):
                            # X103 [public dbt surface: dbt-core 1.9
                            # YAML-defined snapshots — snapshots: blocks
                            # with relation: + config:]
                            with open(os.path.join(dirpath, f)) as fh:
                                ydoc = yaml.safe_load(fh) or {}
                            for entry in _parse_snapshot_yaml(
                                    ydoc, source_map,
                                    os.path.join(dirpath, f)):
                                sdef, fn, deps = entry
                                if sdef.name in snapshots:
                                    raise ValueError(
                                        f"duplicate snapshot "
                                        f"{sdef.name!r}")
                                snapshots[sdef.name] = (sdef, fn, deps)

        for apath in proj_cfg.get("analysis-paths", ["analyses"]):
            adir = os.path.join(proj_dir, apath)
            if os.path.isdir(adir):
                analyses_dirs.append((adir, proj_vars, pmacros))

        # package on-run-* hooks run too [public dbt surface]; root's
        # first, then packages in load order — deterministic either way
        for key in hooks:
            v = proj_cfg.get(key, ())
            hooks[key] += [v] if isinstance(v, str) else list(v or ())

        owner_of.update(
            {n: pname for n in model_names[names_before:]})

    _enforce_access(registry, owner_of, groups, restricted)

    # analyses compile LAST: a root analysis may ref() a package model
    # and vice versa, and the compiled text may name any seed
    analyses: dict[str, str] = {}
    for adir, proj_vars, pmacros in analyses_dirs:
        compiled = compile_analyses(
            registry, adir, vars=proj_vars,
            extra_relations=set(seeds), macros=pmacros, env=env_vars,
            versions=versions, source_map=source_map)
        dup = set(compiled) & set(analyses)
        if dup:
            raise ValueError(f"duplicate analyses {sorted(dup)}")
        analyses.update(compiled)

    selectors = None
    sel_path = os.path.join(project_dir, "selectors.yml")
    if os.path.isfile(sel_path):
        from .selection import load_selectors

        selectors = load_selectors(sel_path)

    return PortedProject(
        name=name, registry=registry, seeds=seeds,
        model_names=model_names,
        clean_targets=tuple(cfg.get("clean-targets", ())), vars=vars_,
        on_run_start=tuple(hooks["on-run-start"]),
        on_run_end=tuple(hooks["on-run-end"]),
        analyses=analyses, snapshots=snapshots,
        freshness=tuple(freshness),
        packages=tuple(p.name for p in packages),
        selectors=selectors, deprecations=deprecations, groups=groups,
        owner_of=owner_of, sources=sources_meta)


_PLAIN_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _scan_sources(model_dirs: list[str]) -> tuple[dict, dict]:
    """Pre-scan a project's properties files for ``sources:`` blocks
    (r12, VERDICT r11 item 5 [public dbt surface: sources YAML —
    ``database`` / ``schema`` / ``identifier`` / ``quoting``]).

    Returns ``(source_map, sources_meta)``: ``source_map`` maps
    ``(source_name, table_name) -> physical identifier`` for the
    text-level ``source()`` rewrite; ``sources_meta`` records the full
    declared address per ``"<source>.<table>"`` — database, schema
    (defaulting to the source name, as dbt does), identifier, and the
    merged quoting flags — INERTLY: this engine's relation namespace is
    flat, so database/schema are documentation the manifest carries,
    not routing.  Quoting raises ONLY where semantics would change:
    ``quoting: {identifier: true}`` on a name that is not a plain SQL
    identifier would need backtick-quoting at every substitution site,
    which the flat-text renderer does not do — failing loud beats
    registering a relation the compiled SQL cannot reference.  A plain
    name under identifier-quoting is a no-op and stays inert."""
    import yaml

    source_map: dict = {}
    meta: dict = {}
    for mdir in model_dirs:
        if not os.path.isdir(mdir):
            continue
        for props in sorted(
                glob.glob(os.path.join(mdir, "**", "*.yml"),
                          recursive=True)
                + glob.glob(os.path.join(mdir, "**", "*.yaml"),
                            recursive=True)):
            with open(props) as fh:
                doc = yaml.safe_load(fh) or {}
            for src in doc.get("sources", []) or []:
                sname = src["name"]
                s_quoting = dict(src.get("quoting", {}) or {})
                for tbl in src.get("tables", []) or []:
                    tname = tbl["name"]
                    ident = tbl.get("identifier", tname)
                    quoting = {**s_quoting,
                               **(tbl.get("quoting", {}) or {})}
                    key = (sname, tname)
                    if key in source_map and source_map[key] != ident:
                        raise ValueError(
                            f"{props}: source {sname}.{tname} declared "
                            f"twice with different identifiers "
                            f"({source_map[key]!r} vs {ident!r})")
                    # validate only what the r12 surface INTRODUCES:
                    # an explicit identifier override (it lands in
                    # compiled SQL bare) or an identifier-quoting flag.
                    # A plain declared table with an odd name keeps the
                    # pre-r12 behavior — the run path substitutes
                    # prefixed temp-view names, never the bare token
                    if (quoting.get("identifier")
                            and not _PLAIN_IDENT_RE.match(ident)):
                        raise ValueError(
                            f"{props}: source {sname}.{tname}: quoted "
                            f"identifier {ident!r} is not a plain SQL "
                            "identifier — the flat-text renderer cannot "
                            "backtick-quote substitution sites; rename "
                            "the relation or drop the quoting flag")
                    if (ident != tname
                            and not _PLAIN_IDENT_RE.match(ident)):
                        raise ValueError(
                            f"{props}: source {sname}.{tname}: "
                            f"identifier {ident!r} is not a plain SQL "
                            "identifier — it cannot be referenced by "
                            "the rendered SQL")
                    source_map[key] = ident
                    meta[f"{sname}.{tname}"] = {
                        "database": src.get("database", ""),
                        "schema": src.get("schema", sname),
                        "identifier": ident,
                        "quoting": quoting,
                    }
    return source_map, meta


def _parse_snapshot_yaml(doc: dict, source_map: dict | None,
                         origin: str) -> list:
    """dbt-core 1.9 YAML-defined snapshots (X103 [public dbt surface]):
    ``snapshots:`` blocks in snapshot-paths properties files, each with
    ``relation: ref('m') | source('src', 'tbl')`` and a ``config:``
    carrying the same keys the SQL-block form passes to config().  The
    relation resolves through the r12 sources identifier map like any
    model text; the snapshot body is implicitly ``select * from
    <relation>`` (exactly what dbt generates).  Returns a list of
    ``(SnapshotDef, source_fn, deps)`` tuples."""
    from .snapshot import SnapshotDef
    from .sqlmodel import resolve_source_identifiers

    out = []
    for snap in doc.get("snapshots", []) or []:
        name = snap.get("name")
        rel_token = snap.get("relation")
        if not name or not rel_token:
            raise ValueError(
                f"{origin}: a YAML snapshot needs name and relation")
        cfg = dict(snap.get("config", {}) or {})
        token = resolve_source_identifiers(
            "{{ " + rel_token.strip() + " }}"
            if not rel_token.strip().startswith("{{") else rel_token,
            source_map)
        dep = _dep_name(token)
        check_cols = cfg.get("check_cols", ())
        if isinstance(check_cols, str) and check_cols != "all":
            check_cols = (check_cols,)
        if check_cols == "all":
            raise ValueError(
                f"{origin}: snapshot {name}: check_cols='all' is not "
                "supported — name the columns")
        hard = cfg.get("hard_deletes",
                       "invalidate" if cfg.get("invalidate_hard_deletes")
                       else "ignore")
        if "unique_key" not in cfg:
            raise ValueError(
                f"{origin}: snapshot {name}: config needs unique_key")
        sdef = SnapshotDef(
            name=name, unique_key=cfg["unique_key"],
            strategy=cfg.get("strategy", "timestamp"),
            updated_at=cfg.get("updated_at"),
            check_cols=tuple(check_cols) if check_cols else (),
            hard_deletes=hard)

        def fn(refs: dict, _d=dep):
            return refs[_d]

        out.append((sdef, fn, (dep,)))
    return out


def compile_analyses(registry: ModelRegistry, analyses_dir: str,
                     vars: dict | None = None,
                     extra_relations: set[str] = frozenset(),
                     macros: dict | None = None,
                     env: dict | None = None,
                     versions: dict | None = None,
                     source_map: dict | None = None) -> dict[str, str]:
    """dbt analyses [public knowledge: analysis-paths — SQL that compiles
    with the project's context but is NEVER run or materialized; the
    reference declares analyses/ at dbt_project.yml:7 and ships none]:
    each ``*.sql`` renders with vars and refs substituted by the bare
    relation name (a ported project's models register temp views under
    their own names, so the compiled text runs as-is via spark.sql once
    the DAG is built).  Unknown refs raise at compile time — the same
    manifest validation dbt does."""
    from .sqlmodel import parse_deps, preprocess_sql, render_sql

    out: dict[str, str] = {}
    for dirpath, _dirnames, filenames in sorted(os.walk(analyses_dir)):
        for f in sorted(filenames):
            if not f.endswith(".sql"):
                continue
            name = f[:-len(".sql")]
            with open(os.path.join(dirpath, f)) as fh:
                text = preprocess_sql(fh.read(), macros, vars, env,
                                      versions, source_map)
            deps = parse_deps(text)
            known = set(registry.names()) | set(extra_relations)
            unknown = [d for d in deps if d not in known]
            if unknown:
                raise ValueError(
                    f"analysis {name!r}: unknown refs {unknown}")
            out[name] = render_sql(text, {d: d for d in deps})
    return out


# ------------------------------------------------------- schema.yml ----

_GENERIC = {"unique", "not_null", "accepted_values", "relationships"}
_REF_IN_TO = re.compile(r"ref\(\s*'([^']+)'\s*\)")
_SOURCE_IN_TO = re.compile(r"source\(\s*'[^']+'\s*,\s*'([^']+)'\s*\)")


def _dep_name(token: str) -> str:
    """'ref(\\'x\\')' / 'source(\\'s\\',\\'x\\')' / bare 'x' -> the dep key."""
    m = _REF_IN_TO.search(token) or _SOURCE_IN_TO.search(token)
    return m.group(1) if m else token


# -------------------------------------------------------- unit tests ----

@dataclass
class UnitTestResult:
    """One dbt-style unit test outcome; ``detail`` explains a failure."""
    name: str
    model: str
    passed: bool
    detail: str = ""

    def __bool__(self) -> bool:
        return self.passed


def _canon(v) -> str:
    """Type-tolerant scalar canonicalization for expect-row comparison:
    dbt unit tests compare VALUES, not renderings — a YAML ``5`` must
    match a double column's ``5.0`` (r11 review).  Integral floats
    collapse to their integer rendering; everything else goes through
    str()."""
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    import decimal

    if isinstance(v, decimal.Decimal):
        f = float(v)
        return str(int(f)) if f.is_integer() else str(f)
    return str(v)


def _mock_type(values: list):
    """Spark type for one mock column, inferred from its non-null
    values.  An all-None column defaults to StringType — the documented
    empty-input pattern (one all-None row) previously died in
    ``createDataFrame``'s pandas inference with CANNOT_DETERMINE_TYPE
    (ADVICE r10 medium); NULL compares equal across types in the
    expect-row canonicalization, so string is a safe carrier."""
    from pyspark.sql.types import TimestampType

    kinds = set()
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            kinds.add("bool")
        elif isinstance(v, int):
            kinds.add("long")
        elif isinstance(v, float):
            kinds.add("double")
        elif isinstance(v, datetime.datetime):
            kinds.add("timestamp")
        elif isinstance(v, datetime.date):
            kinds.add("date")
        else:
            kinds.add("string")
    if kinds <= {"long", "double"} and "double" in kinds:
        return DoubleType()           # YAML mixes 5 and 5.5 in one column
    if len(kinds) > 1:
        raise ValueError(f"mock column mixes types {sorted(kinds)}")
    t = {"bool": BooleanType, "long": LongType, "double": DoubleType,
         "timestamp": TimestampType, "date": DateType,
         "string": StringType}[kinds.pop()] if kinds else StringType
    return t()


def _mock_frame(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Mocked input rows -> DataFrame.  Column set is the union across
    rows (dbt: unmocked columns are NULL); an all-empty mock needs at
    least the columns the model touches, so rows=[] yields a zero-row
    single-NULL-column frame only if no columns are derivable — callers
    should mock one row or give ``format: empty_with_columns``-style
    hints via a dict row of all-None values.  The schema is built
    EXPLICITLY (per-column from non-null values, all-None -> string) so
    the all-None pattern the docstring recommends actually constructs."""
    cols: list[str] = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    if not cols:
        raise ValueError(
            "empty unit-test mock needs at least one all-None row to "
            "carry the column names the model reads")
    schema = StructType([
        StructField(c, _mock_type([r.get(c) for r in rows])) for c in cols])
    data = [tuple(float(r.get(c))
                  if (isinstance(r.get(c), int)
                      and not isinstance(r.get(c), bool)
                      and isinstance(schema[c].dataType, DoubleType))
                  else r.get(c) for c in cols) for r in rows]
    return spark.createDataFrame(data, schema)


def _fixture_rows(block: dict, what: str):
    """dbt unit-test fixture rows [public dbt surface: unit test
    ``format: dict | csv | sql``] — dict rows pass through; ``format:
    csv`` parses an inline CSV string with the same agate-like type
    ladder seeds use (whole-column vote, empty field -> NULL), so a
    fixture behaves exactly like the seed it stands in for.  ``sql``
    fixtures and ``fixture:`` file references raise (out of the lite
    scope — inline what the test needs)."""
    import io

    block = block or {}
    fmt = block.get("format", "dict")
    rows = block.get("rows")
    if fmt == "dict":
        if block.get("fixture"):
            raise ValueError(
                f"{what}: fixture: files are unsupported — inline the "
                "rows")
        return rows
    if fmt != "csv":
        raise ValueError(
            f"{what}: format {fmt!r} is unsupported — dict or csv")
    if not isinstance(rows, str):
        raise ValueError(f"{what}: format csv needs rows: as one "
                         "CSV string (header line first)")
    parsed = list(csv.reader(io.StringIO(rows.strip())))
    if not parsed:
        return []
    header, body = parsed[0], parsed[1:]
    # ragged rows fail loud (review r12): zip(*body) truncates to the
    # SHORTEST row, so one short line would silently drop trailing
    # columns from EVERY row — a fixture typed wrong with no error
    for i, r in enumerate(body, start=2):
        if len(r) != len(header):
            raise ValueError(
                f"{what}: csv line {i} has {len(r)} fields, header "
                f"declares {len(header)}")
    cols = list(zip(*body)) if body else [()] * len(header)
    convs = [_infer([v for v in col if v != ""])[1] for col in cols]
    return [{h: (None if v == "" else conv(v))
             for h, v, conv in zip(header, r, convs)} for r in body]


def run_unit_tests(spark: SparkSession, registry: ModelRegistry,
                   path_or_text: str) -> list[UnitTestResult]:
    """dbt unit tests [public knowledge: dbt-core 1.8 ``unit_tests:``
    properties — run a single model's LOGIC against mocked ref/source
    inputs and compare to expected rows, no warehouse involved]:

    .. code-block:: yaml

        unit_tests:
          - name: rollup_handles_empty_payments
            model: agg_monthly_loans_fixed
            given:
              - input: ref('fct_loan_details')
                rows: [{loan_id: L1, ...}]
              - input: ref('stg_loan_payments')
                rows: [{payment_id: null, loan_id: null, ...}]
            expect:
              rows: [{month: 2024-01-01, new_loans: 1}]

    Semantics mirrored from dbt: every dep of the model must be given
    (unmocked deps are an error, not silently-real data); the expect
    comparison projects the ACTUAL output onto exactly the expected
    columns and compares full sorted row multisets; an incremental
    model's fn runs with a first-build context (``is_incremental() ->
    false``) unless ``overrides: {is_incremental: true}``, which also
    requires a ``given`` entry for ``this``."""
    import yaml

    if os.path.exists(path_or_text):
        with open(path_or_text) as fh:
            doc = yaml.safe_load(fh)
    else:
        doc = yaml.safe_load(path_or_text)
    results: list[UnitTestResult] = []
    for ut in (doc or {}).get("unit_tests", []) or []:
        name, model = ut["name"], ut["model"]
        mdef = registry[model]
        given = {_dep_name(g["input"]):
                 _fixture_rows(g, f"unit test {name!r} given") or []
                 for g in ut.get("given", []) or []}
        missing = [d for d in mdef.deps if d not in given]
        if missing:
            raise ValueError(
                f"unit test {name!r}: deps {missing} of model {model!r} "
                "have no given: mock — every input must be mocked")
        overrides = ut.get("overrides", {}) or {}
        wants_ctx = bool(mdef.watermark_col) or getattr(
            mdef.fn, "__wants_incremental_ctx__", False)
        try:
            # mocks build inside the try: a malformed mock is a FAILED
            # test result, not an abort of the whole suite (ADVICE r10)
            refs = {d: _mock_frame(spark, given[d]) for d in mdef.deps}
            if mdef.materialized == "incremental" and wants_ctx:
                from .model import IncrementalContext

                if overrides.get("is_incremental"):
                    if "this" not in given:
                        raise ValueError(
                            f"unit test {name!r}: is_incremental override "
                            "needs a given: entry for 'this'")
                    this = _mock_frame(spark, given["this"])
                    wm = (this.agg(
                        F.max(mdef.watermark_col)).first()[0]
                        if mdef.watermark_col else None)
                    ctx = IncrementalContext(is_incremental=True,
                                             watermark=wm, this=this)
                else:
                    ctx = IncrementalContext(is_incremental=False)
                actual = mdef.fn(refs, ctx)
            else:
                actual = mdef.fn(refs)
            expect_rows = _fixture_rows(
                ut.get("expect", {}), f"unit test {name!r} expect")
            if expect_rows is None:
                raise ValueError(f"unit test {name!r}: no expect.rows")
            cols: list[str] = []
            for r in expect_rows:
                for k in r:
                    if k not in cols:
                        cols.append(k)
            got = sorted(
                (tuple(_canon(v) for v in row)
                 for row in actual.select(*cols).collect()))
            want = sorted(
                tuple(_canon(r.get(c)) for c in cols)
                for r in expect_rows)
            if got == want:
                results.append(UnitTestResult(name, model, True))
            else:
                results.append(UnitTestResult(
                    name, model, False,
                    f"columns {cols}: got {got[:5]} != want {want[:5]}"))
        except Exception as exc:  # noqa: BLE001 — per-test report, like build
            results.append(UnitTestResult(
                name, model, False, f"{type(exc).__name__}: {exc}"))
    return results


def _build_test(model: str, column: str | None, spec) -> "datatests.DataTest":
    """One schema.yml test entry -> a DataTest.  ``spec`` is either the
    bare generic name or ``{name: {kwargs}}`` (dbt's two spellings)."""
    if isinstance(spec, str):
        kind, kw = spec, {}
    elif isinstance(spec, dict) and len(spec) == 1:
        kind, kw = next(iter(spec.items()))
        kw = dict(kw or {})
    else:
        raise ValueError(f"model {model}: unparseable test spec {spec!r}")
    col = kw.pop("column_name", column)
    # dbt severity/threshold configs: bare keys or nested under config
    # (X102: warn_if / error_if compared against the failure count)
    cfg = kw.pop("config", {}) or {}
    tkw = {"severity": cfg.get("severity", kw.pop("severity", "error")),
           "warn_if": str(cfg.get("warn_if", kw.pop("warn_if", "!=0"))),
           "error_if": str(cfg.get("error_if",
                                   kw.pop("error_if", "!=0")))}
    if kind not in _GENERIC:
        raise ValueError(
            f"model {model}: unknown generic test {kind!r} — "
            f"supported: {sorted(_GENERIC)}")
    if kind == "unique":
        cols = kw.pop("combination_of_columns", None) or [col]
        return datatests.unique(model, cols, **tkw)
    if kind == "not_null":
        return datatests.not_null(model, [col], **tkw)
    if kind == "accepted_values":
        return datatests.accepted_values(model, col, kw.pop("values"),
                                         **tkw)
    to, field_ = kw.pop("to"), kw.pop("field")
    return datatests.relationships(
        model, col, _dep_name(to), field_, **tkw)


def attach_properties(registry: ModelRegistry, path_or_text: str) -> dict:
    """Attach a dbt properties (schema.yml) file's tests / contracts /
    exposures onto already-registered models — the standard dbt idiom,
    mapped to the existing ModelDef machinery.  Accepts a path or the
    YAML text itself; returns {"tests": [names], "exposures": [names]}
    for reporting."""
    import yaml

    if os.path.exists(path_or_text):
        with open(path_or_text) as fh:
            doc = yaml.safe_load(fh)
    else:
        doc = yaml.safe_load(path_or_text)
    doc = doc or {}
    applied = {"tests": [], "exposures": []}

    for m in doc.get("models", []) or []:
        # X87: a versioned entry's properties apply to EVERY declared
        # version; a version's own `columns:` resolves against the
        # model-level set first (_version_columns — include/exclude
        # pulls, plain defs override by name)
        if "versions" in m:
            for v in m["versions"] or []:
                name = f"{m['name']}_v{int(v['v'])}"
                entry = m
                if "columns" in v:
                    # per-version column override [public dbt surface:
                    # versioned-model columns with include/exclude]
                    entry = {**m, "columns": _version_columns(
                        m.get("columns") or [], v["columns"], name)}
                _attach_model_props(registry, entry, name, applied)
        else:
            _attach_model_props(registry, m, m["name"], applied)

    applied["freshness"] = []
    for src in doc.get("sources", []) or []:
        # dbt sources: YAML [public knowledge: source freshness config —
        # warn_after/error_after {count, period} on the source or per
        # table, loaded_at_field inherited downward]
        src_fresh = src.get("freshness", {}) or {}
        src_loaded = src.get("loaded_at_field", "")
        for tbl in src.get("tables", []) or []:
            fresh = tbl.get("freshness", src_fresh) or {}
            loaded = tbl.get("loaded_at_field", src_loaded)
            if not fresh:
                continue
            if not loaded:
                raise ValueError(
                    f"source table {tbl['name']!r}: freshness declared "
                    "but no loaded_at_field")
            from .freshness import FreshnessSpec

            def _secs(block) -> float | None:
                if not block:
                    return None
                per = {"minute": 60, "hour": 3600, "day": 86400}
                return block["count"] * per[block["period"]]

            warn = _secs(fresh.get("warn_after"))
            error = _secs(fresh.get("error_after"))
            # dbt accepts warn_after and/or error_after independently —
            # an error_after-only spec is valid and simply never warns
            # (ADVICE r10)
            if warn is None and error is None:
                raise ValueError(
                    f"source table {tbl['name']!r}: freshness needs "
                    "warn_after and/or error_after")
            # the spec keys the PHYSICAL relation: after the r12
            # identifier rewrite, that is the name the engine serves
            applied["freshness"].append(FreshnessSpec(
                source=tbl.get("identifier", tbl["name"]),
                loaded_at_col=loaded,
                warn_after_s=warn, error_after_s=error))

    # X88: group declarations [public dbt surface: model governance,
    # dbt-core 1.5 groups/access] — collected for the port-time
    # membership check; owner metadata kept verbatim
    applied["groups"] = {g["name"]: (g.get("owner", {}) or {})
                         for g in doc.get("groups", []) or []}

    for e in doc.get("exposures", []) or []:
        depends = tuple(
            _REF_IN_TO.search(d).group(1) if _REF_IN_TO.search(d) else d
            for d in e.get("depends_on", ()))
        registry.exposure(
            e["name"], depends_on=depends, type=e.get("type", "dashboard"),
            owner=(e.get("owner", {}) or {}).get("name", ""),
            url=e.get("url", ""), doc=e.get("description", ""))
        applied["exposures"].append(e["name"])
    return applied


def _enforce_access(registry: ModelRegistry, owner_of: dict,
                    groups: dict, restricted: set) -> None:
    """dbt model governance (X88 [public dbt surface: groups / access /
    restrict-access]): PRIVATE models may only be ref'd by models in
    the same group (always enforced — a private model without that gate
    means nothing); PROTECTED (the default) blocks cross-project refs
    only when the dep's owning project declares ``restrict-access:
    true`` (dbt's opt-in, else packages interoperate as before);
    PUBLIC is referable by anyone.  Singular tests are exempt — dbt
    tests are not models and may observe anything in the project."""
    for name in registry.names():
        mdef = registry[name]
        if mdef.group and mdef.group not in groups:
            raise ValueError(
                f"model {name!r} declares group {mdef.group!r} but no "
                f"groups: entry defines it (declared: {sorted(groups)})")
        if mdef.access == "private" and not mdef.group:
            raise ValueError(
                f"model {name!r} is access: private but has no group — "
                "private means same-group-only, so a group is required")
    known = set(registry.names())
    for name in registry.names():  # registry order: deterministic raise
        mdef = registry[name]
        if "singular-test" in mdef.tags:
            continue
        for d in mdef.deps:
            if d not in known:
                continue  # seeds/sources carry no access level
            dd = registry[d]
            acc = dd.access or "protected"
            if acc == "public":
                continue
            if acc == "private":
                if mdef.group != dd.group:
                    raise ValueError(
                        f"model {name!r} (group {mdef.group or None!r}) "
                        f"refs private model {d!r} of group "
                        f"{dd.group!r} — private models are same-group-"
                        "only")
            elif (owner_of.get(d) in restricted
                  and owner_of.get(d) != owner_of.get(name)):
                raise ValueError(
                    f"model {name!r} (project {owner_of.get(name)!r}) "
                    f"refs protected model {d!r} of project "
                    f"{owner_of.get(d)!r}, which sets restrict-access: "
                    "true — mark the model access: public to expose it")


def _version_columns(base: list, vcols, name: str) -> list:
    """One version entry's effective column list [public dbt surface:
    versioned-model ``columns:`` — an ``include:``/``exclude:`` element
    pulls the MODEL-level columns in (include '*'/'all' or a name
    list, exclude subtracts), and plain column defs add to or override
    the pulled set].  Without an include element, exactly the listed
    columns apply — a version that restates its columns owns them."""
    by_name = {c["name"]: c for c in base}
    pulled: list = []
    plain: dict = {}    # per-version defs override by NAME, not position
    seen_include = False
    for c in vcols or []:
        if "include" in c or "exclude" in c:
            if seen_include:
                raise ValueError(
                    f"{name}: more than one include/exclude element in "
                    "a version's columns:")
            seen_include = True
            inc = c.get("include", "*")
            excl = c.get("exclude") or []
            if isinstance(excl, str):   # YAML scalar shorthand — one
                excl = [excl]           # name, never its characters
            if inc in ("*", "all"):
                names = [b["name"] for b in base]
            else:
                if isinstance(inc, str):
                    inc = [inc]
                if not isinstance(inc, list):
                    raise ValueError(
                        f"{name}: include: must be '*', 'all', a name, "
                        f"or a list, got {inc!r}")
                missing = [i for i in inc if i not in by_name]
                if missing:
                    raise ValueError(
                        f"{name}: include: names {missing} not among "
                        f"the model-level columns {sorted(by_name)}")
                names = inc
            unknown_ex = [e for e in excl if e not in by_name]
            if unknown_ex:
                raise ValueError(
                    f"{name}: exclude: names {unknown_ex} not among "
                    f"the model-level columns {sorted(by_name)}")
            pulled = [by_name[n] for n in names if n not in set(excl)]
        else:
            plain[c["name"]] = c
    # a plain def beats the inherited def of the same name regardless
    # of where it appears relative to the include element (review r12:
    # positional handling duplicated the column and attached both defs'
    # tests); defs for columns the include didn't pull append after
    out = [plain.pop(c["name"], c) for c in pulled]
    return out + list(plain.values())


def _attach_model_props(registry: ModelRegistry, m: dict, name: str,
                        applied: dict) -> None:
    """One properties entry applied to one registered model name —
    factored out so a versioned entry can fan out (X87)."""
    if name not in registry.names():
        raise ValueError(
            f"properties file references unknown model {name!r}")
    mdef = registry[name]
    new_tests = []
    contract_cols = []
    enforce = (m.get("config", {}) or {}).get(
        "contract", {}).get("enforced", False)
    for c in m.get("columns", []) or []:
        for spec in c.get("tests", []) or []:
            new_tests.append(_build_test(name, c["name"], spec))
        if enforce and c.get("data_type"):
            contract_cols.append((c["name"], c["data_type"]))
    for spec in m.get("tests", []) or []:
        new_tests.append(_build_test(name, None, spec))
    changes = {}
    if new_tests:
        changes["tests"] = mdef.tests + tuple(new_tests)
        applied["tests"] += [t.name for t in new_tests]
    if contract_cols:
        changes["contract"] = mdef.contract + tuple(contract_cols)
    if m.get("description"):
        # dbt: the properties description IS the model doc — it
        # replaces register_sql_model's length placeholder (r11
        # review: `not mdef.doc` never fired past the placeholder)
        changes["doc"] = m["description"]
    # X88 governance: group (bare or config-nested) + access
    group = m.get("group") or (m.get("config", {}) or {}).get("group")
    if group:
        changes["group"] = group
    if m.get("access"):
        if m["access"] not in ("public", "protected", "private"):
            raise ValueError(
                f"model {name!r}: access must be public/protected/"
                f"private, got {m['access']!r}")
        changes["access"] = m["access"]
    if changes:
        # ModelDef is frozen; swap the amended def in place (same
        # name -> same DAG node, so no registry invariant moves)
        registry._models[name] = replace(mdef, **changes)

