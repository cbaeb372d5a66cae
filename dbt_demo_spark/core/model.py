"""Model registry — the Spark-native analog of dbt's manifest.

In the reference, a model is a SQL file whose ``{{ ref('x') }}`` calls define
DAG edges and whose folder selects a materialization (reference:
dbt_project.yml:17-22; ref call sites at models/staging/stg_loans.sql:2,
models/marts/fct_loan_details.sql:2,6, models/marts/agg_monthly_loans.sql:2,6).
Here a model is a Python function ``(refs: dict[str, DataFrame]) -> DataFrame``
whose declared ``deps`` are the ref edges; the "compile" step is building a
Catalyst logical plan through the DataFrame API, and everything downstream
(analysis, optimization, physical planning) is Spark's, not ours.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

ModelFn = Callable[[dict[str, DataFrame]], DataFrame]


@dataclass(frozen=True)
class IncrementalContext:
    """What an incremental model's fn may consult to bound its source
    reads — dbt's ``is_incremental()`` + ``max(loaded_at) from {{ this }}``
    pattern [public knowledge: dbt incremental models].  ``watermark`` is
    the max of the model's ``watermark_col`` over the EXISTING materialized
    table (None on the first build): the model filters its sources past it
    so a refresh reads O(new data), not O(history).  Late rows at or below
    the watermark are the model's call — subtract a lookback window from
    the watermark in the filter (the dbt lookback idiom) and the
    partition-overwrite write repairs those partitions in full."""
    is_incremental: bool
    watermark: object | None = None
    # the model's EXISTING relation (None on a first build) — what a
    # SQL-text model's ``{{ this }}`` binds to, so the dbt idiom
    # ``where ts > (select max(ts) from {{ this }})`` ports verbatim
    this: object | None = None


@dataclass(frozen=True)
class ModelDef:
    name: str
    deps: tuple[str, ...]
    materialized: str  # "view" | "table" (dbt_project.yml:19-22) | "incremental" | "ephemeral"
    fn: ModelFn
    partition_by: tuple[str, ...] = ()   # table layout at scale (month keys)
    bucket_by: tuple[str, ...] = ()      # hash-bucket layout (join keys):
    n_buckets: int = 0                   # co-located joins, no exchange
    watermark_col: str = ""              # incremental refresh high-water mark
    incremental_strategy: str = "insert_overwrite"  # or "merge" (upsert)
    unique_key: tuple[str, ...] = ()     # merge strategy's row identity
    on_schema_change: str = "ignore"     # | "fail" | "append_new_columns"
    # microbatch strategy (X96 [public dbt surface: dbt-core 1.9
    # microbatch — event_time / batch_size / lookback / begin]).
    # event_time may be declared on ANY model (it marks the column a
    # DOWNSTREAM microbatch model filters this relation by); the other
    # three only configure a microbatch model itself.
    event_time: str = ""                 # the row-timestamp column
    batch_size: str = ""                 # hour | day | month | year
    lookback: int = 1                    # periods re-processed for late data
    begin: str = ""                      # first-build start timestamp
    # aggregate strategy (X107, r13): fold NEW batch partials into an
    # existing GRAIN mart — ((column, fn), ...) with fn in
    # sum | count | min | max; unique_key is the grain key.  The model
    # fn emits batch-level partials (typically bounded by
    # watermark_col); the materialization combines them with the stored
    # partials on the grain key, touching only affected partitions.
    combine: tuple = ()
    tags: tuple[str, ...] = ()           # dbt tags (selection: tag:x)
    zorder_by: tuple[str, ...] = ()      # Morton-clustered file layout
    zorder_files: int = 0                # target file count (0 = let AQE)
    tests: tuple = ()                    # attached DataTests (dbt build gates)
    pre_hook: tuple = ()                 # SQL strings / callables before build
    post_hook: tuple = ()                # … and after materialization
    contract: tuple = ()                 # enforced (column, type) pairs
    doc: str = ""
    group: str = ""                      # dbt model governance (X88)
    access: str = ""                     # "" (=protected) | public |
                                         # protected | private


@dataclass(frozen=True)
class Exposure:
    """A downstream consumer of models — dbt's exposure node [public
    knowledge: dbt exposures declare dashboards/ML jobs/reports that
    depend_on models, so impact analysis ("what breaks if this mart
    changes?") extends past the warehouse boundary]."""
    name: str
    depends_on: tuple[str, ...]
    type: str = "dashboard"      # dbt's types: dashboard|notebook|ml|application|analysis
    owner: str = ""
    url: str = ""
    doc: str = ""


class ModelRegistry:
    def __init__(self) -> None:
        self._models: dict[str, ModelDef] = {}
        self._exposures: dict[str, Exposure] = {}

    def register(self, mdef: ModelDef) -> None:
        if mdef.name in self._models:
            raise ValueError(f"duplicate model: {mdef.name}")
        if mdef.watermark_col and mdef.materialized != "incremental":
            raise ValueError(
                f"model {mdef.name}: watermark_col only applies to "
                "incremental materialization")
        if mdef.incremental_strategy not in ("insert_overwrite", "merge",
                                             "microbatch", "aggregate"):
            raise ValueError(
                f"model {mdef.name}: unknown incremental_strategy "
                f"{mdef.incremental_strategy!r}")
        if mdef.incremental_strategy == "microbatch":
            if mdef.materialized != "incremental":
                raise ValueError(
                    f"model {mdef.name}: the microbatch strategy only "
                    "applies to incremental materialization")
            if not mdef.event_time or not mdef.batch_size:
                raise ValueError(
                    f"model {mdef.name}: microbatch requires event_time "
                    "and batch_size")
            if mdef.batch_size not in ("hour", "day", "month", "year"):
                raise ValueError(
                    f"model {mdef.name}: batch_size must be hour | day | "
                    f"month | year, got {mdef.batch_size!r}")
            if not mdef.partition_by:
                raise ValueError(
                    f"model {mdef.name}: microbatch requires partition_by "
                    "(each batch replaces its period's partitions)")
            if mdef.lookback < 0:
                raise ValueError(
                    f"model {mdef.name}: lookback must be >= 0")
            if mdef.watermark_col:
                raise ValueError(
                    f"model {mdef.name}: watermark_col and microbatch are "
                    "mutually exclusive refresh bounds")
        else:
            if mdef.batch_size or mdef.begin:
                raise ValueError(
                    f"model {mdef.name}: batch_size/begin only apply to "
                    "the microbatch strategy")
            if mdef.lookback != 1:
                raise ValueError(
                    f"model {mdef.name}: lookback only applies to the "
                    "microbatch strategy")
        if mdef.incremental_strategy in ("merge", "aggregate"):
            if mdef.materialized != "incremental":
                raise ValueError(
                    f"model {mdef.name}: the {mdef.incremental_strategy} "
                    "strategy only applies to incremental materialization")
            if not mdef.unique_key:
                raise ValueError(
                    f"model {mdef.name}: {mdef.incremental_strategy} "
                    "strategy requires unique_key")
        elif mdef.unique_key:
            raise ValueError(
                f"model {mdef.name}: unique_key only applies to the "
                "merge/aggregate strategies")
        if mdef.incremental_strategy == "aggregate":
            if not mdef.combine:
                raise ValueError(
                    f"model {mdef.name}: aggregate strategy requires "
                    "combine ((column, fn) pairs)")
            for item in mdef.combine:
                if (not isinstance(item, tuple) or len(item) != 2
                        or item[1] not in ("sum", "count", "min", "max")):
                    raise ValueError(
                        f"model {mdef.name}: combine entries must be "
                        "(column, fn) with fn in sum | count | min | "
                        f"max, got {item!r}")
            overlap = set(mdef.unique_key) & {c for c, _ in mdef.combine}
            if overlap:
                raise ValueError(
                    f"model {mdef.name}: combine columns overlap the "
                    f"grain key: {sorted(overlap)}")
            if mdef.bucket_by:
                raise ValueError(
                    f"model {mdef.name}: aggregate strategy folds via "
                    "staged path swaps — bucketed (catalog-registered) "
                    "layouts are not supported; bucket the SERVING mart "
                    "built from this one instead")
            if not set(mdef.partition_by) <= set(mdef.unique_key):
                raise ValueError(
                    f"model {mdef.name}: aggregate strategy partition "
                    "columns must be part of the grain key (the fold "
                    "prunes the existing mart to the partitions the "
                    "batch touches)")
        elif mdef.combine:
            raise ValueError(
                f"model {mdef.name}: combine only applies to the "
                "aggregate strategy")
        if mdef.on_schema_change not in ("ignore", "fail",
                                         "append_new_columns"):
            raise ValueError(
                f"model {mdef.name}: unknown on_schema_change "
                f"{mdef.on_schema_change!r}")
        if (mdef.on_schema_change != "ignore"
                and mdef.materialized != "incremental"):
            raise ValueError(
                f"model {mdef.name}: on_schema_change only applies to "
                "incremental materialization")
        if mdef.zorder_by:
            if mdef.materialized != "table":
                raise ValueError(
                    f"model {mdef.name}: zorder_by only applies to table "
                    "materialization")
            if mdef.bucket_by:
                raise ValueError(
                    f"model {mdef.name}: zorder_by and bucket_by are "
                    "mutually exclusive layouts (hash-clustered buckets "
                    "vs range-clustered Morton files)")
        elif mdef.zorder_files:
            raise ValueError(
                f"model {mdef.name}: zorder_files without zorder_by")
        for c in mdef.contract:
            if (not isinstance(c, tuple) or len(c) != 2
                    or not all(isinstance(x, str) for x in c)):
                raise ValueError(
                    f"model {mdef.name}: contract entries are "
                    f"(column, type) string pairs, got {c!r}")
        self._models[mdef.name] = mdef

    def exposure(self, name: str, *, depends_on: tuple[str, ...],
                 type: str = "dashboard", owner: str = "",
                 url: str = "", doc: str = "") -> Exposure:
        """Register a dbt-style exposure.  ``depends_on`` is validated at
        manifest time (exposures are usually declared before the last
        model they reference)."""
        if name in self._exposures:
            raise ValueError(f"duplicate exposure: {name}")
        exp = Exposure(name=name, depends_on=tuple(depends_on), type=type,
                       owner=owner, url=url, doc=doc)
        self._exposures[name] = exp
        return exp

    def __getitem__(self, name: str) -> ModelDef:
        return self._models[name]

    def __contains__(self, name: str) -> bool:
        return name in self._models

    def names(self) -> list[str]:
        return list(self._models)

    def model(self, name: str, *, deps: tuple[str, ...] = (),
              materialized: str = "view",
              partition_by: tuple[str, ...] = (),
              bucket_by: tuple[str, ...] = (),
              n_buckets: int = 0,
              watermark_col: str = "",
              incremental_strategy: str = "insert_overwrite",
              unique_key: tuple[str, ...] = (),
              on_schema_change: str = "ignore",
              tags: tuple[str, ...] = (),
              zorder_by: tuple[str, ...] = (),
              zorder_files: int = 0,
              tests: tuple = (),
              pre_hook: tuple = (),
              post_hook: tuple = (),
              contract: tuple = ()) -> Callable[[ModelFn], ModelFn]:
        """Decorator: register a model function on this registry.

        ``watermark_col`` (incremental models only) names an output column
        whose max over the existing table is handed back to the model fn as
        an IncrementalContext on refresh runs — the fn then bounds its
        source reads to rows past the watermark.  The fn opts in by
        accepting a second positional arg: ``fn(refs, ctx)``.

        ``tests`` attaches DataTests to the model — the schema.yml tests
        dbt declares next to a model.  ``Runner.run`` ignores them (dbt
        run doesn't test); ``Runner.build`` executes them right after the
        model materializes and gates every descendant on the outcome.

        ``pre_hook`` / ``post_hook`` are dbt's model hooks [public
        knowledge: dbt pre-hook/post-hook configs run SQL around each
        model's materialization].  Entries are SQL strings (run via
        ``spark.sql``, ``{name}`` interpolated to the model name) or
        callables ``(spark, relations) -> None``; pre hooks run before
        the model fn, post hooks after materialization with the built
        relation already registered.

        ``contract`` is dbt's model contract [public knowledge: dbt
        ``contract: enforced`` declares each column's name and data type
        and the build fails on divergence]: a tuple of (column,
        spark-sql-type) pairs, e.g. ``(("month", "date"), ("revenue",
        "double"))``.  The runner checks the model's ACTUAL schema
        (names + types, order-insensitive; missing/extra columns fail)
        before materializing — schema drift is caught at build time, not
        by a downstream consumer."""

        def deco(fn: ModelFn) -> ModelFn:
            self.register(ModelDef(name=name, deps=tuple(deps),
                                   materialized=materialized, fn=fn,
                                   partition_by=tuple(partition_by),
                                   bucket_by=tuple(bucket_by),
                                   n_buckets=n_buckets,
                                   watermark_col=watermark_col,
                                   incremental_strategy=incremental_strategy,
                                   unique_key=tuple(unique_key),
                                   on_schema_change=on_schema_change,
                                   tags=tuple(tags),
                                   zorder_by=tuple(zorder_by),
                                   zorder_files=zorder_files,
                                   tests=tuple(tests),
                                   pre_hook=tuple(pre_hook),
                                   post_hook=tuple(post_hook),
                                   contract=tuple(tuple(c) for c in contract),
                                   doc=fn.__doc__ or ""))
            return fn

        return deco

    def sql_model(self, name: str, sql_text: str, *,
                  materialized: str = "view", **model_kwargs) -> None:
        """Register a model from its dbt SQL TEXT — the porting path for
        existing dbt projects (core/sqlmodel.py): ``{{ ref() }}`` /
        ``{{ source() }}`` calls become DAG edges, the Jinja-lite macro
        subset renders to Spark SQL, and the model runs through the same
        Runner/materialization/test machinery as a Python model.

            registry.sql_model("stg_loans",
                "select * from {{ ref('raw_loans') }}",
                materialized="view")
        """
        from .sqlmodel import register_sql_model

        register_sql_model(self, name, sql_text,
                           materialized=materialized, **model_kwargs)

    def manifest(self) -> dict:
        """The ``dbt docs generate`` manifest analog [public knowledge:
        dbt-core manifest.json]: one JSON-able node per model with its ref
        edges, materialization, partition layout, doc string, and the
        DAG's execution order — everything a lineage UI or an orchestration
        layer needs, derivable without running anything."""
        known = set(self._models) | {d for m in self._models.values()
                                     for d in m.deps}
        for e in self._exposures.values():
            missing = [d for d in e.depends_on if d not in known]
            if missing:
                raise ValueError(f"exposure {e.name}: depends_on unknown "
                                 f"nodes {missing}")
        order = self.topo_order()
        return {
            "nodes": {
                m.name: {
                    "depends_on": list(m.deps),
                    "materialized": m.materialized,
                    "partition_by": list(m.partition_by),
                    "bucket_by": list(m.bucket_by),
                    "n_buckets": m.n_buckets,
                    "watermark_col": m.watermark_col,
                    "incremental_strategy": m.incremental_strategy,
                    "unique_key": list(m.unique_key),
                    "on_schema_change": m.on_schema_change,
                    "tags": list(m.tags),
                    "zorder_by": list(m.zorder_by),
                    "zorder_files": m.zorder_files,
                    "contract": [list(c) for c in m.contract],
                    "tests": [t.name for t in m.tests],
                    "description": m.doc,
                    "group": m.group,
                    "access": m.access,
                } for m in self._models.values()
            },
            "sources": sorted({d for m in self._models.values()
                               for d in m.deps if d not in self._models}),
            "exposures": {
                e.name: {
                    "depends_on": list(e.depends_on),
                    "type": e.type,
                    "owner": e.owner,
                    "url": e.url,
                    "description": e.doc,
                } for e in self._exposures.values()
            },
            "execution_order": order,
        }

    def topo_order(self, select: list[str] | None = None) -> list[str]:
        """Topological execution order over ref edges (dbt run semantics;
        reference: README.md:50-51).  ``select`` limits to those models plus
        their upstream closure.  Deps that are not registered models are
        treated as sources the caller must provide."""
        wanted = set(select or self._models)
        # expand upstream closure
        frontier = list(wanted)
        while frontier:
            n = frontier.pop()
            if n not in self._models:
                continue
            for d in self._models[n].deps:
                if d in self._models and d not in wanted:
                    wanted.add(d)
                    frontier.append(d)

        order: list[str] = []
        state: dict[str, int] = {}  # 0=visiting, 1=done

        def visit(n: str) -> None:
            if n not in self._models or n not in wanted:
                return
            if state.get(n) == 1:
                return
            if state.get(n) == 0:
                raise ValueError(f"cycle through model {n}")
            state[n] = 0
            for d in self._models[n].deps:
                visit(d)
            state[n] = 1
            order.append(n)

        for n in sorted(wanted):
            visit(n)
        return order


# The default registry used by the Fiction Bank project.
DEFAULT_REGISTRY = ModelRegistry()
model = DEFAULT_REGISTRY.model
