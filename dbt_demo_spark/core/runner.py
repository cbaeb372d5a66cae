"""Topo-sort model runner — the Spark-native ``dbt run``.

Materialization mirrors the reference policy (dbt_project.yml:17-22), plus
the incremental mode the reference's table-rebuild policy scales into:

  * ``view``  -> ``createOrReplaceTempView`` + the lazy DataFrame is passed
    downstream.  Zero storage, recomputed on read — exactly a SQL view, and
    Catalyst inlines it into consumers so column pruning / predicate
    pushdown cross the view boundary for free.
  * ``table`` -> written as parquet under the warehouse dir (partitioned by
    the model's ``partition_by`` columns) and read back, so downstream
    models consume the materialized table rather than recomputing the
    lineage — the same compute-once semantics as dbt's CREATE TABLE AS,
    and at 100 TB the partition columns give static/dynamic partition
    pruning on every downstream read.
  * ``incremental`` -> overwrite-partition semantics (dbt's public
    ``incremental`` materialization with the insert_overwrite strategy):
    the first run writes the full partitioned table; later runs overwrite
    ONLY the partitions present in the model's output
    (``partitionOverwriteMode=dynamic``), so a run fed one new month of
    source data rewrites one partition instead of rescanning/rewriting the
    whole mart — the difference between O(day) and O(history) work at
    100 TB.  Requires ``partition_by``.
  * ``table`` + ``bucket_by``/``n_buckets`` -> bucketed table through the
    session catalog (``bucketBy().sortBy().saveAsTable``): rows hash-
    clustered on the declared join keys at WRITE time, so two marts
    bucketed on the same keys with the same count join with ZERO
    exchanges — the fact-to-fact shuffle paid once per build instead of
    once per query, the classic co-located-join layout for 100 TB marts.
  * ``ephemeral`` -> dbt's compile-time-inline materialization [public
    knowledge: dbt ephemeral models are interpolated into consumers as
    CTEs, never created in the warehouse].  Here the model's DataFrame is
    passed to downstream refs but NO temp view is registered and nothing
    is written — Catalyst inlines the logical plan into each consumer, so
    pruning/pushdown cross the boundary exactly as a CTE would, and the
    name never becomes addressable in the session catalog.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import shutil
import tempfile
import threading
import time
from dataclasses import dataclass, field, replace
from urllib.parse import unquote, urlparse

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .datatests import DataTestResult, run_data_tests
from .model import ModelRegistry


@dataclass
class NodeResult:
    """Per-node outcome of a ``Runner.build`` pass (dbt build's run_results
    row [public knowledge: dbt run_results.json]): ``success`` (model built
    and every attached test passed), ``fail`` (the model raised, or an
    attached test found violations), or ``skipped`` (an ancestor failed —
    dbt's "skipped upon upstream failure")."""
    name: str
    status: str                       # "success" | "fail" | "skipped"
    error: str | None = None          # model exception, if any
    tests: list[DataTestResult] = field(default_factory=list)
    seconds: float = 0.0              # model + attached-test wall time


@dataclass
class BuildResult:
    relations: dict[str, DataFrame]   # sources + every model that BUILT
    nodes: dict[str, NodeResult]

    @property
    def ok(self) -> bool:
        return all(n.status == "success" for n in self.nodes.values())

    def counts(self) -> dict[str, int]:
        out = {"success": 0, "fail": 0, "skipped": 0}
        for n in self.nodes.values():
            out[n.status] += 1
        return out

    def to_json(self) -> dict:
        """The run_results.json artifact shape [public knowledge: dbt
        writes per-node status/timing/failure artifacts each invocation]."""
        return {
            "counts": self.counts(),
            "nodes": {
                n.name: {
                    "status": n.status,
                    "error": n.error,
                    "seconds": round(n.seconds, 3),
                    "tests": [{"name": t.name, "passed": t.passed,
                               "violations": t.violations,
                               "severity": t.severity}
                              for t in n.tests],
                } for n in self.nodes.values()
            },
        }


class Runner:
    def __init__(self, spark: SparkSession, registry: ModelRegistry,
                 warehouse_dir: str | None = None,
                 catalog_namespace: str | None = None,
                 on_run_start: tuple = (),
                 on_run_end: tuple = (),
                 store_failures: bool = False,
                 source_event_time: dict | None = None) -> None:
        self.spark = spark
        self.registry = registry
        # X96 microbatch: event_time declarations for RAW sources (plain
        # DataFrames handed to run(), which carry no ModelDef) — dbt's
        # sources-YAML `event_time` analog.  Registry models declare
        # theirs on ModelDef.event_time.
        self.source_event_time = dict(source_event_time or {})
        # dbt's project-level on-run-start / on-run-end hooks [public
        # knowledge: dbt_project.yml on-run-start/on-run-end] — SQL
        # strings or (spark, relations) callables, run once around every
        # run()/build() pass; on_run_end runs even when nodes failed
        # (dbt's behavior — audit hooks must see failures too)
        self.on_run_start = tuple(on_run_start)
        self.on_run_end = tuple(on_run_end)
        # dbt store_failures [public knowledge]: persist each failing
        # test's violating rows under <warehouse>/_test_failures/<name>
        self.store_failures = store_failures
        self._full_refresh = False
        self._empty = False
        self._batch_id: int | None = None
        self.warehouse_dir = warehouse_dir or tempfile.mkdtemp(prefix="sparkbank_wh_")
        # Catalog-table namespace: the session catalog is GLOBAL, so two
        # runners materializing a same-named bucketed model would silently
        # clobber each other's entry and the loser's clean() would drop the
        # survivor's table (ADVICE r6).  Default: a digest of the warehouse
        # dir — distinct warehouses never collide; pass "" to opt out
        # (single-runner sessions that want bare catalog names).
        if catalog_namespace is None:
            catalog_namespace = "wh_" + hashlib.sha1(
                os.path.abspath(self.warehouse_dir).encode()).hexdigest()[:10]
        self.catalog_namespace = catalog_namespace
        # bucketed models register SESSION-CATALOG tables (bucket metadata
        # lives in the catalog, not the files); track them so clean()
        # drops the entries along with the warehouse files — otherwise a
        # post-clean spark.table() would resolve to deleted paths.  The
        # model-name temp-view aliases over them are tracked for the same
        # reason.  (Aliases are session-global by name: with two live
        # runners sharing a model name, the later run's alias wins —
        # name-based access is a convenience; the namespaced catalog
        # table and the returned handle are the authoritative routes.)
        self._catalog_tables: set[str] = set()
        self._alias_views: set[str] = set()
        # refresh="changed" machinery: fingerprints of the last successful
        # build per model, persisted in the warehouse so a NEW Runner over
        # the same warehouse keeps skipping; memo + lock are per-run
        self._refresh_changed = False
        self._fp_memo: dict[str, str | None] = {}
        self._fp_lock = threading.Lock()
        self.last_refresh_report: dict = {"built": [], "skipped": []}
        # X96: model -> list of "[lo .. hi)" batch windows built last run
        self.last_microbatch_report: dict = {}

    @property
    def _state_path(self) -> str:
        return os.path.join(self.warehouse_dir, "_build_state.json")

    def _load_state(self) -> dict:
        try:
            with open(self._state_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _save_state(self, name: str, fingerprint: str | None) -> None:
        """Record (or, with None, drop) a model's build fingerprint.
        Read-modify-write under the lock (parallel runs build disjoint
        models, but they share this file); atomic rename so a crashed
        write can never half-corrupt the JSON into false skips."""
        with self._fp_lock:
            state = self._load_state()
            if fingerprint is None:
                if name not in state:
                    return
                del state[name]
            else:
                state[name] = fingerprint
            tmp = self._state_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(state, f)
            os.replace(tmp, self._state_path)

    def _drop_state(self, name: str) -> None:
        self._save_state(name, None)

    def catalog_name(self, model_name: str) -> str:
        """The session-catalog table name a bucketed model materializes
        under (namespaced per-runner; the model name itself stays the
        registry/relations key and is registered as a temp-view alias)."""
        if self.catalog_namespace:
            return f"{model_name}__{self.catalog_namespace}"
        return model_name

    def run(self, sources: dict[str, DataFrame],
            select: list[str] | str | None = None,
            exclude: str | None = None,
            threads: int = 1,
            cache_sources: bool = False,
            refresh: str = "full",
            state: dict | None = None,
            full_refresh: bool = False,
            empty: bool = False,
            batch_id: int | None = None) -> dict[str, DataFrame]:
        """Execute models in dependency order.  ``sources`` provides seed /
        external relations (the dbt-seed layer); returns every relation
        (sources + built models) by name.

        ``batch_id`` (X112, r14): exactly-once replay bookkeeping for
        ``aggregate``-strategy materializations driven by a micro-batch
        engine (streaming/ingest.aggregate_mart_maintenance).  Only the
        aggregate materialization consumes it — see
        ``_materialize_aggregate`` for the commit contract; other
        materializations in the same run simply rebuild (pass it only
        on single-aggregate-model maintenance runs).

        ``empty=True`` is dbt's ``--empty`` flag (X97 [public dbt
        surface: dbt-core 1.8 — schema-only dry runs for CI]): every
        model's refs are LIMIT-0'd before its fn runs, so the full DAG
        compiles, analyzes, materializes (empty relations with the real
        schemas), and enforces contracts without reading data — the
        cheap pre-merge gate.  Microbatch models raise under empty (no
        event_time rows means no batches to enumerate — documented).

        ``select`` / ``exclude`` take dbt's node-selection grammar when
        given as strings (``"+mart_x tag:nightly"``, ``"stg_*+2"``,
        ``"@stg_loans"`` — core/selection.py); a list of names keeps the
        legacy exact-name behavior.  Either way the runner still builds
        unselected ANCESTORS the targets need (topo_order's upstream
        closure) — parents here are in-memory views, not deferrable
        warehouse state.

        ``threads`` > 1 runs INDEPENDENT DAG branches concurrently — the
        dbt ``threads`` profile setting [public knowledge]: a model is
        submitted to the pool the moment its refs are built, so sibling
        staging models and independent mart writes overlap wall-clock.
        Spark job submission is thread-safe; each materialization is its
        own job, and on a busy cluster ``spark.scheduler.mode=FAIR`` keeps
        one giant mart from starving the short branches (the default FIFO
        still overlaps I/O + planning, which is most of what small models
        pay).  Results are identical to the sequential order because the
        dependency gate, not submission order, decides when a model
        runs (tested with a diamond DAG).

        ``cache_sources`` is the shared-scan idea (workload.run_workload)
        applied to a mart refresh: every SOURCE relation is persisted
        (Spark's default MEMORY_AND_DISK) for the run's duration, so N
        models fanning out from the same raw tables decode each source
        once instead of once per model — and unpersisted afterwards, win
        or lose, so the run leaves no cache dependence behind.  Worth
        switching on when several independent marts read the same sources
        (the refresh shape); a single-consumer DAG gains nothing.

        ``refresh="changed"`` skips rebuilding a materialized model whose
        whole upstream state is IDENTICAL to its last build — the
        source-partition-watermark refresh (dbt's state:modified deferral
        [public knowledge] applied at the file layer): a model's
        fingerprint chains its fn's source code, its materialization
        params, every upstream model's fingerprint, and the (path, size,
        mtime) of every FILE its source relations scan.  Unchanged ->
        read the existing table back (zero Spark jobs); any unknowable
        input (non-file source, unreadable fn source, bucketed catalog
        table) -> rebuilt, never guessed.  ``last_refresh_report`` lists
        what was built vs skipped."""
        if refresh not in ("full", "changed"):
            raise ValueError(f"refresh must be 'full' or 'changed', "
                             f"got {refresh!r}")
        if isinstance(select, str) or exclude:
            from .selection import select_nodes

            if isinstance(select, list):
                # legacy exact-name list, narrowed by the exclude grammar
                keep = set(select_nodes(self.registry, None, exclude,
                                        state=state))
                select = [n for n in select if n in keep]
            else:
                select = select_nodes(self.registry, select, exclude,
                                      state=state)
        self._refresh_changed = refresh == "changed"
        self._full_refresh = full_refresh
        self._empty = empty
        self._batch_id = batch_id
        self._fp_memo: dict[str, str | None] = {}
        self.last_refresh_report = {"built": [], "skipped": []}
        caches = []
        if cache_sources:
            for df in sources.values():
                caches.append(df.persist())
        out: dict[str, DataFrame] | None = None
        try:
            self._run_hooks(self.on_run_start, "run", dict(sources))
            if threads <= 1:
                relations: dict[str, DataFrame] = dict(sources)
                for name in self.registry.topo_order(select):
                    relations[name] = self._build_model(name, relations)
                out = relations
            else:
                out = self._run_parallel(sources, select, threads)
            return out
        finally:
            for df in caches:
                df.unpersist()
            # on_run_end sees whatever completed (dbt passes results);
            # it runs even when the pass raised, like dbt's
            self._run_hooks(self.on_run_end, "run",
                            out if out is not None else dict(sources))

    def build(self, sources: dict[str, DataFrame],
              select: list[str] | str | None = None,
              exclude: str | None = None,
              threads: int = 1,
              refresh: str = "full",
              state: dict | None = None,
              full_refresh: bool = False,
              empty: bool = False) -> BuildResult:
        """The ``dbt build`` analog [public knowledge: dbt build runs
        models and their tests interleaved in DAG order]: materialize each
        model, IMMEDIATELY run its attached ``tests`` (ModelDef.tests),
        and gate every descendant on the outcome — a failing test (or a
        raising model) marks the node ``fail`` and all its transitive
        descendants ``skipped``, while independent branches keep building.
        Unlike ``run``, model errors are captured per-node rather than
        aborting the pass (dbt build reports per-node status and exits
        non-zero at the end).

        A failed model's relation is still registered in ``relations``
        when it materialized (the table exists in the warehouse — dbt
        leaves it too); only scheduling treats it as poisoned.  Selection
        grammar and ``threads`` behave exactly as in ``run``: the
        dependency gate decides when a node starts, so results are
        identical at any thread count."""
        if refresh not in ("full", "changed"):
            raise ValueError(f"refresh must be 'full' or 'changed', "
                             f"got {refresh!r}")
        if isinstance(select, str) or exclude:
            from .selection import select_nodes

            if isinstance(select, list):
                keep = set(select_nodes(self.registry, None, exclude,
                                        state=state))
                select = [n for n in select if n in keep]
            else:
                select = select_nodes(self.registry, select, exclude,
                                      state=state)
        self._refresh_changed = refresh == "changed"
        self._full_refresh = full_refresh
        self._empty = empty
        self._batch_id = None
        self._fp_memo = {}
        self.last_refresh_report = {"built": [], "skipped": []}

        relations: dict[str, DataFrame] = dict(sources)
        nodes: dict[str, NodeResult] = {}
        poisoned: set[str] = set()        # failed or skipped node names
        built: set[str] = set(sources)    # names whose relation is usable

        # a registered model arriving pre-built in ``sources`` (the retry
        # path seeds prior successes this way) is an artifact to REUSE,
        # not a node to rebuild — dbt retry's contract
        try:
            self._run_hooks(self.on_run_start, "run", dict(sources))
            pending = [n for n in self.registry.topo_order(select)
                       if n not in built]
            self._build_loop(pending, built, poisoned, relations, nodes,
                             threads)
        finally:
            # audit hooks must see failures AND aborts (r11 review: a
            # selector typo after on_run_start skipped the end hook)
            self._run_hooks(self.on_run_end, "run", dict(relations))
        result = BuildResult(relations=relations, nodes=nodes)
        # the dbt run_results.json artifact, refreshed per invocation
        os.makedirs(self.warehouse_dir, exist_ok=True)
        tmp = os.path.join(self.warehouse_dir, "run_results.json.tmp")
        with open(tmp, "w") as f:
            json.dump(result.to_json(), f, indent=1)
        os.replace(tmp,
                   os.path.join(self.warehouse_dir, "run_results.json"))
        return result

    def _build_loop(self, pending, built, poisoned, relations, nodes,
                    threads) -> None:
        from concurrent.futures import (FIRST_COMPLETED, ThreadPoolExecutor,
                                        wait)

        def work(name: str):
            t0 = time.perf_counter()
            df = self._build_model(name, dict(relations))
            mdef = self.registry[name]
            trs: list[DataTestResult] = []
            if mdef.tests:
                rel = dict(relations)
                rel[name] = df
                trs = run_data_tests(
                    list(mdef.tests), rel,
                    store_failures_dir=(
                        os.path.join(self.warehouse_dir, "_test_failures")
                        if self.store_failures else None))
            return df, trs, time.perf_counter() - t0

        with ThreadPoolExecutor(max(1, threads)) as ex:
            in_flight: dict = {}
            while pending or in_flight:
                still = []
                for n in pending:
                    deps = self.registry[n].deps
                    if any(d in poisoned for d in deps):
                        nodes[n] = NodeResult(n, "skipped")
                        poisoned.add(n)
                    elif all(d in built for d in deps):
                        in_flight[ex.submit(work, n)] = n
                    else:
                        still.append(n)
                if len(still) == len(pending) and not in_flight:
                    missing = {n: [d for d in self.registry[n].deps
                                   if d not in built and d not in poisoned]
                               for n in still}
                    raise KeyError(f"unresolved refs: {missing}")
                pending = still
                if not in_flight:
                    continue    # a skip cascade may unblock more skips
                done, _ = wait(in_flight, return_when=FIRST_COMPLETED)
                for fut in done:
                    name = in_flight.pop(fut)
                    try:
                        df, trs, secs = fut.result()
                    except Exception as exc:  # noqa: BLE001 — per-node report
                        nodes[name] = NodeResult(
                            name, "fail",
                            error=f"{type(exc).__name__}: {exc}")
                        poisoned.add(name)
                        continue
                    relations[name] = df
                    # warn-severity test failures record but never gate
                    # (dbt severity: warn [public knowledge])
                    if all(t.gating for t in trs):
                        nodes[name] = NodeResult(name, "success", tests=trs,
                                                 seconds=secs)
                        built.add(name)
                    else:
                        nodes[name] = NodeResult(name, "fail", tests=trs,
                                                 seconds=secs)
                        poisoned.add(name)

    def retry(self, sources: dict[str, DataFrame], prior: "BuildResult",
              threads: int = 1) -> "BuildResult":
        """The ``dbt retry`` analog [public knowledge: dbt retry re-runs
        the nodes that failed or were skipped in the previous invocation,
        reusing prior successes instead of rebuilding them]: seed the
        prior build's successful relations as pre-built artifacts, then
        build ONLY the failed/skipped set — their deps resolve from the
        seeds, the skip cascade re-evaluates (a fixed model un-skips its
        descendants), and the returned run_results covers exactly the
        re-run nodes, like dbt's.  A prior pass with nothing to redo
        returns unchanged."""
        redo = [n for n, r in prior.nodes.items()
                if r.status in ("fail", "skipped")]
        if not redo:
            return prior
        seeded = dict(sources)
        for n, r in prior.nodes.items():
            if r.status == "success" and n in prior.relations:
                seeded[n] = prior.relations[n]
        return self.build(seeded, select=redo, threads=threads)

    def _fingerprint(self, name: str,
                     relations: dict[str, DataFrame]) -> str | None:
        """Build-state fingerprint of ``name``'s whole upstream cone: the
        model fn's source text, its materialization params, every upstream
        MODEL's fingerprint (recursively), and — per SOURCE relation —
        both the (path, size, mtime_ns) of every file it scans
        (``df.inputFiles()``; the local-FS stat here is the HDFS/S3
        FileStatus call at cluster scale) AND its CANONICALIZED logical
        plan (expression ids normalized, so it is stable across sessions):
        a caller that re-filters / re-projects / schema-overrides the same
        files is a CHANGED source even though the files match.  None =
        unknowable (non-file source, remote URI, unreadable fn source) and
        poisons the whole cone: those models always rebuild, never
        guess."""
        with self._fp_lock:
            if name in self._fp_memo:
                return self._fp_memo[name]
        mdef = self.registry[name]
        parts = [name, mdef.materialized, ",".join(mdef.partition_by),
                 ",".join(mdef.bucket_by), str(mdef.n_buckets),
                 mdef.watermark_col, ",".join(mdef.zorder_by),
                 str(mdef.zorder_files),
                 ",".join("=".join(c) for c in mdef.contract),
                 # EVERY materialization-affecting field participates: a
                 # changed strategy / merge key / fold spec / schema
                 # policy / microbatch window must rebuild — omitting
                 # them let refresh="changed" false-skip onto a table
                 # built under the OLD semantics (r13 review)
                 mdef.incremental_strategy, ",".join(mdef.unique_key),
                 ",".join(f"{c}={fn}" for c, fn in mdef.combine),
                 mdef.on_schema_change, mdef.event_time, mdef.batch_size,
                 str(mdef.lookback), mdef.begin]
        try:
            parts.append(inspect.getsource(mdef.fn))
            # SQL-text models share the adapter factory's Python source;
            # their actual code is the SQL text stashed on the fn
            parts.append(getattr(mdef.fn, "__sql_text__", ""))
            # hooks are part of the materialization: a changed hook must
            # rebuild; an unsourceable hook callable is unknowable
            for h in (*mdef.pre_hook, *mdef.post_hook):
                parts.append("hook:" + (h if isinstance(h, str)
                                        else inspect.getsource(h)))
        except (OSError, TypeError):
            parts = None
        if parts is not None:
            for d in sorted(mdef.deps):
                if d in self.registry:
                    sub = self._fingerprint(d, relations)
                    if sub is None:
                        parts = None
                        break
                    parts.append(f"{d}:{sub}")
                    continue
                src = relations[d]
                files = sorted(src.inputFiles())
                if not files:
                    parts = None  # in-memory / non-file source
                    break
                parts.append(f"{d}~" + src._jdf.queryExecution().analyzed()
                             .canonicalized().toString())
                for uri in files:
                    u = urlparse(uri)
                    if u.scheme not in ("", "file"):
                        parts = None  # remote FS: no stat client here
                        break
                    try:
                        st = os.stat(unquote(u.path))
                    except OSError:
                        parts = None
                        break
                    parts.append(f"{d}|{uri}|{st.st_size}|{st.st_mtime_ns}")
                if parts is None:
                    break
        fp = (None if parts is None
              else hashlib.sha1("\n".join(parts).encode()).hexdigest())
        with self._fp_lock:
            self._fp_memo[name] = fp
        return fp

    def _try_skip(self, name: str, mdef,
                  relations: dict[str, DataFrame]) -> DataFrame | None:
        """refresh="changed": reuse the existing materialization when the
        upstream fingerprint matches the recorded one.  Only plain
        path-backed layouts (table without buckets, incremental) are
        skippable — a bucketed model's bucket metadata lives in the
        session catalog, which a fresh session does not carry, so it
        rebuilds rather than silently losing its zero-exchange property."""
        if (not self._refresh_changed
                or mdef.materialized not in ("table", "incremental")
                or mdef.bucket_by):
            return None
        path = os.path.join(self.warehouse_dir, name)
        if not os.path.isdir(path):
            return None
        fp = self._fingerprint(name, relations)
        if fp is None or self._load_state().get(name) != fp:
            return None
        return self._read_back(name, path)

    @staticmethod
    def _enforce_contract(name: str, df: DataFrame,
                          contract: tuple) -> None:
        """dbt model contract enforcement: the model's ACTUAL schema must
        carry exactly the declared (column, type) pairs — missing, extra,
        or type-diverged columns fail the build BEFORE anything
        materializes (plan-time check, no job runs).  Types compare on
        Catalyst's simpleString ("bigint", "decimal(10,2)",
        "array<double>"…), order-insensitive like dbt's check."""
        actual = {f.name: f.dataType.simpleString() for f in df.schema}
        declared = dict(contract)
        problems = []
        # duplicate output names (e.g. an undisambiguated join) would
        # collapse into one dict entry and silently pass a single-column
        # declaration with the LAST field's type winning (ADVICE r8) —
        # catch them before the per-column checks
        if len(actual) != len(df.schema):
            seen: set = set()
            dups = sorted({f.name for f in df.schema
                           if f.name in seen or seen.add(f.name)})
            problems.append(f"duplicate column name(s) {dups} — a "
                            "contracted schema must name each column once")
        for col, typ in declared.items():
            if col not in actual:
                problems.append(f"missing column {col} ({typ})")
            elif actual[col] != typ:
                problems.append(f"column {col}: declared {typ}, "
                                f"got {actual[col]}")
        problems += [f"undeclared column {c} ({t})"
                     for c, t in actual.items() if c not in declared]
        if problems:
            raise ValueError(f"model {name}: contract violation — "
                             + "; ".join(problems))

    def _run_hooks(self, hooks: tuple, name: str,
                   relations: dict[str, DataFrame]) -> None:
        """dbt pre-hook / post-hook execution: SQL strings run via
        ``spark.sql`` with ``{name}`` interpolated (dbt's ``{{ this }}``);
        callables get ``(spark, relations)``.  Hooks run in declaration
        order; a raising hook fails the model (dbt's behavior — hooks are
        part of the materialization)."""
        for h in hooks:
            if isinstance(h, str):
                self.spark.sql(h.format(name=name))
            else:
                h(self.spark, relations)

    def _build_model(self, name: str,
                     relations: dict[str, DataFrame]) -> DataFrame:
        mdef = self.registry[name]
        missing = [d for d in mdef.deps if d not in relations]
        if missing:
            raise KeyError(f"model {name}: unresolved refs {missing}")
        # --full-refresh means REBUILD: a fingerprint match must not
        # skip the rebuild the caller explicitly asked for (r11 review).
        # --empty never reuses a prior FULL-data table either — the dry
        # run's contract is empty relations with real schemas
        skipped = (None if self._full_refresh or self._empty
                   else self._try_skip(name, mdef, relations))
        if skipped is not None:
            self.last_refresh_report["skipped"].append(name)
            return skipped
        refs = {d: relations[d] for d in mdef.deps}
        if getattr(self, "_empty", False):
            # dbt --empty (X97): LIMIT 0 on every ref — the model's
            # transformations analyze and the write produces an empty
            # relation with the REAL schema; contracts still enforce
            refs = {d: df.limit(0) for d, df in refs.items()}
        state_tracked = (mdef.materialized in ("table", "incremental")
                         and not mdef.bucket_by)
        if state_tracked:
            # clear the recorded state BEFORE touching the table: a crash
            # between the parquet write and the post-build save would
            # otherwise leave the OLD fingerprint paired with NEW table
            # bytes — a later run under the old definition would false-skip
            self._drop_state(name)
        self._run_hooks(mdef.pre_hook, name, dict(relations))
        wants_ctx = bool(mdef.watermark_col) or getattr(
            mdef.fn, "__wants_incremental_ctx__", False)
        if (mdef.materialized == "incremental"
                and mdef.incremental_strategy == "microbatch"):
            if self._empty:
                # documented in run(): microbatch is incompatible with
                # --empty — LIMIT-0 refs carry no event_time rows, so
                # batch enumeration is impossible; without this guard the
                # 'quiet upstreams' branch would serve the prior FULL
                # table during a dry run (ADVICE r12)
                raise ValueError(
                    f"model {name}: microbatch models cannot run under "
                    "--empty — LIMIT-0 refs leave no event_time rows to "
                    "enumerate batches from")
            if wants_ctx:
                raise ValueError(
                    f"model {name}: is_incremental()/{{{{ this }}}} inside "
                    "a microbatch model is unsupported — microbatch "
                    "models are plain per-batch transformations; the "
                    "batch window replaces the watermark idiom")
            df = self._materialize_microbatch(name, mdef, refs)
            if mdef.contract:
                self._enforce_contract(name, df, mdef.contract)
            if mdef.post_hook:
                rels = dict(relations)
                rels[name] = df
                self._run_hooks(mdef.post_hook, name, rels)
            self.last_refresh_report["built"].append(name)
            if state_tracked and not self._empty:
                fp = self._fingerprint(name, relations)
                if fp is not None:
                    self._save_state(name, fp)
            return df
        if mdef.materialized == "incremental" and wants_ctx:
            from .model import IncrementalContext

            # dbt --full-refresh [public knowledge]: the model rebuilds
            # from scratch — is_incremental() is false and the existing
            # table is replaced below, not partition-patched
            ctx = (IncrementalContext(is_incremental=False)
                   if self._full_refresh
                   else self._incremental_context(name, mdef))
            df = mdef.fn(refs, ctx)
        else:
            df = mdef.fn(refs)
        if mdef.contract:
            self._enforce_contract(name, df, mdef.contract)
        if mdef.materialized == "table":
            df = self._materialize_table(name, df, mdef.partition_by,
                                         mdef.bucket_by, mdef.n_buckets,
                                         mdef.zorder_by, mdef.zorder_files)
        elif mdef.materialized == "incremental":
            if self._empty:
                # --empty dry run: NEVER route the LIMIT-0 output through
                # the incremental/merge write paths — dynamic partition
                # overwrite with zero partitions (and merge's keep-old
                # union) leaves the existing FULL table in place, and
                # _read_back would then serve prior full data during a
                # dry run (ADVICE r12).  The dry run's contract is an
                # empty relation with the real schema; the on-disk table
                # is deliberately left untouched (non-destructive), and
                # no build state is recorded below so the next real run
                # rebuilds.
                df.createOrReplaceTempView(name)
                self.last_refresh_report["built"].append(name)
                if mdef.post_hook:
                    rels = dict(relations)
                    rels[name] = df
                    self._run_hooks(mdef.post_hook, name, rels)
                return df
            if self._full_refresh:
                path = os.path.join(self.warehouse_dir, name)
                if os.path.isdir(path):
                    shutil.rmtree(path)
            if mdef.incremental_strategy == "merge":
                df = self._materialize_merge(name, df, mdef.partition_by,
                                             mdef.unique_key,
                                             mdef.on_schema_change)
            elif mdef.incremental_strategy == "aggregate":
                df = self._materialize_aggregate(
                    name, df, mdef.partition_by, mdef.unique_key,
                    mdef.combine, mdef.on_schema_change)
            else:
                df = self._materialize_incremental(name, df,
                                                   mdef.partition_by,
                                                   mdef.on_schema_change)
        elif mdef.materialized == "ephemeral":
            pass  # inlined into consumers; no view, no storage
        else:
            df.createOrReplaceTempView(name)
        if mdef.post_hook:
            rels = dict(relations)
            rels[name] = df
            self._run_hooks(mdef.post_hook, name, rels)
        self.last_refresh_report["built"].append(name)
        # NEVER record build state for an --empty run: the fingerprint
        # covers code+upstream only, not the flag, so a later
        # refresh="changed" run would false-skip and serve the EMPTY
        # table as real data (ADVICE r12).  _drop_state above already
        # cleared any prior state, which is exactly right — the next
        # real run must rebuild.
        if state_tracked and not self._empty:
            # record the build state on EVERY successful materialization
            # (not just refresh="changed" runs) so the first changed-mode
            # run over a warehouse built normally can already skip
            fp = self._fingerprint(name, relations)
            if fp is not None:
                self._save_state(name, fp)
        return df

    def _run_parallel(self, sources: dict[str, DataFrame],
                      select: list[str] | None,
                      threads: int) -> dict[str, DataFrame]:
        from concurrent.futures import (FIRST_COMPLETED, ThreadPoolExecutor,
                                        wait)

        relations: dict[str, DataFrame] = dict(sources)
        pending = list(self.registry.topo_order(select))
        with ThreadPoolExecutor(threads) as ex:
            in_flight: dict = {}
            while pending or in_flight:
                # a model is ready iff every ref resolves NOW; refs to
                # not-yet-built models keep it pending
                ready = [n for n in pending
                         if all(d in relations
                                for d in self.registry[n].deps)]
                for n in ready:
                    pending.remove(n)
                    # snapshot the refs under the current relations state;
                    # dict reads are safe — only this thread writes it
                    in_flight[ex.submit(self._build_model, n,
                                        dict(relations))] = n
                if not in_flight:
                    # nothing runnable and nothing running: unresolved refs
                    missing = {n: [d for d in self.registry[n].deps
                                   if d not in relations]
                               for n in pending}
                    raise KeyError(f"unresolved refs: {missing}")
                done, _ = wait(in_flight, return_when=FIRST_COMPLETED)
                for fut in done:
                    name = in_flight.pop(fut)
                    relations[name] = fut.result()  # re-raises model errors
        return relations

    def _materialize_table(self, name: str, df: DataFrame,
                           partition_by: tuple[str, ...],
                           bucket_by: tuple[str, ...] = (),
                           n_buckets: int = 0,
                           zorder_by: tuple[str, ...] = (),
                           zorder_files: int = 0) -> DataFrame:
        path = os.path.join(self.warehouse_dir, name)
        if zorder_by:
            # Morton-clustered file layout (operators/layout.py): range-
            # partition on the Z value so each file covers one compact
            # hyper-rectangle of the zorder_by space — multi-dimensional
            # data skipping via parquet footer stats, next to partition_by
            # (directory pruning, one dim) and bucket_by (join clustering).
            # With partition_by the range shuffle leads with the partition
            # keys so each partition directory gets its own Z-run of files.
            from ..operators.layout import zorder_column

            zc = "__zval__"
            keys = [F.col(c) for c in partition_by] + [F.col(zc)]
            df = df.withColumn(zc, zorder_column(df, list(zorder_by)))
            # an explicit zorder_files pins the file count (a skipping
            # layout wants MANY small Z-ranges; AQE would coalesce them)
            df = (df.repartitionByRange(zorder_files, *keys)
                  if zorder_files else df.repartitionByRange(*keys))
            df = df.sortWithinPartitions(zc).drop(zc)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if bucket_by:
            # BUCKETED table: hash-clustered (and sorted) on the declared
            # join keys, registered through the session catalog — bucket
            # metadata lives there, not in the files, so downstream reads
            # MUST come from spark.table(), which this returns.  Two marts
            # bucketed on the same keys with the same bucket count join
            # WITHOUT any Exchange (plan-asserted in tests/
            # test_bucketing.py) — at 100 TB this is the shuffle a
            # fact-to-fact join cannot otherwise avoid, paid ONCE at write
            # time instead of per query.
            if n_buckets <= 0:
                raise ValueError(
                    f"model {name}: bucket_by requires n_buckets > 0")
            cat_name = self.catalog_name(name)
            # ONE FILE PER BUCKET (r15, VERDICT r14 item 6): a bucketed
            # scan can only claim its sortBy order — letting downstream
            # sort-merge joins skip their per-query fact-size Sorts
            # entirely (session.py sets
            # spark.sql.legacy.bucketedTableScan.outputOrdering) — when
            # every bucket is a single file; a multi-task write had been
            # leaving writer-count x n_buckets files (sf1: 10 per bucket),
            # silently discarding the sorted layout the write paid for.
            # repartition on the bucket keys uses the same murmur3 pmod as
            # the bucket id, so each write task holds exactly one bucket.
            # The extra exchange is a BUILD-time cost, paid once per
            # layout; serve plans drop 2 Sort nodes (measured sf1:
            # mart_bucketed_revenue 0.53 -> 0.30 s interleaved min).
            df_bk = df.repartition(n_buckets, *[F.col(c) for c in bucket_by])
            w = df_bk.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            (w.option("path", path)
             .bucketBy(n_buckets, *bucket_by)
             .sortBy(*bucket_by)
             .saveAsTable(cat_name))
            # a leftover temp view of the same name (e.g. a prior run of
            # this model as a view in the same session) would shadow the
            # catalog table and silently drop the bucket metadata
            self.spark.catalog.dropTempView(cat_name)
            self._catalog_tables.add(cat_name)
            out = self.spark.table(cat_name)
            # temp-view ALIAS under the model name: name-based spark.sql
            # access keeps working, and a view is just a named logical plan
            # over the catalog relation — bucket metadata rides through.
            # Tracked so clean() drops it along with the table — a
            # surviving alias over a dropped table would dangle on the
            # deleted path (r7 self-review finding).
            out.createOrReplaceTempView(name)
            self._alias_views.add(name)
            return out
        if n_buckets:
            raise ValueError(
                f"model {name}: n_buckets without bucket_by — declare the "
                "bucket key columns or drop n_buckets")
        writer.parquet(path)
        return self._read_back(name, path)

    def _incremental_context(self, name: str, mdef) -> "IncrementalContext":
        """The dbt ``is_incremental()`` + ``max({{ this }}.col)`` pattern
        [public knowledge: dbt incremental models]: on a refresh run, read
        the high-water mark of ``watermark_col`` from the model's EXISTING
        table and hand it to the model fn, which bounds its source scans to
        rows past it — the refresh then reads O(new data) instead of
        O(history), and the dynamic partition overwrite below rewrites only
        the partitions those rows land in.  The watermark read itself is a
        single MAX over the mart: parquet footer min/max statistics make it
        a metadata-weight scan even on a 100 TB table."""
        from pyspark.sql import functions as F

        from .model import IncrementalContext

        path = os.path.join(self.warehouse_dir, name)
        if not os.path.isdir(path):
            return IncrementalContext(is_incremental=False)
        existing = self.spark.read.parquet(path)
        if not mdef.watermark_col:
            # SQL-text models ({{ this }} / is_incremental()) carry the
            # watermark logic in their own SQL; hand them the existing
            # relation.  An EMPTY existing table is a first build — the
            # dbt-verbatim `ts > (select max(ts) from this)` guard would
            # compare against NULL and silently drop every source row
            # forever (same posture as the all-NULL watermark below).
            if existing.limit(1).count() == 0:
                return IncrementalContext(is_incremental=False)
            return IncrementalContext(is_incremental=True, this=existing)
        if mdef.watermark_col not in existing.columns:
            raise ValueError(
                f"model {name}: watermark_col {mdef.watermark_col!r} not in "
                f"existing table columns {existing.columns}")
        prev = existing.agg(
            F.max(mdef.watermark_col).alias("wm")).first().wm
        if prev is None:
            # an existing table whose watermark column is all-NULL gives no
            # usable high-water mark; the documented `col > watermark`
            # filter would compare against NULL and silently drop every
            # source row forever — treat it as a first build instead
            return IncrementalContext(is_incremental=False)
        return IncrementalContext(is_incremental=True, watermark=prev,
                                  this=existing)

    def _check_schema_change(self, name: str, df: DataFrame, path: str,
                             policy: str) -> bool:
        """dbt's ``on_schema_change`` [public knowledge] for incremental
        models, against parquet's file-schema reality:

          * ``ignore`` (default) — write as-is; files may carry mixed
            schemas, and the plain read-back resolves them Spark's way
            (dbt's ignore likewise leaves the table schema alone);
          * ``fail`` — any column added or removed vs the existing table
            raises before anything is written;
          * ``append_new_columns`` — write as-is and read the table back
            with ``mergeSchema`` so the UNION schema is visible: old
            partitions show NULL for added columns, new partitions NULL
            for removed ones.

        Returns whether the read-back needs mergeSchema."""
        if policy == "ignore" or not os.path.isdir(path):
            return False
        old = self.spark.read.parquet(path).columns
        added = [c for c in df.columns if c not in old]
        removed = [c for c in old if c not in df.columns]
        if not added and not removed:
            return False
        if policy == "fail":
            raise ValueError(
                f"model {name}: schema changed (added {added}, removed "
                f"{removed}) and on_schema_change='fail'")
        return True  # append_new_columns

    def _materialize_incremental(self, name: str, df: DataFrame,
                                 partition_by: tuple[str, ...],
                                 on_schema_change: str = "ignore") -> DataFrame:
        """Overwrite-partition incremental build: replace exactly the
        partitions the model emitted this run, leave the rest on disk."""
        if not partition_by:
            raise ValueError(
                f"model {name}: incremental materialization requires partition_by")
        path = os.path.join(self.warehouse_dir, name)
        merge_schema = self._check_schema_change(name, df, path,
                                                 on_schema_change)
        (
            df.write.mode("overwrite")
            # per-write dynamic mode: 'overwrite' replaces only partitions
            # present in df, not the whole table (Spark's public
            # spark.sql.sources.partitionOverwriteMode=dynamic, scoped here)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(path)
        )
        return self._read_back(name, path, merge_schema=merge_schema)

    def _materialize_microbatch(self, name: str, mdef,
                                relations: dict) -> DataFrame:
        """dbt's ``microbatch`` incremental strategy (X96 [public dbt
        surface: dbt-core 1.9 — incremental_strategy='microbatch' with
        event_time / batch_size / lookback / begin]): the refresh splits
        into INDEPENDENT per-period batches; for each batch, every
        upstream that declares an ``event_time`` (ModelDef.event_time
        for registry models, Runner(source_event_time=...) for raw
        sources — dbt's sources-YAML event_time analog) is filtered to
        the batch window before the model fn runs, and the batch's
        output replaces exactly its period's partitions (dynamic
        partition overwrite).  Upstreams without an event_time pass
        through whole — dims join fully in every batch, exactly dbt's
        behavior.

        DETERMINISM (this repo's discipline: no wall clocks): dbt bounds
        batches at ``now()``; here the upper bound is the MAX event_time
        observed across the filtered upstreams — data-driven, so a rerun
        over the same inputs enumerates the same batches.  First build
        starts at ``begin`` (required, as in dbt); a refresh reprocesses
        from ``lookback`` periods before the existing table's own max
        event_time (late-arriving data lands without a full rebuild).
        Each batch is independently retryable: a failure raises naming
        the batch window, with prior batches already committed —
        re-running resumes from the recorded bookmark.
        ``last_microbatch_report[name]`` lists the windows built.

        100 TB shape: this is the training-data backfill pattern — the
        event-time filter prunes the upstream scan to one period's
        partitions, each batch's shuffle is O(period) not O(table), and
        a year-long backfill is N independent period jobs."""
        import datetime as _dt

        from pyspark.sql import functions as F

        def _et_of(dep: str) -> str | None:
            if dep in self.registry.names():
                return self.registry[dep].event_time or None
            return self.source_event_time.get(dep)

        dep_et = {d: _et_of(d) for d in mdef.deps}
        if not any(dep_et.values()):
            raise ValueError(
                f"model {name}: microbatch has no upstream with an "
                "event_time to filter — declare event_time on an "
                "upstream model or pass source_event_time to the Runner")

        def _trunc(ts: _dt.datetime) -> _dt.datetime:
            if isinstance(ts, _dt.date) and not isinstance(ts, _dt.datetime):
                ts = _dt.datetime(ts.year, ts.month, ts.day)
            parts = {"hour": ts.replace(minute=0, second=0, microsecond=0),
                     "day": ts.replace(hour=0, minute=0, second=0,
                                       microsecond=0)}
            if mdef.batch_size in parts:
                return parts[mdef.batch_size]
            if mdef.batch_size == "month":
                return _dt.datetime(ts.year, ts.month, 1)
            return _dt.datetime(ts.year, 1, 1)

        def _shift(ts: _dt.datetime, periods: int) -> _dt.datetime:
            if mdef.batch_size == "hour":
                return ts + _dt.timedelta(hours=periods)
            if mdef.batch_size == "day":
                return ts + _dt.timedelta(days=periods)
            if mdef.batch_size == "month":
                t = ts.year * 12 + (ts.month - 1) + periods
                return _dt.datetime(t // 12, t % 12 + 1, 1)
            return _dt.datetime(ts.year + periods, 1, 1)

        def _as_dt(ts):
            # normalize DATE-typed event_time columns so upstream maxima
            # from mixed date/timestamp columns compare (Python refuses
            # date-vs-datetime comparisons)
            if (isinstance(ts, _dt.date)
                    and not isinstance(ts, _dt.datetime)):
                return _dt.datetime(ts.year, ts.month, ts.day)
            return ts

        upstream_max = None
        for d, et in dep_et.items():
            if et is None:
                continue
            if et not in relations[d].columns:
                raise ValueError(
                    f"model {name}: upstream {d!r} declares event_time "
                    f"{et!r} but has no such column")
            mx = _as_dt(relations[d].agg(F.max(et)).first()[0])
            if mx is not None and (upstream_max is None or mx > upstream_max):
                upstream_max = mx

        path = os.path.join(self.warehouse_dir, name)
        existing = os.path.isdir(path)
        if upstream_max is None:
            if existing:  # quiet upstreams: nothing new to process
                self.last_microbatch_report[name] = []
                return self._read_back(name, path)
            raise ValueError(
                f"model {name}: no upstream rows carry an event_time — "
                "cannot enumerate the first build's batches")

        if existing:
            own_max = _as_dt(self.spark.read.parquet(path)
                             .agg(F.max(mdef.event_time)).first()[0])
            if own_max is None:
                existing = False
        end_batch = _trunc(upstream_max)
        if existing:
            # resume from the BOOKMARK batch (own max event_time — an
            # outage never skips periods, unlike a pure now-lookback
            # window) and additionally reprocess `lookback` periods
            # before the data's current edge for late arrivals; late
            # data older than both windows needs an explicit backfill,
            # exactly dbt's posture
            start = min(_trunc(own_max), _shift(end_batch, -mdef.lookback))
            if mdef.begin:
                start = max(start,
                            _trunc(_dt.datetime.fromisoformat(mdef.begin)))
        else:
            if not mdef.begin:
                raise ValueError(
                    f"model {name}: microbatch first build requires "
                    "begin (the backfill start timestamp)")
            start = _trunc(_dt.datetime.fromisoformat(mdef.begin))

        batches: list[tuple] = []
        b = start
        while b <= end_batch:
            batches.append((b, _shift(b, 1)))
            b = _shift(b, 1)
            if len(batches) > 100_000:
                raise ValueError(
                    f"model {name}: >100k batches between {start} and "
                    f"{end_batch} — wrong batch_size for this span")

        checked_schema = False
        built: list[str] = []
        for lo, hi in batches:
            refs_f = {
                d: (relations[d].filter((F.col(et) >= F.lit(lo))
                                        & (F.col(et) < F.lit(hi)))
                    if et else relations[d])
                for d, et in dep_et.items()}
            try:
                out = mdef.fn(refs_f)
                if mdef.event_time not in out.columns:
                    raise ValueError(
                        f"output is missing the declared event_time "
                        f"column {mdef.event_time!r} — the refresh "
                        "bookmark reads it")
                if not checked_schema:
                    self._check_schema_change(name, out, path,
                                              mdef.on_schema_change)
                    checked_schema = True
                (out.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy(*mdef.partition_by)
                    .parquet(path))
            except Exception as exc:
                raise RuntimeError(
                    f"microbatch {name}: batch [{lo} .. {hi}) failed "
                    f"({len(built)} prior batches committed; re-running "
                    f"resumes from the bookmark): {exc}") from exc
            built.append(f"[{lo} .. {hi})")
        self.last_microbatch_report[name] = built
        return self._read_back(name, path)

    def _materialize_merge(self, name: str, df: DataFrame,
                           partition_by: tuple[str, ...],
                           unique_key: tuple[str, ...],
                           on_schema_change: str = "ignore") -> DataFrame:
        """dbt's ``merge`` incremental strategy [public knowledge] on plain
        parquet: UPSERT by ``unique_key`` — rows in ``df`` replace
        same-key rows in the existing table, everything else survives.

        Parquet has no MERGE, so the upsert is emulated with a
        stage-and-swap commit: the merged content is computed by reading
        the EXISTING table (never the path being written), written to a
        ``<path>__stage`` directory, and then moved into place — with
        ``partition_by``, only the partitions present in ``df`` are
        staged and swapped (the existing side is pre-filtered with a
        broadcast semi join on the affected partition values, so the
        merge reads O(affected), not O(table)).  The swap is file moves,
        not a transaction: a crash mid-swap can leave a partition old
        and another new, the same non-atomicity class as dynamic
        partition overwrite on plain parquet — a table format
        (Delta/Iceberg MERGE INTO) is the at-scale answer; this is the
        faithful plain-parquet emulation of the same semantics."""
        keys = list(unique_key)
        path = os.path.join(self.warehouse_dir, name)
        writer_cols = list(partition_by)
        if not os.path.isdir(path):
            w = df.write.mode("overwrite")
            if writer_cols:
                w = w.partitionBy(*writer_cols)
            w.parquet(path)
            return self._read_back(name, path)
        merge_schema = self._check_schema_change(name, df, path,
                                                 on_schema_change)

        from pyspark.sql import functions as F

        existing = self.spark.read.parquet(path)
        if partition_by:
            affected = df.select(*partition_by).distinct()
            old_side = existing.join(F.broadcast(affected),
                                     list(partition_by), "left_semi")
        else:
            old_side = existing
        keep_old = old_side.join(df.select(*keys).distinct(),
                                 keys, "left_anti")
        # allowMissingColumns only under append_new_columns: surviving old
        # rows get NULL in added columns, new rows NULL in removed ones
        merged = keep_old.unionByName(df, allowMissingColumns=merge_schema)

        stage = path + "__stage"
        shutil.rmtree(stage, ignore_errors=True)
        w = merged.write.mode("overwrite")
        if writer_cols:
            w = w.partitionBy(*writer_cols)
        w.parquet(stage)

        if writer_cols:
            # replace exactly the staged partition directories (walk to
            # the leaf dirs that hold part-files; layout mirrors target)
            for root, _dirs, files in os.walk(stage):
                if not any(f.startswith("part-") for f in files):
                    continue
                rel = os.path.relpath(root, stage)
                target = os.path.join(path, rel)
                shutil.rmtree(target, ignore_errors=True)
                os.makedirs(os.path.dirname(target), exist_ok=True)
                os.replace(root, target)
        else:
            # unpartitioned: swap the whole table's data files
            for f in os.listdir(path):
                if f.startswith("part-"):
                    os.remove(os.path.join(path, f))
            for f in os.listdir(stage):
                if f.startswith("part-"):
                    os.replace(os.path.join(stage, f),
                               os.path.join(path, f))
        shutil.rmtree(stage, ignore_errors=True)
        return self._read_back(name, path, merge_schema=merge_schema)

    def _materialize_aggregate(self, name: str, df: DataFrame,
                               partition_by: tuple[str, ...],
                               unique_key: tuple[str, ...],
                               combine: tuple,
                               on_schema_change: str = "ignore") -> DataFrame:
        """``aggregate`` incremental strategy (X107, r13): fold NEW batch
        PARTIALS into an existing grain mart.  The model fn emits
        batch-level partials at the mart's grain (typically bounding its
        source scans with watermark_col / is_incremental); this
        materialization combines them with the stored partials on the
        grain key using the declared associative functions —
        sum/count add, min takes least, max greatest — so the folded
        mart is bit-identical to a full rebuild (long arithmetic is
        associative; pinned by the two-batch == one-shot pytest).

        This is the growth story for the r13 grain-mart family
        (partsupp offers, hourly user grain, BM25 stats): at 100 TB a
        grain mart is never rebuilt — the day's batch folds in.  With
        ``partition_by`` (required ⊆ grain key), the existing mart is
        pre-pruned with a broadcast semi join on the batch's affected
        partition values and ONLY those partitions are re-written and
        swapped — the fold reads and writes O(affected), not O(mart).
        Same stage-and-swap commit (and the same plain-parquet
        non-atomicity caveat) as the merge strategy.

        EXACTLY-ONCE MODE (X112, r14 — ``Runner.run(batch_id=...)``,
        the streaming-maintenance path): the fold must survive
        micro-batch REPLAY, which the default per-partition in-place
        swap cannot (a replayed batch would double-fold).  With a
        batch_id the commit becomes the ingest_bm25_stats contract:
        ingested ids ride in ``_ingested_batches.json`` INSIDE the mart
        directory (Spark ignores ``_``-prefixed files on read), the
        whole mart swaps via two renames (live→__old, stage→live) with
        __old recovery for the mid-commit crash window, and a replayed
        id no-ops.  O(affected) is preserved: untouched leaf partition
        directories are HARDLINKED into the stage (same filesystem by
        construction; parquet files are immutable once written), so the
        data actually written remains the affected partitions + the
        id file — only directory metadata is per-mart."""
        keys = list(unique_key)
        cmb = dict(combine)
        extra = [c for c in df.columns if c not in keys and c not in cmb]
        if extra:
            raise ValueError(
                f"model {name}: aggregate strategy output carries "
                f"columns that are neither grain key nor combine "
                f"columns: {extra} — every stored column must either "
                "identify the grain or declare its fold function")
        missing = [c for c in list(cmb) + keys if c not in df.columns]
        if missing:
            raise ValueError(
                f"model {name}: aggregate strategy output is missing "
                f"declared columns: {missing}")
        # Evaluate the batch plan ONCE (r14 self-review): the dup-grain
        # guard collect, the affected-partition distinct, and the stage
        # write are separate Spark actions over the same model-fn
        # lineage — without a persist each action re-executes it, so
        # O(batch) was paid three times per fold (the streaming
        # maintenance path pays it per micro-batch).
        df = df.persist()
        try:
            return self._aggregate_fold(name, df, partition_by, keys,
                                        cmb, on_schema_change)
        finally:
            df.unpersist()

    def _aggregate_fold(self, name: str, df: DataFrame,
                        partition_by: tuple[str, ...], keys: list,
                        cmb: dict, on_schema_change: str) -> DataFrame:
        """The body of the aggregate materialization (validated, batch
        plan persisted by the caller)."""
        from ..core.atomic import (restore_crashed_backup, swap_commit,
                                   write_batch_ids)
        from pyspark.sql import functions as F

        path = os.path.join(self.warehouse_dir, name)
        writer_cols = list(partition_by)
        batch_id = self._batch_id
        done: set = set()
        if batch_id is not None:
            if self._full_refresh:
                # full refresh already dropped the mart — a stale crash
                # backup must not resurrect it
                shutil.rmtree(path + "__old", ignore_errors=True)
            else:
                # between-renames crash window: restore __old and fold
                # against it (core/atomic.py documents the argument)
                restore_crashed_backup(path, os.path.isdir)
            done = self._ingested_batch_ids(path)
            if batch_id in done:
                return self._read_back(name, path)  # post-commit replay
        # The fold joins old/new partials 1:1 on the grain key — a batch
        # carrying DUPLICATE grain rows would fan out the full_outer
        # join, double-count the stored partials, and leave duplicate
        # grain rows in the mart: silent corruption.  Fail loud instead
        # (ADVICE r13): one bounded aggregation over the batch partials
        # (O(batch), never the mart) proves grain uniqueness before
        # anything is written.  Checked BEFORE the first build too (r14
        # self-review): a dup-grain FIRST batch would otherwise seed a
        # permanently corrupt mart the later checks never see.  Models
        # that legitimately emit sub-grain rows must pre-aggregate with
        # their declared combine functions — a modeling decision, not
        # something to guess here.
        dup = (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
               .where(F.col("__n") > 1).limit(1).collect())
        if dup:
            bad = {k: dup[0][k] for k in keys}
            raise ValueError(
                f"model {name}: aggregate strategy batch is not unique "
                f"on the grain key {keys} (e.g. {bad} appears "
                f"{dup[0]['__n']}x) — pre-aggregate the batch to the "
                "mart grain with the declared combine functions before "
                "emitting partials")
        if not os.path.isdir(path):
            # first build: staged when replay-tracked so a crash
            # mid-write leaves nothing (a replay rebuilds identically),
            # in place otherwise
            target = path
            if batch_id is not None:
                target = path + "__stage"
                shutil.rmtree(target, ignore_errors=True)
            w = df.write.mode("overwrite")
            if writer_cols:
                w = w.partitionBy(*writer_cols)
            w.parquet(target)
            if not any(f.startswith("part-")
                       for _r, _d, fs in os.walk(target) for f in fs):
                # EMPTY first batch (a streaming micro-batch engine can
                # open with one): a partitioned write of zero rows emits
                # no part files, leaving an unreadable "mart" — create
                # nothing instead.  Folding nothing is inert, so an
                # untracked replay of the empty batch is safe without
                # bookkeeping (there is no mart directory to hold it).
                shutil.rmtree(target, ignore_errors=True)
                return df
            if batch_id is not None:
                write_batch_ids(os.path.join(
                    target, "_ingested_batches.json"), {batch_id})
                os.replace(target, path)
            return self._read_back(name, path)
        if on_schema_change == "append_new_columns":
            raise ValueError(
                f"model {name}: on_schema_change='append_new_columns' "
                "is unsupported for the aggregate strategy — an added "
                "combine column has no stored partial to fold into; "
                "full-refresh the mart instead")
        self._check_schema_change(name, df, path, on_schema_change)

        existing = self.spark.read.parquet(path)
        drift = (set(existing.columns) ^ set(df.columns))
        if drift:
            # even under on_schema_change='ignore' the fold cannot
            # proceed: a column on one side only has no stored/new
            # partial to combine with — fail with the real reason
            # instead of an opaque missing-column AnalysisException
            raise ValueError(
                f"model {name}: aggregate fold schema drift "
                f"({sorted(drift)} on one side only) — every grain/"
                "combine column must exist in both the stored mart and "
                "the batch output; full-refresh to change the schema")
        if partition_by:
            # prune the stored mart to the batch's affected partitions.
            # eqNullSafe per partition column (mirroring the grain-key
            # condition below): a name-based semi join compares with
            # null-UNSAFE `=`, so a batch touching a NULL partition
            # value would exclude the stored NULL-partition rows from
            # the fold while the staged __HIVE_DEFAULT_PARTITION__
            # directory still replaced the target — silently discarding
            # stored partials (ADVICE r13).
            affected = df.select(*partition_by).distinct()
            ex, af = existing.alias("ex"), affected.alias("af")
            pcond = None
            for p in partition_by:
                c = F.col(f"ex.{p}").eqNullSafe(F.col(f"af.{p}"))
                pcond = c if pcond is None else (pcond & c)
            old_side = ex.join(F.broadcast(af), pcond, "left_semi")
        else:
            old_side = existing
        old, new = old_side.alias("old"), df.alias("new")
        cond = None
        for k in keys:
            c = F.col(f"old.{k}").eqNullSafe(F.col(f"new.{k}"))
            cond = c if cond is None else (cond & c)
        joined = old.join(new, cond, "full_outer")
        sel = [F.coalesce(F.col(f"old.{k}"), F.col(f"new.{k}")).alias(k)
               for k in keys]
        for c, fn in cmb.items():
            o, n = F.col(f"old.{c}"), F.col(f"new.{c}")
            if fn in ("sum", "count"):
                e = F.when(o.isNull(), n).when(n.isNull(), o).otherwise(o + n)
            elif fn == "min":
                e = F.least(o, n)   # least/greatest skip NULLs
            else:
                e = F.greatest(o, n)
            sel.append(e.alias(c))
        merged = joined.select(*sel)

        stage = path + "__stage"
        shutil.rmtree(stage, ignore_errors=True)
        w = merged.write.mode("overwrite")
        if writer_cols:
            w = w.partitionBy(*writer_cols)
        w.parquet(stage)
        if batch_id is not None:
            # exactly-once commit: complete the stage into a FULL mart
            # (hardlink untouched leaf partitions — same inode, same
            # bytes, no data copied), put the id set inside, then swap
            # whole directories so stats and bookkeeping commit together
            if writer_cols:
                for root, _dirs, files in os.walk(path):
                    if not any(f.startswith("part-") for f in files):
                        continue
                    rel = os.path.relpath(root, path)
                    sdir = os.path.join(stage, rel)
                    if os.path.isdir(sdir):
                        continue  # affected: the merged output wins
                    os.makedirs(sdir, exist_ok=True)
                    for f in files:
                        if f.startswith("part-"):
                            os.link(os.path.join(root, f),
                                    os.path.join(sdir, f))
            write_batch_ids(os.path.join(
                stage, "_ingested_batches.json"), done | {batch_id})
            swap_commit(path, stage)
        elif writer_cols:
            # replace exactly the staged (affected) partition directories
            for root, _dirs, files in os.walk(stage):
                if not any(f.startswith("part-") for f in files):
                    continue
                rel = os.path.relpath(root, stage)
                target = os.path.join(path, rel)
                shutil.rmtree(target, ignore_errors=True)
                os.makedirs(os.path.dirname(target), exist_ok=True)
                os.replace(root, target)
        else:
            for f in os.listdir(path):
                if f.startswith("part-"):
                    os.remove(os.path.join(path, f))
            for f in os.listdir(stage):
                if f.startswith("part-"):
                    os.replace(os.path.join(stage, f),
                               os.path.join(path, f))
        shutil.rmtree(stage, ignore_errors=True)
        return self._read_back(name, path)

    @staticmethod
    def _ingested_batch_ids(path: str) -> set:
        """Ids already folded into an aggregate mart (X112) — the
        exactly-once bookkeeping, committed INSIDE the swapped mart
        directory.  Protocol: core/atomic.py (the ONE shared
        implementation, also behind the BM25 and line-census
        indexes)."""
        from ..core.atomic import read_batch_ids
        return read_batch_ids(os.path.join(path,
                                           "_ingested_batches.json"))

    def show(self, sources: dict[str, DataFrame], name: str,
             n: int = 5) -> list:
        """``dbt show`` analog (X89 family [public dbt surface: dbt show
        — compile one model and preview rows without materializing]):
        build the model's upstream closure in-memory only (every node
        forced ephemeral — nothing written to the warehouse, no
        catalog/table side effects) and return the first ``n`` rows.
        The preview is a peek, not a build: tests don't run, hooks
        don't fire, and the warehouse is untouched.  Only the target's
        UPSTREAM CLOSURE is shadowed (an unrelated model elsewhere in
        the registry cannot break a preview), and the
        materialization-coupled layout/refresh fields are stripped with
        the materialization they belong to — ModelRegistry.register
        validates watermark_col/merge/unique_key/zorder against the
        declared mode, so forcing ephemeral without stripping raised
        (review r12).  An incremental model previews its FIRST-BUILD
        branch (no existing relation to refresh against)."""
        if name not in self.registry.names():
            raise ValueError(f"show: unknown model {name!r} "
                             f"(registry: {sorted(self.registry.names())})")
        closure, stack = set(), [name]
        while stack:
            node = stack.pop()
            if node in closure:
                continue
            closure.add(node)
            stack += [d for d in self.registry[node].deps
                      if d in self.registry.names()]
        shadow = type(self.registry)()
        for nm in self.registry.names():     # registry order
            if nm not in closure:
                continue
            m = self.registry[nm]
            shadow.register(replace(
                m, materialized="ephemeral", tests=(), pre_hook=(),
                post_hook=(), partition_by=(), bucket_by=(),
                n_buckets=0, watermark_col="",
                incremental_strategy="insert_overwrite", unique_key=(),
                on_schema_change="ignore", zorder_by=(),
                zorder_files=0))
        peek = Runner(self.spark, shadow)
        try:
            rels = peek.run(dict(sources), select=[name])
            return rels[name].limit(n).collect()
        finally:
            peek.clean()

    def clone(self, relations: dict[str, DataFrame],
              select: str | list[str] | None = None,
              exclude: str | None = None,
              state: dict | None = None) -> dict:
        """``dbt clone`` analog (X91 [public dbt surface: dbt clone —
        copy prior-state relations into the target schema WITHOUT
        running models; the cheap dev-environment seeding verb]).

        Each selected TABLE-family model whose prior relation appears in
        ``relations`` is written into this runner's warehouse with the
        model's declared layout (partition_by / bucket_by / zorder) —
        afterwards the relation reads back by name exactly as if built
        here.  VIEW / ephemeral models are skipped and reported (dbt
        re-creates views as views over prod objects; an in-memory view
        layer has no object to point at without running the model —
        skipping loud beats cloning wrong).  Refresh fingerprints are
        NOT cloned: a later ``run(refresh='changed')`` rebuilds, because
        a clone never certifies upstream state.  A selected table model
        MISSING from ``relations`` raises — silently half-cloning an
        environment is how dev schemas go stale."""
        from .selection import select_nodes

        if select is None and exclude is None:
            names = list(self.registry.names())
        elif isinstance(select, list):
            names = list(select)
            if exclude:
                # same narrowing run()/build() give a list select —
                # ignoring exclude here would clone a relation the
                # caller explicitly ruled out (review r12)
                keep = set(select_nodes(self.registry, None, exclude,
                                        state=state))
                names = [n for n in names if n in keep]
        else:
            names = select_nodes(self.registry, select, exclude,
                                 state=state)
        cloned, skipped = [], []
        for name in names:
            mdef = self.registry[name]
            if mdef.materialized in ("view", "ephemeral"):
                skipped.append(name)
                continue
            if name not in relations:
                raise ValueError(
                    f"clone: no prior relation for table model {name!r}"
                    " — pass it in relations or narrow the selection")
            self._materialize_table(
                name, relations[name], mdef.partition_by,
                mdef.bucket_by, mdef.n_buckets,
                mdef.zorder_by, mdef.zorder_files)
            cloned.append(name)
        return {"cloned": cloned, "skipped_views": skipped}

    def _read_back(self, name: str, path: str,
                   merge_schema: bool = False) -> DataFrame:
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        out = reader.parquet(path)
        out.createOrReplaceTempView(name)
        return out

    def clean(self) -> None:
        """dbt clean analog (dbt_project.yml:13-15): drop the warehouse
        files AND the catalog entries of this runner's bucketed tables
        (the session catalog is global — leaving them would strand table
        names pointing at deleted paths), AND the model-name temp-view
        aliases over them (a surviving alias would dangle the same way)."""
        for name in self._catalog_tables:
            self.spark.sql(f"DROP TABLE IF EXISTS `{name}`")
        self._catalog_tables.clear()
        for name in self._alias_views:
            self.spark.catalog.dropTempView(name)
        self._alias_views.clear()
        shutil.rmtree(self.warehouse_dir, ignore_errors=True)
