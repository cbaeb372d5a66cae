"""``Runner.build`` — the dbt build analog: models and their attached
tests interleaved in DAG order, failures gating descendants while
independent branches keep going.  What must hold:

  * a failing attached test marks the node ``fail`` and every transitive
    descendant ``skipped``; siblings on other branches still build;
  * a RAISING model is a per-node ``fail`` (with the error captured),
    not an aborted pass — dbt build reports statuses, it doesn't stop
    the world;
  * statuses and built relations are identical at any thread count (the
    dependency gate, not submission order, schedules nodes);
  * the fiction-bank registry surfaces the reference's deliberate
    fan-out bug (models/marts/agg_monthly_loans.sql:48-49) as a test
    failure ON that node, with the fixed twin green — the build-level
    retelling of docs/bug-analysis.md.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dbt_demo_spark.core import DataTest, ModelRegistry, Runner
from dbt_demo_spark.core.datatests import unique


def _diamond_registry():
    """a -> b -> c, a -> d; b carries a test that always fails."""
    reg = ModelRegistry()

    @reg.model("a", deps=("src",))
    def a(refs):
        return refs["src"].select("k", "v")

    @reg.model("b", deps=("a",),
               tests=(DataTest("always_fails", lambda rel: rel["b"]),))
    def b(refs):
        return refs["a"].filter(F.col("v") > 0)

    @reg.model("c", deps=("b",))
    def c(refs):
        return refs["b"].groupBy("k").count()

    @reg.model("d", deps=("a",),
               tests=(unique("d", ["k"]),))
    def d(refs):
        return refs["a"].select("k").distinct()

    return reg


@pytest.fixture
def src(spark):
    return {"src": spark.createDataFrame([(1, 10), (2, 20), (2, 30)],
                                         "k long, v long")}


def test_failing_test_gates_descendants_not_siblings(spark, src, tmp_path):
    res = Runner(spark, _diamond_registry(), str(tmp_path)).build(src)
    status = {n: r.status for n, r in res.nodes.items()}
    assert status == {"a": "success", "b": "fail",
                      "c": "skipped", "d": "success"}
    assert not res.ok
    assert res.counts() == {"success": 2, "fail": 1, "skipped": 1}
    # the failed model still materialized (dbt leaves the table too) …
    assert "b" in res.relations
    # … but the skipped one never ran
    assert "c" not in res.relations
    # the failing test's violation count is reported
    [t] = res.nodes["b"].tests
    assert not t.passed and t.violations == 3


def test_raising_model_is_a_per_node_fail(spark, src, tmp_path):
    reg = ModelRegistry()

    @reg.model("boom", deps=("src",))
    def boom(refs):
        raise RuntimeError("planted")

    @reg.model("after_boom", deps=("boom",))
    def after_boom(refs):
        return refs["boom"]

    @reg.model("other", deps=("src",))
    def other(refs):
        return refs["src"]

    res = Runner(spark, reg, str(tmp_path)).build(src)
    assert res.nodes["boom"].status == "fail"
    assert "planted" in res.nodes["boom"].error
    assert res.nodes["after_boom"].status == "skipped"
    assert res.nodes["other"].status == "success"


def test_build_parallel_matches_sequential(spark, src, tmp_path):
    seq = Runner(spark, _diamond_registry(),
                 str(tmp_path / "seq")).build(src)
    par = Runner(spark, _diamond_registry(),
                 str(tmp_path / "par")).build(src, threads=4)
    assert ({n: r.status for n, r in seq.nodes.items()}
            == {n: r.status for n, r in par.nodes.items()})


def test_fiction_bank_build_surfaces_the_fanout_bug(spark, tmp_path):
    from dbt_demo_spark.models.fiction_bank import REGISTRY
    from dbt_demo_spark.models.seeds import load_seed_dataframes

    res = Runner(spark, REGISTRY, str(tmp_path)).build(
        load_seed_dataframes(spark))
    # the reference-faithful buggy rollup fails ITS OWN grain test …
    assert res.nodes["agg_monthly_loans"].status == "fail"
    failed = [t for t in res.nodes["agg_monthly_loans"].tests if not t.passed]
    assert [t.name for t in failed] == ["grain_agg_monthly_loans"]
    # … every other node (including the fixed twin and its tests) is green
    others = {n: r.status for n, r in res.nodes.items()
              if n != "agg_monthly_loans"}
    assert set(others.values()) == {"success"}
    assert any(t.name.startswith("grain_agg_monthly_loans_fixed")
               for t in res.nodes["agg_monthly_loans_fixed"].tests)


# ---------------------------------------------------------------------------
# Source freshness (the dbt source freshness analog)
# ---------------------------------------------------------------------------


def test_source_freshness_thresholds(spark):
    from datetime import datetime

    from dbt_demo_spark.core.freshness import (FreshnessSpec,
                                               check_freshness)

    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12, 0, 0)),
         (2, datetime(2024, 1, 2, 0, 0, 0))], "id long, loaded_at timestamp")
    empty = ev.filter("id < 0")
    now = datetime(2024, 1, 2, 6, 0, 0)          # 6h past the newest row

    res = {r.source: r for r in check_freshness(
        {"fresh": ev, "stale_warn": ev, "stale_err": ev, "never": empty},
        [FreshnessSpec("fresh", "loaded_at", warn_after_s=7 * 3600),
         FreshnessSpec("stale_warn", "loaded_at", warn_after_s=3600),
         FreshnessSpec("stale_err", "loaded_at", warn_after_s=3600,
                       error_after_s=2 * 3600),
         FreshnessSpec("never", "loaded_at", warn_after_s=1)], now)}

    assert res["fresh"].status == "pass" and bool(res["fresh"])
    assert res["stale_warn"].status == "warn"
    assert res["stale_warn"].age_s == 6 * 3600
    assert res["stale_err"].status == "error"
    assert res["never"].status == "error"
    assert res["never"].max_loaded_at is None

    # DATE-typed loaded_at: a day loaded "on d" is fresh through the END
    # of day d (age measured from d+1 midnight, clamped at 0) — ADVICE r8:
    # the old midnight-of-d conversion made a same-day load read ~24h old,
    # so any sub-day threshold warned on a fresh source
    import pyspark.sql.functions as F
    dated = ev.select(F.col("loaded_at").cast("date").alias("loaded_at"))
    # same-day check (now is during the max loaded day) with a SUB-DAY
    # threshold: must pass, age 0
    [r] = check_freshness({"d": dated},
                          [FreshnessSpec("d", "loaded_at",
                                         warn_after_s=3600)], now)
    assert r.status == "pass" and r.age_s == 0.0
    # checked 30h after day d ended: age counts from end of day d
    late = datetime(2024, 1, 4, 6, 0, 0)
    [r] = check_freshness({"d": dated},
                          [FreshnessSpec("d", "loaded_at",
                                         warn_after_s=24 * 3600)], late)
    assert r.status == "warn" and r.age_s == 30 * 3600


# ---------------------------------------------------------------------------
# Model hooks (dbt pre-hook / post-hook)
# ---------------------------------------------------------------------------


def test_pre_and_post_hooks_run_in_order(spark, src, tmp_path):
    calls = []
    reg = ModelRegistry()

    @reg.model("hooked", deps=("src",),
               pre_hook=(lambda s, rel: calls.append(("pre",
                                                      sorted(rel))),),
               post_hook=("CREATE OR REPLACE TEMP VIEW audit_{name} AS "
                          "SELECT COUNT(*) AS n FROM {name}",
                          lambda s, rel: calls.append(("post",
                                                       sorted(rel)))))
    def hooked(refs):
        calls.append(("fn", None))
        return refs["src"]

    Runner(spark, reg, str(tmp_path)).run(src)
    # pre fires before the fn (model not yet in relations), post after
    # (model registered); the SQL hook ran with {name} interpolated
    assert calls == [("pre", ["src"]), ("fn", None),
                     ("post", ["hooked", "src"])]
    assert spark.table("audit_hooked").collect()[0].n == 3


def test_raising_hook_fails_the_model_in_build(spark, src, tmp_path):
    reg = ModelRegistry()

    @reg.model("bad_hook", deps=("src",),
               post_hook=(lambda s, rel: (_ for _ in ()).throw(
                   RuntimeError("hook boom")),))
    def bad_hook(refs):
        return refs["src"]

    res = Runner(spark, reg, str(tmp_path)).build(src)
    assert res.nodes["bad_hook"].status == "fail"
    assert "hook boom" in res.nodes["bad_hook"].error


# ---------------------------------------------------------------------------
# Model contracts (dbt contract: enforced) and exposures
# ---------------------------------------------------------------------------


def test_contract_enforced_at_build_time(spark, src, tmp_path):
    reg = ModelRegistry()

    @reg.model("ok", deps=("src",),
               contract=(("k", "bigint"), ("v", "bigint")))
    def ok(refs):
        return refs["src"]

    @reg.model("drifted", deps=("src",),
               contract=(("k", "bigint"), ("v", "string"),
                         ("missing_col", "date")))
    def drifted(refs):
        return refs["src"].withColumn("extra", F.lit(1))

    r = Runner(spark, reg, str(tmp_path))
    r.run(src, select=["ok"])                       # green contract passes
    res = r.build(src)
    assert res.nodes["ok"].status == "success"
    assert res.nodes["drifted"].status == "fail"
    err = res.nodes["drifted"].error
    # all three divergence kinds reported at once
    assert "declared string, got bigint" in err     # type drift
    assert "missing column missing_col" in err
    assert "undeclared column extra" in err


def test_contract_rejects_duplicate_output_columns(spark, src, tmp_path):
    """ADVICE r8: a schema carrying the same column name twice (e.g. an
    undisambiguated join) used to collapse into one dict entry and pass a
    contract declaring the column once, the later field's type silently
    winning.  Duplicates are now a contract violation in their own
    right."""
    reg = ModelRegistry()

    @reg.model("duped", deps=("src",),
               contract=(("k", "bigint"), ("v", "bigint")))
    def duped(refs):
        return refs["src"].select("k", "v", F.col("k").cast("bigint"))

    res = Runner(spark, reg, str(tmp_path)).build(src)
    assert res.nodes["duped"].status == "fail"
    assert "duplicate column name(s) ['k']" in res.nodes["duped"].error


def test_fiction_bank_fct_contract_is_green(spark, tmp_path):
    from dbt_demo_spark.models.fiction_bank import REGISTRY
    from dbt_demo_spark.models.seeds import load_seed_dataframes

    Runner(spark, REGISTRY, str(tmp_path)).run(
        load_seed_dataframes(spark), select=["fct_loan_details"])


def test_exposures_in_manifest(spark):
    reg = ModelRegistry()

    @reg.model("mart", deps=("src",))
    def mart(refs):
        return refs["src"]

    reg.exposure("weekly_dashboard", depends_on=("mart",),
                 type="dashboard", owner="analytics",
                 url="https://bi.example/d/42")
    man = reg.manifest()
    assert man["exposures"]["weekly_dashboard"]["depends_on"] == ["mart"]
    assert man["nodes"]["mart"]["contract"] == []

    reg.exposure("broken", depends_on=("nonexistent_model",))
    with pytest.raises(ValueError, match="depends_on unknown"):
        reg.manifest()


def test_build_writes_run_results_artifact(spark, src, tmp_path):
    import json
    import os

    from dbt_demo_spark.core.lineage import manifest_with_lineage

    res = Runner(spark, _diamond_registry(), str(tmp_path)).build(src)
    with open(os.path.join(str(tmp_path), "run_results.json")) as f:
        art = json.load(f)
    assert art["counts"] == res.counts()
    assert art["nodes"]["b"]["status"] == "fail"
    assert art["nodes"]["b"]["tests"][0]["violations"] == 3
    assert art["nodes"]["a"]["seconds"] > 0
    assert art["nodes"]["c"]["seconds"] == 0        # skipped: never ran

    # the one-document lineage manifest composes table + column edges
    reg = _diamond_registry()
    man = manifest_with_lineage(reg, src)
    assert man["nodes"]["d"]["columns"] == {"k": [["a", "k"]]}
    assert man["nodes"]["a"]["depends_on"] == ["src"]
    json.dumps(man)


def test_retry_reruns_only_failed_and_skipped(spark, src, tmp_path):
    """dbt retry analog: prior successes are reused (their fn does NOT
    re-run), the failed node and its skip cascade rebuild, and the new
    run_results covers exactly the re-run set."""
    calls = {"a": 0, "b": 0, "c": 0}
    flaky = {"broken": True}
    reg = ModelRegistry()

    @reg.model("a", deps=("src",))
    def a(refs):
        calls["a"] += 1
        return refs["src"]

    @reg.model("b", deps=("a",))
    def b(refs):
        calls["b"] += 1
        if flaky["broken"]:
            raise RuntimeError("transient upstream outage")
        return refs["a"]

    @reg.model("c", deps=("b",))
    def c(refs):
        calls["c"] += 1
        return refs["b"]

    r = Runner(spark, reg, str(tmp_path))
    first = r.build(src)
    assert first.nodes["a"].status == "success"
    assert first.nodes["b"].status == "fail"
    assert first.nodes["c"].status == "skipped"
    assert calls == {"a": 1, "b": 1, "c": 0}

    flaky["broken"] = False
    second = r.retry(src, first)
    assert set(second.nodes) == {"b", "c"}          # only the redo set
    assert all(n.status == "success" for n in second.nodes.values())
    assert calls == {"a": 1, "b": 2, "c": 1}        # a reused, not rebuilt

    # an all-green prior returns unchanged, no work
    third = r.retry(src, second)
    assert third is second
    assert calls == {"a": 1, "b": 2, "c": 1}


# -------------------------------------------------- X91 dbt clone ----

def test_clone_copies_prior_tables(spark, tmp_path):
    """dbt clone analog: prior-state table relations copy into a fresh
    warehouse without running models — views are skipped and reported,
    a missing prior relation raises, and the clone reads back by name."""
    from dbt_demo_spark.core.model import ModelDef, ModelRegistry
    from dbt_demo_spark.core.runner import Runner

    reg = ModelRegistry()
    reg.register(ModelDef(
        name="stage_v", deps=("src",), materialized="view",
        fn=lambda refs: refs["src"].selectExpr("k", "k * 2 as v")))
    reg.register(ModelDef(
        name="mart_t", deps=("stage_v",), materialized="table",
        partition_by=("p",),
        fn=lambda refs: refs["stage_v"].selectExpr(
            "k", "v", "k % 2 as p")))

    src = {"src": spark.range(6).selectExpr("id as k")}
    prod = Runner(spark, reg, str(tmp_path / "prod"))
    dev = Runner(spark, reg, str(tmp_path / "dev"))
    try:
        prior = prod.run(dict(src))
        report = dev.clone(prior)
        assert report == {"cloned": ["mart_t"],
                          "skipped_views": ["stage_v"]}
        got = spark.read.parquet(str(tmp_path / "dev" / "mart_t"))
        assert sorted((r.k, r.v, r.p) for r in got.collect()) == \
            sorted((r.k, r.v, r.p) for r in prior["mart_t"].collect())
        # declared layout preserved: the partition directories exist
        import os
        assert any(d.startswith("p=") for d in
                   os.listdir(tmp_path / "dev" / "mart_t"))
        # selected-but-missing prior relation raises
        dev2 = Runner(spark, reg, str(tmp_path / "dev2"))
        try:
            import pytest as _pytest
            with _pytest.raises(ValueError, match="no prior relation"):
                dev2.clone({}, select="mart_t")
        finally:
            dev2.clean()
    finally:
        prod.clean()
        dev.clean()


def test_clone_list_select_honors_exclude(spark, tmp_path):
    """Review r12: clone(select=[...], exclude=...) must narrow the
    list — an explicitly excluded relation may not land in the dev
    warehouse."""
    from dbt_demo_spark.core.model import ModelDef, ModelRegistry
    from dbt_demo_spark.core.runner import Runner

    reg = ModelRegistry()
    for n in ("t1", "t2"):
        reg.register(ModelDef(
            name=n, deps=("src",), materialized="table",
            fn=lambda refs: refs["src"]))
    src = {"src": spark.range(3).selectExpr("id as k")}
    prod = Runner(spark, reg, str(tmp_path / "prod"))
    dev = Runner(spark, reg, str(tmp_path / "dev"))
    try:
        prior = prod.run(dict(src))
        report = dev.clone(prior, select=["t1", "t2"], exclude="t2")
        assert report["cloned"] == ["t1"]
        import os
        assert not os.path.exists(tmp_path / "dev" / "t2")
    finally:
        prod.clean()
        dev.clean()


def test_show_previews_without_materializing(spark, tmp_path):
    """dbt show analog: previews N rows of a model through an all-
    ephemeral shadow build — no warehouse writes, no tests, no hooks."""
    from dbt_demo_spark.core.model import ModelDef, ModelRegistry
    from dbt_demo_spark.core.runner import Runner
    import os

    fired = []
    reg = ModelRegistry()
    reg.register(ModelDef(
        name="stage", deps=("src",), materialized="table",
        post_hook=(lambda s, r: fired.append("hook"),),
        fn=lambda refs: refs["src"].selectExpr("k", "k * 10 as v")))
    reg.register(ModelDef(
        name="tip", deps=("stage",), materialized="table",
        fn=lambda refs: refs["stage"].where("v >= 20")))
    r = Runner(spark, reg, str(tmp_path / "wh"))
    try:
        rows = r.show({"src": spark.range(5).selectExpr("id as k")},
                      "tip", n=2)
        assert len(rows) == 2
        assert all(row.v >= 20 for row in rows)
        # nothing materialized, no hooks fired
        assert not os.path.exists(tmp_path / "wh" / "stage")
        assert not os.path.exists(tmp_path / "wh" / "tip")
        assert fired == []
        import pytest as _pytest
        with _pytest.raises(ValueError, match="unknown model"):
            r.show({}, "nope")
    finally:
        r.clean()


def test_show_survives_incremental_and_layout_models(spark, tmp_path):
    """Review r12: show() shadows only the target's upstream closure and
    strips materialization-coupled fields — an unrelated incremental
    watermark model (or a bucketed mart) elsewhere in the registry must
    not break a preview, and previewing the incremental itself runs its
    first-build branch."""
    from dbt_demo_spark.core.model import ModelDef, ModelRegistry
    from dbt_demo_spark.core.runner import Runner

    reg = ModelRegistry()
    reg.register(ModelDef(
        name="inc", deps=("src",), materialized="incremental",
        partition_by=("p",), watermark_col="p",
        fn=lambda refs, ctx=None: refs["src"].selectExpr(
            "k", "k % 2 as p")))
    reg.register(ModelDef(
        name="plain", deps=("src",), materialized="view",
        fn=lambda refs: refs["src"].selectExpr("k * 3 as k3")))
    r = Runner(spark, reg, str(tmp_path / "wh"))
    try:
        rows = r.show({"src": spark.range(4).selectExpr("id as k")},
                      "plain", n=10)
        assert sorted(row.k3 for row in rows) == [0, 3, 6, 9]
        rows2 = r.show({"src": spark.range(4).selectExpr("id as k")},
                       "inc", n=10)
        assert len(rows2) == 4
    finally:
        r.clean()


def test_empty_flag_dry_runs_with_real_schemas(spark, tmp_path):
    """X97 dbt --empty [public dbt surface: dbt-core 1.8 schema-only dry
    runs]: every ref is LIMIT-0'd — the DAG compiles, materializes empty
    relations with the REAL schemas, and contracts still enforce; a
    normal run afterwards is unaffected."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.core.model import ModelDef, ModelRegistry

    calls = []
    reg = ModelRegistry()
    reg.register(ModelDef(
        name="staged", deps=("src",), materialized="view",
        fn=lambda refs: refs["src"].select(
            "k", (F.col("v") * 2).alias("v2"))))
    reg.register(ModelDef(
        name="mart", deps=("staged",), materialized="table",
        contract=(("k", "bigint"), ("v2", "bigint")),
        fn=lambda refs: (calls.append(1) or refs["staged"])))
    src = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    r = Runner(spark, reg, str(tmp_path / "wh"))
    try:
        rels = r.run({"src": src}, empty=True)
        # real schema, zero rows, table actually materialized
        assert rels["mart"].columns == ["k", "v2"]
        assert rels["mart"].count() == 0
        assert (tmp_path / "wh" / "mart").is_dir()
        # a SUBSEQUENT normal run sees data (the flag does not stick)
        rels = r.run({"src": src})
        assert rels["mart"].count() == 2
        # and an empty CHANGED-refresh run never reuses the full table
        rels = r.run({"src": src}, empty=True, refresh="changed")
        assert rels["mart"].count() == 0
    finally:
        r.clean()

    # a contract violation still fails the dry run — the CI value
    reg2 = ModelRegistry()
    reg2.register(ModelDef(
        name="bad", deps=("src",), materialized="table",
        contract=(("missing_col", "bigint"),),
        fn=lambda refs: refs["src"]))
    r2 = Runner(spark, reg2, str(tmp_path / "wh2"))
    try:
        res = r2.build({"src": src}, empty=True)
        assert res.nodes["bad"].status == "fail"
        assert "missing_col" in (res.nodes["bad"].error or "")
    finally:
        r2.clean()

def test_empty_run_never_saves_build_state(spark, tmp_path):
    """ADVICE r12 (high): an empty=True run must NOT record a build-state
    fingerprint — the fingerprint covers code+upstream only, so a later
    refresh="changed" run would false-skip and serve the EMPTY table as
    real data."""
    from dbt_demo_spark.core.model import ModelDef, ModelRegistry

    reg = ModelRegistry()
    reg.register(ModelDef(
        name="mart", deps=("src",), materialized="table",
        fn=lambda refs: refs["src"].selectExpr("k", "v * 2 as v2")))
    # file-backed source: in-memory relations fingerprint as None
    # (unknowable) and would disable skipping altogether
    spark.createDataFrame([(1, 10), (2, 20)], "k long, v long") \
        .write.parquet(str(tmp_path / "src"))
    src = spark.read.parquet(str(tmp_path / "src"))
    r = Runner(spark, reg, str(tmp_path / "wh"))
    try:
        # normal build → state recorded; changed-refresh skips (sanity)
        r.run({"src": src})
        r.run({"src": src}, refresh="changed")
        assert "mart" in r.last_refresh_report["skipped"]
        # empty dry run materializes a 0-row table...
        rels = r.run({"src": src}, empty=True)
        assert rels["mart"].count() == 0
        # ...and a later changed-refresh run must REBUILD (not serve it)
        rels = r.run({"src": src}, refresh="changed")
        assert "mart" in r.last_refresh_report["built"]
        assert rels["mart"].count() == 2
    finally:
        r.clean()


def test_empty_run_incremental_serves_empty_keeps_table(spark, tmp_path):
    """ADVICE r12 (high): incremental models under empty=True must serve
    an EMPTY relation (the --empty contract) — the LIMIT-0 output has no
    partitions, so routing it through dynamic partition overwrite (or
    merge) would leave the full table in place and _read_back would
    serve prior FULL data during a dry run.  The on-disk table is left
    untouched (dry runs are non-destructive) and no state is saved, so
    the next real run refreshes normally."""
    from dbt_demo_spark.core.model import ModelDef, ModelRegistry

    reg = ModelRegistry()
    reg.register(ModelDef(
        name="inc", deps=("src",), materialized="incremental",
        partition_by=("p",),
        fn=lambda refs: refs["src"].selectExpr("k", "k % 2 as p")))
    reg.register(ModelDef(
        name="mrg", deps=("src",), materialized="incremental",
        incremental_strategy="merge", unique_key=("k",),
        fn=lambda refs: refs["src"].selectExpr("k", "k * 10 as v")))
    src = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    r = Runner(spark, reg, str(tmp_path / "wh"))
    try:
        rels = r.run({"src": src})
        assert rels["inc"].count() == 3 and rels["mrg"].count() == 3
        # dry run: BOTH strategies serve empty with the real schema
        rels = r.run({"src": src}, empty=True)
        assert rels["inc"].count() == 0
        assert rels["inc"].columns == ["k", "p"]
        assert rels["mrg"].count() == 0
        assert rels["mrg"].columns == ["k", "v"]
        # on-disk tables untouched by the dry run (non-destructive)
        assert spark.read.parquet(str(tmp_path / "wh" / "inc")).count() == 3
        assert spark.read.parquet(str(tmp_path / "wh" / "mrg")).count() == 3
        # a subsequent real run serves full data again
        rels = r.run({"src": src})
        assert rels["inc"].count() == 3 and rels["mrg"].count() == 3
    finally:
        r.clean()


def test_empty_run_microbatch_raises(spark, tmp_path):
    """ADVICE r12 (medium): microbatch models raise explicitly under
    empty=True (documented in run()) — LIMIT-0 refs leave no event_time
    rows, so batch enumeration is impossible; without the guard the
    'quiet upstreams' branch served the prior FULL table in a dry run."""
    import datetime as dt

    from dbt_demo_spark.core.model import ModelDef, ModelRegistry

    reg = ModelRegistry()
    reg.register(ModelDef(
        name="mb", deps=("ev",), materialized="incremental",
        incremental_strategy="microbatch", event_time="ts",
        batch_size="day", begin="2024-03-01", partition_by=("day",),
        fn=lambda refs: refs["ev"].select(
            F.col("ts").cast("date").alias("day"), "ts", "k")))
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 1, 5))], "k long, ts timestamp")
    r = Runner(spark, reg, str(tmp_path / "wh"),
               source_event_time={"ev": "ts"})
    try:
        # first build (no table yet): clear error, not a misleading
        # 'no upstream rows carry an event_time'
        with pytest.raises(ValueError, match="--empty"):
            r.run({"ev": ev}, empty=True)
        # with a real table on disk: still raises — never serves it
        r.run({"ev": ev})
        with pytest.raises(ValueError, match="--empty"):
            r.run({"ev": ev}, empty=True)
    finally:
        r.clean()

def test_changed_materialization_params_invalidate_state(spark, tmp_path):
    """r13 review: the build-state fingerprint must cover EVERY
    materialization-affecting field — before this fix a model whose
    incremental unique_key (or strategy / combine / on_schema_change /
    microbatch window) changed kept the SAME fingerprint, and a
    refresh="changed" run false-skipped onto a table built under the
    old semantics."""
    from dbt_demo_spark.core.model import ModelDef, ModelRegistry

    spark.createDataFrame([(1, 10), (2, 20)], "k long, v long") \
        .write.parquet(str(tmp_path / "src"))
    src = spark.read.parquet(str(tmp_path / "src"))

    def build(unique_key):
        reg = ModelRegistry()
        reg.register(ModelDef(
            name="m", deps=("src",), materialized="incremental",
            incremental_strategy="merge", unique_key=unique_key,
            fn=lambda refs: refs["src"].selectExpr("k", "v")))
        return Runner(spark, reg, str(tmp_path / "wh"))

    r = build(("k",))
    try:
        r.run({"src": src})
        r.run({"src": src}, refresh="changed")
        assert "m" in r.last_refresh_report["skipped"]  # sanity: can skip
    finally:
        pass
    # SAME warehouse, changed unique_key: must REBUILD, not skip
    r2 = build(("k", "v"))
    try:
        r2.run({"src": src}, refresh="changed")
        assert "m" in r2.last_refresh_report["built"]
    finally:
        r2.clean()
