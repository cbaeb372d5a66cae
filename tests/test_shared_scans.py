"""Shared-scan multi-query mode (sources/parquet.shared_scans): results
are identical in and out of the block, the block serves cached relations,
and the plain scans come back (cache released) on exit — including on
error."""

from __future__ import annotations

import pytest

from dbt_demo_spark.queries import CATALOG
from dbt_demo_spark.queries.llm_pipeline import (
    events_hourly_rollup_rawscan)
from dbt_demo_spark.queries.tpch import tpch_q6_forecast_revenue
from dbt_demo_spark.sources import parquet
from dbt_demo_spark.sources.parquet import load_table, shared_scans
from tests.conftest import SF_GATE

# grain_check_fanout is the raw-orders representative: the agg_monthly_*
# family moved onto the orderkey-bucketed MARTS (r12 grain pre-agg), so
# their footprint no longer touches the sf_dir orders table at all —
# exactly the behavior the workload footprint derives from the plans
# q6 resolves outside CATALOG since its r13 demotion (slot funds
# corpus_bm25_topk); it stays here as the raw-lineitem representative.
# events_hourly_rollup moved onto the hour-grain MART in r13 (its
# footprint no longer touches the sf_dir events table), so the raw-events
# representative is its rawscan twin — same treatment the header comment
# describes for the agg_monthly family.
FNS = {"tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
       "events_hourly_rollup": events_hourly_rollup_rawscan}
QUERIES = ["tpch_q6_forecast_revenue", "grain_check_fanout",
           "events_hourly_rollup", "text_quality"]

COLUMNS = {
    "lineitem": ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    "orders": ["o_orderdate", "o_orderstatus"],
    "documents": ["doc_id", "text"],
    "events": None,
}


def _results(spark):
    return {n: sorted(map(tuple, _fn(n)(spark, SF_GATE).collect()))
            for n in QUERIES}


def _fn(name):
    return FNS.get(name) or CATALOG[name].fn


def test_shared_scans_results_identical_and_restored(spark):
    plain = _results(spark)
    key = (spark.sparkContext.applicationId, SF_GATE, "lineitem")
    before = parquet._SCANS.get(key)

    with shared_scans(spark, SF_GATE, COLUMNS):
        served = load_table(spark, SF_GATE, "lineitem")
        # the block serves the cached, column-pruned relation
        assert served.storageLevel.useMemory
        assert set(served.columns) == set(COLUMNS["lineitem"])
        assert _results(spark) == plain

    after = load_table(spark, SF_GATE, "lineitem")
    assert not after.storageLevel.useMemory      # cache dropped
    assert set(after.columns) >= {"l_orderkey", "l_partkey"}  # full scan back
    if before is not None:
        assert after is before                    # memo restored, not rebuilt


def test_shared_scans_restores_on_error(spark):
    with pytest.raises(RuntimeError, match="boom"):
        with shared_scans(spark, SF_GATE, {"orders": None}):
            assert load_table(spark, SF_GATE, "orders").storageLevel.useMemory
            raise RuntimeError("boom")
    assert not load_table(spark, SF_GATE, "orders").storageLevel.useMemory


def test_workload_api_footprint_and_equality(spark, tmp_path):
    """run_workload (dbt_demo_spark/workload.py): the footprint derived
    from the batch's own plans covers exactly the read columns, and the
    shared-mode outputs are byte-equal to plain-mode outputs."""
    from dbt_demo_spark.workload import batch_footprint, run_workload

    queries = {n: _fn(n) for n in QUERIES}
    dfs = {n: fn(spark, SF_GATE) for n, fn in queries.items()}
    fp = batch_footprint(dfs, SF_GATE)
    assert set(fp) == {"lineitem", "orders", "documents", "events"}
    assert fp["events"] is None               # normalized loader, whole
    assert set(fp["orders"]) == set(COLUMNS["orders"])
    assert "l_shipdate" in fp["lineitem"] and "l_partkey" not in fp["lineitem"]

    t_shared = run_workload(spark, SF_GATE, queries,
                            out_dir=str(tmp_path / "shared"))
    t_plain = run_workload(spark, SF_GATE, queries, shared=False,
                           out_dir=str(tmp_path / "plain"))
    assert set(t_shared) == set(t_plain) == set(QUERIES)
    for n in QUERIES:
        a = sorted(map(tuple, spark.read.parquet(
            str(tmp_path / "shared" / n)).collect()))
        b = sorted(map(tuple, spark.read.parquet(
            str(tmp_path / "plain" / n)).collect()))
        assert a == b, n
    # cache released after the workload returns
    assert not load_table(spark, SF_GATE, "orders").storageLevel.useMemory


def test_workload_requires_sink(spark):
    from dbt_demo_spark.workload import run_workload

    with pytest.raises(ValueError, match="sink"):
        run_workload(spark, SF_GATE, {})


def test_scan_columns_survives_nested_types_and_paths(spark):
    """r6 code-review findings on the footprint parser: a column AFTER a
    complex-typed column must not be dropped (greedy struct body +
    depth-aware split), a non-canonical sf_dir spelling must still match
    the absolute paths Spark prints, and a handle whose plan was already
    materialized must still parse (fresh query execution inside)."""
    from dbt_demo_spark.workload import batch_footprint, scan_columns

    emb = (load_table(spark, SF_GATE, "embeddings")
           .select("vec_id", "embedding", "label"))
    fp = scan_columns(emb, SF_GATE)
    assert fp["embeddings"] == {"vec_id", "embedding", "label"}

    # non-canonical dir spelling
    dotted = SF_GATE.rstrip("/") + "/."
    assert "embeddings" in scan_columns(emb, dotted)

    # pre-materialized handle: collect first, parse after
    emb.limit(1).collect()
    assert scan_columns(emb, SF_GATE)["embeddings"] == {
        "vec_id", "embedding", "label"}

    # empty footprint warns instead of silently degrading
    from dbt_demo_spark.workload import run_workload

    mem = spark.range(3)
    with pytest.warns(UserWarning, match="without shared scans"):
        run_workload(spark, SF_GATE,
                     {"m": lambda s, d: mem},
                     sink=lambda n, df: df.count())


def test_missing_column_fails_loudly_not_wrong(spark):
    """A footprint that under-covers the batch must fail at ANALYSIS time
    (missing column), never silently compute on fewer columns."""
    from pyspark.errors import AnalysisException

    with shared_scans(spark, SF_GATE, {"orders": ["o_orderkey"]}):
        with pytest.raises(AnalysisException):
            CATALOG["grain_check_fanout"].fn(spark, SF_GATE).collect()


def test_location_regex_matches_any_uri_scheme():
    """_LOC_RE must match hdfs/s3a Locations, not only file: — a cluster
    filesystem would otherwise silently degrade run_workload to unshared
    execution (ADVICE r6)."""
    from dbt_demo_spark.workload import _LOC_RE, _dir_matches

    local = "Location: InMemoryFileIndex(1 paths) [file:/data/sf1/orders.parquet]"
    hdfs = "Location: InMemoryFileIndex(1 paths) [hdfs://nn:8020/w/sf1/orders.parquet]"
    s3 = "Location: InMemoryFileIndex(1 paths) [s3a://bucket/sf1/orders.parquet]"
    for line in (local, hdfs, s3):
        assert _LOC_RE.search(line), line
    assert _dir_matches(
        _LOC_RE.search(local).group("path"), "/data/sf1", "/data/sf1")
    assert _dir_matches(
        _LOC_RE.search(hdfs).group("path"),
        "hdfs://nn:8020/w/sf1", "/irrelevant")
    assert _dir_matches(
        _LOC_RE.search(s3).group("path"),
        "s3a://bucket/sf1/", "/irrelevant")
    assert not _dir_matches(
        _LOC_RE.search(s3).group("path"),
        "s3a://bucket/other", "/irrelevant")


def test_shared_scans_preserve_source_column_order(spark):
    """Inside the block, a star expansion over a cached table must produce
    the SAME column order as the plain scan — the footprint arrives as a
    sorted set but is projected in table order (ADVICE r6)."""
    from dbt_demo_spark.sources.parquet import load_table

    plain = load_table(spark, SF_GATE, "orders").select(
        "o_totalprice", "o_orderkey", "o_orderdate")
    before = plain.select("*").columns
    with shared_scans(spark, SF_GATE,
                      {"orders": sorted(["o_totalprice", "o_orderkey",
                                         "o_orderdate"])}):
        inside = load_table(spark, SF_GATE, "orders").select("*").columns
    # cached projection serves columns in the source table's order
    orders_cols = load_table(spark, SF_GATE, "orders").columns
    want = [c for c in orders_cols
            if c in {"o_totalprice", "o_orderkey", "o_orderdate"}]
    assert inside == want
    assert before == ["o_totalprice", "o_orderkey", "o_orderdate"]
