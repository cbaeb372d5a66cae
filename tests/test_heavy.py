"""Exact heavy hitters (operators/heavy.py): the Misra-Gries candidate
pass must never lose a true heavy hitter, under eviction pressure and
under adversarial partitionings, and the final output must be bit-equal
to the naive exact GROUP BY."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dbt_demo_spark.operators.heavy import _mg_merge, heavy_hitters


def _exact(df, col, denom):
    n = df.count()
    return {(r[col], r.cnt) for r in
            df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") * denom >= n).collect()}


def _skewed(spark, parts):
    """Zipf-ish: item_0 2048 rows, item_1 1024, ... item_10 2 rows, plus a
    4000-item long tail of singletons — the tail is what MG must evict."""
    heavy = [(f"item_{i}",) for i in range(11) for _ in range(2048 >> i)]
    tail = [(f"tail_{i}",) for i in range(4000)]
    return spark.createDataFrame(heavy + tail, ["w"]).repartition(parts)


@pytest.mark.parametrize("k", [16, 64, 512])
@pytest.mark.parametrize("parts", [1, 7, 32])
def test_matches_naive_exact_under_eviction_and_partitioning(spark, k, parts):
    """k=16 on a 4011-distinct input forces constant MG evictions; the
    two-pass result must STILL equal the naive exact answer for every
    partitioning, because candidates are a guaranteed superset."""
    df = _skewed(spark, parts)
    denom = 100  # threshold ~81 rows -> item_0..item_4 qualify
    got = {(r.w, r.cnt) for r in
           heavy_hitters(df, "w", denom=denom, k=k, naive_max_bytes=0).collect()}
    assert got == _exact(df, "w", denom)
    assert len(got) == 5


def test_candidate_bound_is_superset_not_equality(spark):
    """With k barely above denom the candidate set may include non-heavy
    items — the exact pass must strip them (no false positives leak)."""
    df = _skewed(spark, 3)
    got = {r.w for r in heavy_hitters(df, "w", denom=100, k=128, naive_max_bytes=0).collect()}
    assert got == {f"item_{i}" for i in range(5)}


def test_empty_and_all_light_inputs(spark):
    empty = spark.createDataFrame([], "w string")
    assert heavy_hitters(empty, "w", denom=10, naive_max_bytes=0).count() == 0
    # 1000 singletons, threshold 1% -> nothing qualifies
    light = spark.createDataFrame([(f"t{i}",) for i in range(1000)], ["w"])
    assert heavy_hitters(light, "w", denom=100, k=32, naive_max_bytes=0).count() == 0


def test_threshold_boundary_is_exact_integer(spark):
    """cnt * denom >= N at the boundary: 10 copies in N=100 with denom=10
    is exactly on the threshold and must be INCLUDED (>=, not >)."""
    rows = [("hot",)] * 10 + [(f"t{i}",) for i in range(90)]
    df = spark.createDataFrame(rows, ["w"])
    got = {(r.w, r.cnt) for r in
           heavy_hitters(df, "w", denom=10, k=8, naive_max_bytes=0).collect()}
    assert got == {("hot", 10)}


def test_mg_merge_bound():
    """Merged summary counts undercount true counts by at most n/(k+1)
    and never overcount (the mergeable-summaries bound the candidate
    filter relies on)."""
    import random

    rng = random.Random(7)
    items = ([f"h{i}" for i in range(5) for _ in range(200)]
             + [f"t{rng.randrange(3000)}" for _ in range(3000)])
    rng.shuffle(items)
    k = 50
    counters: dict = {}
    true: dict = {}
    # feed in uneven batches, as mapInPandas would
    i = 0
    while i < len(items):
        step = rng.randrange(1, 400)
        batch: dict = {}
        for it in items[i:i + step]:
            batch[it] = batch.get(it, 0) + 1
            true[it] = true.get(it, 0) + 1
        counters = _mg_merge(counters, batch, k)
        i += step
    assert len(counters) <= k
    n = len(items)
    for it, c in counters.items():
        assert c <= true[it], "MG must never overcount"
    for it, t in true.items():
        assert counters.get(it, 0) >= t - n / (k + 1), \
            f"undercount bound violated for {it}"


def test_small_input_routes_to_one_job_naive_path(spark, tmp_path):
    """VERDICT r9 item 4: under the size threshold the plan is the naive
    single-aggregation (no Arrow boundary, no broadcast-semi pass 2) and
    the answer is bit-equal to both the forced-MG route and the exact
    oracle.  Parquet-backed like the real corpus: an RDD-backed plan has
    no usable size statistic (Catalyst estimates it at Long.Max, which
    correctly routes unknown-size inputs down the scale-safe MG road)."""
    _skewed(spark, 5).write.parquet(str(tmp_path / "w"))
    df = spark.read.parquet(str(tmp_path / "w"))
    routed = heavy_hitters(df, "w", denom=100)  # default threshold: tiny
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan.lower().replace(" ", "")
    assert "BroadcastHashJoin" not in plan
    got = {(r.w, r.cnt) for r in routed.collect()}
    forced = {(r.w, r.cnt) for r in
              heavy_hitters(df, "w", denom=100, k=64,
                            naive_max_bytes=0).collect()}
    assert got == forced == _exact(df, "w", 100)


def test_null_heavy_hitter_identical_across_routes(spark, tmp_path):
    """r11 review finding: SQL groups NULLs, so a NULL heavy hitter must
    appear from BOTH routes — the MG pass keeps NULL as an ordinary
    counter (the partition total rides its own is_total flag) and pass 2
    joins null-safely."""
    rows = [(None,)] * 50 + [("a",)] * 30 + [(f"t{i}",) for i in range(20)]
    spark.createDataFrame(rows, "w string").repartition(4) \
        .write.parquet(str(tmp_path / "w"))
    df = spark.read.parquet(str(tmp_path / "w"))
    want = {(None, 50), ("a", 30)}  # denom=4: threshold 25
    naive = {(r.w, r.cnt) for r in
             heavy_hitters(df, "w", denom=4).collect()}
    mg = {(r.w, r.cnt) for r in
          heavy_hitters(df, "w", denom=4, k=8,
                        naive_max_bytes=0).collect()}
    assert naive == mg == want == _exact(df, "w", 4)


def test_output_plan_owns_no_cache_state(spark):
    """The returned DataFrame must not reference InMemoryRelation — the
    operator's summary cache is internal and unpersisted before return."""
    df = _skewed(spark, 4)
    out = heavy_hitters(df, "w", denom=100, k=64, naive_max_bytes=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryRelation" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
