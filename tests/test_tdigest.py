"""Mergeable t-digest percentile sketches (operators/tdigest.py,
VERDICT r6 item 7): rank-error bound vs the exact sort, merge
associativity / batch-split invariance, and the two-level Spark path
against the exact X28-style quantiles at gate scale."""

from __future__ import annotations

import math

import numpy as np
import pytest

from dbt_demo_spark.operators.tdigest import (Digest, build_digest,
                                              merge_digests,
                                              merge_shard_digests, quantile,
                                              sketch_quantiles,
                                              tdigest_shards)

PROBS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
DELTA = 200.0
# k1-scale digests hold rank error well under 1/delta at mid-quantiles;
# 1.5/delta is a comfortable CI bound across seeds and distributions
BOUND = 1.5 / DELTA


def rank_err(sorted_vals: np.ndarray, q: float, est: float) -> float:
    n = len(sorted_vals)
    r = np.searchsorted(sorted_vals, est, side="left")
    r2 = np.searchsorted(sorted_vals, est, side="right")
    # distance from the target rank to the est's rank INTERVAL (ties)
    target = q * n
    if r <= target <= r2:
        return 0.0
    return min(abs(target - r), abs(target - r2)) / n


@pytest.mark.parametrize("dist", ["uniform", "normal", "lognormal", "ints"])
def test_rank_bound_single_digest(dist):
    rng = np.random.default_rng(7)
    vals = {
        "uniform": rng.uniform(0, 1, 50_000),
        "normal": rng.normal(0, 1, 50_000),
        "lognormal": rng.lognormal(0, 2, 50_000),
        "ints": rng.integers(0, 500, 50_000).astype(float),
    }[dist]
    d = build_digest(vals, DELTA)
    s = np.sort(vals)
    for p in PROBS:
        assert rank_err(s, p, quantile(d, p)) <= BOUND, (dist, p)
    # exact tails
    assert quantile(d, 0.0) == s[0] and quantile(d, 1.0) == s[-1]


def test_merge_is_batch_split_invariant_within_bound():
    rng = np.random.default_rng(11)
    vals = rng.lognormal(0, 1.5, 60_000)
    s = np.sort(vals)
    # any partitioning of the stream merges to a digest with the same
    # rank-bound class as the one-shot digest
    for n_parts in (2, 7, 64):
        parts = np.array_split(vals, n_parts)
        merged = merge_digests([build_digest(p, DELTA) for p in parts], DELTA)
        assert merged.n == len(vals)
        assert merged.vmin == s[0] and merged.vmax == s[-1]
        for p in PROBS:
            assert rank_err(s, p, quantile(merged, p)) <= BOUND, (n_parts, p)
    # associativity shape: merge of merges
    a = merge_digests([build_digest(p, DELTA)
                       for p in np.array_split(vals[:30_000], 5)], DELTA)
    b = merge_digests([build_digest(p, DELTA)
                       for p in np.array_split(vals[30_000:], 3)], DELTA)
    ab = merge_digests([a, b], DELTA)
    for p in PROBS:
        assert rank_err(s, p, quantile(ab, p)) <= BOUND, p


def test_digest_size_stays_bounded():
    rng = np.random.default_rng(3)
    d = build_digest(rng.uniform(0, 1, 200_000), DELTA)
    assert len(d.means) <= 2 * DELTA  # O(delta) centroids, not O(n)
    m = merge_digests([d, d, d, d], DELTA)
    assert len(m.means) <= 2 * DELTA


def test_empty_and_degenerate():
    assert math.isnan(quantile(build_digest([], DELTA), 0.5))
    one = build_digest([42.0], DELTA)
    assert quantile(one, 0.0) == quantile(one, 1.0) == 42.0
    const = build_digest([5.0] * 1000, DELTA)
    assert quantile(const, 0.5) == 5.0
    with pytest.raises(ValueError):
        quantile(one, 1.5)


def test_spark_two_level_matches_exact_at_gate_scale(spark):
    """The Spark path (mapInPandas shard digests -> merge) against the
    exact sorted ranks of the documents.n_chars column at sf0.01 — the
    same column family as the exact X28 quantiles."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.sources.parquet import load_table, spread
    from tests.conftest import SF_GATE

    docs = (load_table(spark, SF_GATE, "documents")
            .select(F.length("text").cast("double").alias("n_chars")))
    docs = spread(docs, "n_chars")
    shards = tdigest_shards(docs, "n_chars", DELTA)
    assert shards.count() > 1  # genuinely multi-shard
    d = merge_shard_digests(shards, DELTA)
    exact = np.sort(np.array(
        [r.n_chars for r in docs.collect()]))
    assert d.n == len(exact)
    for p in PROBS:
        assert rank_err(exact, p, quantile(d, p)) <= BOUND, p
    # the one-call path agrees with the composed path
    q = sketch_quantiles(docs, "n_chars", [0.5], DELTA)
    assert rank_err(exact, 0.5, q[0.5]) <= BOUND


def test_sf1_replica_when_present(spark):
    """10x scale marker (same discipline as test_funnel_scale): skip
    cleanly when /tmp/sf1 is absent."""
    import os

    import pyspark.sql.functions as F

    if not os.path.isdir("/tmp/sf1"):
        pytest.skip("sf1 replica not materialized")
    docs = (spark.read.parquet("/tmp/sf1/documents.parquet")
            .select(F.length("text").cast("double").alias("n_chars")))
    d = merge_shard_digests(tdigest_shards(docs, "n_chars", DELTA), DELTA)
    exact = np.sort(np.array([r.n_chars for r in docs.collect()]))
    for p in PROBS:
        assert rank_err(exact, p, quantile(d, p)) <= BOUND, p


def test_grouped_sketch_matches_exact_per_language(spark):
    """Per-key sketches vs exact per-key sorted ranks on the X28 column
    family (documents per-language char lengths) at sf0.01."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.operators.tdigest import grouped_sketch_quantiles
    from dbt_demo_spark.sources.parquet import load_table
    from tests.conftest import SF_GATE

    docs = (load_table(spark, SF_GATE, "documents")
            .select("lang", F.length("text").cast("double").alias("n_chars")))
    got = {r.key: (r.n, r.quantiles)
           for r in grouped_sketch_quantiles(
               docs, "lang", "n_chars", PROBS, DELTA).collect()}
    exact = {}
    for r in docs.collect():
        exact.setdefault(r.lang, []).append(r.n_chars)
    assert set(got) == set(exact)
    for lang, vals in exact.items():
        s = np.sort(np.array(vals))
        n, qs = got[lang]
        assert n == len(s)
        for p, est in zip(PROBS, qs):
            assert rank_err(s, p, est) <= BOUND, (lang, p)
