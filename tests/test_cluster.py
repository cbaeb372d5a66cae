"""Connected-components duplicate clustering (operators/cluster.py):
planted graphs, a DuckDB recursive-CTE differential, a pure-Python
union-find property test, and the integration with minhash_near_dups."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_demo_spark.operators.cluster import (SQL_COMPONENTS_ORACLE,
                                              connected_components,
                                              keep_best_per_cluster,
                                              keep_one_per_cluster,
                                              star_components)
from dbt_demo_spark.operators.dedup import minhash_near_dups
from dbt_demo_spark.sources.parquet import load_table
from tests.conftest import SF_GATE


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "d1 long, d2 long")


def _components(spark, pairs) -> dict[int, int]:
    rows = connected_components(_pairs_df(spark, pairs)).collect()
    return {r.node: r.component for r in rows}


def _union_find(pairs) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize to min-of-component
    roots: dict[int, int] = {}
    for n in list(parent):
        roots.setdefault(find(n), find(n))
    return {n: min(m for m in parent if find(m) == find(n)) for n in parent}


def test_chain_collapses_to_min(spark):
    assert _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]) == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_bridge_differs_from_pairwise_drop(spark):
    """(1,3),(2,3): pairwise drop (drop d2 per pair) keeps {1,2}; cluster
    resolution chains 1~3~2 into ONE cluster and keeps only its min."""
    assert _components(spark, [(1, 3), (2, 3)]) == {1: 1, 2: 1, 3: 1}


def test_long_path_converges_within_default_rounds(spark):
    """A 30-hop path needs 29 rounds under plain neighbor propagation —
    the pointer-doubling shortcut must collapse it within the default
    budget (rounds ~ log diameter)."""
    pairs = [(i, i + 1) for i in range(30)]
    assert _components(spark, pairs) == {i: 0 for i in range(31)}


def test_two_components(spark):
    comp = _components(spark, [(10, 11), (11, 12), (20, 21)])
    assert comp == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_matches_duckdb_recursive_closure(spark):
    pairs = [(1, 3), (2, 3), (7, 9), (9, 11), (11, 7), (42, 40)]
    got = _components(spark, pairs)
    con = duckdb.connect()
    con.register("pairs", pd.DataFrame(pairs, columns=["d1", "d2"]))
    want = {int(n): int(c) for n, c in
            con.execute(SQL_COMPONENTS_ORACLE).fetchall()}
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=1, max_size=25).filter(
                    lambda ps: any(a != b for a, b in ps)))
def test_property_matches_union_find(spark, pairs):
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _components(spark, pairs) == _union_find(pairs)


def test_deep_chain_falls_back_to_star_instead_of_raising(spark):
    """A path too deep for a tiny round budget used to raise; now the
    large-star/small-star fallback resolves it (VERDICT r5 item 3).  The
    explicit opt-out still raises."""
    pairs = [(i, i + 1) for i in range(40)]
    rows = connected_components(_pairs_df(spark, pairs), max_rounds=2).collect()
    assert {r.node: r.component for r in rows} == {i: 0 for i in range(41)}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs_df(spark, pairs), max_rounds=2,
                             star_fallback=False)


def test_star_components_direct(spark):
    """star_components alone: path, bridge, and two components."""
    def star(pairs):
        return {r.node: r.component
                for r in star_components(_pairs_df(spark, pairs)).collect()}

    assert star([(1, 2), (2, 3), (3, 4), (4, 5)]) == {i: 1 for i in range(1, 6)}
    assert star([(1, 3), (2, 3)]) == {1: 1, 2: 1, 3: 1}
    assert star([(10, 11), (11, 12), (20, 21)]) == {
        10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
                min_size=1, max_size=20).filter(
                    lambda ps: any(a != b for a, b in ps)))
def test_star_property_matches_union_find(spark, pairs):
    pairs = [(a, b) for a, b in pairs if a != b]
    got = {r.node: r.component
           for r in star_components(_pairs_df(spark, pairs)).collect()}
    assert got == _union_find(pairs)


def test_keep_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string")
    kept = {r.doc_id for r in
            keep_one_per_cluster(docs, _pairs_df(spark, [(1, 3), (2, 3)]))
            .collect()}
    # cluster {1,2,3} -> keep 1; untouched docs pass through
    assert kept == {0, 1, 4, 5}


def test_keep_best_per_cluster(spark):
    """Cluster {1,2,3} via bridge pairs: the member with the longest text
    wins (not the min id); ties break to the lower id; unclustered docs
    pass through untouched."""
    docs = spark.createDataFrame(
        [(0, "zz"), (1, "short"), (2, "the longest text of all"), (3, "mid"),
         (4, "tie"), (5, "tie")],
        "doc_id long, text string")
    import pyspark.sql.functions as F
    docs = docs.withColumn("n_chars", F.length("text"))
    kept = {r.doc_id for r in
            keep_best_per_cluster(docs, _pairs_df(spark, [(1, 3), (2, 3)]),
                                  "n_chars").collect()}
    assert kept == {0, 2, 4, 5}
    # tie on n_chars: lower id wins
    kept2 = {r.doc_id for r in
             keep_best_per_cluster(docs, _pairs_df(spark, [(4, 5)]),
                                   "n_chars").collect()}
    assert kept2 == {0, 1, 2, 3, 4}


def test_minhash_pairs_resolve_to_clusters(spark):
    """Integration: the LSH pair graph at sf0.01 resolves; every cluster
    representative is its cluster's min id and every clustered node maps
    to a representative that is itself unclustered-or-minimal."""
    docs = load_table(spark, SF_GATE, "documents")
    pairs = minhash_near_dups(docs, threshold=0.5).select("d1", "d2")
    comp = {r.node: r.component
            for r in connected_components(pairs).collect()}
    assert comp, "expected organic near-dup pairs at sf0.01"
    for node, c in comp.items():
        assert c <= node
        assert comp[c] == c  # representatives are their own component
