"""Duplicate-cluster resolution: connected components over a near-dup pair
graph, and keep-one-per-cluster filtering.

Pairwise drop (drop ``d2`` of every verified pair — what the one-shot dedup
queries do) and CLUSTER resolution differ on non-clique graphs: for pairs
(1,3),(2,3), pairwise drop keeps {1,2} although 1 ~ 3 ~ 2 chains them into
one duplicate cluster; connected components keeps only {1}.  Large-corpus
pipelines (the MinHashLSH dedup described for C4/The Pile/RefinedWeb-class
corpora) resolve clusters, so this operator closes that gap.

Spark-first shape:

  * the pair graph is SMALL relative to the corpus (it is the duplication,
    bounded by the LSH bucket guards upstream), so iterating over it never
    touches the corpus again — the final keep filter is one broadcast
    anti join against the scan;
  * min-label propagation WITH SHORTCUTTING: each round every node takes
    the min label among itself and its neighbors, then additionally jumps
    to its current label's label (pointer doubling — the short-cut step of
    the classic MapReduce CC algorithms).  Neighbor propagation alone
    needs graph-diameter rounds; the shortcut makes label chains collapse
    geometrically, so rounds ~ log(diameter) — a 30-node path converges in
    a handful of rounds instead of 29;
  * each round ends in ``localCheckpoint`` — iterative DataFrame loops
    otherwise stack lineage into an exponentially re-analyzed plan;
  * convergence is checked with a count of changed labels (one driver-side
    long per round, not a collect of the data).  At truly adversarial
    diameters the alternating large-star/small-star algorithm (Kiveris et
    al., "Connected Components in MapReduce and Beyond") halves round
    count; this implementation keeps the simple form and exposes
    ``max_rounds`` as the guard.

Differential-tested against a DuckDB recursive-CTE transitive closure plus
a pure-Python union-find property test (tests/test_cluster.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SQL_COMPONENTS_ORACLE = """
    WITH RECURSIVE edges AS (
        SELECT d1 AS a, d2 AS b FROM pairs
        UNION
        SELECT d2, d1 FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node
    )
    SELECT node, MIN(r) AS component FROM reach GROUP BY node
"""


def connected_components(pairs: DataFrame, max_rounds: int = 25) -> DataFrame:
    """(node, component) for every node in ``pairs`` (columns d1, d2),
    where component = the minimum node id reachable through the pair
    graph.  Deterministic; raises if ``max_rounds`` is hit before
    convergence (a diameter that deep means the input is not a near-dup
    graph and needs the large-star algorithm instead)."""
    edges = (pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
             .unionByName(pairs.select(F.col("d2").alias("a"),
                                       F.col("d1").alias("b")))
             .distinct()
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("a").alias("node")).distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint(eager=True))

    for _ in range(max_rounds):
        neighbor_min = (
            edges.join(labels, edges.a == labels.node)
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("component").alias("neighbor_component")))
        stepped = (
            labels.join(neighbor_min, "node", "left")
            .select("node",
                    F.least("component", "neighbor_component")
                    .alias("component"),
                    (F.col("neighbor_component") < F.col("component"))
                    .alias("changed")))
        # shortcut (pointer doubling): follow the label one more hop —
        # component := label(component) — so chains halve every round
        lab2 = stepped.select(F.col("node").alias("c_node"),
                              F.col("component").alias("c_component"))
        improved = (
            stepped.join(lab2, stepped.component == lab2.c_node, "left")
            .select("node",
                    F.least("component", "c_component").alias("component"),
                    (F.col("changed")
                     | (F.col("c_component") < F.col("component")))
                    .alias("changed")))
        improved = improved.localCheckpoint(eager=True)
        n_changed = improved.filter("changed").count()
        labels = improved.drop("changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds; "
        "use a large-star/small-star implementation for deep graphs")


def keep_best_per_cluster(docs: DataFrame, pairs: DataFrame,
                          order_col: str, id_col: str = "doc_id") -> DataFrame:
    """Corpus rows minus every cluster member except the one with the
    HIGHEST ``order_col`` (ties broken by lowest id — deterministic).  The
    production near-dup policy is usually "keep the best copy" (longest
    text, highest quality score), not "keep the smallest id".

    Only CLUSTERED docs (a small set — it is the duplication) enter the
    ranking window; the unclustered corpus never shuffles: the final step
    is one broadcast anti join of the loser ids against the scan."""
    from pyspark.sql import Window

    comp = connected_components(pairs)
    clustered = docs.join(
        F.broadcast(comp), docs[id_col] == comp.node).select(
            F.col(id_col).alias("_id"), F.col(order_col).alias("_ord"),
            "component")
    w = Window.partitionBy("component").orderBy(F.desc("_ord"), F.asc("_id"))
    losers = (clustered.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") > 1)
              .select(F.col("_id").alias(id_col)))
    return docs.join(F.broadcast(losers), id_col, "left_anti")


def keep_one_per_cluster(docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Corpus rows minus every non-minimal member of each duplicate
    cluster.  The drop set is the clustered nodes with node != component —
    small by construction, so it broadcasts into the anti join and the
    corpus passes through in one narrow scan."""
    drop = (connected_components(pairs)
            .filter(F.col("node") != F.col("component"))
            .select(F.col("node").alias(id_col)))
    return docs.join(F.broadcast(drop), id_col, "left_anti")
