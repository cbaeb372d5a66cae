"""Semantic deduplication — SemDeDup-shaped [public knowledge: Abbas,
Tirumala, Simig, Ganguli, Morcos, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023]: drop all but one
member of each group of embedding-space near-duplicates, keeping the
most REPRESENTATIVE copy.

Composition of existing scale-shaped operators — nothing new shuffles
the corpus:

  1. candidate pairs from the multi-probe hyperplane-LSH self-join +
     exact cosine verify (similarity.embedding_near_dups);
  2. duplicate GROUPS as connected components over the pair graph
     (cluster.connected_components — pointer-doubling min-label; the
     graph IS the duplication, small by construction);
  3. the keep policy: each component's member closest (cosine) to the
     component's mean embedding survives — SemDeDup keeps one
     representative per semantic group; ties break on lowest id.
     Centroid math runs only over CLUSTERED vectors (broadcast-joined
     component labels), exploded by dimension and re-assembled — the
     unclustered corpus never leaves its scan.

Returns the kept rows of ``vectors`` (losers anti-joined away,
broadcast).  ``semantic_dedup_report`` returns the per-component keep
decision for audits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .cluster import connected_components
from .similarity import embedding_near_dups


def _keep_decisions(vectors: DataFrame, threshold: float,
                    id_col: str, vec_col: str) -> DataFrame:
    """(component, vec_id, score, keep): every clustered vector scored by
    cosine against its component's mean embedding."""
    pairs = embedding_near_dups(vectors, threshold=threshold,
                                id_col=id_col, vec_col=vec_col)
    comp = connected_components(pairs.select("d1", "d2"))
    members = vectors.join(
        F.broadcast(comp), vectors[id_col] == comp.node).select(
            F.col(id_col).alias("_id"), "component",
            F.col(vec_col).cast("array<double>").alias("_v"))
    dims = (members.select("component", "_id", F.posexplode("_v")
                           .alias("pos", "x")))
    cent = (dims.groupBy("component", "pos").agg(F.avg("x").alias("c")))
    # cosine(member, centroid) per member: one join on (component, pos),
    # sums per member — all on the small clustered set
    scored = (dims.join(cent, ["component", "pos"])
              .groupBy("component", "_id")
              .agg((F.sum(F.col("x") * F.col("c"))
                    / (F.sqrt(F.sum(F.col("x") * F.col("x")))
                       * F.sqrt(F.sum(F.col("c") * F.col("c")))))
                   .alias("score")))
    w = Window.partitionBy("component").orderBy(F.desc("score"), F.asc("_id"))
    return (scored.withColumn("keep", F.row_number().over(w) == 1)
            .select("component", F.col("_id").alias(id_col), "score",
                    "keep"))


def semantic_dedup(vectors: DataFrame, threshold: float = 0.9,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """``vectors`` minus every semantic-duplicate group member except the
    centroid-nearest representative."""
    losers = (_keep_decisions(vectors, threshold, id_col, vec_col)
              .filter(~F.col("keep")).select(id_col))
    return vectors.join(F.broadcast(losers), id_col, "left_anti")


def semantic_dedup_report(vectors: DataFrame, threshold: float = 0.9,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """The audit view: (component, id, score, keep) for every clustered
    vector — what was grouped with what, and why the survivor won."""
    return _keep_decisions(vectors, threshold, id_col, vec_col)
