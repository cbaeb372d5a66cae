"""Similarity search over embedding columns (array<float>).

Two paths, both pure DataFrame ops with bit-exact scores
(functions/vectors.py):

  * brute-force top-k — query set x corpus cross join + window rank.
    Exact baseline; cost O(|Q| * |C|).  Right answer when |Q| is small.
  * LSH-bucketed top-k — deterministic random-hyperplane buckets; the
    join keys on bucket id so each query only scores its bucket
    (~|C| / 2^N_PLANES candidates).  The 100 TB path: bucket once, write
    partitioned by bucket, and every later query prunes to one partition.
    Recall < 1.0 by construction; multi-probe = also join neighboring
    buckets (Hamming distance 1 on the bucket id).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.vectors import as_double, cosine, lsh_bucket


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k per query: rank on (score desc, neighbor id)."""
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       as_double(F.col(vec_col)).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      as_double(F.col(vec_col)).alias("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("cv")).alias("score"))
    )
    return _ranked_topk(scored, k)


def bucketed_vectors(vectors: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(id, vec, bucket) with the deterministic hyperplane LSH bucket —
    per-row math, no shuffle; at scale this is the write-side partition key."""
    return vectors.select(
        F.col(id_col).alias("vid"),
        as_double(F.col(vec_col)).alias("vec"),
        lsh_bucket(as_double(F.col(vec_col))).alias("bucket"),
    )


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only same-bucket candidates."""
    q = bucketed_vectors(queries, id_col, vec_col).withColumnsRenamed(
        {"vid": "query_id", "vec": "qv"})
    c = bucketed_vectors(corpus, id_col, vec_col).withColumnsRenamed(
        {"vid": "neighbor_id", "vec": "cv"})
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("score"))
    )
    return _ranked_topk(scored, k)
