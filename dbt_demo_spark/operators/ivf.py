"""IVF (inverted-file) approximate nearest neighbor: k-means coarse
quantizer + cluster-probed exact scoring — the classic ANN index family
(IVF-Flat) expressed as Spark dataflow.

Contrast with the hyperplane-LSH path (operators/similarity.py): LSH buckets
are data-independent (deterministic planes — oracle-checkable), IVF adapts
its partitions to the data distribution (k-means centroids — better recall
per probe on clustered data, but iterative training, so no SQL oracle; the
driver records a rows-only check and pytest covers the semantics).

Scale posture:
  * train on a SAMPLE (k-means cost is O(sample x k x iters), independent of
    corpus size);
  * assignment is one broadcast of k centroids + a map-side argmin — no
    shuffle;
  * the index is a MATERIALIZATION, not a per-query computation:
    ``build_index`` trains once and writes the assigned corpus partitioned
    by cluster_id (plus a centroids table) — indexes follow the same
    train-once / read-many lifecycle as the runner's partitioned marts
    (reference analog: the mart materialization policy,
    dbt_project.yml:21-22);
  * ``ivf_topk_indexed`` reads the persisted layout: the probe join on
    cluster_id triggers dynamic partition pruning, so a query batch reads
    only its probed partitions — candidate set ~ corpus * nprobe / k.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.vectors import as_double, dot, norm

DEFAULT_K = 16
DEFAULT_NPROBE = 2
DEFAULT_TRAIN_SAMPLE = 0.25


def _centroid_array(model) -> list[list[float]]:
    return [[float(x) for x in c] for c in model.clusterCenters()]


def train_quantizer(corpus: DataFrame, k: int = DEFAULT_K, seed: int = 7,
                    vec_col: str = "embedding", sample: float | None = None):
    """Fit the k-means coarse quantizer (seeded — deterministic for a fixed
    input partitioning).  ``sample`` trains on a fraction of the corpus —
    the 100 TB path where full-corpus k-means is pointless."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.sample(sample, seed=seed) if sample else corpus
    feats = train.select(
        array_to_vector(as_double(F.col(vec_col))).alias("features"))
    return KMeans(k=k, seed=seed, maxIter=10).fit(feats)


def assign_clusters(vectors: DataFrame, centroids: list[list[float]],
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    id_alias: str = "vid", nprobe: int = 1) -> DataFrame:
    """(id, vec, norm, cluster_id) rows — one per probed cluster, ranked by
    squared distance to the centroid (nprobe=1 -> pure assignment).  The
    centroid list rides into the plan as a literal (broadcast by value);
    per-row work is a map-side argmin over k centroids."""
    cents = F.array(*[
        F.array(*[F.lit(x) for x in c]) for c in centroids])
    v = (vectors.select(F.col(id_col).alias(id_alias),
                        F.explode(F.array(as_double(F.col(vec_col)))).alias("vec"))
         .select(id_alias, "vec", norm(F.col("vec")).alias("nrm"),
                 cents.alias("_cents")))
    # squared distance to each centroid, then take the nprobe closest
    dists = F.transform(
        F.col("_cents"),
        lambda c: F.aggregate(F.zip_with(F.col("vec"), c, lambda x, y: (x - y) * (x - y)),
                              F.lit(0.0), lambda a, b: a + b))
    ranked = (
        v.select(id_alias, "vec", "nrm", F.posexplode(dists).alias("cluster_id", "dist"))
        .withColumn("_rk", F.row_number().over(
            Window.partitionBy(id_alias).orderBy(F.asc("dist"), F.asc("cluster_id"))))
        .filter(F.col("_rk") <= nprobe)
        .drop("dist", "_rk")
    )
    return ranked


@dataclass(frozen=True)
class IvfIndex:
    """Handle to a persisted IVF-Flat index: ``<path>/corpus`` is the
    assigned corpus parquet partitioned by cluster_id, ``<path>/centroids``
    the k centroid vectors."""
    path: str
    centroids: tuple[tuple[float, ...], ...]

    @property
    def corpus_path(self) -> str:
        return os.path.join(self.path, "corpus")

    @property
    def centroids_path(self) -> str:
        return os.path.join(self.path, "centroids")


def build_index(corpus: DataFrame, path: str, n_clusters: int = DEFAULT_K,
                seed: int = 7, id_col: str = "vec_id",
                vec_col: str = "embedding",
                sample: float | None = DEFAULT_TRAIN_SAMPLE,
                model=None, centroids=None) -> IvfIndex:
    """Train-once / persist: fit the quantizer on a corpus SAMPLE (the
    100 TB path — k-means cost stays independent of corpus size), assign
    every corpus vector map-side, and write the assigned corpus partitioned
    by cluster_id so probes prune partitions at read time.  Pass ``model``
    to reuse an already-fitted quantizer, or ``centroids`` (list of
    vectors) to build from an OFFLINE-trained frozen quantizer — the
    serving-side lifecycle (operators/ivf_frozen.py, tools/freeze_ivf.py)
    that also makes the scoring path SQL-oracle-checkable."""
    spark = corpus.sparkSession
    if centroids is not None:
        cents = [[float(x) for x in c] for c in centroids]
    else:
        model = model or train_quantizer(corpus, k=n_clusters, seed=seed,
                                         vec_col=vec_col, sample=sample)
        cents = _centroid_array(model)
    assigned = assign_clusters(corpus, cents, id_col, vec_col,
                               "neighbor_id", nprobe=1)
    (assigned.write.mode("overwrite").partitionBy("cluster_id")
     .parquet(os.path.join(path, "corpus")))
    (spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cluster_id int, centroid array<double>")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(path, "centroids")))
    return IvfIndex(path, tuple(tuple(c) for c in cents))


def load_index(spark: SparkSession, path: str) -> IvfIndex:
    rows = (spark.read.parquet(os.path.join(path, "centroids"))
            .orderBy("cluster_id").collect())
    return IvfIndex(path, tuple(tuple(r.centroid) for r in rows))


def ivf_topk_indexed(queries: DataFrame, index: IvfIndex, k: int = 5,
                     nprobe: int = DEFAULT_NPROBE, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k against a PERSISTED index: queries are
    assigned to their nprobe nearest centroids map-side (centroids ride in
    the plan as literals), then joined against the partitioned corpus on
    cluster_id — the join side is small, so Spark plans a broadcast join
    and dynamic partition pruning restricts the corpus scan to the probed
    cluster_id partitions (asserted in tests/test_plan_quality.py)."""
    spark = queries.sparkSession
    c = (spark.read.parquet(index.corpus_path)
         .withColumnsRenamed({"vec": "cv", "nrm": "cn"}))
    q = assign_clusters(queries, [list(c_) for c_ in index.centroids],
                        id_col, vec_col, "query_id", nprobe=nprobe)
    scored = (
        q.withColumnsRenamed({"vec": "qv", "nrm": "qn"})
        .join(c, "cluster_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                (dot(F.col("qv"), F.col("cv"))
                 / (F.col("qn") * F.col("cn"))).alias("score"))
        # no dedup needed: each corpus row lives in exactly ONE cluster
        # (nprobe=1 assignment), so a (query, neighbor) pair can match the
        # probe join at most once — a distinct here would be a full extra
        # shuffle over the scored pairs for nothing (r8 self-review)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
             n_clusters: int = DEFAULT_K, nprobe: int = DEFAULT_NPROBE,
             id_col: str = "vec_id", vec_col: str = "embedding",
             model=None) -> DataFrame:
    """IVF-Flat approximate cosine top-k: corpus assigned to its nearest
    centroid, queries probe their ``nprobe`` nearest clusters, exact cosine
    scores the candidates, window rank keeps k."""
    model = model or train_quantizer(corpus, k=n_clusters, vec_col=vec_col)
    cents = _centroid_array(model)
    c = assign_clusters(corpus, cents, id_col, vec_col, "neighbor_id", nprobe=1)
    q = assign_clusters(queries, cents, id_col, vec_col, "query_id", nprobe=nprobe)
    scored = (
        q.withColumnsRenamed({"vec": "qv", "nrm": "qn"})
        .join(c.withColumnsRenamed({"vec": "cv", "nrm": "cn"}), "cluster_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                (dot(F.col("qv"), F.col("cv"))
                 / (F.col("qn") * F.col("cn"))).alias("score"))
        # no dedup needed: each corpus row lives in exactly ONE cluster
        # (nprobe=1 assignment), so a (query, neighbor) pair can match the
        # probe join at most once — a distinct here would be a full extra
        # shuffle over the scored pairs for nothing (r8 self-review)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )
