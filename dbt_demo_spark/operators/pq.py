"""Product quantization (PQ) — the compressed ANN tier under IVF-Flat.

IVF-Flat (operators/ivf.py) prunes WHICH vectors a query scores; PQ
compresses WHAT is stored per vector: the 64-dim float corpus row becomes
``M`` small integer codes (one per subspace) plus one exact float norm —
64 floats -> 8 bytes of codes + 8 bytes of norm at the shipped geometry
(M=8 subspaces x K=16 codewords), a ~16x reduction in what the scoring
join has to move.  At 100 TB the corpus embeddings are the dominant
byte-weight of an ANN index; PQ is what makes the probed partitions small
enough to stream through a scoring stage at all.  Reference analog: the
compressed index tier next to the flat tier (same role FAISS's IVFPQ plays
next to IVFFlat [public knowledge]).

Semantics (all JVM-side expressions, no Python in the serving path):

  * TRAIN: per-subspace Lloyd's k-means over a bounded corpus sample —
    driver-side numpy on a few thousand rows, the same train-once
    lifecycle as the IVF coarse quantizer (cost independent of corpus
    size).  tools/freeze_pq.py freezes the shipped codebooks
    (operators/pq_frozen.py) so the serving path is SQL-expressible and
    oracle-checkable, exactly the ivf_frozen.py pattern.
  * ENCODE (map-side, no shuffle): codes[m] = argmin_j
    ||v[m*d : (m+1)*d] - C[m][j]||^2, ties to the lowest j.  The
    codebooks ride into the plan as literals (broadcast by value); the
    squared distance is the same zip_with/aggregate left fold the IVF
    assignment uses, so both engines compute bit-identical distances.
  * SCORE (asymmetric distance, ADC): the query stays exact; the corpus
    side is reconstructed from its codes
    (recon = concat_m C[m][codes[m]]) and scored
    score = dot(q, recon) / (||q|| * ||c||) with the TRUE corpus norm
    stored exactly at encode time — quantization error lands only in the
    dot term, the standard IVF-PQ residual-free formulation.  One full
    64-element fold per pair keeps the association order identical to
    the DuckDB oracle's list_dot_product.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.vectors import as_double, dot, norm

M_SUBSPACES = 8
K_CODEWORDS = 16
SUB_DIM = 8  # DIM (64) / M_SUBSPACES


# ---------------------------------------------------------------------------
# Training (driver-side numpy over a bounded sample — a materialization
# step, never the query path)
# ---------------------------------------------------------------------------

def train_codebooks(sample: np.ndarray, m: int = M_SUBSPACES,
                    k: int = K_CODEWORDS, iters: int = 20,
                    seed: int = 7) -> list[list[list[float]]]:
    """Per-subspace Lloyd's k-means.  ``sample`` is (n, dim) float64; the
    returned codebooks are [m][k][dim/m] plain floats (repr round-trips
    doubles exactly, so freezing them preserves every bit).  Deterministic
    for a fixed (sample, seed): init picks k distinct sample rows via a
    seeded generator, empty clusters re-seed to the farthest point."""
    n, dim = sample.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by {m} subspaces")
    d = dim // m
    rng = np.random.default_rng(seed)
    books: list[list[list[float]]] = []
    for mi in range(m):
        sub = np.ascontiguousarray(sample[:, mi * d:(mi + 1) * d], dtype=np.float64)
        cents = sub[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            # (n, k) squared distances; argmin ties to the lowest j
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            moved = False
            for j in range(k):
                mask = assign == j
                if mask.any():
                    nc = sub[mask].mean(axis=0)
                else:  # empty cluster: grab the point farthest from its centroid
                    nc = sub[d2.min(axis=1).argmax()]
                if not np.array_equal(nc, cents[j]):
                    cents[j] = nc
                    moved = True
            if not moved:
                break
        books.append([[float(x) for x in c] for c in cents])
    return books


def train_codebooks_from_df(corpus: DataFrame, vec_col: str = "embedding",
                            m: int = M_SUBSPACES, k: int = K_CODEWORDS,
                            max_sample: int = 4096, seed: int = 7):
    """Train on a bounded corpus sample: the `limit` caps the driver
    transfer regardless of corpus size (k-means quality saturates far
    below it), keeping training O(sample) at 100 TB."""
    rows = (corpus.select(as_double(F.col(vec_col)).alias("v"))
            .limit(max_sample).collect())
    return train_codebooks(np.array([r.v for r in rows]), m=m, k=k, seed=seed)


def _centroid_literal(centroids) -> F.Column:
    return F.array(*[F.array(*[F.lit(float(x)) for x in c])
                     for c in centroids])


def _residual_expr(vec: F.Column, cluster_id: F.Column, centroids) -> F.Column:
    """v - centroid[cluster] — what residual PQ quantizes.  Residuals have
    far smaller norms than raw vectors (the coarse quantizer already
    explains the cluster-scale structure), so the same codebook budget
    spends its resolution on a tighter ball — the classic IVFADC layout
    [public knowledge: Jegou et al., "Product Quantization for Nearest
    Neighbor Search", 2011]."""
    cent = F.element_at(_centroid_literal(centroids), cluster_id + 1)
    return F.zip_with(vec, cent, lambda x, y: x - y)


def train_residual_codebooks(corpus: DataFrame, centroids,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             m: int = M_SUBSPACES, k: int = K_CODEWORDS,
                             max_sample: int = 4096, seed: int = 7):
    """Codebooks for the residual tier: assign each sampled vector to its
    coarse centroid (map-side), subtract it JVM-side, train per-subspace
    k-means on the residuals.  Same bounded-sample discipline as the
    plain trainer."""
    from .ivf import assign_clusters

    assigned = assign_clusters(corpus, [list(c) for c in centroids],
                               id_col, vec_col, "rid", nprobe=1)
    rows = (assigned.select(
        _residual_expr(F.col("vec"), F.col("cluster_id"), centroids)
        .alias("r")).limit(max_sample).collect())
    return train_codebooks(np.array([r.r for r in rows]), m=m, k=k, seed=seed)


# ---------------------------------------------------------------------------
# Encode / reconstruct / score (pure column expressions)
# ---------------------------------------------------------------------------

def _codebook_literal(codebooks) -> F.Column:
    """[m][k][d] nested array literal — rides the plan like the IVF
    centroid table, broadcast by value to every task."""
    return F.array(*[
        F.array(*[F.array(*[F.lit(float(x)) for x in cw]) for cw in book])
        for book in codebooks])


def _sqdist(a: F.Column, b: F.Column) -> F.Column:
    # same left fold as the IVF assignment (operators/ivf.py) — the
    # primitive the cross-engine bit-identity rests on
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, v: acc + v)


def encode_expr(vec: F.Column, codebooks) -> F.Column:
    """array<int> of per-subspace codes: argmin over each codebook of the
    squared distance from the vector's slice, ties to the lowest index.
    Map-side only — no shuffle, no Python."""
    cb = _codebook_literal(codebooks)
    d = len(codebooks[0][0])

    def code_for(mi: int) -> F.Column:
        sub = F.slice(vec, mi * d + 1, d)
        dists = F.transform(F.element_at(cb, mi + 1),
                            lambda cw: _sqdist(sub, cw))
        # array_position finds the FIRST bit-equal minimum -> lowest j
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return F.array(*[code_for(mi) for mi in range(len(codebooks))])


def reconstruct_expr(codes: F.Column, codebooks) -> F.Column:
    """Decode codes back to the concatenated codeword vector
    (recon = C[0][codes[0]] || ... || C[M-1][codes[M-1]])."""
    cb = _codebook_literal(codebooks)
    return F.flatten(F.transform(
        codes, lambda code, i: F.element_at(F.element_at(cb, i + 1), code + 1)))


def encode(vectors: DataFrame, codebooks, id_col: str = "vec_id",
           vec_col: str = "embedding", id_alias: str = "neighbor_id") -> DataFrame:
    """(id, codes, cn) — the compressed corpus row: M small codes plus the
    exact norm of the ORIGINAL vector (so quantization error never touches
    the cosine denominator)."""
    v = as_double(F.col(vec_col))
    # explode-of-one makes the cast a real attribute (the _with_norm
    # pattern, operators/similarity.py) so the norm fold and the M encode
    # folds share one materialized array instead of re-casting per fold
    return (vectors
            .select(F.col(id_col).alias(id_alias),
                    F.explode(F.array(v)).alias("v"))
            .select(id_alias,
                    encode_expr(F.col("v"), codebooks).alias("codes"),
                    norm(F.col("v")).alias("cn")))


# ---------------------------------------------------------------------------
# Persisted IVF-PQ index
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PqIndex:
    """<path>/corpus: (neighbor_id, codes, cn, cluster_id) parquet
    partitioned by cluster_id — the IVF layout with PQ codes in place of
    the raw vectors.  Codebooks + centroids ride in the handle (they are
    a few KB; the frozen serving path pins them in code).  ``residual``
    marks codebooks trained on (v - centroid) — reconstruction then adds
    the coarse centroid back (IVFADC)."""
    path: str
    centroids: tuple[tuple[float, ...], ...]
    codebooks: tuple[tuple[tuple[float, ...], ...], ...]
    residual: bool = False

    @property
    def corpus_path(self) -> str:
        return os.path.join(self.path, "corpus")


def build_pq_index(corpus: DataFrame, path: str, centroids, codebooks,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   residual: bool = False) -> PqIndex:
    """Assign every corpus vector to its nearest coarse centroid (the IVF
    map-side argmin) and PQ-encode it, then persist partitioned by
    cluster_id: probes prune partitions exactly as IVF-Flat's index does,
    but each partition holds codes, not vectors.  ``residual=True``
    encodes (v - centroid[cluster]) instead of v — pass codebooks trained
    by train_residual_codebooks; the stored schema is identical, only the
    reconstruction (and therefore the handle flag) differs."""
    from .ivf import assign_clusters

    assigned = assign_clusters(corpus, [list(c) for c in centroids],
                               id_col, vec_col, "neighbor_id", nprobe=1)
    target = (_residual_expr(F.col("vec"), F.col("cluster_id"), centroids)
              if residual else F.col("vec"))
    compressed = assigned.select(
        "neighbor_id", "cluster_id",
        encode_expr(target, codebooks).alias("codes"),
        F.col("nrm").alias("cn"))
    (compressed.write.mode("overwrite").partitionBy("cluster_id")
     .parquet(os.path.join(path, "corpus")))
    return PqIndex(path,
                   tuple(tuple(c) for c in centroids),
                   tuple(tuple(tuple(cw) for cw in b) for b in codebooks),
                   residual=residual)


def query_table_expr(qv: F.Column, codebooks) -> F.Column:
    """The classic ADC lookup table, as one expression: per query,
    table[m][j] = dot(q_sub_m, C[m][j]) — an [M][K] array computed ONCE
    per query row, so scoring a candidate drops from an O(D) fold to M
    array lookups.  [Public knowledge: the FAISS IVFPQ scan precomputes
    exactly this table per (query, probe).]"""
    d = len(codebooks[0][0])
    cb = _codebook_literal(codebooks)
    return F.transform(
        cb, lambda book, m: F.transform(
            book, lambda cw: dot(F.slice(qv, m * d + 1, d), cw)))


def pq_topk_indexed(queries: DataFrame, index: PqIndex, k: int = 5,
                    nprobe: int = 2, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    adc: str = "recon") -> DataFrame:
    """IVF-PQ approximate cosine top-k against the persisted compressed
    index: queries probe their nprobe nearest coarse clusters (map-side,
    centroid literals), the probe join prunes corpus partitions (DPP),
    and ADC scores each candidate — exact query against the reconstructed
    codeword vector over the stored exact norm.

    ``adc`` picks the scoring form:
      * ``"recon"`` (default) — reconstruct the codeword vector and take
        one full-width dot.  One 64-element left fold per pair, the SAME
        association order as the DuckDB oracle, so catalog scores
        hash-match bit-for-bit.
      * ``"table"`` — precompute the per-query [M][K] lookup table
        (query_table_expr) before the join; each candidate then costs M
        lookups + M-1 adds instead of an O(D) fold — the FAISS-style scan
        and the form to ship when the probed partitions are large (the
        per-pair work no longer scales with dimension).  Sums per
        subspace first, so scores differ from "recon" by ulps
        (association order); ranks agree except on ulp-ties
        (pytest-differentialed, with a measured receipt in
        tests/test_pq.py)."""
    from .ivf import assign_clusters

    if adc not in ("recon", "table"):
        raise ValueError(f"adc must be 'recon' or 'table', got {adc!r}")
    spark = queries.sparkSession
    c = spark.read.parquet(index.corpus_path)
    q = (assign_clusters(queries, [list(c_) for c_ in index.centroids],
                         id_col, vec_col, "query_id", nprobe=nprobe)
         .withColumnsRenamed({"vec": "qv", "nrm": "qn"}))
    cent = F.element_at(_centroid_literal(index.centroids),
                        F.col("cluster_id") + 1)
    if adc == "table":
        # the table is a per-query-row attribute: computed once per probe
        # row before the join (the window in assign_clusters already
        # materialized q's columns), referenced — not recomputed — per pair
        q = q.withColumn("qtab", query_table_expr(F.col("qv"),
                                                  index.codebooks))
        approx_dot = F.aggregate(
            F.zip_with(F.col("codes"), F.col("qtab"),
                       lambda code, row: F.element_at(row, code + 1)),
            F.lit(0.0), lambda acc, v: acc + v)
        if index.residual:
            # dot(q, cent + recon_res) = dot(q, cent) + table sum; the
            # centroid term is one fold per pair but over nprobe distinct
            # values per query — still cheaper than full reconstruction
            approx_dot = approx_dot + dot(F.col("qv"), cent)
    else:
        recon = reconstruct_expr(F.col("codes"), index.codebooks)
        if index.residual:
            # IVFADC: codes quantize (v - centroid), so reconstruction
            # adds the coarse centroid back before the one full-width dot
            recon = F.zip_with(cent, recon, lambda x, y: x + y)
        approx_dot = dot(F.col("qv"), recon)
    scored = (
        q.join(c, "cluster_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                (approx_dot / (F.col("qn") * F.col("cn"))).alias("score"))
        # no dedup needed: each corpus row lives in exactly ONE cluster
        # (nprobe=1 assignment), so a (query, neighbor) pair can match the
        # probe join at most once — a distinct here would be a full extra
        # shuffle over the scored pairs for nothing (r8 self-review)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "score"))


def pq_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
            codebooks=None, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Flat (un-probed) PQ top-k: every query ADC-scores the whole encoded
    corpus — the compressed twin of brute_force_topk, and the recall
    baseline the IVF-probed variant is judged against in tests."""
    codebooks = codebooks or train_codebooks_from_df(corpus, vec_col)
    from .similarity import _with_norm

    q = _with_norm(queries, id_col, vec_col, "query_id", "qv", "qn")
    c = encode(corpus, codebooks, id_col, vec_col, "neighbor_id")
    recon = reconstruct_expr(F.col("codes"), codebooks)
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                (dot(F.col("qv"), recon)
                 / (F.col("qn") * F.col("cn"))).alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "score"))
