"""Deduplication operators for LLM-training-data pipelines.

Four families, all pure DataFrame compositions (no Python UDFs):

  * exact            — hash-groupBy on content (one shuffle on the content
                       hash; at 100 TB group by xxhash64(text) instead of
                       the raw text to keep shuffle keys small)
  * minhash_lsh      — shingle -> minhash signature -> band -> bucket-join
                       candidates -> exact (hashed-)shingle Jaccard verify
  * simhash          — position-insensitive 64-bit-ish fingerprint from
                       token-hash bit votes; near-dups share fingerprints
  * ngram_jaccard    — exact n-gram Jaccard via inverted-index join (the
                       verify path of minhash, usable standalone for small
                       query sets)

Every function takes a token-hash column builder so the portable
(oracle-checkable) char hash and the production `xxhash64` are
interchangeable.  Scale notes per function.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.text import HASH_P, shingle_hashes, token_hashes

# MinHash parameters: K hash functions in BANDS bands of ROWS_PER_BAND.
# Fixed odd multipliers/offsets — deterministic, no RNG.
K_MINHASH = 8
BANDS = 2
ROWS_PER_BAND = K_MINHASH // BANDS
_A = [2654435761, 2246822519, 3266489917, 668265263,
      374761393, 2654435789, 2246822579, 3266489989]
_B = [1, 7, 31, 127, 8191, 131071, 524287, 2147483647]


def exact_dedup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level exact-duplicate stats: total docs, distinct texts,
    duplicate rows.  One pass, partial-aggregated."""
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.col(text_col)).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(F.col(text_col))).alias("n_dupes"),
    )


def exact_dedup_keep_first(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Exact dedup keeping the lowest id per distinct text.  The groupBy is
    the canonical exact-dedup shuffle; returns (keep_id, n_copies, text)."""
    return (
        docs.groupBy(text_col)
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies", F.col(text_col).alias("text"))
    )


def doc_shingles(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sh: array<long>) of hashed 3-token shingles; drops docs with
    < 3 tokens (no shingle exists, and Spark's `sequence` would run
    descending)."""
    th = token_hashes(F.col(text_col))
    return (
        docs.select(F.col(id_col).alias("doc_id"), th.alias("th"))
        .filter(F.size("th") >= 3)
        .select("doc_id", shingle_hashes(F.col("th")).alias("sh"))
    )


def minhash_signature(shingled: DataFrame) -> DataFrame:
    """(doc_id, m0..m{K-1}): minhash over the shingle-hash array — pure
    per-row array math, no shuffle."""
    def _mh(a: int, b: int):
        # closure, not default args — Spark maps a lambda's arity onto the
        # higher-order function's parameters, so extra defaulted params
        # would be misread as the element-index argument.
        return lambda s: (s * a + b) % HASH_P

    cols = [
        F.array_min(F.transform(F.col("sh"), _mh(_A[i], _B[i]))).alias(f"m{i}")
        for i in range(K_MINHASH)
    ]
    return shingled.select("doc_id", *cols)


def band_keys(signatures: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key): one row per band.  band_key packs the
    band's minhash rows; equal keys -> LSH candidate bucket."""
    bands = []
    for b in range(BANDS):
        key = F.lit(0).cast("long")
        for r in range(ROWS_PER_BAND):
            key = key * 31 + F.col(f"m{b * ROWS_PER_BAND + r}")
        bands.append(F.struct(F.lit(b).alias("band_id"), key.alias("band_key")))
    return (
        signatures.select("doc_id", F.explode(F.array(*bands)).alias("band"))
        .select("doc_id", "band.band_id", "band.band_key")
    )


def lsh_candidates(bands: DataFrame) -> DataFrame:
    """Distinct candidate pairs (d1 < d2) sharing any band bucket.  The
    self-join shuffles on (band_id, band_key) — at 100 TB this is the only
    quadratic-risk step, bounded by bucket size; oversized buckets (degenerate
    content) should be dropped with a bucket-count filter upstream."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )


def jaccard_verify(candidates: DataFrame, shingled: DataFrame,
                   threshold: float) -> DataFrame:
    """Exact Jaccard over distinct hashed shingles for candidate pairs;
    keeps pairs >= threshold.  Jaccard is a ratio of exact ints — engine
    independent."""
    sets = shingled.select(
        "doc_id", F.array_distinct("sh").alias("ss"), F.size(F.array_distinct("sh")).alias("n"))
    s1 = sets.alias("s1")
    s2 = sets.alias("s2")
    inter = F.size(F.array_intersect(F.col("s1.ss"), F.col("s2.ss")))
    jac = inter * 1.0 / (F.col("s1.n") + F.col("s2.n") - inter)
    return (
        candidates.join(s1, F.col("d1") == F.col("s1.doc_id"))
        .join(s2, F.col("d2") == F.col("s2.doc_id"))
        .select("d1", "d2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_near_dups(docs: DataFrame, threshold: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> signature -> bands ->
    candidates -> Jaccard >= threshold.  Returns (d1, d2, jaccard)."""
    shingled = doc_shingles(docs, text_col, id_col)
    cands = lsh_candidates(band_keys(minhash_signature(shingled)))
    return jaccard_verify(cands, shingled, threshold)


def simhash(docs: DataFrame, n_bits: int = 16, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """SimHash fingerprint: per bit position, tokens vote +1/-1 by their
    hash bit; the sign of the tally is the fingerprint bit.  Pure per-row
    array math.  Returns (doc_id, simhash)."""
    th = token_hashes(F.col(text_col))

    def _vote(mask: int):
        return lambda x: F.when(x.bitwiseAND(F.lit(mask)) > 0,
                                F.lit(1)).otherwise(F.lit(-1))

    fp = F.lit(0).cast("long")
    for bit in range(n_bits):
        votes = F.aggregate(F.transform(th, _vote(1 << bit)),
                            F.lit(0), lambda acc, v: acc + v)
        fp = fp + F.when(votes > 0, F.lit(1 << bit)).otherwise(F.lit(0))
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("simhash"))


def ngram_jaccard_pairs(query_docs: DataFrame, corpus: DataFrame,
                        threshold: float) -> DataFrame:
    """Exact shingle-Jaccard of each query doc against the corpus via an
    inverted-index join on shingle hash (explode -> join -> count), skipping
    the signature step entirely.  Right-sized when the query side is small
    (e.g. incremental ingest vs existing corpus); full-corpus N^2 is what
    minhash_lsh avoids."""
    q = doc_shingles(query_docs).select(
        F.col("doc_id").alias("qid"), F.array_distinct("sh").alias("qs"))
    c = doc_shingles(corpus).select(
        F.col("doc_id").alias("cid"), F.array_distinct("sh").alias("cs"))
    qx = q.select("qid", F.explode("qs").alias("h"), F.size("qs").alias("qn"))
    cx = c.select("cid", F.explode("cs").alias("h"), F.size("cs").alias("cn"))
    return (
        qx.join(cx, "h")
        .filter(F.col("qid") != F.col("cid"))
        .groupBy("qid", "cid", "qn", "cn")
        .agg(F.count(F.lit(1)).alias("inter"))
        .select(
            "qid", "cid",
            (F.col("inter") * 1.0
             / (F.col("qn") + F.col("cn") - F.col("inter"))).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
