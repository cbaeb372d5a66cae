"""Mergeable percentile sketches: a t-digest (Dunning's merging variant,
public algorithm) with a two-level Spark aggregation — the path a
federated 100 TB stats job needs, where exact quantiles (X28,
queries/text_filters.corpus_length_quantiles) would shuffle every value
and a single-pass GK sketch cannot be unioned across independently
prepared shards.

Shape:

  stage 1 — ``tdigest_shards``: one digest row per Arrow batch via
      mapInPandas — NO shuffle; each worker summarizes its partition
      stream into O(delta) centroids.  This is the map-side combine of
      sketch aggregation.
  stage 2 — ``merge_shard_digests``: the tiny digest rows (a few KB each)
      merge into one digest.  Runs as a single-group applyInPandas (one
      reducer task — correct at any scale because the input is
      shard-COUNT-sized, not data-sized) or driver-side via
      ``merge_digests`` for the federated case (digests arriving from
      separate jobs/clusters as plain arrays).

Accuracy: with the k1 scale function (asin) and compression ``delta``,
centroid q-spans are bounded by ~1/delta except at the tails where they
shrink — observed rank error is well under 1/delta at mid-quantiles
(rank-bound differential vs the exact sort in tests/test_tdigest.py).
Merging digests loses no mergeability: merge(d(A), d(B)) carries the same
bound class as d(A ∪ B) (tested: batch-split invariance within the rank
bound).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame

DIGEST_SCHEMA = ("means array<double>, weights array<double>, "
                 "n double, vmin double, vmax double")


@dataclass
class Digest:
    """A t-digest: centroid means (ascending) + weights, with exact
    count/min/max.  Plain arrays — trivially serializable for federation."""
    means: list[float]
    weights: list[float]
    n: float
    vmin: float
    vmax: float


def _k(q: float, delta: float) -> float:
    # k1 scale function: finer clusters at the tails, coarser mid-stream
    return delta / (2.0 * math.pi) * math.asin(2.0 * min(max(q, 0.0), 1.0) - 1.0)


def _compress(means, weights, delta: float):
    """Merge sorted (mean, weight) pairs greedily under the k1 size bound.
    Input must be sorted by mean; output is the compressed centroid list."""
    total = float(sum(weights))
    if total == 0:
        return [], []
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = means[0], float(weights[0])
    cum = 0.0  # weight fully emitted so far
    k_lo = _k(0.0, delta)
    for m, w in zip(means[1:], weights[1:]):
        q_hi = (cum + cur_w + w) / total
        if _k(q_hi, delta) - k_lo <= 1.0:
            # absorb: weighted mean stays within the cluster's q-span bound
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            k_lo = _k(cum / total, delta)
            cur_m, cur_w = m, float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return out_m, out_w


def build_digest(values, delta: float = 200.0) -> Digest:
    """Digest a value sequence (one shard's worth) — sort + one compress
    pass, O(n log n) local work, O(delta) output."""
    import numpy as np

    a = np.asarray(values, dtype=np.float64)
    a = a[~np.isnan(a)]
    if a.size == 0:
        return Digest([], [], 0.0, math.inf, -math.inf)
    a.sort()
    m, w = _compress(a.tolist(), [1.0] * a.size, delta)
    return Digest(m, w, float(a.size), float(a[0]), float(a[-1]))


def merge_digests(digests, delta: float = 200.0) -> Digest:
    """Merge any number of digests into one: concatenate centroids, sort
    by mean, re-compress.  Associative and order-insensitive up to the
    rank bound — the federation primitive."""
    digests = list(digests)  # iterated more than once below
    pairs = sorted(
        (m, w) for d in digests for m, w in zip(d.means, d.weights))
    n = sum(d.n for d in digests)
    if not pairs or n == 0:
        return Digest([], [], 0.0, math.inf, -math.inf)
    m, w = _compress([p[0] for p in pairs], [p[1] for p in pairs], delta)
    return Digest(m, w, float(n),
                  min(d.vmin for d in digests if d.n),
                  max(d.vmax for d in digests if d.n))


def quantile(d: Digest, q: float) -> float:
    """Estimate the q-quantile: linear interpolation over the centroid
    cumulative-weight midpoints, exact min/max at the tails (standard
    t-digest estimation)."""
    if d.n == 0:
        return math.nan
    if not 0.0 <= q <= 1.0:
        raise ValueError("q outside [0, 1]")
    target = q * d.n
    cum = 0.0
    prev_mid, prev_mean = 0.0, d.vmin
    for m, w in zip(d.means, d.weights):
        mid = cum + w / 2.0
        if target < mid:
            if mid == prev_mid:
                return m
            frac = (target - prev_mid) / (mid - prev_mid)
            return prev_mean + frac * (m - prev_mean)
        prev_mid, prev_mean = mid, m
        cum += w
    # past the last centroid midpoint: interpolate toward the exact max
    if d.n == prev_mid:
        return d.vmax
    frac = (target - prev_mid) / (d.n - prev_mid)
    return prev_mean + frac * (d.vmax - prev_mean)


# --- Spark two-level aggregation -----------------------------------------


def tdigest_shards(df: DataFrame, value_col: str,
                   delta: float = 200.0) -> DataFrame:
    """Stage 1: one digest row per Arrow batch, NO shuffle (mapInPandas).
    At 100 TB every partition stream folds to O(delta) doubles before
    anything moves."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            d = build_digest(pdf[value_col].to_numpy(), delta)
            if d.n == 0:
                continue
            yield pd.DataFrame({
                "means": [d.means], "weights": [d.weights],
                "n": [d.n], "vmin": [d.vmin], "vmax": [d.vmax]})

    return df.select(value_col).mapInPandas(run, DIGEST_SCHEMA)


def merge_shard_digests(shards: DataFrame, delta: float = 200.0) -> Digest:
    """Stage 2: union the shard digest rows and merge.  The rows are
    collected — they are sketch-sized (O(shards * delta) doubles), not
    data-sized; the same rows could equally be merged by a single-group
    applyInPandas when the result must stay a DataFrame."""
    rows = shards.collect()
    return merge_digests(
        (Digest(list(r.means), list(r.weights), r.n, r.vmin, r.vmax)
         for r in rows), delta)


def sketch_quantiles(df: DataFrame, value_col: str, probs,
                     delta: float = 200.0) -> dict[float, float]:
    """One-call path: two-level t-digest quantiles for a column."""
    d = merge_shard_digests(tdigest_shards(df, value_col, delta), delta)
    return {p: quantile(d, p) for p in probs}


def grouped_sketch_quantiles(df: DataFrame, key_col: str, value_col: str,
                             probs, delta: float = 200.0,
                             n_shards: int = 32) -> DataFrame:
    """Per-key quantile sketches — the mergeable twin of the exact
    per-language quantiles (X28, corpus_length_quantiles): returns one
    row per key with the estimated quantiles as an array (aligned with
    ``probs``).

    Two-level inside Spark: stage 1 digests (key, hash-shard) groups via
    applyInPandas — a skewed key's values spread over ``n_shards``
    sub-digests so no single task holds a hot key's whole stream; stage 2
    merges each key's shard digests (sketch-sized rows) and estimates.
    Both stages shuffle only (key, digest) rows after the first
    aggregation — at 100 TB the values cross the wire once, pre-reduced
    to O(delta) centroids per (key, shard)."""
    import pandas as pd
    import pyspark.sql.functions as F

    probs = list(probs)
    stage1_schema = f"key string, {DIGEST_SCHEMA}"

    def digest_group(pdf: pd.DataFrame) -> pd.DataFrame:
        d = build_digest(pdf[value_col].to_numpy(), delta)
        return pd.DataFrame({
            "key": [str(pdf["_key"].iloc[0])],
            "means": [d.means], "weights": [d.weights],
            "n": [d.n], "vmin": [d.vmin], "vmax": [d.vmax]})

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        d = merge_digests(
            (Digest(list(m), list(w), n, lo, hi)
             for m, w, n, lo, hi in zip(pdf["means"], pdf["weights"],
                                        pdf["n"], pdf["vmin"], pdf["vmax"])),
            delta)
        return pd.DataFrame({
            "key": [pdf["key"].iloc[0]],
            "n": [d.n],
            "quantiles": [[quantile(d, p) for p in probs]]})

    shards = (
        # content-hashed shard key (never monotonically_increasing_id: a
        # position-dependent key changes under task retry/reordering, so
        # re-executed tasks could regroup rows other reducers already
        # consumed — and runs would not be reproducible).  Hashing the
        # value spreads a hot key's stream; equal values collapsing into
        # one shard is harmless for a digest (they compress to one
        # centroid anyway).
        df.select(F.col(key_col).cast("string").alias("_key"),
                  value_col,
                  F.pmod(F.xxhash64(F.col(key_col), F.col(value_col)),
                         F.lit(n_shards)).alias("_shard"))
        .groupBy("_key", "_shard")
        .applyInPandas(digest_group, stage1_schema)
    )
    return (
        shards.groupBy("key")
        .applyInPandas(merge_group,
                       "key string, n double, quantiles array<double>")
    )
