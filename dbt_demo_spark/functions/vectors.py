"""Vector (embedding) column functions as Spark higher-order functions.

All JVM-side — `zip_with` + `aggregate` folds, no Python.  The fold
accumulates left-to-right exactly like DuckDB's `list_dot_product`, and both
engines do correctly-rounded IEEE double ops, so scores are BIT-IDENTICAL
across engines (verified on 2500 real embedding pairs) — similarity queries
need no rounding to hash-match their oracles.

At 100 TB the same expressions apply per-row inside codegen; the scale
lever is candidate pruning (LSH bucketing, `lsh_bucket`) not the arithmetic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from .text import HASH_P


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def sql_dot(a: str, b: str) -> str:
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_cosine(a: str, b: str) -> str:
    return f"{sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)})"


# --- random-hyperplane LSH (sign-bit bucketing) ----------------------------
#
# Plane coefficients are derived from a deterministic integer formula (no
# RNG, no libm) so both engines build the exact same planes:
#   plane(j, d) = ((j+1)*65537 + (d+1)*2654435761) % P) / P - 0.5
#
# 16 planes -> 65,536 buckets: a same-bucket join prunes ~65,536x, and the
# recall lost to the finer partitioning is bought back with multi-probe
# (probe_buckets: the bucket plus its 16 Hamming-1 neighbors), so the
# candidate set is ~17/65,536 of the corpus instead of 1/256 as with the
# previous 8-plane single-probe variant — the difference between a bounded
# and an effectively quadratic within-bucket join at 100 TB.

N_PLANES = 16
DIM = 64


def _plane(j: int) -> list[float]:
    return [(((j + 1) * 65537 + (d + 1) * 2654435761) % HASH_P) / HASH_P - 0.5
            for d in range(DIM)]


def lsh_bucket(vec: Column) -> Column:
    """0..2^N_PLANES-1 bucket id from sign bits of N_PLANES plane dots —
    ONE zip_with pass over the plane matrix.  `vec` should be a plain column
    reference (the callers select it into an attribute first), so the
    per-plane references stay cheap."""
    planes = F.array(*[
        F.array(*[F.lit(v) for v in _plane(j)]) for j in range(N_PLANES)])
    bits = F.array(*[F.lit(1 << j) for j in range(N_PLANES)])
    return F.aggregate(
        F.zip_with(planes, bits,
                   lambda p, b: F.when(dot(vec, p) > 0, b).otherwise(F.lit(0))),
        F.lit(0), lambda acc, v: acc + v)


def probe_buckets(bucket: Column) -> Column:
    """Multi-probe set: the bucket and its N_PLANES Hamming-1 neighbors
    (flip each sign bit once).  All 1+N_PLANES values are distinct, so a
    probe join produces each candidate pair at most once."""
    return F.array(bucket,
                   *[bucket.bitwiseXOR(F.lit(1 << j)) for j in range(N_PLANES)])


def sql_lsh_bucket(vec: str) -> str:
    terms = []
    for j in range(N_PLANES):
        plane = "[" + ", ".join(repr(v) for v in _plane(j)) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(CAST({vec} AS DOUBLE[]), {plane}) > 0"
            f" THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def sql_probe_join(cbucket: str, qbucket: str) -> str:
    """DuckDB join condition matching probe_buckets: corpus bucket equals
    the query bucket or any Hamming-1 neighbor of it."""
    terms = [f"{cbucket} = {qbucket}"] + [
        f"{cbucket} = xor({qbucket}, {1 << j})" for j in range(N_PLANES)]
    return "(" + " OR ".join(terms) + ")"
