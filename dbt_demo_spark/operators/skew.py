"""Salted join — the join-side skew lever (the aggregation-side twin is
queries/windows.py events_salted_rollup).

When a join key is heavily skewed (one tenant, one bot user, one null-ish
default), the shuffle hash-partitions every row of the hot key into ONE
reducer, and that task runs for hours while the cluster idles.  AQE's
skew-join handling splits oversized sort-merge partitions at runtime, but
it only triggers on detected size thresholds and only for join strategies
it can re-plan; explicit salting is the deterministic, always-available
form of the same idea:

  * the BIG side gains a salt in [0, n_salt) hashed from the whole row —
    a hot key's rows spread across n_salt reducers;
  * the SMALL side is replicated once per salt value (explode over
    sequence) — n_salt copies, so every (key, salt) bucket can still find
    its match;
  * the join runs on (key, salt); dropping the salt afterwards yields a
    result row-identical to the unsalted join (asserted in tests).

Cost model: small side bytes x n_salt extra shuffle/broadcast volume buys
a 1/n_salt cap on any one reducer's share of a hot key.  Use for
fact-to-medium-dim joins where the dim is too big to broadcast but cheap
to replicate; for broadcastable dims just broadcast (no shuffle at all).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_SALT = 16


def salted_join(big: DataFrame, small: DataFrame, on: list[str] | str,
                n_salt: int = DEFAULT_SALT, how: str = "inner") -> DataFrame:
    """Join ``big`` with ``small`` on ``on`` with ``n_salt``-way key
    salting.  Row-identical to ``big.join(small, on, how)`` for inner and
    left joins (the supported modes: replication makes right-side
    multiplicity ambiguous for right/full joins)."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    keys = [on] if isinstance(on, str) else list(on)
    # whole-row hash: deterministic, and spreads a hot KEY because the
    # non-key columns vary across its rows
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                  F.lit(n_salt)).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return b.join(s, keys + ["_salt"], how).drop("_salt")
