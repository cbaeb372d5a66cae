"""Cross-engine-deterministic numeric helpers.

The reference rounds money with SQL ROUND (fct_loan_details.sql:25-33), which
DuckDB evaluates on the binary double while Spark's F.round goes through Java
BigDecimal.valueOf (shortest decimal string) — at half-cent boundaries the two
disagree (observed: avg 642583.42/4 -> Spark .86, DuckDB .85; SURVEY.md §7.2
item 1).  For differential-tested queries we therefore round with only
exactly-specified IEEE-754 ops, bit-identical in every engine:

    round_n(x) = floor(x * 10^n + 0.5) / 10^n      (half-up toward +inf)

`floor`, `*`, `+`, `/` are all correctly-rounded IEEE doubles in both Spark
(JVM) and DuckDB (C++), so both engines produce the same 64 bits.  Use the
Spark form and the SQL form in matched pairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def roundn(col: Column, n: int = 2) -> Column:
    scale = float(10 ** n)
    return F.floor(col * scale + F.lit(0.5)) / scale


def round2(col: Column) -> Column:
    return roundn(col, 2)


def sql_roundn(expr: str, n: int = 2) -> str:
    scale = float(10 ** n)
    return f"FLOOR(({expr}) * {scale!r} + 0.5) / {scale!r}"


def sql_round2(expr: str) -> str:
    return sql_roundn(expr, 2)


# --- integer-scaled money aggregation --------------------------------------
#
# Even the floor-trick flips when (a) two engines' double sums differ by an
# ulp AND (b) the true decimal value sits exactly on a rounding boundary —
# which for 4-decimal revenue terms like extprice*(1-discount) happens in
# ~1% of groups.  The only order-independent sum is an integer sum: scale
# fixed-decimal money to int64 first, sum exactly, divide once at the end.
# Both engines then hold bit-identical inputs for every later operation.
# (DuckDB's sum(BIGINT) widens to HUGEINT — divide by a float scale right
# away so the surfaced column is DOUBLE in both engines.)


def scaled_long(col: Column, decimals: int = 2) -> Column:
    """Money column with `decimals` fixed decimals -> exact integer units."""
    return F.round(col * float(10 ** decimals), 0).cast("long")


def sql_scaled_long(expr: str, decimals: int = 2) -> str:
    return f"CAST(ROUND(({expr}) * {float(10 ** decimals)!r}, 0) AS BIGINT)"
