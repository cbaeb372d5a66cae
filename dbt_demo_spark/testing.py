"""Differential-test harness: replicate the driver's t2 gate locally.

For each catalog query with an oracle, run the Spark DataFrame and the DuckDB
SQL on the same parquet inputs and compare row count, schema (column names +
arrow types), and an order-insensitive value digest.  This is our local
mirror of the driver's CORRECTNESS_r{N}.json check, so a query that passes
here should pass the gate.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from .sources.parquet import TESTDATA_TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""

    def __bool__(self) -> bool:
        return self.ok


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the driver tables as DuckDB views, as the driver does.

    A table may be a single file (the driver's layout) or a directory of
    part files named ``{t}.parquet`` (tools/make_scale.py's splittable
    layout) — DuckDB needs a glob for the latter."""
    import os

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{src}')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        # strict: the driver's value-hash is assumed exact, so we compare
        # exact; catalog queries must round explicitly on both sides.
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _canon_type(t: pa.DataType) -> str:
    """Canonical arrow type name for schema comparison.

    The driver's value hash is TYPE-sensitive (round 1 shipped three oracle
    bugs where DuckDB's SUM(BIGINT)->decimal128 hashed differently from
    Spark's int64 while a name-only schema check stayed green), so the local
    gate must compare types too.  Equivalences are granted only where round-1
    driver evidence shows its hash ignores the difference:
      * integer width (text_token_count int32 vs len() int64: hash_match=true)
      * timestamp timezone tag (events_hourly_rollup: hash_match=true)
    decimal vs integer stays DISTINCT — that's the class that shipped."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_type(t.value_type)}>"
    if pa.types.is_large_string(t):
        return "string"
    if pa.types.is_large_binary(t):
        return "binary"
    return str(t)


def _canon_table(tbl: pa.Table) -> tuple[list[str], list[str]]:
    """Column-name-sorted, order-insensitive canonical form:
    (sorted "name:type" strings, sorted row strings)."""
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    sig = [f"{c}:{_canon_type(tbl.schema.field(c).type)}" for c in cols]
    rows = [
        "|".join(_canon_cell(v) for v in row)
        for row in zip(*(tbl.column(c).to_pylist() for c in cols))
    ]
    rows.sort()
    return sig, rows


def compare(name: str, spark_df: DataFrame, con: duckdb.DuckDBPyConnection,
            oracle: str) -> CompareResult:
    # toArrow (Spark 4) preserves logical types exactly — toPandas would
    # coerce nullable int64 columns to float64 and corrupt the comparison.
    spark_tbl = spark_df.toArrow()
    oracle_tbl = con.execute(oracle).arrow()

    s_cols, s_rows = _canon_table(spark_tbl)
    o_cols, o_rows = _canon_table(oracle_tbl)

    if s_cols != o_cols:
        return CompareResult(name, False, len(s_rows), len(o_rows),
                             f"schema mismatch: spark={s_cols} oracle={o_cols}")
    if len(s_rows) != len(o_rows):
        return CompareResult(name, False, len(s_rows), len(o_rows), "row count mismatch")
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
        return CompareResult(name, False, len(s_rows), len(o_rows),
                             f"value mismatch, first diffs: {diffs}")
    return CompareResult(name, True, len(s_rows), len(o_rows))


def run_catalog(spark: SparkSession, sf_dir: str,
                only: list[str] | None = None) -> list[CompareResult]:
    from .queries import CATALOG

    con = duckdb_connection(sf_dir)
    results = []
    for name, spec in CATALOG.items():
        if only and name not in only:
            continue
        if spec.oracle is None:
            continue
        try:
            results.append(compare(name, spec.fn(spark, sf_dir), con, spec.oracle))
        except Exception as e:  # surface, don't abort the sweep
            results.append(CompareResult(name, False, -1, -1, f"exception: {e}"))
    return results
