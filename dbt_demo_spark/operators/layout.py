"""Z-order clustered layout — multi-dimensional data skipping for parquet.

Partition pruning (core/runner.py partition_by) prunes ONE dimension; a
100 TB fact table is queried on several (ship date AND customer, lat AND
lon).  Sorting by column A packs A tightly but scatters B across every
file; the Z-order (Morton) curve interleaves the bits of both, so files
hold small rectangles of the (A, B) space and a point/box predicate on
EITHER column skips most files via parquet min/max footer stats [public
knowledge: Morton 1966; Delta Lake OPTIMIZE ZORDER BY].

Everything is JVM expression work:

  * Each column is affinely mapped to a ``bits``-wide integer rank over
    its [min, max] (the min/max pair is a one-row aggregate — the same
    train-then-apply shape as the IVF centroid step).
  * The Morton value interleaves those ranks bit-by-bit with a statically
    unrolled shift/or expression (bits * ncols terms, whole-stage
    codegen'd; no UDF, no Python).
  * ``write_zordered`` range-partitions on the Morton value and sorts
    within partitions, so each output file covers one compact Z-range =
    one small hyper-rectangle.

``skipping_receipt`` measures the payoff honestly: per-file min/max from
the parquet footers (pyarrow), and the fraction of files a box predicate
must read.  tests/test_layout.py pins that a Z-ordered table reads a
small fraction where the unsorted layout reads ~all files — at cluster
scale the same footer check is what Spark's scan planning does, so the
receipt is the speedup.
"""

from __future__ import annotations

import os
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_Z = "__zval__"


def _rank_expr(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Affine map of ``col`` onto [0, 2**bits): rank = floor((x - lo) /
    (hi - lo) * (2**bits - 1) + 0.5), clamped — constants ride the plan as
    literals.  A degenerate column (lo == hi) ranks to 0 everywhere."""
    n = (1 << bits) - 1
    if hi == lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) \
        / F.lit(float(hi - lo)) * n
    r = F.round(scaled, 0).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n), r)).cast("long")


def morton_expr(ranks: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits from each rank column: output bit
    (i * ncols + j) is bit i of rank j.  Statically unrolled shift/or —
    one codegen'd expression, no loop at runtime."""
    ncols = len(ranks)
    terms = []
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * ncols + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_column(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """The Morton value over ``cols`` for this DataFrame, bounds trained
    by one min/max aggregate over ``df`` (2 * ncols scalars to the
    driver)."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder supports 1-4 columns")
    if bits * len(cols) > 62:
        raise ValueError("bits * ncols must fit in a signed long")
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    ranks = [_rank_expr(F.col(c), row[f"_lo_{c}"], row[f"_hi_{c}"], bits)
             for c in cols]
    return morton_expr(ranks, bits)


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 16, bits: int = 12) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Z-curve of ``cols``: range-partition on the Morton value (one
    skew-aware range shuffle — Spark samples the distribution), sort
    within partitions so row groups inside each file stay tight too."""
    z = zorder_column(df, cols, bits)
    (df.withColumn(_Z, z)
     .repartitionByRange(n_files, F.col(_Z))
     .sortWithinPartitions(_Z)
     .drop(_Z)
     .write.mode("overwrite").parquet(path))


def skipping_receipt(path: str, box: dict[str, tuple]) -> dict:
    """Footer-stats pruning receipt: for each parquet file under ``path``,
    read its row-group min/max for the ``box`` columns (pyarrow, no Spark
    job) and decide whether ANY row group overlaps the box — the same
    decision a scan's filter pushdown makes.  Returns
    ``{files, files_read, frac_read}``."""
    import pyarrow.parquet as pq

    files = [os.path.join(dp, f)
             for dp, _dn, fns in os.walk(path)
             for f in fns if f.endswith(".parquet")]
    read = 0
    for fp in files:
        meta = pq.ParquetFile(fp).metadata
        schema_idx = {meta.row_group(0).column(i).path_in_schema: i
                      for i in range(meta.num_columns)} if meta.num_row_groups else {}
        hit = False
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            ok = True
            for col, (lo, hi) in box.items():
                st = rg.column(schema_idx[col]).statistics
                if st is None or st.min is None:
                    continue  # no stats -> cannot prune, must read
                if st.min > hi or st.max < lo:
                    ok = False
                    break
            if ok:
                hit = True
                break
        read += hit
    return {"files": len(files), "files_read": read,
            "frac_read": read / len(files) if files else 0.0}
