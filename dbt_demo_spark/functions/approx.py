"""The approx-distinct opt-in — the documented 100 TB escape hatch for
exact COUNT(DISTINCT).

Exact distinct aggregation plans an Expand + TWO shuffle stages (partial
distinct on (group, value), then the final count), and its state is the
full distinct value set per group.  `approx_count_distinct`
(HyperLogLog++) is one shuffle with O(1) state per group and a declared
relative standard deviation — the only form that also works under
incremental/streaming aggregation (streaming/rollup.py already uses it;
this module is the batch-side opt-in).

The catalog's oracled queries stay EXACT (the driver hash-compares
values); `distinct_count(approx=True)` is what a 100 TB deployment flips
per metric once a ±rsd error band is acceptable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

DEFAULT_RSD = 0.02


def distinct_count(col: Column | str, approx: bool = False,
                   rsd: float = DEFAULT_RSD) -> Column:
    """``countDistinct`` or its HLL++ approximation, one flag apart, so a
    rollup definition can scale without rewriting its aggregation list."""
    return F.approx_count_distinct(col, rsd) if approx else F.countDistinct(col)
