"""TPC-H-style analytical queries over the driver's synthetic star schema.

These are the classic public TPC-H query shapes (spec: TPC-H v3, public),
adapted to the driver tables' columns — they exercise multi-way joins,
filtered aggregation, and deterministic top-k beyond the reference's own
3-model surface.  Populated in M3.
"""

from __future__ import annotations
