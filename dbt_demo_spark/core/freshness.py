"""Source freshness — the ``dbt source freshness`` analog [public
knowledge: dbt sources declare a ``loaded_at_field`` with
``warn_after`` / ``error_after`` thresholds; the command computes
``max(loaded_at_field)`` per source and reports pass / warn / error].

The check is ONE single-column MAX aggregation per source — column
pruning reduces the scan to the loaded-at column, and at 100 TB a
date-partitioned source resolves it from partition values without
touching data files.  ``now`` is an explicit argument, not a wall-clock
read: freshness is a comparison against a caller-supplied reference
instant, which keeps results reproducible (and testable) — the same
determinism rule the rest of the engine follows.

Reference parity: the reference project declares its seeds statically
and has no freshness config; this extends the engine with the dbt-core
surface its users would reach for once sources become continuously
loaded (the streaming ingest twin, streaming/ingest.py, is exactly such
a source).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date, datetime

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class FreshnessSpec:
    source: str
    loaded_at_col: str
    warn_after_s: float | None = None    # None: never warns (error-only)
    error_after_s: float | None = None   # None: never escalates past warn


@dataclass
class FreshnessResult:
    source: str
    max_loaded_at: datetime | None        # None: source has no rows
    age_s: float | None
    status: str                           # "pass" | "warn" | "error"

    def __bool__(self) -> bool:
        return self.status == "pass"


def check_freshness(relations: dict[str, DataFrame],
                    specs: list[FreshnessSpec],
                    now: datetime) -> list[FreshnessResult]:
    """Evaluate each spec against ``now``.  An EMPTY source is an
    ``error`` (dbt reports a runtime error when the loaded-at max is
    NULL — a source that never loaded is the stalest possible)."""
    out: list[FreshnessResult] = []
    for spec in specs:
        src = relations[spec.source]
        row = src.agg(F.max(spec.loaded_at_col).alias("m")).collect()[0]
        if row.m is None:
            out.append(FreshnessResult(spec.source, None, None, "error"))
            continue
        m = row.m
        if isinstance(m, date) and not isinstance(m, datetime):
            # DATE-typed loaded_at: a day loaded "on d" is fresh through
            # the END of day d, so age measures from d+1 midnight — at
            # midnight-of-d the same-day load would already read ~24h old
            # and any sub-day threshold would warn on a fresh source
            # (ADVICE r8)
            from datetime import timedelta

            m = datetime(m.year, m.month, m.day) + timedelta(days=1)
        # a DATE source checked during day d sits "before" its end-of-day
        # reference instant; clamp to 0 — fresh, not negative-aged
        age = max(0.0, (now - m).total_seconds())
        if spec.error_after_s is not None and age > spec.error_after_s:
            status = "error"
        elif spec.warn_after_s is not None and age > spec.warn_after_s:
            status = "warn"
        else:
            status = "pass"
        out.append(FreshnessResult(spec.source, row.m, age, status))
    return out
