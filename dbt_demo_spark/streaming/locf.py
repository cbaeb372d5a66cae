"""Stateful forward-fill (LOCF) over an event stream — the streaming twin
of the batch gap-fill's carry stage (queries/timeseries.py
events_gapfill_ffill): each row is annotated with the last OBSERVED gauge
value for its key, carried across micro-batches in GroupState.

The batch twin is ``last(value, ignorenulls) OVER (PARTITION BY user_id
ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)`` — pytest pins streamed
== batch on the same data (tests/test_operators.py).

What the streaming form does NOT do: emit spine rows for gap DAYS.  A
batch job can generate the dense daily grid after the fact;  a stream
would need per-key event-time timers firing daily, which
applyInPandasWithState's timeout model (one timeout per key, reset on
data) doesn't express cleanly — run the batch gap-fill over the landed
table for the dense grid, use this operator for always-current carried
values on the live stream.

Ordering contract: rows are carried in (ts, event_id) order WITHIN a
micro-batch (sorted in the handler); ACROSS batches the carry follows
arrival order — the standard streaming LOCF contract (a late observation
lands with its arrival batch; the batch twin over the landed table is
the order-repair path).

Scale: state is one double per key, hash-partitioned by the grouping key
(one shuffle per micro-batch, touching only the batch's keys).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id long, ts timestamp, event_id long, value double, "
              "gauge double, observed boolean")
STATE_SCHEMA = "last_value double"


def _locf(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
          state: GroupState) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    last = state.get[0] if state.exists else None
    gauges, observed = [], []
    for v in rows["value"]:
        if pd.notna(v):
            last = float(v)
            observed.append(True)
        else:
            observed.append(False)
        gauges.append(last)
    state.update((last,))
    yield pd.DataFrame({
        "user_id": key[0],
        "ts": rows["ts"],
        "event_id": rows["event_id"],
        "value": rows["value"],
        "gauge": gauges,
        "observed": observed,
    })


def streaming_locf(events: DataFrame) -> DataFrame:
    """(user_id, ts, event_id, value?) -> the same rows with ``gauge`` =
    last non-null value carried forward per user (NULL until the user's
    first observation) and an ``observed`` flag.  State: one double per
    key, NoTimeout (a gauge stays current however long the key is quiet;
    bound it with a TTL variant if the key space churns)."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _locf,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
