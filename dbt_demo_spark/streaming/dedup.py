"""Custom stateful streaming operator: keyed FIRST-SEEN dedup via
``applyInPandasWithState`` — the streaming form of exact dedup for an
ingest pipeline (emit the first record per key, suppress every later
duplicate, remember what was seen across micro-batches).

Why a custom operator: ``dropDuplicates`` on a stream keeps state forever
and emits per-batch; this operator owns its state explicitly — the seen-set
per key lives in GroupState, an event-time timeout (TTL) can bound it, and
the emitted row carries first-seen bookkeeping.  The same pattern carries
any per-key online algorithm (counters, HLL sketches, anomaly scores) that
Structured Streaming's built-in aggregates can't express.

Scale: state is partitioned by the grouping key across executors (one
shuffle); each micro-batch touches only the keys present in the batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, event_type string, first_event_id long, " \
             "first_ts timestamp, n_dupes_suppressed long"
STATE_SCHEMA = "first_event_id long, first_ts timestamp, n_seen long"


def _first_seen(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    """Emit one row the first time a key appears; afterwards only update the
    suppressed-duplicate counter in state (emitting the refreshed count)."""
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    if state.exists:
        first_event_id, first_ts, n_seen = state.get
    else:
        first_event_id, first_ts, n_seen = int(rows.iloc[0]["event_id"]), rows.iloc[0]["ts"], 0
    n_seen += len(rows)
    state.update((first_event_id, first_ts, n_seen))
    user_id, event_type = key
    yield pd.DataFrame({
        "user_id": [user_id],
        "event_type": [event_type],
        "first_event_id": [first_event_id],
        "first_ts": [first_ts],
        "n_dupes_suppressed": [n_seen - 1],
    })


def streaming_first_seen(events: DataFrame) -> DataFrame:
    """First event per (user_id, event_type) with duplicate suppression —
    state persists across micro-batches; output mode `update` re-emits a
    key's row only when its count changes."""
    return (
        events.groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _first_seen,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
