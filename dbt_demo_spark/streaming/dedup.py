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
    key's row only when its count changes.

    State is UNBOUNDED (NoTimeout): correct for a finite backlog replay or
    a key space that genuinely never expires, but on an endless stream use
    ``streaming_first_seen_ttl`` — the event-time-TTL variant that drops a
    key's state once the watermark passes its last event + TTL."""
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


def _first_seen_ttl_fn(ttl_ms: int):
    """Handler factory: first-seen dedup whose per-key state expires
    ``ttl_ms`` of EVENT TIME after the key's latest event.  When the
    watermark passes that point Spark invokes the handler with
    ``hasTimedOut`` and no data; the state is dropped, so a later event
    for the key re-emits as a fresh "first" — bounded state on an endless
    stream, at the cost of re-admitting duplicates separated by more than
    the TTL (the standard windowed-dedup contract)."""

    def handler(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            first_event_id, first_ts, n_seen = state.get
        else:
            first_event_id = int(rows.iloc[0]["event_id"])
            first_ts, n_seen = rows.iloc[0]["ts"], 0
        n_seen += len(rows)
        state.update((first_event_id, first_ts, n_seen))
        # TTL anchored on the key's LATEST event: a hot key stays deduped,
        # a silent key expires once the watermark passes last_ts + ttl
        last_ts = rows["ts"].max()
        state.setTimeoutTimestamp(
            int(last_ts.timestamp() * 1000) + ttl_ms)
        user_id, event_type = key
        yield pd.DataFrame({
            "user_id": [user_id],
            "event_type": [event_type],
            "first_event_id": [first_event_id],
            "first_ts": [first_ts],
            "n_dupes_suppressed": [n_seen - 1],
        })

    return handler


def interval_ms(spark, interval: str) -> int:
    """Milliseconds in a Spark interval string — full interval syntax
    (``'90 seconds'``, ``'1 day'``, ``'1 hour 30 minutes'``), evaluated by
    the engine's own interval parser so TTL strings accept exactly what
    ``withWatermark`` accepts.  One row-local job at stream-setup time."""
    micros = spark.sql(
        "SELECT unix_micros(TIMESTAMP '1970-01-01 00:00:00' + INTERVAL "
        f"{interval})").first()[0]
    return micros // 1000


def streaming_first_seen_ttl(events: DataFrame, ttl: str = "1 hour",
                             watermark: str = "10 minutes") -> DataFrame:
    """TTL-bounded first-seen dedup: like ``streaming_first_seen`` but per-
    key state is dropped once the watermark passes the key's last event +
    ``ttl`` (GroupStateTimeout.EventTimeTimeout) — the handler's timeout
    branch removes the state, and an expired key's next event re-emits as a
    fresh first.  State size is bounded by the keys active within one TTL
    window instead of the lifetime key space.  ``ttl`` takes the same
    interval syntax as ``watermark``."""
    ttl_ms = interval_ms(events.sparkSession, ttl)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _first_seen_ttl_fn(ttl_ms),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_dedup_within_watermark(events: DataFrame,
                                     delay: str = "10 minutes") -> DataFrame:
    """Built-in twin of the TTL dedup: ``dropDuplicatesWithinWatermark``
    emits the first row per key and suppresses duplicates arriving within
    the watermark delay of each other; the engine evicts a key's state once
    the watermark passes, so — exactly like the TTL variant — a duplicate
    separated by more than the delay re-emits.  Use this when "first row,
    bounded memory" is all that's needed; the applyInPandasWithState
    variant additionally carries bookkeeping (suppressed counts, first-seen
    metadata) no built-in operator tracks."""
    return (
        events.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
