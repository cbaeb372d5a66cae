"""Streaming daily spine — gap-fill with EVENT-TIME TIMERS via
``transformWithStateInPandas`` (the Spark 4 StatefulProcessor API): the
true streaming twin of the batch date-spine gap-fill
(queries/timeseries.py events_gapfill_ffill), emitting one row per (user,
day) on the dense grid as the watermark proves each day closed.

Two fill paths compose the dense grid:

  * OBSERVATION-DRIVEN (handleInputRows): a new observation for day D
    first emits carried rows for every gap day since the user's last
    emitted day, then the observation day itself (last observation per
    day wins, ordered by (ts, event_id) — the batch twin's struct-max);
  * TIMER-DRIVEN (handleExpiredTimer): an event-time timer is kept
    registered at the END of the user's next unemitted day; when the
    WATERMARK passes it (proving no earlier-timestamped observation can
    still arrive) the day is emitted as carried, and the timer advances
    to the next day.  This is what applyInPandasWithState could not
    express (one timeout per key, reset on data) and why the LOCF twin
    (streaming/locf.py) documents spine emission as out of its scope.

Late rows BELOW the watermark for already-emitted days are dropped (the
append-mode contract; the batch job over the landed table is the
order-repair path).  State per key: (last_value, next_day_ms, timer_ms)
— three fixed-width fields, hash-partitioned by user.

OUTPUT CONTRACT (append mode cannot retract): every CLOSED day appears
exactly once, but the NEWEST observed day is re-emitted with a refined
value when later observations for it arrive in a subsequent micro-batch
(the `day == next_day - DAY_MS` branch; within one batch the dedup dict
collapses them).  Consumers must therefore apply last-write-wins per
(user, day) — the standard append-stream upsert contract, and exactly
what the streamed==batch twin tests do.  Suppressing the refinement
instead would freeze the first value and diverge from the batch twin's
last-observation-per-day semantics.

Runtime dependency: transformWithState's Python runner protocol needs
``protobuf`` (a PySpark extra not shipped in every environment); the
module imports without it, the query start is what requires it — the
pytest twin import-skips accordingly.

Determinism note for tests: with ``withWatermark(ts, "0 seconds")`` and
availableNow, the final no-data micro-batch fires every timer whose day
END <= max(ts), so the streamed grid equals the batch window's rows for
all days strictly before the corpus's last day, plus observation rows on
the last day itself (trailing carried rows for the unfinished last day
are exactly what a correct streaming job must NOT emit yet).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (ExpiredTimerInfo,
                                                      StatefulProcessor,
                                                      StatefulProcessorHandle,
                                                      TimerValues)

DAY_MS = 86_400_000
OUT_SCHEMA = "user_id long, day_ms long, gauge double, observed boolean"
STATE_SCHEMA = "last_value double, next_day_ms long, timer_ms long"


def _day_ms(ts) -> int:
    ms = int(pd.Timestamp(ts).value // 1_000_000)
    return ms - ms % DAY_MS


class DailySpineProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.state = handle.getValueState("spine", STATE_SCHEMA)

    def _load(self):
        if self.state.exists():
            return tuple(self.state.get())
        return (None, None, None)

    def _retime(self, timer_ms, next_day_ms):
        """Keep exactly one timer registered: at the END of the next
        unemitted day."""
        want = next_day_ms + DAY_MS
        if timer_ms == want:
            return timer_ms
        if timer_ms is not None:
            self.handle.deleteTimer(timer_ms)
        self.handle.registerTimer(want)
        return want

    def handleInputRows(self, key: Any, rows, timerValues: TimerValues
                        ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
        pdf = pdf[pdf["value"].notna()]
        last, next_day, timer = self._load()
        out = []
        for ts, val in zip(pdf["ts"], pdf["value"]):
            day = _day_ms(ts)
            if next_day is None:                    # user's first obs
                out.append((day, float(val), True))
            elif day < next_day - DAY_MS:
                continue                            # late, day already closed
            elif day == next_day - DAY_MS:
                # same-day refinement: a later obs on the newest emitted
                # day replaces the carry (batch twin: last obs per day)
                out.append((day, float(val), True))
            else:
                d = next_day
                while d < day:                      # gap days, carried
                    out.append((d, last, False))
                    d += DAY_MS
                out.append((day, float(val), True))
            last = float(val)
            next_day = max(next_day or 0, day + DAY_MS)
        if next_day is not None:
            timer = self._retime(timer, next_day)
            self.state.update((last, next_day, timer))
        if out:
            # one row per day: the LAST entry for a day wins
            dedup = {}
            for day, g, obs in out:
                dedup[day] = (g, obs or dedup.get(day, (None, False))[1])
            yield pd.DataFrame({
                "user_id": key[0],
                "day_ms": list(dedup),
                "gauge": [v[0] for v in dedup.values()],
                "observed": [v[1] for v in dedup.values()],
            })

    def handleExpiredTimer(self, key: Any, timerValues: TimerValues,
                           expiredTimerInfo: ExpiredTimerInfo
                           ) -> Iterator[pd.DataFrame]:
        last, next_day, timer = self._load()
        if next_day is None:
            return
        wm = timerValues.getCurrentWatermarkInMs()
        out = []
        while next_day + DAY_MS <= wm:              # day provably closed
            out.append((next_day, last, False))
            next_day += DAY_MS
        timer = self._retime(None, next_day)        # expired one is gone
        self.state.update((last, next_day, timer))
        if out:
            yield pd.DataFrame({
                "user_id": key[0],
                "day_ms": [d for d, _, _ in out],
                "gauge": [g for _, g, _ in out],
                "observed": [o for _, _, o in out],
            })

    def close(self) -> None:
        pass


def streaming_daily_spine(events: DataFrame,
                          watermark: str = "0 seconds") -> DataFrame:
    """(user_id, ts, event_id, value) observation stream -> the dense
    (user_id, day, gauge, observed) daily grid: each closed day emitted
    once when the watermark proves it over; the newest observed day may
    be RE-emitted with a refined value when later observations for it
    span micro-batches — consumers apply last-write-wins per (user, day)
    (module docstring, OUTPUT CONTRACT).  ``day`` is surfaced as a DATE
    (state carries epoch-day ms)."""
    import pyspark.sql.functions as F

    ev = (events.select("user_id", "ts", "event_id", "value")
          .withWatermark("ts", watermark))
    grid = (ev.groupBy("user_id")
            .transformWithStateInPandas(
                DailySpineProcessor(),
                outputStructType=OUT_SCHEMA,
                outputMode="append",
                timeMode="EventTime"))
    return grid.select(
        "user_id",
        F.to_date(F.timestamp_millis(F.col("day_ms"))).alias("day"),
        "gauge", "observed")
