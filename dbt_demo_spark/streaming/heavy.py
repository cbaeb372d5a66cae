"""Streaming Misra-Gries heavy-hitter sketch — the online twin of the
batch candidate pass (operators/heavy.py), via ``applyInPandasWithState``.

A live ingest pipeline wants "what's hot right now" (boilerplate phrases,
hot keys, trending n-grams) without keeping a counter per distinct item —
at web scale the distinct-item set IS the stream.  The sketch keys the
stream by a hash shard of the item and keeps ONE bounded MG summary per
shard in GroupState:

  * every item's occurrences land in exactly one shard (hash routing), so
    a shard's summary sees the item's full stream — the batch pass's
    per-partition guarantee, transplanted: a shard summary undercounts an
    item by at most shard_n/(k+1) and never overcounts (the same
    mergeable-summaries bound, tests/test_operators.py pins it against
    exact prefix counts);
  * state per shard is <= k counters regardless of how many distinct
    items flow through — memory is n_shards * k, not |vocabulary|;
  * each micro-batch folds its Arrow batches through the SAME _mg_merge
    the batch operator uses (per-distinct-key vectorized, no per-row
    Python) and emits the refreshed summary (update mode: the latest
    emission per shard, highest shard_n, is the current sketch).

Promoting sketch entries to EXACT heavy hitters stays a batch job — run
operators/heavy.heavy_hitters over the accumulated corpus with the sketch
as a candidate hint, or accept the bounded-error counts as-is (the usual
monitoring tradeoff).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.heavy import _mg_merge

OUT_SCHEMA = "shard int, item string, mg_count long, shard_n long"
STATE_SCHEMA = "items array<string>, counts array<long>, n long"


def _mg_handler(k: int):
    def handler(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n = state.get
            counters = dict(zip(items, counts))
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            col = pdf["item"]
            n += len(col)
            counters = _mg_merge(counters, col.value_counts().to_dict(), k)
        state.update((list(counters),
                      [int(c) for c in counters.values()], n))
        (shard,) = key
        yield pd.DataFrame({
            "shard": shard,
            "item": list(counters),
            "mg_count": [int(c) for c in counters.values()],
            "shard_n": n,
        })

    return handler


def streaming_heavy_hitter_sketch(items: DataFrame, item_col: str = "item",
                                  k: int = 64,
                                  n_shards: int = 8) -> DataFrame:
    """Bounded-state streaming frequency sketch: route each item to
    ``xxhash64 % n_shards``, hold one <=``k``-counter MG summary per shard
    in GroupState, emit the refreshed summary every micro-batch (update
    mode).  One shuffle on the shard key; state size is n_shards * k
    counters forever, whatever the vocabulary does."""
    routed = items.select(
        F.col(item_col).cast("string").alias("item"),
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_shards))
        .cast("int").alias("shard"))
    return (routed.groupBy("shard").applyInPandasWithState(
        _mg_handler(k),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ))
