"""Sequence packing — fill fixed token-budget bins with chunks, the step
after chunking in a pretraining pipeline (context-window packing: short
sequences are concatenated up to the model's context length so padding
doesn't waste FLOPs).

Packing is inherently stateful (which bin a chunk lands in depends on every
chunk placed before it), so the bin assignment cannot be a pure window
expression; it runs as first-fit-decreasing INSIDE Arrow-batched
``applyInPandas`` groups.  Distribution strategy for 100 TB:

  * chunks are sharded by a deterministic hash of the id column —
    one shuffle, shards are independent, any parallelism;
  * each shard packs its own chunks FFD (sorted by descending size,
    first bin with room, else open a new bin) — O(n log n) per shard,
    state never leaves the shard;
  * bin ids are (shard, local bin index) so they are globally unique and
    the result is deterministic for a given shard count: reshuffling
    executors, re-running, or changing cluster size never changes the
    packing (hash sharding + in-shard total order fix it).

Sharded FFD trades a bounded amount of packing efficiency (each shard
packs only its own chunks) for linear scalability — the standard
trade in distributed bin packing; utilization loss shrinks as shards get
larger because FFD waste concentrates in the final bins of each shard.
Oversized chunks (n_tokens > budget) get a bin of their own — they must be
truncated/split upstream (chunk_documents never emits one when
chunk_tokens <= budget).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

PACKED_SCHEMA = ("shard int, bin_id long, doc_id long, chunk_id int, "
                 "n_tokens int, pos int")


def pack_chunks(chunks: DataFrame, budget: int, n_shards: int = 64,
                id_col: str = "doc_id",
                group_cols: tuple[str, ...] = (),
                carry_cols: tuple[str, ...] = (),
                shard_col: Column | None = None,
                cost_col: str = "n_tokens") -> DataFrame:
    """(shard, bin_id, doc_id, chunk_id, n_tokens, pos): every input chunk
    assigned to exactly one bin; sum(n_tokens) per bin <= budget unless the
    bin holds a single oversized chunk.  Deterministic for fixed
    ``n_shards``.  ``pos`` is the chunk's placement index within its bin
    (the FFD iteration order) — the order a shard writer concatenates the
    bin's chunks in, so packed sequences are reproducible byte-for-byte.

    ``group_cols``: extra packing-group columns carried through the output
    (e.g. a ``split`` assignment — bins must never mix train and val rows,
    so the split participates in the grouping, not just the layout).
    ``carry_cols``: per-chunk payload columns (e.g. the chunk text) that
    ride the packing shuffle WITHOUT joining the grouping — the shard
    writer needs the text grouped by bin anyway, and carrying it through
    the one packing shuffle beats recomputing the chunk pipeline and
    paying a second join shuffle to reattach it.
    ``shard_col``: override the shard-assignment expression (default
    ``pmod(xxhash64(id), n_shards)``; a portable-hash caller passes its own
    so the assignment is reproducible outside Spark).
    ``cost_col``: the column the budget is denominated in (default
    ``n_tokens``, the whitespace count).  A tokenizer-aware caller packs by
    an estimated-subword column instead (functions/text.subword_cost) —
    the budget a trainer cares about is BPE tokens, not words — while
    ``n_tokens`` still rides through for provenance."""
    if budget <= 0:
        raise ValueError("budget must be positive")

    import pandas as pd  # noqa: F401  (applyInPandas contract)

    extra = list(group_cols)

    def pack_shard(pdf):
        # FFD: descending size, tie-broken by (doc_id, chunk_id) for
        # determinism; linear scan over open bins (shards are sized so
        # bins-per-shard stays small; a heap drops this to log n if not)
        pdf = pdf.sort_values(
            [cost_col, "doc_id", "chunk_id"],
            ascending=[False, True, True], kind="mergesort")
        bins: list[int] = []  # remaining room per bin
        fill: list[int] = []  # chunks placed per bin (the next pos)
        assign = []
        pos = []
        for tok in pdf[cost_col]:
            placed = -1
            for b, room in enumerate(bins):
                if room >= tok:
                    placed = b
                    bins[b] = room - tok
                    break
            if placed < 0:
                bins.append(max(0, budget - tok))
                fill.append(0)
                placed = len(bins) - 1
            assign.append(placed)
            pos.append(fill[placed])
            fill[placed] += 1
        out = pdf[["shard", "doc_id", "chunk_id", "n_tokens",
                   *cost, *extra, *carry]].copy()
        out["bin_id"] = assign
        out["pos"] = pos
        return out[["shard", "bin_id", "doc_id", "chunk_id", "n_tokens",
                    "pos", *cost, *extra, *carry]]

    carry = list(carry_cols)
    cost = [] if cost_col == "n_tokens" else [cost_col]
    if shard_col is None:
        shard_col = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    sharded = chunks.withColumn("shard", shard_col.cast("int"))
    fields = {f.name: f.dataType.simpleString() for f in chunks.schema.fields}
    schema = PACKED_SCHEMA + "".join(
        f", {c} {fields[c]}" for c in cost + extra + carry)
    return (
        sharded.select("shard", "doc_id", "chunk_id", "n_tokens",
                       *cost, *extra, *carry)
        .groupBy("shard", *extra)
        .applyInPandas(pack_shard, schema)
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bin fill statistics: one row per (shard, bin_id) with chunk
    count, token total, and utilization — the pipeline health metric
    (average utilization is what packing exists to maximize)."""
    return (
        packed.groupBy("shard", "bin_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"),
             F.sum("n_tokens").alias("tokens"),
             (F.sum("n_tokens") / F.lit(budget)).alias("utilization"))
    )
