"""Training-shard output layout — the trainer-facing end of the corpus
pipeline: accepted documents become split-partitioned, budget-packed
parquet shards a data loader consumes directly.

Composition (every piece is an already-tested operator):

    chunk_documents (fixed token windows, split carried through)
      -> pack_chunks (sharded first-fit-decreasing into token budgets,
                      grouped by (split, shard) so no bin mixes splits)
      -> one row per PACKED SEQUENCE (ordered chunk texts + provenance)
      -> parquet partitioned by (split, shard)

Scale posture: chunking is row-local JVM dataflow; packing is ONE shuffle
on (split, shard); the sequence roll-up rides the same partitioning
(groupBy on a superset of the packing keys); the write is a streaming-free
dynamic partition layout.  Shard assignment uses the PORTABLE integer hash
by default (functions/text.HASH_P arithmetic — the same family as
text_stable_split) so the census below is oracle-checkable in any engine
and the layout is reproducible outside Spark; ``xxhash64`` is the
production alternative (cheaper, better mixed, Spark-only).

The census (``shard_census``) is the receipt: per (split, shard) document
/ chunk / token counts computed WITHOUT exploding chunks — the chunk count
per document is closed-form integer arithmetic — so it runs as a pure
aggregation over the corpus and doubles as the driver-gateable catalog row
(queries/llm_pipeline.py corpus_shard_census).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.text import HASH_P, subword_cost, subword_costs, tokens
from .chunk import chunk_documents
from .packing import pack_chunks

# Fibonacci-hash multiplier reduced mod HASH_P, DISTINCT from the split
# multiplier (queries/llm_pipeline._SPLIT_MULT uses the Knuth constant):
# shard and split assignments must be independent hash functions or shard
# populations would correlate with split membership.  Reduced form keeps
# every intermediate <= (P-1)^2 — int64-safe for any doc_id.
_SHARD_MULT = 11400714819323198485 % HASH_P


@dataclass(frozen=True)
class ShardSpec:
    """Layout parameters for the packed-shard output.

    chunk_tokens / overlap: the chunker's window (operators/chunk.py);
    budget: max tokens per packed sequence (the model context length);
    n_shards: packing-parallelism + file fan-out per split;
    cost_model: what the budget is denominated in — ``"whitespace"``
    (word count, the chunker's own unit), ``"subword"`` (the BPE-ish
    per-word ceil(len/4) estimate, functions/text.subword_cost), or
    ``"bpe"`` (EXACT token counts under the frozen learned merge table,
    operators/bpe_frozen.py via the pure-JVM regex fold of
    operators/bpe.bpe_cost_expr — the unit a trainer's context window is
    actually measured in, measured rather than estimated).  Under
    ``"subword"``/``"bpe"`` every packed row carries ``n_cost`` next to
    ``n_tokens`` and bins respect the budget in cost units; a chunk whose
    cost alone exceeds the budget gets a bin of its own (the packer's
    documented oversize rule — words-to-subwords expansion is
    data-dependent, so no chunk_tokens bound can preclude it)."""
    chunk_tokens: int
    budget: int
    overlap: int = 0
    n_shards: int = 16
    cost_model: str = "whitespace"

    def __post_init__(self):
        if self.cost_model not in ("whitespace", "subword", "bpe"):
            raise ValueError(
                f"unknown cost_model {self.cost_model!r}: "
                "expected 'whitespace', 'subword' or 'bpe'")
        if self.cost_model == "whitespace" and self.budget < self.chunk_tokens:
            raise ValueError(
                f"budget {self.budget} < chunk_tokens {self.chunk_tokens}: "
                "every full chunk would be oversized")
        if self.n_shards <= 0:
            raise ValueError("n_shards must be positive")
        # same bound the chunker enforces — validating here makes the
        # census path (which never calls the chunker) fail loudly too,
        # instead of dividing by a zero stride
        if not 0 <= self.overlap < self.chunk_tokens:
            raise ValueError("need 0 <= overlap < chunk_tokens")


def shard_column(doc_id: Column, n_shards: int) -> Column:
    """Portable deterministic shard assignment: pure int64-safe integer
    math, identical in any engine (the oracle twin is plain SQL)."""
    return ((doc_id % HASH_P) * _SHARD_MULT) % HASH_P % n_shards


def build_training_shards(docs: DataFrame, spec: ShardSpec,
                          text_col: str = "text", id_col: str = "doc_id",
                          split_col: str = "split") -> DataFrame:
    """One row per packed training sequence:

    (split, shard, bin_id, n_chunks, n_tokens, doc_ids, chunk_texts)

    ``chunk_texts`` is the bin's chunks in FFD placement order (the
    ``pos`` index pack_chunks emits) — concatenating them is the
    trainer's sequence; ``doc_ids`` is aligned provenance.  Bins never
    mix splits (the split participates in the packing group) and never
    exceed ``spec.budget`` tokens unless a single chunk alone does
    (impossible here: ShardSpec enforces budget >= chunk_tokens and the
    chunker never emits a chunk longer than chunk_tokens)."""
    chunks = chunk_documents(docs, spec.chunk_tokens, spec.overlap,
                             text_col=text_col, id_col=id_col,
                             carry_cols=(split_col,))
    cost_col = "n_tokens"
    if spec.cost_model == "subword":
        # budget in estimated BPE tokens: the cost rides the same row, so
        # tokenizer-awareness costs one row-local HOF fold, zero shuffles
        cost_col = "n_cost"
        chunks = chunks.withColumn(
            "n_cost", subword_cost(F.col("chunk_text")).cast("int"))
    elif spec.cost_model == "bpe":
        # budget in REAL tokenizer units: exact counts under the frozen
        # learned merges — still row-local JVM expression work, zero
        # shuffles, zero Python (operators/bpe.py documents why the
        # rank-order regex fold is exact BPE)
        from .bpe import bpe_cost_expr
        from .bpe_frozen import FROZEN_BPE_MERGES

        cost_col = "n_cost"
        chunks = chunks.withColumn(
            "n_cost",
            bpe_cost_expr(F.col("chunk_text"),
                          FROZEN_BPE_MERGES).cast("int"))
    # the chunk text rides the packing shuffle as a carry column: the
    # layout needs text grouped by bin anyway, so this is the one shuffle
    # the corpus bytes must cross — a join-back alternative would
    # recompute the chunk pipeline AND pay a second shuffle to reattach it
    packed = pack_chunks(chunks, spec.budget, n_shards=spec.n_shards,
                         group_cols=(split_col,),
                         carry_cols=("chunk_text",),
                         shard_col=shard_column(F.col("doc_id"),
                                                spec.n_shards),
                         cost_col=cost_col)
    # the roll-up groups on a superset of the packing keys, riding the
    # packing shuffle's clustering — no extra exchange
    cost_aggs = ([F.sum("n_cost").alias("n_cost")]
                 if spec.cost_model in ("subword", "bpe") else [])
    seq = (
        packed.groupBy(split_col, "shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
            *cost_aggs,
            # placement-ordered roll-ups: sort_array on (pos, payload)
            # structs, then project — aggregation order is never relied on
            F.transform(
                F.sort_array(F.collect_list(
                    F.struct(F.col("pos"), F.col("doc_id")))),
                lambda s: s["doc_id"]).alias("doc_ids"),
            F.transform(
                F.sort_array(F.collect_list(
                    F.struct(F.col("pos"), F.col("chunk_text")))),
                lambda s: s["chunk_text"]).alias("chunk_texts"),
        )
    )
    return seq


def write_training_shards(docs: DataFrame, out_dir: str, spec: ShardSpec,
                          text_col: str = "text", id_col: str = "doc_id",
                          split_col: str = "split",
                          partition_literals: dict | None = None) -> None:
    """Materialize the packed sequences as parquet partitioned by
    (split, shard): ``out_dir/split=train/shard=3/part-*.parquet``.  A
    trainer reads one split directory; a distributed loader assigns shard
    directories to workers; both prune at the directory level (static
    partition pruning — no footer even gets read outside the slice).

    The repartition on the partition keys makes each (split, shard) land
    as ONE file written by one task — without it every task can emit a
    file into every directory (tasks x partitions small files, the classic
    dynamic-partition-write mistake at scale).

    ``partition_literals``: extra leading partition columns written as
    literals (e.g. ``{"ingest_batch_id": 7}`` from the streaming twin).
    When given, the write switches to a DYNAMIC partition overwrite so a
    replayed batch overwrites exactly its own partitions — the same
    exactly-once story as the streaming warehouse sink — instead of
    clobbering the whole layout."""
    seq = build_training_shards(docs, spec, text_col, id_col, split_col)
    lead = list(partition_literals or {})
    for k, v in (partition_literals or {}).items():
        seq = seq.withColumn(k, F.lit(v))
    writer = (seq.repartition(F.col(split_col), F.col("shard"))
              .write.mode("overwrite"))
    if lead:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy(*lead, split_col, "shard").parquet(out_dir)


def read_training_shards(spark, out_dir: str) -> DataFrame:
    """Read the packed-shard layout back (partition columns restored)."""
    return spark.read.parquet(out_dir)


def shard_census(docs: DataFrame, spec: ShardSpec,
                 text_col: str = "text", id_col: str = "doc_id",
                 split_col: Column | None = None) -> DataFrame:
    """Per (split, shard): document, chunk, and token counts — the shard
    layout's receipt, computed WITHOUT exploding chunks: the chunker's
    chunk count per document is closed-form,

        n_chunks = greatest(1, 1 + floor((n - chunk + stride - 1)/stride))

    so the census is one narrow aggregation over the corpus (one shuffle
    on ~n_shards*3 groups), engine-portable, and cheap enough to run as a
    gate on every build.  ``n_tokens`` counts PACKED tokens — each chunk
    past the first repeats exactly ``overlap`` tokens, so the closed form
    is ``n + (n_chunks - 1) * overlap`` (exact: the chunker guarantees
    every tail is longer than the overlap) — equal to the realized
    layout's per-(split, shard) token sum (tested).  ``split_col``
    defaults to the pipeline's deterministic hash split
    (pipeline.split_column)."""
    from ..pipeline import split_column

    if split_col is None:
        split_col = split_column(F.col(id_col))
    stride = spec.chunk_tokens - spec.overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.lit(1) + F.floor((n - F.lit(spec.chunk_tokens) + F.lit(stride)
                            - F.lit(1)) / F.lit(stride)).cast("int"))
    cost_sel, cost_aggs = [], []
    if spec.cost_model in ("subword", "bpe"):
        # packed cost, still without exploding chunks: every word's
        # cost once, plus the costs of the words each overlap region
        # REPEATS — region i (1-based chunk index) is exactly the word
        # positions [i*stride+1, i*stride+overlap], and the chunker
        # guarantees every tail outlasts the overlap, so the slices never
        # run off the document
        zero = F.lit(0).cast("long")
        if spec.cost_model == "subword":
            costs = subword_costs(toks)
        else:
            # exact per-word BPE counts under the frozen merges — the
            # regex fold rides inside ONE transform lambda, so the
            # 89-replace expression exists once and evaluates per word
            from .bpe import bpe_cost_expr
            from .bpe_frozen import FROZEN_BPE_MERGES

            costs = F.transform(
                toks, lambda t: bpe_cost_expr(t, FROZEN_BPE_MERGES)
                .cast("int"))
        # fold the costs array already built above — subword_cost(text)
        # would re-tokenize the full text (HOF subtrees are not reliably
        # CSE'd by Catalyst), doubling the census's per-row work
        cost_all = F.aggregate(costs, zero, lambda acc, v: acc + v)
        if spec.overlap:
            repeated = F.when(n_chunks > 1, F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), n_chunks - 1),
                    lambda i: F.aggregate(
                        F.slice(costs, i * stride + 1, spec.overlap),
                        zero, lambda acc, v: acc + v)),
                zero, lambda acc, v: acc + v)).otherwise(zero)
        else:
            repeated = zero
        cost_sel = [(cost_all + repeated).alias("_c")]
        cost_aggs = [F.sum("_c").cast("long").alias("n_cost")]
    return (
        docs.select(
            split_col.alias("split"),
            shard_column(F.col(id_col), spec.n_shards).cast("long")
            .alias("shard"),
            n.alias("_n"), n_chunks.alias("_nc"), *cost_sel)
        .groupBy("split", "shard")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("_nc").alias("n_chunks"),
             (F.sum("_n")
              + (F.sum("_nc") - F.count(F.lit(1))) * F.lit(spec.overlap))
             .cast("long").alias("n_tokens"),
             *cost_aggs)
    )


def packing_utilization(seq: DataFrame, spec: ShardSpec) -> DataFrame:
    """Per-(split, shard) bin-utilization receipt over the packed layout
    (build_training_shards output): bin count, packed cost, mean fill
    fraction against the budget, and the fill of the emptiest/fullest
    bin.  This is the number a capacity plan runs on — utilization says
    how many shard files the token budget actually bought.

    Also the auditable FFD floor: within any packing group, at most ONE
    bin can be half-empty (two such bins would have been merged by
    first-fit), so ``n_half_empty <= 1`` per (split, shard) — asserted in
    tests/test_shards.py as the composition-survives invariant."""
    cost = "n_cost" if spec.cost_model in ("subword", "bpe") else "n_tokens"
    fill = F.col(cost) / F.lit(spec.budget)
    return (seq
            .select("split", "shard", F.col(cost).alias("_cost"),
                    fill.alias("_fill"))
            .groupBy("split", "shard")
            .agg(F.count(F.lit(1)).alias("n_bins"),
                 F.sum("_cost").cast("long").alias("packed_cost"),
                 (F.sum("_cost") / (F.count(F.lit(1)) * spec.budget))
                 .alias("utilization"),
                 F.min("_fill").alias("min_fill"),
                 F.max("_fill").alias("max_fill"),
                 F.sum(F.when(F.col("_fill") <= 0.5, 1).otherwise(0))
                 .cast("long").alias("n_half_empty")))
