"""Line-level boilerplate removal (X108, r13) — the CCNet-style
paragraph/line dedup step [public knowledge: Wenzek et al. 2020, CCNet —
dedup at paragraph granularity removes headers/footers/navigation
chrome; Penedo et al. 2023, RefinedWeb, applies the same idea
line-wise].  Distinct from document/passage dedup (operators/dedup.py):
the DOCUMENT survives, only its lines that repeat across many documents
are stripped in place.

Spark-first shape, two stages:

  1. LINE CENSUS — per-document DISTINCT lines explode into a
     (line) groupBy counting how many documents carry each line: the
     one vocabulary-grain shuffle (lines repeated across >= min_docs
     docs are by definition few — boilerplate — and the census frame is
     line-vocabulary-sized, never corpus-sized).
  2. STRIP — rewrite each document row-locally:
       * small hot set (<= row_local_max, the common case): the hot
         lines become an IN-list inside a higher-order `F.filter` over
         the split array — zero joins, zero shuffles, whole-stage
         codegen; the driver-side collect is bounded by `max_hot`
         (same bounded-artifact policy as the decontamination grams).
       * large hot set: posexplode -> broadcast LEFT-ANTI join against
         the hot frame -> re-assemble by position with one doc-key
         shuffle — no driver collect at all, the 100 TB path.
     Both paths produce identical output (pinned by pytest).

Guards: `max_hot` caps the hot set — a corpus where MORE lines than
that repeat across min_docs documents is not exhibiting boilerplate
(the threshold is wrong for it), and the operator refuses loudly
instead of silently stripping half the corpus.

INCREMENTAL CENSUS (X109, r14 — VERDICT r13 item 2): the one-shot
census above re-scans the whole corpus every run; a growing corpus
needs the persisted-index lifecycle every other dedup family already
has (BM25 stats, passage/minhash/simhash indexes).  ``LineCensusIndex``
persists (line_hash, n_docs) — xxhash64 of the line, never the text:
8 bytes/line, the passage-index posture; a false strip needs a 64-bit
collision against a hot line, ~2^32 distinct lines by birthday bound —
and ``ingest_line_census`` folds each new batch in by integer sum-merge
on the hash key (only the batch is scanned; the census is
line-vocabulary-sized).  The commit mirrors ``ingest_bm25_stats``
exactly: batch ids ride INSIDE the staged swap (replay-inert in every
crash window, including the two-rename window via __old recovery) —
and ``remove_boilerplate_lines_served`` strips any batch against the
CURRENT census by hash membership, row-local or broadcast-anti exactly
like the one-shot strip.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

ROW_LOCAL_MAX = 256          # IN-list size above which the join path runs
DEFAULT_MAX_HOT = 10_000


def hot_lines(docs: DataFrame, min_docs: int = 3, sep: str = "\n",
              text_col: str = "text") -> DataFrame:
    """(line, n_docs) for every line appearing in >= min_docs distinct
    documents.  Per-document dedup (array_distinct) happens BEFORE the
    explode, so a line repeated inside one document counts once."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs} — "
                         "every line repeats across >= 1 document")
    return (docs.select(F.explode(F.array_distinct(
                F.split(F.col(text_col), sep))).alias("line"))
            .groupBy("line")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs))


def _strip_hot(docs: DataFrame, hot_keys: DataFrame, key_of,
               sample_vals: list, sep: str, text_col: str,
               id_col: str, row_local_max: int) -> DataFrame:
    """Shared strip engine for the one-shot and census-served paths:
    ``hot_keys`` is a 1-column frame of hot KEYS (raw line text or
    line_hash), ``key_of(line_expr)`` maps a line to its key, and
    ``sample_vals`` is the guard-bounded collected key list.  Small hot
    set: IN-list inside a higher-order filter — zero joins, codegen.
    Large: posexplode -> broadcast LEFT-ANTI on the key -> positional
    reassembly with one doc-key shuffle.  Identical output (pinned by
    pytest)."""
    if not sample_vals:
        return docs
    if len(sample_vals) <= row_local_max:
        cleaned = F.array_join(
            F.filter(F.split(F.col(text_col), sep),
                     lambda x: ~key_of(x).isin(*sample_vals)), sep)
        return docs.withColumn(text_col, cleaned)
    other_cols = [c for c in docs.columns if c != text_col]
    key_name = hot_keys.columns[0]
    exploded = docs.select(
        *other_cols,
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__line"))
    kept = exploded.join(
        F.broadcast(hot_keys.select(F.col(key_name).alias("__key"))),
        key_of(F.col("__line")) == F.col("__key"), "left_anti")
    rebuilt = (kept.groupBy(*other_cols)
               .agg(F.array_join(
                   F.transform(F.array_sort(F.collect_list(
                       F.struct("__pos", "__line"))),
                       lambda s: s["__line"]), sep).alias(text_col)))
    # documents whose EVERY line was hot drop out of the groupBy —
    # restore them with empty text (the row-local path's behavior)
    emptied = (docs.join(rebuilt.select(id_col), id_col, "left_anti")
               .withColumn(text_col, F.lit("")))
    cols = docs.columns
    return rebuilt.select(*cols).unionByName(emptied.select(*cols))


def _guarded_sample(hot_keys: DataFrame, max_hot: int, op_name: str,
                    threshold_desc: str) -> list:
    """Collect the hot-key set, refusing loudly past ``max_hot`` — the
    census is line-vocabulary-sized; take max_hot+1 to detect the guard
    violation without counting the whole frame."""
    key = hot_keys.columns[0]
    sample = hot_keys.select(key).limit(max_hot + 1).collect()
    if len(sample) > max_hot:
        raise ValueError(
            f"{op_name}: more than {max_hot} lines {threshold_desc} — "
            "that is not boilerplate, the threshold is wrong for this "
            "corpus (raise min_docs or max_hot explicitly)")
    return [r[0] for r in sample]


def remove_boilerplate_lines(docs: DataFrame, min_docs: int = 3,
                             sep: str = "\n", text_col: str = "text",
                             id_col: str = "doc_id",
                             max_hot: int = DEFAULT_MAX_HOT,
                             row_local_max: int = ROW_LOCAL_MAX) -> DataFrame:
    """Strip lines that appear in >= min_docs documents from every
    document, preserving the remaining lines' order.  Returns ``docs``
    with ``text_col`` rewritten (all other columns untouched)."""
    hot = hot_lines(docs, min_docs, sep, text_col)
    vals = _guarded_sample(hot.select("line"), max_hot,
                           "remove_boilerplate_lines",
                           f"repeat across >= {min_docs} documents")
    return _strip_hot(docs, hot.select("line"), lambda x: x, vals,
                      sep, text_col, id_col, row_local_max)


# ------------------------------------------------------------------ #
# X109: persisted incremental line census                            #
# ------------------------------------------------------------------ #

LINE_CENSUS_SCHEMA = "line_hash long, n_docs long"


@dataclass(frozen=True)
class LineCensusIndex:
    """Handle to a persisted cross-batch hot-line census directory.

    Layout (mirrors operators/bm25.Bm25StatsIndex):

      <path>/census        (line_hash BIGINT, n_docs BIGINT) parquet —
                           in how many ingested documents each line
                           (by xxhash64) has appeared, ever
      <path>/batches.json  ingested batch ids, committed INSIDE the
                           staged swap (exactly-once bookkeeping)
    """
    path: str

    @property
    def census_path(self) -> str:
        return os.path.join(self.path, "census")

    @property
    def batches_path(self) -> str:
        return os.path.join(self.path, "batches.json")

    def ingested_batches(self) -> set:
        from ..core.atomic import read_batch_ids
        return read_batch_ids(self.batches_path)


def _write_census_batches(idx: LineCensusIndex, ids: set) -> None:
    from ..core.atomic import write_batch_ids
    if not ids:
        return  # absent file == nothing ingested (non-streaming builds)
    write_batch_ids(idx.batches_path, ids)


def _batch_line_census(docs: DataFrame, sep: str,
                       text_col: str) -> DataFrame:
    """(line_hash, n_docs) integer partials from ONE batch: per-document
    DISTINCT lines (a line repeated inside one document counts once),
    hashed before the vocabulary-grain groupBy so nothing wider than
    8 bytes/line ever shuffles or lands on disk."""
    return (docs.select(F.explode(F.array_distinct(
                F.split(F.col(text_col), sep))).alias("__line"))
            .select(F.xxhash64("__line").alias("line_hash"))
            .groupBy("line_hash")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))


def build_line_census(docs: DataFrame, path: str, sep: str = "\n",
                      text_col: str = "text",
                      batch_id: int | None = None) -> LineCensusIndex:
    """Build the census from scratch (overwrites ``path``).  Staged like
    the ingest path so the FIRST streaming batch is also replay-safe: a
    crash mid-build leaves either the prior census or nothing — never a
    half-built census whose missing bookkeeping would double-count a
    replay."""
    census = _batch_line_census(docs, sep, text_col)
    stage = path + "__stage"
    shutil.rmtree(stage, ignore_errors=True)
    sidx = LineCensusIndex(stage)
    census.write.mode("overwrite").parquet(sidx.census_path)
    _write_census_batches(sidx, set() if batch_id is None else {batch_id})
    shutil.rmtree(path, ignore_errors=True)
    os.replace(stage, path)
    return LineCensusIndex(path)


def ingest_line_census(new_docs: DataFrame, path: str, sep: str = "\n",
                       text_col: str = "text",
                       batch_id: int | None = None) -> LineCensusIndex:
    """Incrementally fold one NEW batch into the persisted census
    (builds fresh if ``path`` has no census yet).  Only the batch is
    scanned; the merge is a vocabulary-grain integer sum on the hash
    key — never a corpus re-scan.  Commit and replay semantics are the
    ``ingest_bm25_stats`` contract verbatim: batch ids ride inside the
    staged swap (post-commit replay no-ops, pre-commit replay merges
    against a census that never counted the batch), and the two-rename
    commit window recovers from ``path + '__old'`` instead of silently
    rebuilding from the replayed batch alone."""
    from ..core.atomic import restore_crashed_backup, swap_commit

    idx = LineCensusIndex(path)
    if not os.path.isdir(idx.census_path):
        # between-renames crash window: restore __old and fall through
        # to the normal merge (core/atomic.py documents the argument);
        # otherwise this is a genuine fresh build
        if not restore_crashed_backup(
                path, lambda b: os.path.isdir(
                    LineCensusIndex(b).census_path)):
            return build_line_census(new_docs, path, sep, text_col,
                                     batch_id)
    done = idx.ingested_batches()
    if batch_id is not None and batch_id in done:
        return idx  # post-commit replay: already counted
    spark = new_docs.sparkSession
    merged = (spark.read.schema(LINE_CENSUS_SCHEMA)
              .parquet(idx.census_path)
              .unionByName(_batch_line_census(new_docs, sep, text_col))
              .groupBy("line_hash")
              .agg(F.sum("n_docs").cast("long").alias("n_docs")))
    stage = path + "__stage"
    shutil.rmtree(stage, ignore_errors=True)
    sidx = LineCensusIndex(stage)
    merged.write.mode("overwrite").parquet(sidx.census_path)
    _write_census_batches(sidx, done | ({batch_id} if batch_id is not None
                                        else set()))
    swap_commit(path, stage)
    return idx


def remove_boilerplate_lines_served(
        docs: DataFrame, index: LineCensusIndex, min_docs: int = 3,
        sep: str = "\n", text_col: str = "text", id_col: str = "doc_id",
        max_hot: int = DEFAULT_MAX_HOT,
        row_local_max: int = ROW_LOCAL_MAX) -> DataFrame:
    """Strip lines hot in the PERSISTED census (>= min_docs ingested
    documents, ever) from ``docs`` — the cross-batch form of
    ``remove_boilerplate_lines``: a batch is cleaned against the whole
    corpus's history without re-censusing it.  Membership is by
    xxhash64 (the index stores hashes, not text); output equals the
    text-exact strip up to 64-bit collisions (see module docstring).
    Same two-path strip and ``max_hot`` guard as the one-shot form."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs} — "
                         "every line repeats across >= 1 document")
    spark = docs.sparkSession
    hot = (spark.read.schema(LINE_CENSUS_SCHEMA)
           .parquet(index.census_path)
           .filter(F.col("n_docs") >= min_docs)
           .select("line_hash"))
    vals = _guarded_sample(hot, max_hot, "remove_boilerplate_lines_served",
                           f"are hot in the census (>= {min_docs} docs)")
    return _strip_hot(docs, hot, lambda x: F.xxhash64(x), vals,
                      sep, text_col, id_col, row_local_max)
