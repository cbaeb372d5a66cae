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
"""

from __future__ import annotations

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


def remove_boilerplate_lines(docs: DataFrame, min_docs: int = 3,
                             sep: str = "\n", text_col: str = "text",
                             id_col: str = "doc_id",
                             max_hot: int = DEFAULT_MAX_HOT,
                             row_local_max: int = ROW_LOCAL_MAX) -> DataFrame:
    """Strip lines that appear in >= min_docs documents from every
    document, preserving the remaining lines' order.  Returns ``docs``
    with ``text_col`` rewritten (all other columns untouched)."""
    hot = hot_lines(docs, min_docs, sep, text_col)
    # the census is line-vocabulary-sized; take max_hot+1 to detect the
    # guard violation without counting the whole frame
    sample = hot.select("line").limit(max_hot + 1).collect()
    if len(sample) > max_hot:
        raise ValueError(
            f"remove_boilerplate_lines: more than {max_hot} lines "
            f"repeat across >= {min_docs} documents — that is not "
            "boilerplate, the threshold is wrong for this corpus "
            "(raise min_docs or max_hot explicitly)")
    if not sample:
        return docs
    if len(sample) <= row_local_max:
        # row-local strip: hot lines as an IN-list inside a HOF filter
        hot_vals = [r.line for r in sample]
        cleaned = F.array_join(
            F.filter(F.split(F.col(text_col), sep),
                     lambda x: ~x.isin(*hot_vals)), sep)
        return docs.withColumn(text_col, cleaned)
    # join path: no driver-held literal — posexplode, broadcast anti
    # join the hot frame, reassemble by position (one doc-key shuffle)
    other_cols = [c for c in docs.columns if c != text_col]
    exploded = docs.select(
        *other_cols,
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__line"))
    kept = exploded.join(F.broadcast(hot.select(F.col("line")
                                                .alias("__line"))),
                         "__line", "left_anti")
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
