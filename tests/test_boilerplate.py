"""X108 line-level boilerplate removal (operators/boilerplate.py) —
CCNet-style cross-document line dedup: hot lines strip in place, docs
survive.  The synthetic corpus has no line structure (single-space word
streams), so like the PII row the tests run on constructed frames; the
DuckDB differential registers the same frame and computes the identical
cleanup in SQL."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from dbt_demo_spark.operators.boilerplate import (
    LineCensusIndex, build_line_census, hot_lines, ingest_line_census,
    remove_boilerplate_lines, remove_boilerplate_lines_served)
from dbt_demo_spark.testing import compare, duckdb_connection
from tests.conftest import SF_GATE

DOCS = [
    (1, "HEADER\nbody one\nFOOTER"),
    (2, "HEADER\nbody two\nFOOTER"),
    (3, "HEADER\nunique\nthing"),
    (4, "HEADER\nFOOTER"),              # nothing but boilerplate
    (5, "all original\nlines here"),    # untouched document
    (6, "HEADER\nHEADER\nkept"),        # in-doc repeat counts ONCE
]

ORACLE = """
WITH ls AS (
    SELECT doc_id, string_split(text, chr(10)) AS lines FROM bdocs
), split AS (
    SELECT doc_id, lines[i] AS line, i AS ord
    FROM ls, UNNEST(generate_series(1, len(lines))) AS t(i)
), hot AS (
    SELECT line FROM split GROUP BY line
    HAVING COUNT(DISTINCT doc_id) >= 3
), kept AS (
    SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS cleaned
    FROM split WHERE line NOT IN (SELECT line FROM hot)
    GROUP BY doc_id
)
SELECT d.doc_id AS doc_id, COALESCE(k.cleaned, '') AS text
FROM bdocs d LEFT JOIN kept k USING (doc_id)
"""


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_row_local_path_matches_duckdb(spark):
    """The common small-hot-set path (HOF filter with an IN-list) is
    hash-identical to the DuckDB twin computing the same cleanup."""
    out = remove_boilerplate_lines(_docs(spark), min_docs=3)
    con = duckdb_connection(SF_GATE)
    con.register("bdocs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    r = compare("boilerplate_rowlocal", out, con, ORACLE)
    assert r.ok, r.detail
    got = {r.doc_id: r.text for r in out.collect()}
    assert got[1] == "body one"           # HEADER + FOOTER stripped
    assert got[3] == "unique\nthing"      # FOOTER not hot (2 < 3 docs)
    assert got[4] == ""                   # boilerplate-only doc empties
    assert got[5] == "all original\nlines here"
    assert got[6] == "kept"               # in-doc repeat still stripped
    # the strip is row-local: no join, no shuffle exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_join_path_identical_to_row_local(spark):
    """Forcing the large-hot-set path (posexplode + broadcast anti join
    + positional reassembly, no driver-held literal) must produce the
    identical frame — including the emptied boilerplate-only doc."""
    docs = _docs(spark)
    row_local = remove_boilerplate_lines(docs, min_docs=3)
    joined = remove_boilerplate_lines(docs, min_docs=3, row_local_max=0)
    assert (sorted(map(tuple, row_local.collect()))
            == sorted(map(tuple, joined.collect())))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_census_no_hot_and_guards(spark):
    """hot_lines census counts documents (not occurrences); a corpus
    with no repeated lines passes through untouched; the max_hot guard
    and min_docs validation fail loud."""
    docs = _docs(spark)
    census = {r.line: r.n_docs for r in
              hot_lines(docs, min_docs=2).collect()}
    assert census == {"HEADER": 5, "FOOTER": 3}   # doc 6 counts once

    clean = spark.createDataFrame([(1, "a\nb"), (2, "c\nd")],
                                  "doc_id long, text string")
    out = remove_boilerplate_lines(clean, min_docs=2)
    assert sorted(map(tuple, out.collect())) == [(1, "a\nb"), (2, "c\nd")]

    with pytest.raises(ValueError, match="min_docs must be >= 2"):
        remove_boilerplate_lines(docs, min_docs=1)
    with pytest.raises(ValueError, match="not\\s+boilerplate"):
        remove_boilerplate_lines(docs, min_docs=2, max_hot=1)


def test_other_columns_survive_both_paths(spark):
    """Non-text columns ride through unchanged on both strategies."""
    docs = spark.createDataFrame(
        [(1, "X\na", "en"), (2, "X\nb", "fr"), (3, "X\nc", "de")],
        "doc_id long, text string, lang string")
    for rlm in (256, 0):
        out = remove_boilerplate_lines(docs, min_docs=3, row_local_max=rlm)
        got = sorted(map(tuple, out.select("doc_id", "text",
                                           "lang").collect()))
        assert got == [(1, "a", "en"), (2, "b", "fr"), (3, "c", "de")]


# ------------------------------------------------------------------ #
# X109: persisted incremental line census                            #
# ------------------------------------------------------------------ #

def _census_rows(spark, idx):
    return sorted(map(tuple,
                      spark.read.parquet(idx.census_path).collect()))


def test_two_batch_ingest_equals_one_shot_census(spark, tmp_path):
    """Folding the corpus in as two batches reproduces the one-shot
    census exactly — (line_hash, n_docs) are integer partials under
    sum-merge, so batch boundaries cannot matter."""
    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") <= 3)
    b = docs.filter(F.col("doc_id") > 3)

    inc = str(tmp_path / "inc")
    ingest_line_census(a, inc)          # first ingest = fresh build
    ingest_line_census(b, inc)          # second folds in
    one = build_line_census(docs, str(tmp_path / "one"))

    assert _census_rows(spark, LineCensusIndex(inc)) \
        == _census_rows(spark, one)
    # census counts documents, not occurrences (doc 6's in-doc repeat
    # counts once): HEADER hot in 5 docs, FOOTER in 3
    import pyspark.sql.functions as _F
    by_hash = {r.line_hash: r.n_docs
               for r in spark.read.parquet(one.census_path).collect()}
    h = {r.line: r.h for r in spark.createDataFrame(
        [("HEADER",), ("FOOTER",)], "line string")
        .select("line", _F.xxhash64("line").alias("h")).collect()}
    assert by_hash[h["HEADER"]] == 5
    assert by_hash[h["FOOTER"]] == 3


def test_served_strip_matches_one_shot_both_paths(spark, tmp_path):
    """Stripping against the persisted census (hash membership) equals
    the text-exact one-shot strip on the same corpus — on the row-local
    IN-list path AND the broadcast-anti join path."""
    docs = _docs(spark)
    idx = build_line_census(docs, str(tmp_path / "idx"))
    want = sorted(map(tuple,
                      remove_boilerplate_lines(docs, min_docs=3)
                      .collect()))
    for rlm in (256, 0):
        got = sorted(map(tuple, remove_boilerplate_lines_served(
            docs, idx, min_docs=3, row_local_max=rlm).collect()))
        assert got == want, f"row_local_max={rlm}"
    # cross-batch: a NEW batch reusing HEADER/FOOTER is cleaned against
    # the historical census without those lines being hot in the batch
    newb = spark.createDataFrame(
        [(7, "HEADER\nfresh content\nFOOTER")],
        "doc_id long, text string")
    got = {r.doc_id: r.text for r in remove_boilerplate_lines_served(
        newb, idx, min_docs=3).collect()}
    assert got[7] == "fresh content"


def test_census_replay_windows_converge(spark, tmp_path):
    """Exactly-once under replay, all three crash windows: post-commit
    (batch id found, no-op), pre-commit on the first batch (rebuild to
    identical), and MID-COMMIT between the two renames (recover the
    __old backup and merge — never rebuild from the replayed batch
    alone)."""
    import os
    import shutil as _sh

    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") <= 3)
    b = docs.filter(F.col("doc_id") > 3)

    path = str(tmp_path / "idx")
    ingest_line_census(a, path, batch_id=0)
    ingest_line_census(b, path, batch_id=1)
    want = _census_rows(spark, LineCensusIndex(path))

    # post-commit replay: no double count
    ingest_line_census(b, path, batch_id=1)
    assert _census_rows(spark, LineCensusIndex(path)) == want
    assert LineCensusIndex(path).ingested_batches() == {0, 1}

    # pre-commit replay on the FIRST batch
    fresh = str(tmp_path / "fresh")
    ingest_line_census(a, fresh, batch_id=0)
    once = _census_rows(spark, LineCensusIndex(fresh))
    _sh.rmtree(fresh)
    ingest_line_census(a, fresh, batch_id=0)
    assert _census_rows(spark, LineCensusIndex(fresh)) == once

    # mid-commit crash window: live moved to __old, stage never moved
    mid = str(tmp_path / "mid")
    ingest_line_census(a, mid, batch_id=0)
    _sh.copytree(mid, mid + "__stage")       # stale uncommitted stage
    os.replace(mid, mid + "__old")
    assert not os.path.isdir(mid)
    ingest_line_census(b, mid, batch_id=1)   # replay must merge
    assert _census_rows(spark, LineCensusIndex(mid)) == want
    assert LineCensusIndex(mid).ingested_batches() == {0, 1}
    assert not os.path.isdir(mid + "__old")


def test_served_guards(spark, tmp_path):
    """min_docs validation and the max_hot guard hold on the served
    path too; an empty hot set passes the batch through untouched."""
    docs = _docs(spark)
    idx = build_line_census(docs, str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="min_docs must be >= 2"):
        remove_boilerplate_lines_served(docs, idx, min_docs=1)
    with pytest.raises(ValueError, match="not\\s+boilerplate"):
        remove_boilerplate_lines_served(docs, idx, min_docs=2, max_hot=1)
    clean = spark.createDataFrame([(9, "nothing\nhot")],
                                  "doc_id long, text string")
    out = remove_boilerplate_lines_served(clean, idx, min_docs=6)
    assert sorted(map(tuple, out.collect())) == [(9, "nothing\nhot")]


def test_census_ingest_associativity_property(spark, tmp_path):
    """Property (hypothesis): for ANY partition of the corpus into
    batches, sequential census ingest reproduces the one-shot census
    exactly — (line_hash, n_docs) are integer partials under sum-merge,
    so batch order and boundaries cannot matter (the bm25 associativity
    property on the line census)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    docs = _docs(spark).cache()
    docs.count()
    one = build_line_census(docs, str(tmp_path / "prop_one"))
    want = _census_rows(spark, one)
    runs = [0]

    @settings(max_examples=5, deadline=None)
    @given(cuts=st.sets(st.integers(min_value=1, max_value=5),
                        max_size=2))
    def check(cuts):
        runs[0] += 1
        path = str(tmp_path / f"prop_{runs[0]}")
        bounds = sorted(cuts) + [7]
        lo = 0
        for hi in bounds:
            batch = docs.filter((F.col("doc_id") >= lo)
                                & (F.col("doc_id") < hi))
            ingest_line_census(batch, path)
            lo = hi
        assert _census_rows(spark, LineCensusIndex(path)) == want

    try:
        check()
    finally:
        docs.unpersist()
