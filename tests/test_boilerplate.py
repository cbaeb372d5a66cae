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

from dbt_demo_spark.operators.boilerplate import (hot_lines,
                                                  remove_boilerplate_lines)
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
