"""Eval-set decontamination (operators/decontaminate.py): DuckDB
differential on the driver corpus, planted-fixture ground truth, and the
no-corpus-shuffle plan claim."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dbt_demo_spark.operators.decontaminate import (contamination_report,
                                                    decontaminate,
                                                    sql_contamination_report)
from dbt_demo_spark.sources.parquet import load_table
from dbt_demo_spark.testing import compare, duckdb_connection
from tests.conftest import SF_GATE

EVAL_PRED = "doc_id % 97 = 0"
CORPUS_PRED = "doc_id % 97 <> 0"


def _split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (docs.filter(F.expr(CORPUS_PRED)), docs.filter(F.expr(EVAL_PRED)))


def test_report_matches_oracle_on_driver_corpus(spark):
    corpus, ev = _split(spark, SF_GATE)
    con = duckdb_connection(SF_GATE)
    res = compare("contamination_report",
                  contamination_report(corpus, ev), con,
                  sql_contamination_report(EVAL_PRED, CORPUS_PRED))
    assert res.ok, res.detail


def test_decontaminate_complement_on_driver_corpus(spark):
    corpus, ev = _split(spark, SF_GATE)
    bad = {r.doc_id for r in contamination_report(corpus, ev).collect()}
    kept = {r.doc_id for r in decontaminate(corpus, ev).select("doc_id").collect()}
    everyone = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert kept == everyone - bad


# --- planted ground truth ---------------------------------------------------

DOCS = [
    # eval doc (id 0): the protected benchmark text
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    # verbatim leak of an eval span — contaminated
    (1, "intro words then the quick brown fox jumps over something"),
    # shares tokens but never three in a row — clean
    (2, "fox the quick dog brown lazy the jumps over tonight"),
    # completely disjoint vocabulary — clean
    (3, "alpha beta gamma delta epsilon zeta eta theta"),
    # the whole eval doc again — maximal contamination
    (4, "the quick brown fox jumps over the lazy dog tonight"),
    # too short to carry any 3-gram — clean by construction
    (5, "the quick"),
]


@pytest.fixture(scope="module")
def planted(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return df.filter("doc_id != 0"), df.filter("doc_id = 0")


def test_planted_report(spark, planted):
    corpus, ev = planted
    rows = {r.doc_id: r for r in contamination_report(corpus, ev).collect()}
    assert set(rows) == {1, 4}
    # doc 4 is a verbatim copy: every one of its distinct 3-grams matches
    assert rows[4].n_matched == rows[4].n_grams
    assert rows[4].matched_frac == 1.0
    # doc 1 leaks the 5-token span "the quick brown fox jumps over" wrapped
    # in clean words: its 3-grams include exactly 4 eval 3-grams
    assert rows[1].n_matched == 4
    assert 0 < rows[1].matched_frac < 1.0


def test_planted_filter_and_threshold(spark, planted):
    corpus, ev = planted
    assert {r.doc_id for r in decontaminate(corpus, ev).collect()} == {2, 3, 5}
    # a higher bar keeps the partial leak and still drops the full copy
    assert {r.doc_id for r in decontaminate(corpus, ev, min_matched=5)
            .collect()} == {1, 2, 3, 5}


def test_corpus_side_never_shuffles_before_the_semi_join(spark):
    """The corpus must reach the broadcast semi join as a narrow pipeline:
    the only hash exchanges in the whole report plan are the EVAL side's
    distinct and the post-match groupBy — both bounded by contamination,
    not corpus size."""
    corpus, ev = _split(spark, SF_GATE)
    plan = contamination_report(corpus, ev)._jdf.queryExecution(
        ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
