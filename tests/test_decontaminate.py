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


def test_arrow_shingle_sets_identical_to_jvm_gram_fold(spark):
    """The r14 Arrow gram pass (shingle_arrow.shingle_sets) must produce
    exactly the distinct gram sets the JVM spec fold
    (array_distinct(shingle_hashes(token_hashes(text)))) produces — same
    kept docs, same integers (order-insensitive: numpy sorts, the JVM
    keeps first occurrence), same counts — on the gate corpus AND on a
    Unicode + degenerate fixture (short docs, NULL text)."""
    from dbt_demo_spark.operators.decontaminate import _doc_grams
    from dbt_demo_spark.operators.shingle_arrow import shingle_sets

    fixtures = [load_table(spark, SF_GATE, "documents")]
    fixtures.append(spark.createDataFrame(
        [(1, "café au lait était très bon aujourd'hui à paris"),
         (2, "日本語 の 文書 は 三つ の 単語 が 必要"),
         (3, "two tokens"), (4, "one"), (5, ""), (6, None),
         (7, "mixed ascii and émojis 🚀 rocket ship launch")],
        "doc_id long, text string"))
    for docs in fixtures:
        jvm = {r.doc_id: sorted(set(r.grams))
               for r in _doc_grams(docs, "text", "doc_id").collect()
               if r.grams}          # <3-token docs: empty array == no row
        arrow = {r.doc_id: list(r.ss)
                 for r in shingle_sets(docs).collect()}
        assert jvm == arrow
        counts = {r.doc_id: r.n for r in shingle_sets(docs).collect()}
        assert counts == {d: len(s) for d, s in jvm.items()}


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
    the hash exchanges in the report plan are the post-match groupBy —
    bounded by contamination, not corpus size — plus (r14) the Arrow
    shingle pass's `spread` of the narrow (doc_id, text) projection, which
    sources/parquet.spread makes a no-op on cluster-width scans (it never
    re-shuffles an input already at pool width).  Since r15 the eval side
    contributes NO hash exchange at all (the semi join's build side skips
    the distinct — left_semi is set semantics).  The invariant that
    matters at 100 TB stays pinned below: the EXPLODED gram stream — the
    only corpus-gram-sized relation — never hash-shuffles before the semi
    join cuts it down."""
    corpus, ev = _split(spark, SF_GATE)
    plan = contamination_report(corpus, ev)._jdf.queryExecution(
        ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    # the gram explosion feeds the semi join inside ONE stage: no exchange
    # may sit between the Generate and the LeftSemi BroadcastHashJoin.
    # (ADVICE r14: compare the sorted positions so the region between the
    # two nodes is actually checked — the join prints before the Generate
    # in this plan, so the old `join < gen or ...` form was vacuous.)
    gen = plan.index("Generate explode")
    join = plan.index("BroadcastHashJoin")
    lo, hi = sorted((join, gen))
    assert "Exchange" not in plan[lo:hi], plan
