"""Char-bigram LM quality scoring (operators/lm.py) — the CCNet-style
perplexity-proxy filter.  What must hold:

  * training is deterministic and produces a properly normalized table
    (each row's probabilities sum to 1 before logging);
  * the JVM fold, the Arrow twin, and the DuckDB twin score every
    document BIT-IDENTICALLY (no transcendentals at score time — the
    table holds pre-logged doubles, engines only add);
  * the score means something: in-domain text scores better (lower
    bits/char) than gibberish, and the degenerate cases (empty, 1-char)
    are NULL, not garbage.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from dbt_demo_spark.operators import lm
from dbt_demo_spark.sources.parquet import load_table
from tests.conftest import SF_GATE, SF_SMOKE


def test_train_table_normalized_and_deterministic(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    t1 = lm.train_char_bigram_lm(docs)
    t2 = lm.train_char_bigram_lm(docs)
    assert t1 == t2
    assert len(t1) == lm.ALPHA_SIZE * lm.ALPHA_SIZE
    for r in range(lm.ALPHA_SIZE):
        row = t1[r * lm.ALPHA_SIZE:(r + 1) * lm.ALPHA_SIZE]
        assert abs(sum(math.exp(x) for x in row) - 1.0) < 1e-9


def test_jvm_arrow_duckdb_score_bit_identical(spark):
    """The three scoring paths must agree to the BIT on every gate-scale
    document — the same cross-engine contract as the vector folds."""
    import duckdb

    docs = load_table(spark, SF_GATE, "documents")
    table = lm.train_char_bigram_lm(docs)

    jvm = {r.doc_id: r.bits_per_char
           for r in lm.score_documents(docs, table).collect()}
    arrow = {r.doc_id: r.bits_per_char
             for r in lm.bits_per_char_arrow(docs, table).collect()}
    assert jvm == arrow

    sql = lm.sql_bits_per_char_query(
        table, relation=f"read_parquet('{SF_GATE}/documents.parquet')")
    duck = dict(duckdb.sql(sql).fetchall())
    assert jvm == duck
    assert len(jvm) == docs.count()


def test_score_separates_in_domain_from_gibberish(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    table = lm.train_char_bigram_lm(docs)
    probe = spark.createDataFrame(
        [(1, "the fast key order sort table scan merge join"),
         (2, "zqxvjw kpfzq vvqxz jzzwqk xqzvbn pqzzt wqkxjv"),
         (3, ""), (4, "a")],
        "doc_id long, text string")
    got = {r.doc_id: r.bits_per_char
           for r in lm.score_documents(probe, table).collect()}
    assert got[1] < got[2], "in-domain text must score lower bits/char"
    assert got[3] is None and got[4] is None


def test_score_is_row_local_zero_exchange(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    table = lm.train_char_bigram_lm(docs)
    plan = (lm.score_documents(docs, table)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, "scoring must not shuffle"


def test_clean_corpus_lm_band_drops_gibberish(spark, tmp_path):
    """The funnel's optional perplexity band: a planted gibberish doc is
    dropped, in-domain docs survive, and the stage's Observation reports
    the post-filter count like every other stage."""
    from dbt_demo_spark.pipeline import clean_corpus

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    table = lm.train_char_bigram_lm(docs)
    gib = spark.createDataFrame(
        [(900001, "zqxvjw kpfzq vvqxz jzzwqk xqzvbn pqzzt wqkxjv qzx")],
        "doc_id long, text string")
    corpus = docs.unionByName(gib)
    scores = {r.doc_id: r.bits_per_char
              for r in lm.score_documents(corpus, table).collect()}
    # a band that keeps every real doc but excludes the planted gibberish
    cut = max(v for k, v in scores.items() if k != 900001) + 1e-9
    assert scores[900001] > cut

    clean, obs = clean_corpus(corpus, str(tmp_path / "idx"),
                              lm_table=table, max_bits_per_char=cut)
    kept = {r.doc_id for r in clean.collect()}
    assert 900001 not in kept
    assert obs["after_lm_quality"].get["rows"] == obs["after_repetition"].get["rows"] - 1


def test_clean_corpus_lm_band_validation(spark, tmp_path):
    from dbt_demo_spark.pipeline import clean_corpus
    import pytest

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    with pytest.raises(ValueError, match="band keeps everything"):
        clean_corpus(docs, str(tmp_path / "i1"), lm_table=[0.0] * 784)
    with pytest.raises(ValueError, match="need lm_table"):
        clean_corpus(docs, str(tmp_path / "i2"), max_bits_per_char=3.0)


def test_frozen_table_matches_retraining(spark):
    """The committed frozen table (operators/lm_frozen.py, the artifact the
    catalog row text_lm_quality scores with) must equal retraining on the
    gate-scale corpus with the frozen hyperparameters — catches silent
    drift if the test data or the trainer changes without re-freezing."""
    from dbt_demo_spark.operators.lm_frozen import (FROZEN_ALPHA,
                                                    FROZEN_LM_TABLE,
                                                    FROZEN_MAX_SAMPLE)

    docs = load_table(spark, SF_GATE, "documents")
    fresh = lm.train_char_bigram_lm(docs, max_sample=FROZEN_MAX_SAMPLE,
                                    alpha=FROZEN_ALPHA)
    assert list(FROZEN_LM_TABLE) == fresh
