"""Corpus mixture balancing (operators/mixture.py, X113): the static
target-proportions solve behind GPT-3/LLaMA-style training mixes.  What
must hold:

  * the closed form is exact: achieved proportions == targets (to float
    eps), the binding source keeps rate 1.0, nothing upsamples;
  * the solve composes with the repo's own sampler + funnel: applying
    the rates through source_weighted_sample / clean_corpus moves the
    measured corpus mix toward the target (hash-bucket sampling is
    exact only in expectation, so the end-to-end check uses tolerance
    while the solve itself is checked exactly);
  * a DuckDB twin computing the same per-source weights agrees with the
    Spark measurement exactly;
  * impossible or sloppy inputs fail loud (shares not summing to 1,
    zero-weight target source, non-positive shares).
"""

from __future__ import annotations

import pytest

from dbt_demo_spark.operators.mixture import (achieved_mixture,
                                              mixture_rates, source_weights)
from dbt_demo_spark.sources.parquet import load_table
from tests.conftest import SF_GATE


def test_solve_exact_and_binding_source_keeps_all():
    w = {"web": 1000, "books": 100, "code": 400}
    t = {"web": 0.5, "books": 0.2, "code": 0.3}
    rates = mixture_rates(w, t)
    # binding source: smallest w/t is books (100/0.2=500 vs web 2000,
    # code 1333) — it keeps everything
    assert rates["books"] == 1.0
    assert all(0 < r <= 1.0 for r in rates.values())
    got = achieved_mixture(w, rates)
    for s in t:
        assert got[s] == pytest.approx(t[s], abs=1e-12)
    # maximality: scaling all rates by any factor > 1 would push the
    # binding source over 1.0 — the solve keeps the most data possible
    assert max(rates.values()) == 1.0


def test_unlisted_sources_drop_and_already_balanced_is_identity():
    w = {"a": 300, "b": 300, "junk": 999}
    rates = mixture_rates(w, {"a": 0.5, "b": 0.5})
    assert rates["junk"] == 0.0
    assert rates["a"] == 1.0 and rates["b"] == 1.0  # already on target


def test_error_matrix():
    w = {"a": 10, "b": 10}
    with pytest.raises(ValueError, match="sum to"):
        mixture_rates(w, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="no corpus weight"):
        mixture_rates(w, {"a": 0.5, "ghost": 0.5})
    with pytest.raises(ValueError, match="non-positive"):
        mixture_rates(w, {"a": 1.0, "b": 0.0})
    with pytest.raises(ValueError, match="empty targets"):
        mixture_rates(w, {})
    with pytest.raises(ValueError, match="tokens | docs"):
        source_weights(None, weight="chars")


def test_weights_match_duckdb_and_rates_compose_with_sampler(spark):
    """Spark-measured token weights == a DuckDB twin exactly; applying
    the solved rates through the repo's own hash-bucket sampler lands
    the corpus mix within sampling tolerance of the target."""
    import duckdb

    from dbt_demo_spark.queries.text_filters import source_weighted_sample

    docs = load_table(spark, SF_GATE, "documents")
    w = source_weights(docs)
    twin = dict(duckdb.sql(f"""
        SELECT source, SUM(len(string_split(text, ' ')))::BIGINT
        FROM read_parquet('{SF_GATE}/documents.parquet') GROUP BY 1
    """).fetchall())
    assert w == twin

    sources = sorted(w)
    assert len(sources) >= 2
    # a deliberately skewed target over the two largest sources
    big = sorted(sources, key=lambda s: -w[s])[:2]
    targets = {big[0]: 0.7, big[1]: 0.3}
    rates = mixture_rates(w, targets)
    sampled = source_weighted_sample(docs, rates)
    got_w = source_weights(sampled)
    tot = sum(got_w.values())
    for s, t in targets.items():
        assert got_w[s] / tot == pytest.approx(t, abs=0.05), (s, got_w)
    # dropped sources are gone entirely
    assert set(got_w) == set(big)


def test_rates_feed_clean_corpus_funnel(spark, tmp_path):
    """End to end through the funnel: clean_corpus(rates=solved) applies
    the mixture and the sampling-stage Observation sees the cut."""
    from dbt_demo_spark.operators.mixture import mixture_rates
    from dbt_demo_spark.pipeline import clean_corpus

    docs = load_table(spark, SF_GATE, "documents")
    w = source_weights(docs)
    big = sorted(w, key=lambda s: -w[s])[:2]
    rates = mixture_rates(w, {big[0]: 0.6, big[1]: 0.4})
    clean, obs = clean_corpus(docs, str(tmp_path / "idx"), rates=rates)
    clean.write.format("noop").mode("overwrite").save()
    assert obs["after_sampling"].get["rows"] < \
        obs["after_repetition"].get["rows"]
    kept_sources = {r.source for r in clean.select("source")
                    .distinct().collect()}
    assert kept_sources <= set(big)
