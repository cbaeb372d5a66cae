"""Training-shard output layout (operators/shards.py): chunk -> pack ->
split-partitioned shard write, composed into clean_corpus.  The invariants
the composition must preserve are the pieces' own: every chunk of every
accepted doc lands in exactly one bin, bins respect the token budget,
bins never mix splits, and the census receipt equals the realized layout.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from dbt_demo_spark.operators.chunk import chunk_documents
from dbt_demo_spark.operators.shards import (ShardSpec, build_training_shards,
                                             read_training_shards,
                                             shard_census, shard_column,
                                             write_training_shards)
from tests.conftest import SF_SMOKE

SPEC = ShardSpec(chunk_tokens=32, budget=128, overlap=4, n_shards=4)


@pytest.fixture(scope="module")
def docs(spark):
    from dbt_demo_spark.pipeline import split_column

    return (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "text")
            .withColumn("split", split_column(F.col("doc_id"))))


def test_spec_validation():
    with pytest.raises(ValueError, match="oversized"):
        ShardSpec(chunk_tokens=256, budget=128)
    with pytest.raises(ValueError, match="n_shards"):
        ShardSpec(chunk_tokens=8, budget=16, n_shards=0)


def test_build_training_shards_invariants(spark, docs):
    seq = build_training_shards(docs, SPEC).cache()
    try:
        rows = seq.collect()
        assert rows
        # (split, shard, bin_id) is the sequence key — exactly one row each
        keys = [(r.split, r.shard, r.bin_id) for r in rows]
        assert len(keys) == len(set(keys))
        for r in rows:
            # budget respected (ShardSpec guarantees no oversized chunk)
            assert r.n_tokens <= SPEC.budget, r
            # roll-ups aligned: one text and one provenance id per chunk
            assert len(r.chunk_texts) == r.n_chunks == len(r.doc_ids)
            # shard really is the portable hash of each member doc
            from dbt_demo_spark.functions.text import HASH_P
            from dbt_demo_spark.operators.shards import _SHARD_MULT

            for d in r.doc_ids:
                expect = ((d % HASH_P) * _SHARD_MULT) % HASH_P % SPEC.n_shards
                assert r.shard == expect
        # COVERAGE: every chunk of every doc appears exactly once
        flat = sorted(
            (d, t)
            for r in rows
            for d, t in zip(r.doc_ids, r.chunk_texts))
        chunks = sorted(
            (r.doc_id, r.chunk_text)
            for r in chunk_documents(docs, SPEC.chunk_tokens,
                                     SPEC.overlap).collect())
        assert flat == chunks
    finally:
        seq.unpersist()


def test_build_training_shards_deterministic(spark, docs):
    a = {(r.split, r.shard, r.bin_id): (tuple(r.doc_ids),
                                        tuple(r.chunk_texts))
         for r in build_training_shards(docs, SPEC).collect()}
    b = {(r.split, r.shard, r.bin_id): (tuple(r.doc_ids),
                                        tuple(r.chunk_texts))
         for r in build_training_shards(docs, SPEC).collect()}
    assert a == b


def test_write_training_shards_layout(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, SPEC)
    # split-partitioned directory layout, shard subdirectories inside
    splits = sorted(d for d in os.listdir(out) if d.startswith("split="))
    assert splits == ["split=test", "split=train", "split=val"]
    train_shards = [d for d in os.listdir(os.path.join(out, "split=train"))
                    if d.startswith("shard=")]
    assert train_shards
    # ONE data file per (split, shard) directory — the repartition-before-
    # write contract (small-file control at scale)
    for sh in train_shards:
        files = [f for f in os.listdir(os.path.join(out, "split=train", sh))
                 if f.endswith(".parquet")]
        assert len(files) == 1, (sh, files)
    back = read_training_shards(spark, out)
    inline = build_training_shards(docs, SPEC)
    assert back.count() == inline.count()
    assert int(back.agg(F.sum("n_tokens")).first()[0]) == \
        int(inline.agg(F.sum("n_tokens")).first()[0])


def test_shard_census_matches_realized_layout(spark, docs):
    """The census receipt (closed-form chunk counts, no explode) must equal
    the counts realized by the actual chunk->pack->shard composition."""
    spec = SPEC
    census = {(r.split, r.shard): (r.n_docs, r.n_chunks, r.n_tokens)
              for r in shard_census(
                  docs, spec, split_col=F.col("split")).collect()}
    seq = build_training_shards(docs, spec)
    realized_chunks = (
        seq.groupBy("split", "shard")
        .agg(F.sum("n_chunks").alias("n_chunks"),
             F.sum("n_tokens").alias("n_tokens")))
    realized_docs = (
        docs.select("split",
                    shard_column(F.col("doc_id"), spec.n_shards)
                    .cast("long").alias("shard"), "doc_id")
        .groupBy("split", "shard")
        .agg(F.countDistinct("doc_id").alias("n_docs")))
    real = {
        (r.split, r.shard): r
        for r in realized_chunks.join(realized_docs,
                                      ["split", "shard"]).collect()}
    assert set(census) == set(real)
    for k, (nd, nc, nt) in census.items():
        assert (real[k].n_docs, real[k].n_chunks, real[k].n_tokens) == \
            (nd, nc, nt), k


def test_clean_corpus_shard_spec_mode(spark, tmp_path):
    """clean_corpus(shard_spec=, shards_dir=) lands split-partitioned
    packed shards containing exactly the accepted docs' chunks, and the
    funnel counts replicate the plain run's."""
    from dbt_demo_spark.pipeline import clean_corpus

    texts = [(i, "sample document number %d with several plain tokens "
                 "repeated across the corpus body %d" % (i, i), "web")
             for i in range(40)]
    texts.append((100, texts[0][1], "web"))  # exact dup of doc 0
    docs = spark.createDataFrame(texts, "doc_id long, text string, "
                                 "source string")
    spec = ShardSpec(chunk_tokens=8, budget=32, overlap=0, n_shards=2)

    clean_a, obs_a = clean_corpus(docs, str(tmp_path / "idx_a"))
    plain_accepted = sorted(r.doc_id for r in clean_a.collect())
    funnel_a = {k: o.get["rows"] for k, o in obs_a.items()}

    out = str(tmp_path / "shards")
    clean_b, obs_b = clean_corpus(docs, str(tmp_path / "idx_b"),
                                  shard_spec=spec, shards_dir=out)
    # the shard sink already materialized the output; the returned handle
    # is collected for the assertion (which also fires the final
    # "accepted" tap — that one wraps the returned handle, not the sink)
    accepted = sorted(r.doc_id for r in clean_b.collect())
    assert accepted == plain_accepted
    funnel_b = {k: o.get["rows"] for k, o in obs_b.items()}
    assert funnel_a == funnel_b

    shards = read_training_shards(spark, out)
    shard_docs = sorted({d for r in shards.select("doc_ids").collect()
                         for d in r.doc_ids})
    assert shard_docs == accepted
    # chunk coverage of the accepted set survives the composition
    expected_chunks = chunk_documents(
        clean_b.select("doc_id", "text"), spec.chunk_tokens,
        spec.overlap).count()
    assert int(shards.agg(F.sum("n_chunks")).first()[0]) == expected_chunks


def test_clean_corpus_shard_spec_needs_dir(spark, tmp_path):
    from dbt_demo_spark.pipeline import clean_corpus

    docs = spark.createDataFrame([(1, "a b c", "web")],
                                 "doc_id long, text string, source string")
    with pytest.raises(ValueError, match="go together"):
        clean_corpus(docs, str(tmp_path / "i"),
                     shard_spec=ShardSpec(chunk_tokens=4, budget=8))


# ---------------------------------------------------------------------------
# Tokenizer-aware (subword) packing cost model
# ---------------------------------------------------------------------------

def test_subword_cost_matches_duckdb_twin(spark):
    """The BPE-ish cost estimate (per-word ceil(len/4), min 1) is the same
    integer in both engines — the portability the census receipt rests on."""
    import duckdb

    from dbt_demo_spark.functions.text import sql_subword_cost, subword_cost

    got = {r.doc_id: r.c for r in
           spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
           .select("doc_id", subword_cost(F.col("text")).alias("c")).collect()}
    want = dict(duckdb.sql(
        f"SELECT doc_id, {sql_subword_cost('text')} AS c "
        f"FROM read_parquet('{SF_SMOKE}/documents.parquet')").fetchall())
    assert got == want
    # sanity: more expensive than zero, never cheaper than the word count/4
    assert all(v >= 1 for v in got.values())


def test_build_training_shards_subword_budget(spark, docs):
    """cost_model='subword': bins respect the budget in COST units (unless
    a single chunk alone exceeds it), n_cost is exactly the sum of the
    bin's per-chunk subword costs, and the whitespace provenance column
    still rides through."""
    from dbt_demo_spark.functions.text import subword_cost

    spec = ShardSpec(chunk_tokens=32, budget=220, overlap=4, n_shards=4,
                     cost_model="subword")
    seq = build_training_shards(docs, spec).cache()
    try:
        rows = seq.collect()
        assert rows
        for r in rows:
            assert r.n_cost <= spec.budget or r.n_chunks == 1
            assert r.n_tokens >= r.n_chunks  # provenance column intact
        # n_cost equals the recomputed per-chunk costs of the bin's texts
        chunks = chunk_documents(docs, spec.chunk_tokens, spec.overlap,
                                 carry_cols=("split",))
        per_chunk = {(r.doc_id, r.chunk_id): r.c for r in chunks.select(
            "doc_id", "chunk_id",
            subword_cost(F.col("chunk_text")).alias("c")).collect()}
        got_total = sum(r.n_cost for r in rows)
        assert got_total == sum(per_chunk.values())
    finally:
        seq.unpersist()


def test_shard_census_subword_matches_realized_layout(spark, docs):
    """The census's closed-form packed cost (all word costs + each overlap
    region's repeated word costs, no chunk explosion) equals the realized
    build's per-(split, shard) n_cost sum — same receipt contract as the
    whitespace token count."""
    spec = ShardSpec(chunk_tokens=32, budget=220, overlap=4, n_shards=4,
                     cost_model="subword")
    census = {(r.split, r.shard): (r.n_docs, r.n_chunks, r.n_tokens, r.n_cost)
              for r in shard_census(docs, spec,
                                    split_col=F.col("split")).collect()}
    seq = build_training_shards(docs, spec)
    realized = {(r.split, r.shard): (r.n_chunks, r.n_tokens, r.n_cost)
                for r in seq.groupBy("split", "shard")
                .agg(F.sum("n_chunks").alias("n_chunks"),
                     F.sum("n_tokens").alias("n_tokens"),
                     F.sum("n_cost").alias("n_cost")).collect()}
    assert set(census) == set(realized)
    for k, (nd, nc, nt, cost) in census.items():
        assert (nc, nt, cost) == realized[k], k


def test_shard_census_subword_zero_overlap(spark, docs):
    """With no overlap the packed cost is just the document cost — the
    closed form's repeated term must vanish."""
    from dbt_demo_spark.functions.text import subword_cost

    spec = ShardSpec(chunk_tokens=32, budget=220, overlap=0, n_shards=4,
                     cost_model="subword")
    census_total = sum(r.n_cost for r in
                       shard_census(docs, spec,
                                    split_col=F.col("split")).collect())
    doc_total = docs.select(
        F.sum(subword_cost(F.col("text"))).alias("t")).first().t
    assert census_total == doc_total


def test_packing_utilization_receipt(spark, docs):
    """Utilization receipt agrees with a direct recompute from the packed
    bins, fills are sane, and the FFD floor holds: at most one half-empty
    bin per (split, shard) group."""
    from dbt_demo_spark.operators.shards import packing_utilization

    seq = build_training_shards(docs, SPEC)
    util = packing_utilization(seq, SPEC)
    rows = util.collect()
    assert rows, "census must be non-empty"
    direct = {(r.split, r.shard): (r.n_bins, r.packed_cost)
              for r in seq.groupBy("split", "shard")
              .agg(F.count(F.lit(1)).alias("n_bins"),
                   F.sum("n_tokens").cast("long").alias("packed_cost"))
              .collect()}
    for r in rows:
        assert (r.n_bins, r.packed_cost) == direct[(r.split, r.shard)]
        assert 0.0 < r.utilization <= 1.0
        assert 0.0 < r.min_fill <= r.max_fill <= 1.0
        assert abs(r.utilization - r.packed_cost / (r.n_bins * SPEC.budget)) < 1e-12
        assert r.n_half_empty <= 1, \
            f"two half-empty bins in {(r.split, r.shard)} — first-fit broken"


def test_packing_utilization_subword_cost_model(spark, docs):
    from dbt_demo_spark.operators.shards import packing_utilization

    spec = ShardSpec(chunk_tokens=32, budget=128, overlap=4, n_shards=4,
                     cost_model="subword")
    seq = build_training_shards(docs, spec)
    for r in packing_utilization(seq, spec).collect():
        assert 0.0 < r.utilization <= 1.0
        assert r.n_half_empty <= 1
