"""Learned-BPE token counting (operators/bpe.py + frozen merges): the JVM
regex fold is EXACT BPE (differential vs the reference Python tokenizer),
the frozen table reproduces from its embedded training input, and the
packing/census integration measures real tokenizer units end-to-end
(VERDICT r8 item 8)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_demo_spark.operators import bpe
from dbt_demo_spark.operators.bpe_frozen import (FROZEN_BPE_MERGES,
                                                 TRAIN_WORD_COUNTS)
from tests.conftest import SF_GATE, SF_SMOKE


def test_frozen_merges_reproduce_from_embedded_training_input():
    """Drift guard (the lm_frozen pattern): retraining on the embedded
    word counts must reproduce the frozen merges bit-for-bit."""
    got = bpe.train_bpe(TRAIN_WORD_COUNTS, len(FROZEN_BPE_MERGES))
    assert got == FROZEN_BPE_MERGES


def test_jvm_fold_matches_reference_on_gate_corpus(spark):
    """bpe_cost_expr == the reference Python tokenizer on every document
    of the gate corpus — the fold is exact BPE, not an estimate."""
    docs = (spark.read.parquet(f"{SF_GATE}/documents.parquet")
            .select("doc_id", "text").limit(300))
    got = {r.doc_id: r.c for r in docs.select(
        "doc_id",
        bpe.bpe_cost_expr(F.col("text"), FROZEN_BPE_MERGES).alias("c"))
        .collect()}
    want = {r.doc_id: bpe.bpe_token_count(r.text, FROZEN_BPE_MERGES)
            for r in docs.collect()}
    assert got == want
    assert sum(want.values()) > 0


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x1f"),
    max_size=24), min_size=1, max_size=6))
def test_jvm_fold_matches_reference_on_random_text(spark, words):
    """Property: arbitrary unicode words (regex metacharacters, repeats,
    empties included) — JVM fold == reference, under merges trained on
    that same tiny corpus (so merges actually fire)."""
    text = " ".join(w.replace(" ", "_") for w in words)
    merges = bpe.train_bpe(
        {w: i + 1 for i, w in enumerate(set(text.split(" "))) if w}, 16)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = df.select(bpe.bpe_cost_expr(
        F.col("text"), merges).alias("c")).first().c
    assert got == bpe.bpe_token_count(text, merges)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x1f"),
    max_size=16), min_size=1, max_size=6))
def test_byte_level_jvm_fold_matches_reference_on_unicode(spark, words):
    """VERDICT r9 item 9's done-criterion: byte-level mode over arbitrary
    unicode (multibyte scripts, emoji, metacharacters) — the JVM fold
    equals the pure-Python byte-level reference under byte-trained
    merges, and with NO merges every word costs exactly its UTF-8 byte
    length (the fixed 256-symbol floor, no <unk>, no 1-token/char)."""
    text = " ".join(w.replace(" ", "_") for w in words)
    vocab = {w: i + 1 for i, w in enumerate(set(text.split(" "))) if w}
    merges = bpe.train_bpe(vocab, 16, byte_level=True)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = df.select(bpe.bpe_cost_expr(
        F.col("text"), merges, byte_level=True).alias("c")).first().c
    assert got == bpe.bpe_token_count(text, merges, byte_level=True)
    # the floor: zero merges -> cost is the UTF-8 byte length per word
    floor = df.select(bpe.bpe_cost_expr(
        F.col("text"), [], byte_level=True).alias("c")).first().c
    assert floor == sum(len(w.encode("utf-8"))
                        for w in text.split(" ") if w)


def test_byte_level_oov_script_segments_at_byte_floor(spark):
    """An OOV CJK/emoji word under ASCII-trained byte merges costs its
    byte length (3-4 per char), never raises, and the vocab path agrees
    with the inline path."""
    merges = bpe.train_bpe({"the": 50, "then": 20, "than": 10}, 8,
                           byte_level=True)
    docs = spark.createDataFrame(
        [(0, "the then 你好 🙂"), (1, "")],
        "doc_id long, text string")
    inline = {r.doc_id: r.c for r in docs.select(
        "doc_id", bpe.bpe_cost_expr(F.col("text"), merges,
                                    byte_level=True).alias("c")).collect()}
    assert inline[0] == bpe.bpe_token_count("the then 你好 🙂", merges,
                                            byte_level=True)
    # 你好 = 6 utf-8 bytes, unmergeable under ASCII training
    assert bpe.tokenize_word("你好", merges, byte_level=True) == \
        list("你好".encode("utf-8").decode("latin-1"))
    assert inline[1] == 0
    via_vocab = {r.doc_id: r.n_bpe for r in bpe.bpe_costs_by_vocab(
        docs, merges, byte_level=True).collect()}
    assert via_vocab == inline


def test_vocab_path_equals_inline_path(spark):
    """bpe_costs_by_vocab (distinct-word join, the corpus-scale path)
    equals the inline whole-text expression on the gate corpus."""
    docs = (spark.read.parquet(f"{SF_GATE}/documents.parquet")
            .select("doc_id", "text").limit(300))
    inline = {r.doc_id: r.c for r in docs.select(
        "doc_id",
        bpe.bpe_cost_expr(F.col("text"), FROZEN_BPE_MERGES).alias("c"))
        .collect()}
    via_vocab = {r.doc_id: r.n_bpe for r in
                 bpe.bpe_costs_by_vocab(docs, FROZEN_BPE_MERGES).collect()}
    assert via_vocab == inline


def test_packing_under_bpe_cost_matches_reference(spark):
    """cost_model='bpe': bins respect the budget in REAL tokenizer units,
    and every bin's n_cost equals the reference Python BPE count of its
    own chunk texts — the packing differential."""
    from dbt_demo_spark.operators.shards import (ShardSpec,
                                                 build_training_shards)
    from dbt_demo_spark.pipeline import split_column

    docs = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "text")
            .withColumn("split", split_column(F.col("doc_id"))))
    spec = ShardSpec(chunk_tokens=32, budget=48, overlap=4, n_shards=4,
                     cost_model="bpe")
    rows = build_training_shards(docs, spec).collect()
    assert rows
    oversize = 0
    for r in rows:
        if r.n_cost > spec.budget:
            oversize += 1
            assert r.n_chunks == 1      # documented oversize rule
        assert r.n_cost == sum(
            bpe.bpe_token_count(t, FROZEN_BPE_MERGES)
            for t in r.chunk_texts)
    # on this synthetic corpus (31 distinct words) the learned table
    # memorizes every word whole, so the BPE cost exactly equals the
    # whitespace count — never exceeds it; richer vocabularies (see the
    # random-text property test) segment into true subwords
    assert sum(r.n_cost for r in rows) <= sum(r.n_tokens for r in rows)


def test_shard_census_bpe_matches_realized_layout(spark):
    """The census's closed-form packed BPE cost (per-word exact counts +
    overlap repeats, no chunk explosion) equals the realized build's
    per-(split, shard) n_cost sum — census parity in real tokenizer
    units."""
    from dbt_demo_spark.operators.shards import (ShardSpec,
                                                 build_training_shards,
                                                 shard_census)
    from dbt_demo_spark.pipeline import split_column

    docs = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "text")
            .withColumn("split", split_column(F.col("doc_id"))))
    spec = ShardSpec(chunk_tokens=32, budget=220, overlap=4, n_shards=4,
                     cost_model="bpe")
    census = {(r.split, r.shard): (r.n_chunks, r.n_tokens, r.n_cost)
              for r in shard_census(docs, spec,
                                    split_col=F.col("split")).collect()}
    realized = {(r.split, r.shard): (r.n_chunks, r.n_tokens, r.n_cost)
                for r in build_training_shards(docs, spec)
                .groupBy("split", "shard")
                .agg(F.sum("n_chunks").alias("n_chunks"),
                     F.sum("n_tokens").alias("n_tokens"),
                     F.sum("n_cost").alias("n_cost")).collect()}
    assert census == realized


def test_spec_rejects_unknown_cost_model():
    from dbt_demo_spark.operators.shards import ShardSpec

    with pytest.raises(ValueError, match="cost_model"):
        ShardSpec(chunk_tokens=8, budget=16, cost_model="wordpiece")
