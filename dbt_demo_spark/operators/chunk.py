"""Document chunking — fixed-size token windows with overlap, the step
between corpus curation and tokenizer sharding in a training-data
pipeline (context-window packing, RAG indexing, embedding batches).

Pure JVM dataflow: one `transform(sequence(...))` builds all chunk
descriptors per document in a single expression, `posexplode` fans them
out — no Python, no shuffle (chunking is embarrassingly row-local; the
fan-out multiplies rows ~len/stride, which is why it runs AFTER dedup
and quality filtering in a real pipeline).  DuckDB computes the same
chunks from the same integer arithmetic (differential in
tests/test_operators.py); coverage/overlap invariants are property
checks there too.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text import tokens


def chunk_documents(docs: DataFrame, chunk_tokens: int, overlap: int = 0,
                    text_col: str = "text",
                    id_col: str = "doc_id",
                    carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): whitespace-token windows
    of ``chunk_tokens`` advancing by ``chunk_tokens - overlap``.  The last
    chunk may be short (the tail is kept, never padded or dropped); every
    token appears in at least one chunk; consecutive chunks share exactly
    ``overlap`` tokens except possibly at the tail.

    ``carry_cols``: per-document columns (e.g. a ``split`` assignment)
    projected through onto every chunk — a pure projection, so carrying
    them costs nothing vs the join-back a trainer-shard writer would
    otherwise pay over the exploded chunk table."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # number of windows starting inside the document: 1 + ceil((n - chunk)
    # / stride) when n > chunk, else 1 — as integer arithmetic
    n_chunks = F.greatest(
        F.lit(1),
        (F.lit(1) + ((n - F.lit(chunk_tokens) + F.lit(stride) - 1)
                     / F.lit(stride)).cast("int")))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * stride + 1, chunk_tokens), " "))
    carry = list(carry_cols)
    return (
        docs.select(F.col(id_col).alias("doc_id"), chunks.alias("_chunks"),
                    *carry)
        .select("doc_id", *carry,
                F.posexplode("_chunks").alias("chunk_id", "chunk_text"))
        .withColumn("chunk_id", F.col("chunk_id").cast("int"))
        .withColumn("n_tokens", F.size(F.split("chunk_text", " ")))
        .select("doc_id", "chunk_id", "n_tokens", "chunk_text", *carry)
    )
