"""Arrow-vectorized portable shingle/minhash features — the fast path for
the dedup family's token->shingle->minhash pipeline.

The JVM higher-order-function form walks the interpreted expression tree
per token (~0.3 ms/row measured on 100-token docs); this mapInPandas pass
computes the SAME integers with numpy: every step is integer arithmetic
(char hash, Horner shingles, minhash fold, band keys), so equality with the
JVM/DuckDB path is exact by construction — no floating point anywhere —
and pytest asserts it on the real corpus.

Applies ONLY to the portable char hash (functions/text.py char_hash); the
pluggable xxhash64 variant keeps the JVM path.  Unicode-safe: ``ascii()``
in both Spark and DuckDB returns the first character's CODEPOINT, and the
vectorized path reads codepoints via numpy's UCS4 (``U``) dtype, so any
Unicode corpus hashes identically to the JVM path (bit-equality pytest
covers an accented/CJK corpus).

Output per doc: band keys (BANDS-array, fused minhash) + distinct shingle
set + its size — everything downstream LSH candidate generation and exact
Jaccard verification need, in one corpus pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text import HASH_P
from . import dedup as _dedup

FEATURES_SCHEMA = ("doc_id long, bks array<long>, ss array<long>, n int")


def _char_hashes(tokens: np.ndarray) -> np.ndarray:
    """Vectorized functions/text.char_hash over a flat token array:
    (ascii(first)*31 + ascii(second)*17 + ascii(last)*7 + len*131) % P.

    Spark's and DuckDB's ``ascii()`` both return the Unicode CODEPOINT of
    the first character (not a byte), so the token matrix uses numpy's
    ``U`` dtype (UCS4) viewed as uint32 — codepoint-exact for any Unicode
    input, where the previous ``S`` (bytes) dtype raised UnicodeEncodeError
    on the first non-ASCII token.  Empty tokens hash like ascii('') = 0
    (U-dtype zero padding)."""
    lens = np.char.str_len(tokens).astype(np.int64)
    width = max(int(lens.max(initial=1)), 1)
    mat = tokens.astype(f"U{width}").view(np.uint32).reshape(len(tokens), width)
    first = mat[:, 0].astype(np.int64)
    second = (mat[:, 1].astype(np.int64) if width > 1
              else np.zeros(len(tokens), dtype=np.int64))
    last = mat[np.arange(len(tokens)), np.maximum(lens - 1, 0)].astype(np.int64)
    return (first * 31 + second * 17 + last * 7 + lens * 131) % HASH_P


def _flat_shingles(doc_ids: list, texts: list):
    """Shared flat-vectorized token->shingle core: split every text, hash
    every token in ONE np.char pass, window 3-token shingles masked at doc
    boundaries.  Returns (kept_ids, n_sh, sh, starts, ends) for the docs
    with >= 3 tokens (the only ones that produce a shingle), or None when
    the batch has no such doc.  NULL text counts as 0 tokens."""
    tok_lists = [t.split(" ") if t is not None else [] for t in texts]
    counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    keep = counts >= 3
    if not keep.any():
        return None
    kept_ids = [d for d, k in zip(doc_ids, keep) if k]
    kept_toks = [t for t, k in zip(tok_lists, keep) if k]
    counts = counts[keep]

    flat = np.array([tok for toks in kept_toks for tok in toks])
    th = _char_hashes(flat)

    # shingle windows, invalid across doc boundaries
    doc_idx = np.repeat(np.arange(len(counts)), counts)
    sh_all = ((th[:-2] * 31 + th[1:-1]) * 31 + th[2:]) % HASH_P
    mask = doc_idx[:-2] == doc_idx[2:]
    sh = sh_all[mask]

    n_sh = counts - 2                      # shingles per kept doc (>= 1)
    starts = np.concatenate(([0], np.cumsum(n_sh)[:-1]))
    ends = np.cumsum(n_sh)
    return kept_ids, n_sh, sh, starts, ends


def _batch_features(doc_ids: list, texts: list,
                    ab: np.ndarray) -> dict[str, list]:
    """Whole-batch flat vectorization: one np.char pass hashes every token
    in the batch; shingle windows are masked at doc boundaries; per-doc
    minhash minima come from one `np.minimum.reduceat` over the (shingles x
    K) matrix — no per-doc numpy calls except the final unique()."""
    core = _flat_shingles(doc_ids, texts)
    if core is None:
        return {"doc_id": [], "bks": [], "ss": [], "n": []}
    kept_ids, n_sh, sh, starts, ends = core

    # per-doc segment minima of (s*a + b) % P for all K hash fns at once
    vals = (sh[:, None] * ab[0] + ab[1]) % HASH_P
    mins = np.minimum.reduceat(vals, starts, axis=0)

    # Horner band keys over BANDS x ROWS_PER_BAND
    m = mins.reshape(len(kept_ids), _dedup.BANDS, _dedup.ROWS_PER_BAND)
    keys = np.zeros((len(kept_ids), _dedup.BANDS), dtype=np.int64)
    for r in range(_dedup.ROWS_PER_BAND):
        keys = keys * 31 + m[:, :, r]

    ss = [np.unique(sh[s:e]).tolist() for s, e in zip(starts, ends)]
    return {"doc_id": kept_ids, "bks": keys.tolist(), "ss": ss,
            "n": [len(x) for x in ss]}


SETS_SCHEMA = "doc_id long, ss array<long>, n int"


def shingle_sets(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ss: distinct shingle hashes, n = |ss|) via one Arrow pass —
    the decontamination slice of ``shingle_features``: same flat token->
    shingle core, NO minhash/band work (the n-gram overlap screen needs
    only the distinct gram set).  Docs under 3 tokens produce no row, the
    exact rows the JVM spec path's empty-gram-array form contributes
    nothing for.  Set-identical to
    ``array_distinct(shingle_hashes(token_hashes(text)))`` — integer
    arithmetic end to end (``ss`` is sorted where the JVM form keeps
    first-occurrence order; downstream explode/count semantics are
    order-free, pytest-pinned on the gate corpus)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            core = _flat_shingles(list(pdf[id_col]), list(pdf[text_col]))
            if core is None:
                continue
            kept_ids, _n_sh, sh, starts, ends = core
            ss = [np.unique(sh[s:e]).tolist() for s, e in zip(starts, ends)]
            yield pd.DataFrame({"doc_id": kept_ids, "ss": ss,
                                "n": [len(x) for x in ss]})

    from ..sources.parquet import spread

    src = spread(docs.select(F.col(id_col).alias(id_col), text_col), id_col)
    return src.mapInPandas(run, SETS_SCHEMA)


def shingle_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, bks: BANDS band keys, ss: distinct shingle hashes, n) via one
    Arrow pass — integer-for-integer equal to
    band_rows(doc_shingles(...)) + jaccard_verify's set computation.
    `ss` is SORTED distinct (np.unique) where the JVM path keeps
    first-occurrence order; set semantics downstream are order-free."""
    ab = np.array([_dedup._A[:_dedup.K_MINHASH],
                   _dedup._B[:_dedup.K_MINHASH]], dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _batch_features(list(pdf[id_col]), list(pdf[text_col]), ab)
            # a partition holding ONLY <3-token docs yields an empty frame
            # whose list columns would default to float64 — un-convertible
            # to array<long>; yield nothing instead
            if out["doc_id"]:
                yield pd.DataFrame(out)

    from ..sources.parquet import spread

    # single-row-group test files scan as ONE task; spread the narrow
    # (id, text) projection across the pool so the Arrow pass parallelizes
    # (no-op on already-wide inputs — see sources/parquet.spread)
    src = spread(docs.select(F.col(id_col).alias(id_col), text_col), id_col)
    return src.mapInPandas(run, FEATURES_SCHEMA)


def band_rows(features: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) from the features table."""
    return (
        features.select("doc_id", F.posexplode("bks").alias("band_id", "band_key"))
        .withColumn("band_id", F.col("band_id").cast("int"))
    )
