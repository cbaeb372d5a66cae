"""Text-analysis column functions, built as Spark higher-order functions
(JVM-side, whole-stage-codegen'd — no Python UDFs in the hot path).

Cross-engine portability: the differential oracle (DuckDB) must compute
byte-identical values, so the token/shingle hashes here use only integer
arithmetic over `ascii`/`length`/`substr` — primitives whose semantics are
identical in Spark SQL and DuckDB.  The production-scale variant of the same
operators can swap in `F.xxhash64` (cheaper, better-mixed, Spark-only); the
operators take the hash as a parameter.

`sql_*` helpers emit the DuckDB expression computing the same value.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

HASH_P = 1_000_003  # prime modulus for all portable hashes


def tokens(text: Column) -> Column:
    """Whitespace tokens (documents are single-space word sequences)."""
    return F.split(text, " ")


def sql_tokens(expr: str = "text") -> str:
    return f"string_split({expr}, ' ')"


def char_hash(tok: Column) -> Column:
    """Portable per-token hash from first/second/last chars + length.
    Injective on small vocabularies; swap for xxhash64 at scale."""
    first = F.ascii(F.substring(tok, 1, 1))
    second = F.ascii(F.substring(tok, 2, 1))          # ascii('') = 0, both engines
    last = F.ascii(tok.substr(F.length(tok), F.lit(1)))
    return (first * 31 + second * 17 + last * 7 + F.length(tok) * 131) % HASH_P


def sql_char_hash(tok: str) -> str:
    return (f"(ascii(substr({tok}, 1, 1)) * 31 + ascii(substr({tok}, 2, 1)) * 17"
            f" + ascii(substr({tok}, length({tok}), 1)) * 7"
            f" + length({tok}) * 131) % {HASH_P}")


def token_hashes(text: Column) -> Column:
    """array<long> of per-token portable hashes."""
    return F.transform(tokens(text), lambda t: char_hash(t).cast("long"))


def sql_token_hashes(expr: str = "text") -> str:
    return f"list_transform({sql_tokens(expr)}, t -> CAST({sql_char_hash('t')} AS BIGINT))"


def token_hashes_xxhash(text: Column) -> Column:
    """Production-scale token hash: per-token ``xxhash64`` — cheaper and far
    better mixed than the portable char hash, but Spark-only (DuckDB has no
    xxhash64 twin), so operators built on it are pytest-verified rather than
    oracle-checked.  ``pmod`` folds the full signed-64 output into the same
    [0, HASH_P) field the portable hash lives in, so every downstream
    shingle/minhash expression keeps its overflow-free integer arithmetic
    (Spark 4 runs ANSI mode: silent wraparound is an error)."""
    return F.transform(tokens(text), lambda t: F.pmod(F.xxhash64(t), F.lit(HASH_P)).cast("long"))


def shingle_hashes(th: Column) -> Column:
    """Hashes of 3-token shingles from the token-hash array.  Caller must
    ensure >= 3 tokens (`slice` with non-positive length errors).

    Built as slice+zip_with over three shifted copies rather than
    transform(sequence, i -> element_at(th, i)): Catalyst's CollapseProject
    inlines the full token-hash expression into every element_at reference,
    so the per-element form recomputes the whole token-hash array O(len)
    times per row (measured 30s for 5000 docs at sf0.1; this form is
    ~constant references per row)."""
    n = F.size(th) - 2
    ab = F.zip_with(F.slice(th, 1, n), F.slice(th, 2, n),
                    lambda x, y: x * 31 + y)
    return F.zip_with(ab, F.slice(th, 3, n),
                      lambda xy, z: (xy * 31 + z) % HASH_P)


def sql_shingle_hashes(th: str) -> str:
    return (f"[((({th}[i]) * 31 + ({th}[i+1])) * 31 + ({th}[i+2])) % {HASH_P}"
            f" for i in generate_series(1, len({th}) - 2)]")


# BPE-ish subword cost model: a trainer's packing budget is denominated in
# TOKENIZER tokens, not whitespace words, and real BPE vocabularies average
# ~4 characters per subword on English text [public knowledge: byte-pair
# encoding, Sennrich et al. 2016; the "1 token ~ 4 chars" rule of thumb].
# The estimator is per-word ceil(len/4) clamped to >= 1 — deterministic
# integer arithmetic, identical in both engines, and an upper-ish bound a
# context-window packer can budget against without shipping a tokenizer.
SUBWORD_CHARS = 4


def subword_costs(toks: Column) -> Column:
    """array<int> of per-word estimated subword counts: ceil(len/4), min 1."""
    return F.transform(
        toks, lambda t: F.greatest(
            F.lit(1),
            F.floor((F.length(t) + (SUBWORD_CHARS - 1)) / SUBWORD_CHARS)
            .cast("int")))


def subword_cost(text: Column) -> Column:
    """Estimated subword count of a whole text (sum of per-word costs)."""
    return F.aggregate(subword_costs(tokens(text)),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def sql_subword_costs(toks: str) -> str:
    return (f"list_transform({toks}, t -> greatest(1, "
            f"CAST(floor((length(t) + {SUBWORD_CHARS - 1}) / {SUBWORD_CHARS}) "
            f"AS INT)))")


def sql_subword_cost(expr: str = "text") -> str:
    return (f"CAST(list_sum({sql_subword_costs(sql_tokens(expr))}) "
            f"AS BIGINT)")


def stopword_count(toks: Column, stopwords: list[str]) -> Column:
    lits = [F.lit(s) for s in stopwords]
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def sql_stopword_count(toks: str, stopwords: list[str]) -> str:
    inlist = ", ".join(f"'{s}'" for s in stopwords)
    return f"len(list_filter({toks}, t -> t IN ({inlist})))"


def position_weighted_fingerprint(th: Column) -> Column:
    """Order-sensitive document fingerprint: sum_i h(tok_i) * w(i) mod P,
    with w(i) = (i * 2654435761) % P.  Commutative to COMPUTE (safe under
    any execution order) yet sensitive to token ORDER — a reordered
    document fingerprints differently."""
    # multiplier pre-reduced mod P: identical values (modular arithmetic),
    # but every intermediate stays <= (P-1)^2 ~ 1e12 regardless of token
    # index — the same overflow discipline as text_stable_split's bucket
    mult = 2654435761 % HASH_P
    weighted = F.transform(
        th, lambda x, i: (x * ((((i + 1) % HASH_P) * F.lit(mult)) % HASH_P)) % HASH_P)
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, v: acc + v) % HASH_P


def sql_position_weighted_fingerprint(th: str) -> str:
    mult = 2654435761 % HASH_P
    return (f"CAST(list_sum([(({th}[i]) * (((i % {HASH_P}) * {mult}) % {HASH_P})) % {HASH_P}"
            f" for i in generate_series(1, len({th}))]) % {HASH_P} AS BIGINT)")
