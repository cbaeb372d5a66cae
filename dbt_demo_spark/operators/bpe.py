"""Learned byte-pair-encoding token counting — real tokenizer units for
the packing/census cost model (VERDICT r8 item 8), replacing the
ceil(len/4) estimate with EXACT counts under a trained merge table.

Three pieces, one algorithm [public knowledge: Sennrich, Haddow, Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016]:

  * ``train_bpe`` — the reference trainer: greedy highest-count pair
    merging over a word-frequency dict (driver-side; training input is a
    Spark word count, the vocabulary, not the corpus).  Deterministic:
    ties break lexicographically, no RNG.
  * ``tokenize_word`` — the reference Python tokenizer (the differential
    oracle, and the freeze-time sanity check).
  * ``bpe_cost_expr`` — the SAME tokenization as one JVM Column
    expression: the text is encoded as a \\x1f-separated symbol string,
    and each merge (rank order) is ONE ``regexp_replace`` pass; the
    token count falls out of the surviving separator count.  No Python
    in the scoring path — this is the lm_frozen discipline applied to
    subword segmentation.

Why a sequential rank-order fold is EXACT BPE (not an approximation):
merging pair (a, b) only creates new adjacencies that involve the merged
symbol ``ab``; any merge containing ``ab`` was necessarily learned
later, so applying merges once each, in learned order, yields the same
segmentation as the priority-queue form — the property linear BPE
appliers rely on.  Within one pass, Java's replaceAll scans left to
right without overlap, matching the trainer's left-to-right merge of
repeated pairs (``aaa`` -> ``(aa)a``); the trailing-separator LOOKAHEAD
(not consumed) keeps back-to-back occurrences (``abab``) all matching.

Word boundaries: training input is per-WORD frequencies, so no merge
ever contains a space; in the whole-text encoding spaces ride along as
ordinary symbols that never match a merge pattern, which is exactly the
"merges don't cross word boundaries" rule.  Token count excludes the
space symbols (the cost model counts subwords, like the ceil(len/4)
estimate it replaces).

Scale: ``bpe_cost_expr`` is per-row expression work (embarrassingly
parallel, ~n_merges regex passes over ~2x the text bytes).  The Zipf
path for corpus-scale scoring is ``bpe_costs_by_vocab`` — tokenize each
DISTINCT word once, broadcast the per-word costs back — so the regex
fold runs over the vocabulary, not the corpus.

Byte-level floor (``byte_level=True``, VERDICT r9 item 9): the
production norm [public knowledge: GPT-2's byte-level BPE, Radford et
al. 2019] trains over UTF-8 BYTES, so the base vocabulary is a fixed
256 symbols and every string — OOV scripts included — is tokenizable
with no <unk> and no unbounded character table.  Implementation: a
bijective re-coding ``utf8-bytes -> ISO-8859-1 chars`` (codepoints
0-255) turns the byte sequence into a string the EXISTING char-level
trainer and regex fold consume unchanged — in the JVM that re-coding is
``decode(encode(text,'UTF-8'),'ISO-8859-1')``, two built-in calls.  An
unmerged multibyte char costs its byte length (the floor); merges then
compress exactly as in char mode.  UTF-8 never uses byte 0x20 inside a
multibyte sequence, so the space-exclusion arithmetic is unchanged.
"""

from __future__ import annotations

import re
from collections import Counter

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SEP = "\x1f"  # symbol separator: a C0 control char real text never carries


# ---------------------------------------------------------------------------
# Reference trainer + tokenizer (driver-side, pure Python)
# ---------------------------------------------------------------------------

def _merge_word(sym: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    a, b = pair
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def byte_symbols(s: str) -> str:
    """The byte-level re-coding: UTF-8 bytes as ISO-8859-1 chars — a
    bijection onto codepoints 0-255, so char-level machinery operates on
    bytes without knowing it."""
    return s.encode("utf-8").decode("latin-1")


def train_bpe(word_counts: dict[str, int],
              n_merges: int, byte_level: bool = False
              ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a word-frequency dict (greedy
    highest total pair count; ties break on the lexicographically
    smallest pair — fully deterministic).  ``byte_level`` trains over
    UTF-8 byte symbols (fixed 256-base vocabulary, the OOV floor)."""
    if byte_level:
        word_counts = {byte_symbols(w): c for w, c in word_counts.items()}
    vocab = {tuple(w): c for w, c in word_counts.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        vocab = {_merge_word(sym, best): c for sym, c in vocab.items()}
    return merges


def tokenize_word(word: str, merges: list[tuple[str, str]],
                  byte_level: bool = False) -> list[str]:
    """Reference BPE application: every merge once, in rank order.
    ``byte_level`` segments the word's UTF-8 bytes (as ISO-8859-1
    chars) — an unmerged multibyte char yields one token per byte."""
    sym: tuple = tuple(byte_symbols(word) if byte_level else word)
    for pair in merges:
        if len(sym) == 1:
            break
        sym = _merge_word(sym, pair)
    return list(sym)


def bpe_token_count(text: str, merges: list[tuple[str, str]],
                    byte_level: bool = False) -> int:
    """Reference whole-text subword count (spaces are not tokens)."""
    return sum(len(tokenize_word(w, merges, byte_level))
               for w in text.split(" ") if w)


# ---------------------------------------------------------------------------
# JVM scoring expression
# ---------------------------------------------------------------------------

def _java_repl(s: str) -> str:
    """Escape a replacement string for Java's Matcher (backslash, $)."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def bpe_cost_expr(text: Column,
                  merges: list[tuple[str, str]],
                  byte_level: bool = False) -> Column:
    """EXACT BPE token count of ``text`` as one JVM expression.

    Encoding: strip any stray \\x1f, then put a separator before every
    char and after the last — ``"hi yo"`` becomes
    ``␟h␟i␟ ␟y␟o␟``.  Each merge (a, b) is one regexp_replace of
    ``␟a␟b(?=␟)`` with ``␟ab`` (symbols regex-quoted; the lookahead
    leaves the trailing separator for the next occurrence).  Surviving
    separators = symbols + 1, and spaces stay single symbols, so

        tokens = (separators - 1) - n_space_chars

    ``byte_level``: the text is first re-coded UTF-8 bytes -> ISO-8859-1
    chars (two built-ins), after which every "char" below IS one byte —
    merges must come from a ``byte_level`` trainer.  Space is byte 0x20,
    which UTF-8 never uses inside a multibyte sequence, so the space
    exclusion is unchanged.
    """
    if byte_level:
        text = F.decode(F.encode(text, "UTF-8"), "ISO-8859-1")
    enc = F.concat(
        F.lit(SEP),
        F.regexp_replace(F.regexp_replace(text, SEP, ""),
                         "(?s)(.)", "$1" + SEP))
    for a, b in merges:
        pat = SEP + re.escape(a) + SEP + re.escape(b) + f"(?={SEP})"
        enc = F.regexp_replace(enc, pat, _java_repl(SEP + a + b))
    seps = F.length(enc) - F.length(F.regexp_replace(enc, SEP, ""))
    n_space = F.length(text) - F.length(F.regexp_replace(text, " ", ""))
    return (seps - 1 - n_space).cast("long")


def bpe_costs_by_vocab(docs: DataFrame, merges: list[tuple[str, str]],
                       text_col: str = "text",
                       out_col: str = "n_bpe",
                       byte_level: bool = False) -> DataFrame:
    """Corpus-scale scoring: run the regex fold over the DISTINCT word
    vocabulary (Zipf: orders of magnitude smaller than the corpus), then
    broadcast the per-word costs back into an exploded-word sum.  Output:
    ``docs`` plus ``out_col``.  Same values as ``bpe_cost_expr`` on every
    doc (pytest-pinned); docs with no words cost 0."""
    from ..functions.text import tokens

    words = (docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
             .filter(F.col("w") != "").distinct())
    costs = words.select(
        "w", bpe_cost_expr(F.col("w"), merges, byte_level).alias("c"))
    exploded = docs.select(
        F.col("*"), F.explode_outer(
            F.filter(tokens(F.col(text_col)), lambda t: t != ""))
        .alias("w"))
    joined = exploded.join(F.broadcast(costs), "w", "left")
    keys = [c for c in docs.columns]
    return (joined.groupBy(*keys)
            .agg(F.coalesce(F.sum("c"), F.lit(0)).alias(out_col)))
