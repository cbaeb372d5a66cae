"""Corpus mixture balancing (X113, r14) — solve per-source sampling
rates that hit a TARGET mixture [public knowledge: Brown et al. 2020
sample the GPT-3 training mix with fixed per-dataset weights; Touvron et
al. 2023 publish LLaMA's static per-source proportions; Xie et al. 2023
(DoReMi) is the adaptive version — this operator is the static solve
those recipes start from].

Given the corpus's measured per-source weight (token count by default)
and a target proportion per source, compute the downsampling rates that
realize the target mix EXACTLY in expectation while keeping the most
data possible without upsampling:

    rate_s = c * t_s / w_s,   c = min_s (w_s / t_s)

— the binding source (smallest w_s / t_s, i.e. the one furthest under
its target share) keeps everything (rate 1.0) and every other source
downsamples to match.  Closed form, deterministic, driver-side over a
#sources-row aggregate (the only Spark job is one groupBy at source
grain — bounded-artifact collect policy).  The rates feed the existing
hash-bucket sampler (queries/text_filters.source_weighted_sample, via
clean_corpus(rates=...)): row-local, RNG-free, repartition-stable.

At 100 TB: the weight measurement is one map-side-combined aggregate
over the corpus (source grain — a handful of rows); the solve is O(#
sources) arithmetic; applying the rates is a row-local filter.  Nothing
shuffles wider than the source-grain frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text import tokens


def source_weights(docs: DataFrame, by: str = "source",
                   text_col: str = "text",
                   weight: str = "tokens") -> dict[str, int]:
    """Measured weight per source: ``tokens`` (whitespace token count —
    the unit training mixes are quoted in) or ``docs`` (row count).
    One source-grain aggregate; the collect is bounded by the number of
    distinct sources."""
    if weight == "tokens":
        w = F.sum(F.size(tokens(F.col(text_col)))).alias("w")
    elif weight == "docs":
        w = F.count(F.lit(1)).alias("w")
    else:
        raise ValueError(f"weight must be tokens | docs, got {weight!r}")
    rows = docs.groupBy(by).agg(w).collect()
    return {r[by]: int(r.w) for r in rows}


def mixture_rates(weights: dict[str, int],
                  targets: dict[str, float],
                  tol: float = 1e-6) -> dict[str, float]:
    """Per-source keep rates realizing ``targets`` (proportions, must
    sum to 1 within ``tol``) over a corpus with measured ``weights`` —
    the closed-form solve above.  Every target source must exist with
    positive weight (a zero-weight source cannot supply its share; that
    is a data problem to surface, not round away); sources absent from
    ``targets`` get rate 0.0 (dropped — the sampler's contract for
    unlisted sources), stated explicitly in the result so the caller
    sees the whole mix."""
    if not targets:
        raise ValueError("mixture_rates: empty targets")
    bad = [s for s, t in targets.items() if t <= 0]
    if bad:
        raise ValueError(
            f"mixture_rates: non-positive target share for {bad} — drop "
            "the source from targets instead of assigning it 0")
    total = sum(targets.values())
    if abs(total - 1.0) > tol:
        raise ValueError(
            f"mixture_rates: target shares sum to {total!r}, not 1 — "
            "normalize explicitly; silent renormalization hides typos")
    missing = [s for s in targets if weights.get(s, 0) <= 0]
    if missing:
        raise ValueError(
            f"mixture_rates: target sources with no corpus weight: "
            f"{missing} — the mix is unachievable from this corpus")
    c = min(weights[s] / t for s, t in targets.items())
    rates = {s: min(1.0, c * t / weights[s]) for s, t in targets.items()}
    for s in weights:
        rates.setdefault(s, 0.0)
    return rates


def achieved_mixture(weights: dict[str, int],
                     rates: dict[str, float]) -> dict[str, float]:
    """Expected post-sampling proportions — the check the solve is
    verified against (pytest): kept_s = w_s * rate_s, normalized."""
    kept = {s: weights.get(s, 0) * r for s, r in rates.items() if r > 0}
    total = sum(kept.values())
    if total <= 0:
        raise ValueError("achieved_mixture: rates keep nothing")
    return {s: v / total for s, v in kept.items()}
