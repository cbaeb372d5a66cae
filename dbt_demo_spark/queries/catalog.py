"""QuerySpec registry shared by the driver entry point, bench, and tests."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None        # DuckDB SQL; None -> driver does rows-only check
    tags: tuple[str, ...] = ()
    bench: bool = True        # include in bench.py headline timing
    # two_pass=True: the query fn does real multi-pass engine work (Spark
    # jobs, e.g. a Misra-Gries candidate pass) at PLAN-CONSTRUCTION time,
    # so bench.py must rebuild the plan inside the timed region instead of
    # re-executing a prebuilt handle — otherwise only the final pass is
    # timed while the oracle pays its full scan (VERDICT r8 item 3).
    two_pass: bool = False
    doc: str = ""


CATALOG: dict[str, QuerySpec] = {}

# The catalog rows where the DuckDB baseline's text/list operations are
# the outlier (together they dominate its catalog total); every
# relational-subtotal artifact (bench.py sequential_relational_sec,
# tools/scale_bench.py sequential_ratio_relational) excludes exactly this
# set — ONE definition so the two can never drift apart again (they had,
# r4-r6).
NON_RELATIONAL_QUERIES = frozenset({
    "corpus_decontamination", "doc_fingerprint", "dedup_embedding_cosine",
})


def query(name: str, *, oracle: str | None, tags: tuple[str, ...] = (),
          bench: bool = True,
          two_pass: bool = False) -> Callable[[SparkQuery], SparkQuery]:
    """Register a catalog query.  The decorated function's docstring should
    cite the reference file:line whose operator it exercises."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in CATALOG:
            raise ValueError(f"duplicate query name: {name}")
        CATALOG[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags,
                                  bench=bench, two_pass=two_pass,
                                  doc=fn.__doc__ or "")
        return fn

    return deco


def get_queries() -> dict[str, SparkQuery]:
    return {n: s.fn for n, s in CATALOG.items()}


def get_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in CATALOG.items() if s.oracle is not None}
