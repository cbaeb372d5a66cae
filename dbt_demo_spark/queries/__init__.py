"""Differential-test query catalog.

Every implemented operator from SURVEY.md §2 is represented by a QuerySpec:
a Spark callable `(spark, sf_dir) -> DataFrame` plus (where SQL-expressible)
an equivalent ANSI-SQL oracle string that DuckDB runs on the same parquet
tables.  `__spark_entry__.py`, `bench.py`, and the pytest parity harness all
read this one registry.
"""

from .catalog import CATALOG, QuerySpec, query, get_queries, get_oracles

# Importing these modules populates CATALOG via the @query decorator.
# Registration order matters: the driver's CORRECTNESS gate records at most
# 50 queries in catalog order (round 2 shipped 53 and the last 3 — the
# window suite — were silently unchecked).  windows registers BEFORE
# llm_pipeline so the window/events surface always lands inside the checked
# window even if future rounds grow the tail.
from . import reference_surface  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import tpch2  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import llm_pipeline  # noqa: E402,F401
# corpus-hygiene surface: registers text_repetition (r5, displacing
# tpch_q19 whose gate moved to a pytest differential — tpch2.py)
from . import text_filters  # noqa: E402,F401
# time-series reshaping: pivot + date-spine gap-fill (r9, displacing
# tpch_q10 / tpch_q4 whose gates moved to pytest differentials — tpch.py)
from . import timeseries  # noqa: E402,F401

__all__ = ["CATALOG", "QuerySpec", "query", "get_queries", "get_oracles"]
