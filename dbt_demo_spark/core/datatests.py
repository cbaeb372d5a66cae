"""Data-test runner — the Spark-native ``dbt test``.

dbt compiles each test to a SELECT returning violating rows and fails on
row count > 0 (reference: README.md:53-54; the intended grain test is
specified in prose at docs/bug-analysis.md:139-157).  Same contract here:
a DataTest produces a DataFrame of violations; non-empty -> fail.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class DataTest:
    name: str
    fn: Callable[[dict[str, DataFrame]], DataFrame]   # relations -> violations


@dataclass
class DataTestResult:
    name: str
    passed: bool
    violations: int

    def __bool__(self) -> bool:
        return self.passed


def run_data_tests(tests: list[DataTest],
                   relations: dict[str, DataFrame]) -> list[DataTestResult]:
    results = []
    for t in tests:
        # limit(1).count() would be cheaper, but the violation count is the
        # useful diagnostic and these are assertion-sized queries.
        n = t.fn(relations).count()
        results.append(DataTestResult(t.name, n == 0, n))
    return results
