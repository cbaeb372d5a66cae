"""Incremental (overwrite-partition) materialization + partition pruning.

Verifies the two scale claims the runner makes:
  1. a second incremental run fed a one-month slice of source data rewrites
     ONLY that month's partition (other partition files untouched on disk);
  2. a month-filtered read of a partitioned mart partition-prunes (the scan
     node carries a PartitionFilters entry selecting 1 of N partitions).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from dbt_demo_spark.models.fiction_bank import REGISTRY
from dbt_demo_spark.models.seeds import load_seed_dataframes
from dbt_demo_spark.core.runner import Runner


def _partition_files(path: str) -> dict[str, tuple[str, float]]:
    """{month-dir: (filename, mtime)} for each month= partition."""
    out = {}
    for d in sorted(os.listdir(path)):
        if not d.startswith("month="):
            continue
        files = sorted(f for f in os.listdir(os.path.join(path, d))
                       if f.endswith(".parquet"))
        mt = max(os.path.getmtime(os.path.join(path, d, f)) for f in files)
        out[d] = (";".join(files), mt)
    return out


def test_incremental_rewrites_only_touched_partition(spark, tmp_path):
    wh = str(tmp_path / "wh")
    seeds = load_seed_dataframes(spark)

    runner = Runner(spark, REGISTRY, wh)
    full = runner.run(seeds)["agg_monthly_loans_fixed"]
    full_rows = {(str(r["month"]), r["loan_type_name"]): r["payment_volume"]
                 for r in full.collect()}
    path = os.path.join(wh, "agg_monthly_loans_fixed")
    before = _partition_files(path)
    assert len(before) > 2, "expected several month partitions"

    # Incremental run: only February 2023 source rows (one month slice).
    feb = dict(seeds)
    feb["raw_loans"] = seeds["raw_loans"].filter(
        F.col("loan_start_date").startswith("2023-02"))
    feb["raw_loan_payments"] = seeds["raw_loan_payments"].filter(
        F.col("payment_date").startswith("2023-02"))
    runner2 = Runner(spark, REGISTRY, wh)
    out = runner2.run(feb)["agg_monthly_loans_fixed"]

    after = _partition_files(path)
    # every non-February partition is byte-for-byte the same files, untouched
    untouched = {d: v for d, v in before.items() if "2023-02" not in d}
    for d, v in untouched.items():
        assert after[d] == v, f"partition {d} was rewritten by an incremental run"
    # February was rewritten
    feb_dirs = [d for d in after if "2023-02" in d]
    assert feb_dirs and all(after[d] != before.get(d) for d in feb_dirs)

    # table still contains ALL months (old partitions survive) and the
    # February values equal the full-build values (same grain, same data)
    rows = {(str(r["month"]), r["loan_type_name"]): r["payment_volume"]
            for r in out.collect()}
    assert set(rows) == set(full_rows)
    for k, v in rows.items():
        if k[0].startswith("2023-02"):
            assert v == full_rows[k]


def test_partitioned_read_prunes(spark, tmp_path):
    wh = str(tmp_path / "wh")
    runner = Runner(spark, REGISTRY, wh)
    rel = runner.run(load_seed_dataframes(spark))

    pruned = rel["agg_monthly_loans_fixed"].filter(F.col("month") == "2023-02-01")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "month" in plan
    # the filter reaches the scan as a partition filter, not a data filter
    assert pruned.count() >= 1
