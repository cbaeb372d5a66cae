"""Batch (multi-query) workload execution — the engine-level API over
sources/parquet.shared_scans.

A repeated analytics workload (the catalog, a dashboard refresh, a
nightly mart rebuild) touches the same sources many times; serving the
batch from column-pruned cached scans decodes each source ONCE per batch
(measured: SHARED_SCAN.json, 17% off the sf1 sequential catalog).  This
module makes that a one-call engine feature:

    from dbt_demo_spark.workload import run_workload
    timings = run_workload(spark, sf_dir, {"q1": fn1, "q2": fn2},
                           out_dir="/warehouse/results")

The cached footprint is derived from the BATCH'S OWN PLANS: each query is
constructed once against the plain scans, its formatted physical plan is
parsed for (Location, ReadSchema) pairs under ``sf_dir``, and the union
of read columns per table is what gets cached — the footprint a
cluster-side workload manager would compute.  Queries are then
RE-constructed inside the shared-scan block (DataFrames bind their scans
at construction) and materialized there, because the cache is released
when the block exits.
"""

from __future__ import annotations

import os
import re
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .sources.parquet import shared_scans

# any URI scheme (file:, hdfs:, s3a:, ...) — matching only file: would
# silently degrade run_workload to unshared execution on cluster
# filesystems, contrary to the 100 TB posture (ADVICE r6)
_LOC_RE = re.compile(
    r"Location: [^\[]+\[(?P<path>[a-zA-Z][a-zA-Z0-9+.-]*:[^\]]+)\]")
# greedy to the LAST '>' on the line: nested types (array<float>,
# map<string,int>) contain '>' themselves — a lazy match would cut the
# column list at the first one and silently drop later columns (r6
# code-review finding)
_SCHEMA_RE = re.compile(r"ReadSchema: struct<(?P<cols>.*)>\s*$")


def _strip_file_scheme(p: str) -> str:
    """file:/x, file:///x -> /x; non-file URIs returned unchanged."""
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
    return p


def _dir_matches(loc: str, sf_dir: str, sf_abs: str) -> bool:
    """Does the scan Location's parent directory name ``sf_dir``?  Local
    paths compare as normalized filesystem paths (file: scheme stripped
    from either side); remote URIs compare as trimmed URI strings —
    os.path on an s3a:// string would be meaningless."""
    parent = os.path.dirname(loc.rstrip("/"))
    if parent.startswith("file:") or ":" not in parent.split("/", 1)[0]:
        return os.path.abspath(_strip_file_scheme(parent)) == sf_abs
    return parent.rstrip("/") == sf_dir.rstrip("/")


def _split_top_level(cols: str) -> list[str]:
    """Split a struct body on commas at bracket depth 0 only — commas
    inside nested type parameters (map<string,int>) are not separators."""
    out, cur, depth = [], [], 0
    for ch in cols:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def scan_columns(df: DataFrame, sf_dir: str) -> dict[str, set[str]]:
    """table -> columns this plan reads from ``sf_dir``, parsed from the
    formatted explain's (Location, ReadSchema) pairs.

    The parse happens on a FRESH query execution (``df.select("*")``) with
    the metadata string limit raised for the duration: a previously
    materialized plan binds its metadata strings under the default
    100-char limit, which would truncate deep paths out of the footprint;
    the fresh plan formats under the raised limit regardless of the
    handle's history.  ``sf_dir`` is normalized before comparison so
    relative or non-canonical spellings still match the absolute paths
    Spark prints."""
    spark = df.sparkSession
    sf_abs = os.path.abspath(sf_dir)
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    spark.conf.set(key, "8192")
    try:
        text = df.select("*")._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
    finally:
        spark.conf.set(key, old)
    out: dict[str, set[str]] = {}
    loc = None
    for line in text.splitlines():
        m = _LOC_RE.search(line)
        if m:
            loc = m.group("path")
            continue
        m = _SCHEMA_RE.search(line)
        if m and loc and _dir_matches(loc, sf_dir, sf_abs):
            table = os.path.basename(loc.rstrip("/")).removesuffix(".parquet")
            cols = {c.split(":")[0].strip()
                    for c in _split_top_level(m.group("cols")) if c}
            out.setdefault(table, set()).update(cols)
            loc = None
    return out


def batch_footprint(dfs: dict[str, DataFrame],
                    sf_dir: str) -> dict[str, list[str] | None]:
    """Union of every query's column footprint per table.  ``events``
    caches the full normalized loader output (its scan schema — raw
    nanos/long layouts — differs from the served schema)."""
    cols: dict[str, set[str]] = {}
    for df in dfs.values():
        for t, cset in scan_columns(df, sf_dir).items():
            cols.setdefault(t, set()).update(cset)
    out: dict[str, list[str] | None] = {t: sorted(c) for t, c in cols.items()}
    if "events" in out:
        out["events"] = None
    return out


def run_workload(spark: SparkSession, sf_dir: str,
                 queries: dict[str, Callable[[SparkSession, str], DataFrame]],
                 *, shared: bool = True,
                 sink: Callable[[str, DataFrame], None] | None = None,
                 out_dir: str | None = None) -> dict[str, float]:
    """Execute a named query batch; returns per-query wall seconds.

    ``sink(name, df)`` materializes each result (default: parquet under
    ``out_dir/name``; one of sink/out_dir is required — results must be
    materialized INSIDE the shared block, a lazy handle returned past the
    cache's lifetime would silently recompute from cold scans).  With
    ``shared=False`` runs the same loop against plain scans — the A/B
    the receipts tool (tools/shared_scan_bench.py) measures."""
    if sink is None:
        if out_dir is None:
            raise ValueError("run_workload needs sink= or out_dir=")

        def sink(name: str, df: DataFrame) -> None:
            df.write.mode("overwrite").parquet(os.path.join(out_dir, name))

    def execute() -> dict[str, float]:
        timings = {}
        for name, fn in queries.items():
            t0 = time.perf_counter()
            sink(name, fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        return timings

    if not shared:
        return execute()

    # footprint pass: construct once against plain scans, read the plans
    dfs = {n: fn(spark, sf_dir) for n, fn in queries.items()}
    footprint = batch_footprint(dfs, sf_dir)
    if not footprint:
        # legitimate for pure in-memory batches, but loud: a caller who
        # expected sharing should not discover it silently off
        import warnings

        warnings.warn(
            f"run_workload: no {sf_dir} scans found in the batch's plans; "
            "executing without shared scans", stacklevel=2)
        return execute()
    with shared_scans(spark, sf_dir, footprint):
        return execute()


__all__ = ["batch_footprint", "run_workload", "scan_columns"]
