"""Small-file compaction for parquet tables — the OPTIMIZE-style table
maintenance a long-lived 100 TB warehouse cannot live without.

Streaming ingestion (streaming/ingest.py), incremental refreshes
(core/runner.py insert_overwrite), and per-batch dedup commits all append
small files; at scale the file count — not the byte count — becomes the
bottleneck (every query pays NameNode/S3-listing latency and one task per
tiny file).  The fix is the standard bin-pack rewrite [public knowledge:
Delta Lake OPTIMIZE, Iceberg rewrite_data_files]: per partition leaf,
rewrite many small files into ceil(bytes/target) files, commit atomically,
leave already-compact leaves untouched.

Shapes:
  * Leaves are independent — each leaf's rewrite is its own Spark job
    here (driver-side orchestration loop), and at cluster scale the same
    loop runs leaves concurrently; the data of one leaf never shuffles
    against another.
  * The rewrite is coalesce(n), not repartition(n): packing existing
    files into fewer does NOT need a shuffle, only task-side concat.
  * Commit is the repo's atomic dir-swap discipline (operators/dedup.py
    incremental index): new files stage into a sibling temp dir, the
    swap is two renames, and a crash before the final rename leaves the
    original leaf fully intact.
  * Idempotent: a second pass finds every leaf already compact and
    rewrites nothing (the receipts prove it — tests/test_compact.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _leaf_dirs(root: str) -> list[str]:
    """All directories under ``root`` that directly hold parquet files —
    the partition leaves of a hive layout, or ``root`` itself for an
    unpartitioned table."""
    leaves = []
    for dirpath, dirnames, filenames in os.walk(root):
        # never descend into in-flight/leftover swap dirs from a crashed run
        dirnames[:] = [d for d in dirnames if "__compact_" not in d]
        if "__compact_" in os.path.basename(dirpath):
            continue
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(dirpath)
    return sorted(leaves)


def _parquet_files(leaf: str) -> list[tuple[str, int]]:
    return sorted(
        (f, os.path.getsize(os.path.join(leaf, f)))
        for f in os.listdir(leaf)
        if f.endswith(".parquet")
        and os.path.isfile(os.path.join(leaf, f)))


def plan_compaction(root: str,
                    target_bytes: int = DEFAULT_TARGET_BYTES) -> dict:
    """Inspect-only pass: which leaves would compact, and to how many
    files.  A leaf needs work when it holds >= 2 files AND fewer target
    bins than files (i.e. the rewrite actually reduces the count)."""
    plan = {"root": root, "target_bytes": target_bytes, "leaves": []}
    for leaf in _leaf_dirs(root):
        files = _parquet_files(leaf)
        total = sum(sz for _, sz in files)
        want = max(1, -(-total // target_bytes))  # ceil, >= 1
        plan["leaves"].append({
            "leaf": os.path.relpath(leaf, root),
            "files": len(files),
            "bytes": total,
            "target_files": want,
            "rewrite": len(files) > 1 and want < len(files),
        })
    return plan


def compact_parquet(spark: SparkSession, root: str,
                    target_bytes: int = DEFAULT_TARGET_BYTES) -> dict:
    """Bin-pack every fragmented partition leaf of the parquet table at
    ``root`` into ~``target_bytes`` files.  Returns receipts:
    ``{leaves_considered, leaves_rewritten, files_before, files_after,
    bytes}`` — a maintenance job that cannot say what it did is a
    maintenance job nobody trusts.

    Rows are preserved exactly (multiset equality, pytest-gated); only
    the file layout changes.  Partition-key columns live in the directory
    names, not the files, so each leaf rewrite round-trips just that
    leaf's columns."""
    plan = plan_compaction(root, target_bytes)
    receipts = {"root": root, "target_bytes": target_bytes,
                "leaves_considered": len(plan["leaves"]),
                "leaves_rewritten": 0,
                "files_before": sum(l["files"] for l in plan["leaves"]),
                "files_after": 0,
                "bytes": sum(l["bytes"] for l in plan["leaves"])}
    for entry in plan["leaves"]:
        if not entry["rewrite"]:
            receipts["files_after"] += entry["files"]
            continue
        leaf = os.path.join(root, entry["leaf"]) \
            if entry["leaf"] != "." else root
        tmp = leaf + ".__compact_new__"
        old = leaf + ".__compact_old__"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        # read ONLY this leaf's files; coalesce needs no shuffle
        (spark.read.parquet(leaf)
         .coalesce(entry["target_files"])
         .write.mode("overwrite").parquet(tmp))
        # atomic-swap commit: crash before the second rename leaves the
        # original leaf in place; crash after it leaves a complete new
        # leaf (the stale *.__compact_old__ is garbage, never read)
        os.rename(leaf, old)
        os.rename(tmp, leaf)
        shutil.rmtree(old)
        receipts["leaves_rewritten"] += 1
        receipts["files_after"] += len(_parquet_files(leaf))
    return receipts
