"""SparkSession factory with scale-aware defaults.

Local runs use ``local[N]``; the same config block is what we would ship to a
1000-executor cluster — AQE on (runtime re-planning, skew-join handling,
shuffle-partition coalescing), explicit session timezone (UTC) so
timestamp→date truncation is calendar-stable and matches the DuckDB oracle's
naive timestamps, and Arrow enabled for the few Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB these two are cluster-tuned (shuffle partitions ~ 2-3x total
# cores; AQE coalesces down at runtime).  Locally we keep them small so
# 600k-row benches aren't dominated by empty-task overhead.
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def mart_buckets() -> int:
    """Bucket count for the build-once grain/bucketed marts (r14,
    VERDICT r13 item 6 — one shared constant instead of `n_buckets=8`
    literals in each builder).  Read at BUILD time so a session can
    override without re-importing.  Sizing rule: like shuffle
    partitions, buckets ~ cluster cores x a small multiple (2-4x) so
    co-located bucket joins saturate the executors — but bounded below
    by file size (each bucket file should stay >= tens of MB to avoid a
    small-files explosion).  8 is measured-right at the local bench
    scales (sf0.1-1 on 32 threads); a 1000-executor cluster reading
    100 TB would set SPARK_GRAFT_MART_BUCKETS to a few thousand."""
    return int(os.environ.get("SPARK_GRAFT_MART_BUCKETS", "8"))

# Measured local-mode bench tuning (FLOOR_SWEEP.json, the winning sweep
# combo): the single source of truth for bench.py AND the sweep's combo_all,
# so the committed bench numbers always reflect the sweep's winner.  LOCAL
# ONLY — the ship defaults below keep AQE on (at 100 TB runtime re-planning
# is essential and these constants vanish).
LOCAL_BENCH_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.shuffle.compress": "false",
    "spark.shuffle.spill.compress": "false",
    "spark.broadcast.compress": "false",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(512 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(16 * 1024 * 1024),
}


def _extra_conf() -> dict:
    """Ad-hoc config overrides from $SPARK_GRAFT_EXTRA_CONF ("k=v;k=v").

    Exists for measured tuning sweeps (tools/floor_bench.py): every candidate
    config delta runs through the same session factory the engine ships, so a
    sweep result is reproducible by exporting the same string."""
    raw = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    out = {}
    for pair in raw.split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            out[k.strip()] = v.strip()
    return out


def get_spark(app_name: str = "dbt_demo_spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              conf: dict | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    ``conf``: caller-supplied overrides (e.g. bench.py's measured local-mode
    tuning, FLOOR_SWEEP.json); $SPARK_GRAFT_EXTRA_CONF still wins over these
    so a sweep/driver can override the caller."""
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{DEFAULT_CPUS}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate copies the generator's child expression
        # into an inferred `size(e) > 0` filter, which predicate pushdown then
        # inlines through the projections below — for our explode-over-
        # expensive-fold operators (MinHash band keys) that re-materializes
        # the whole token->shingle pipeline inside the filter (measured ~2x
        # per-row recompute).  Our generators always produce >= 1 row, so the
        # inference buys nothing.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        # Codegen CLASS cache sized for a query catalog, not a single query:
        # the default 100-entry cache holds ~20 queries' generated classes,
        # so a 47-query catalog pass evicts everything and every query pays
        # a ~0.3-0.5s Janino recompile on each revisit (measured r6: the
        # whole sequential catalog 20.7s -> 12.1s at sf0.1 from this one
        # setting; forced GC made it WORSE, which is what distinguished it
        # from heap pressure).  2000 entries ~ a few hundred MB of metaspace
        # upper bound — the right trade for any engine serving a repeated
        # workload, locally and on a cluster.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # Sorted bucketed marts are written ONE FILE PER BUCKET
        # (core/runner.py bucket_by materialization), which is exactly the
        # layout under which Spark can trust the on-disk sortBy order —
        # but since 3.0 the scan only claims it behind this flag (the
        # default-off reason, multi-file buckets forcing single-task
        # reads, cannot arise for our marts).  With it on, sort-merge
        # joins over co-bucketed marts drop BOTH per-query fact-size Sort
        # nodes (plan-pinned in tests/test_bucketing.py; sf1 interleaved
        # min 0.53 -> 0.30 s on mart_bucketed_revenue).  Scale-neutral:
        # at 100 TB the bucket count grows with the cluster
        # (SPARK_GRAFT_MART_BUCKETS) and the one-file-per-bucket write
        # discipline is what any warehouse does for sorted bucketed marts.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (conf or {}).items():
        builder = builder.config(k, v)
    for k, v in _extra_conf().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable parts of our config to a session we did not
    build (the driver hands us one in ``__spark_entry__.entry``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    # runtime-settable (verified): lets bucketed-mart scans claim their
    # sortBy order so co-bucketed joins skip per-query Sorts — see
    # get_spark above; marts are written one file per bucket (runner.py)
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    # NOTE: spark.sql.codegen.cache.maxEntries is a STATIC conf (verified:
    # setting it here raises CANNOT_MODIFY_STATIC_CONFIG) — it can only be
    # applied at session build (get_spark above); a handed-in session keeps
    # its default codegen class cache.
    return spark
