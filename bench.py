"""Headline benchmark: run the catalog's bench-tagged queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is timed end-to-end (plan + execute + sink) with a `noop` write as
the sink — the whole DataFrame is materialized on executors without paying
driver-side collection, which is how a real pipeline would consume it.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from dbt_demo_spark.queries import CATALOG
    from dbt_demo_spark.session import get_spark

    spark = get_spark(app_name="dbt_demo_spark-bench")

    # Warm the JVM/codegen path once so per-query numbers measure the engine,
    # not first-query classloading.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, spec in CATALOG.items():
        if not spec.bench:
            continue
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "catalog_bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
