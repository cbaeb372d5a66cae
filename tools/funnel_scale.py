"""One COMPOSED clean_corpus pass at sf1 (~50k docs), end to end, with
per-phase wall timings — VERDICT r5 item 7: the funnel was tested at
fixture scale and its stages individually at sf1, but never as one run.

Phases (all from the package's own operators):
  1. clean_corpus over the sf1 documents (exact dedup -> repetition filter
     -> eval-set decontamination -> PII redaction -> incremental near-dup
     vs a fresh persisted index -> split), funnel counts via the
     Observation API in the SAME job that writes the output;
  2. duplicate-CLUSTER resolution over the accepted rows: MinHash-LSH pair
     graph -> connected components -> keep-best-per-cluster (longest
     text), i.e. the transitive-closure pass the pairwise in-funnel dedup
     deliberately leaves to a dedicated stage.

Eval set = the same doc_id % 97 slice the corpus_decontamination catalog
query pins, so the run includes a real decontamination stage.

Writes FUNNEL_SF1.json: {timings, funnel, cluster, env}.  The pytest
marker tests/test_funnel_scale.py re-runs this composition (when the sf1
directory exists) and asserts the funnel invariants.

Usage: python tools/make_scale.py --out /tmp/sf1 --k 10   # if needed
       python tools/funnel_scale.py [--dir /tmp/sf1] [--out FUNNEL_SF1.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_funnel(spark, sf1_dir: str, work_dir: str) -> dict:
    """The composed pass; returns the artifact dict (pure function of the
    input dir + a scratch dir, reused by the pytest marker)."""
    import pyspark.sql.functions as F

    from dbt_demo_spark.operators.cluster import keep_best_per_cluster
    from dbt_demo_spark.operators.dedup import minhash_near_dups
    from dbt_demo_spark.pipeline import clean_corpus
    from dbt_demo_spark.queries.text_filters import (DECONTAM_CORPUS_PRED,
                                                     DECONTAM_EVAL_PRED)

    docs = spark.read.parquet(os.path.join(sf1_dir, "documents.parquet"))
    corpus = docs.filter(DECONTAM_CORPUS_PRED)
    eval_docs = docs.filter(DECONTAM_EVAL_PRED)
    index_dir = os.path.join(work_dir, "fp_index")
    out_dir = os.path.join(work_dir, "clean")

    # min_matched=50: the synthetic corpus shares one small vocabulary, so
    # 3-token shingles collide pervasively (measured at sf1: median doc
    # shares 34 distinct grams with the 510-doc eval slice; min_matched=1
    # would drop 49485 of 49486 docs — a data artifact, not a funnel).
    # 50 keeps the stage meaningful here (~23% drop); exact semantics at
    # real thresholds are pinned by the planted fixtures in
    # tests/test_decontaminate.py and the driver-gated catalog row.
    # r14: the two new row-local/census stages ride the same composed
    # pass — the frozen quality classifier band (margin >= 0 keeps the
    # in-domain bulk; the corpus matches the training distribution) and
    # cross-batch boilerplate removal (the synthetic docs are single-line
    # word streams with no repeated post-dedup text, so the stage is a
    # no-op CUT-wise here — what this run measures is the census cost at
    # scale; line-structured semantics are pinned in test_boilerplate.py)
    from dbt_demo_spark.operators.quality_frozen import (
        FROZEN_QUALITY_BIAS, FROZEN_QUALITY_WEIGHTS)

    t0 = time.perf_counter()
    clean, obs = clean_corpus(
        corpus, index_dir, eval_docs=eval_docs, min_matched=50,
        quality_model=(list(FROZEN_QUALITY_WEIGHTS), FROZEN_QUALITY_BIAS),
        min_quality_margin=0.0,
        boilerplate_census_dir=os.path.join(work_dir, "line_census"),
        boilerplate_batch_id=0)
    clean.write.mode("overwrite").parquet(out_dir)
    t_funnel = time.perf_counter() - t0
    funnel = {name: int(o.get["rows"]) for name, o in obs.items()}

    # cluster resolution over the ACCEPTED corpus (read back from the
    # materialized output — the next pipeline stage's natural input)
    t0 = time.perf_counter()
    accepted = spark.read.parquet(out_dir)
    pairs = minhash_near_dups(accepted, threshold=0.5,
                              max_bucket=64).select("d1", "d2")
    resolved = keep_best_per_cluster(accepted, pairs, order_col="n_chars")
    n_resolved = resolved.count()
    t_cluster = time.perf_counter() - t0

    return {
        "what": ("composed clean_corpus + cluster-resolution pass at sf1 "
                 "(VERDICT r5 item 7); funnel counts from the Observation "
                 "API in the single materializing job"),
        "note": ("cluster_losers == 0 is the EXPECTED invariant when the "
                 "clusters stage follows the in-funnel incremental dedup: "
                 "that dedup already guarantees no accepted doc near-"
                 "matches any earlier accepted doc, so the residual pair "
                 "graph is empty; the cluster stage is the safety net for "
                 "merging independently prepared shards (where cross-shard "
                 "pairs DO exist — tests/test_cluster.py covers the "
                 "non-empty graph semantics)"),
        "dir": sf1_dir,
        "funnel": funnel,
        "cluster": {"resolved_docs": int(n_resolved),
                    "cluster_losers": funnel["accepted"] - int(n_resolved)},
        "timings_sec": {"funnel_wall": round(t_funnel, 3),
                        "cluster_resolution_wall": round(t_cluster, 3)},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--out", default=os.path.join(REPO, "FUNNEL_SF1.json"))
    args = ap.parse_args()

    from dbt_demo_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(app_name="funnel-sf1")
    work = tempfile.mkdtemp(prefix="funnel_sf1_")
    try:
        artifact = run_funnel(spark, args.dir, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
