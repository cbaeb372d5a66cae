"""Streaming performance receipt (VERDICT r8 item 9): every streaming twin
is correctness-tested; this measures the two production-shaped ones and
commits the numbers — rows/sec, per-micro-batch latency, and state size —
so the streaming subsystem is no longer the one unquantified corner.

  * INGEST — the clean_corpus funnel as a file-source stream
    (streaming/ingest.clean_ingest): documents land as files, each
    micro-batch runs exact dedup -> hygiene -> redact -> incremental
    near-dup against the persisted index -> split, exactly-once sink
    before index commit.  "State" is the on-disk fingerprint index (this
    path keeps NO Spark streaming state).
  * SESSIONIZATION — session_window rollup (streaming/rollup.
    session_rollup) with a 2h watermark: true stateful streaming; state
    size/rows come from the engine's own stateOperators metrics.

Both run availableNow over the corpus split into micro-batches via
maxFilesPerTrigger, on the same session conf as bench.py, ambient load
stamped.  Latencies are the engine's triggerExecution durations from
StreamingQueryProgress — not wall-clock guesses.

Usage: python tools/stream_bench.py [--dir /tmp/sf1]
           [--out STREAM_BENCH.json] [--files-per-trigger 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _drain(q) -> list[dict]:
    """Wait out an availableNow query, then return its batch progress."""
    while q.isActive:
        time.sleep(0.5)
    return [json.loads(p.json) if isinstance(p.json, str) else p.json
            for p in q.recentProgress]


def _batch_stats(progress: list[dict]) -> dict:
    batches = [p for p in progress if p.get("numInputRows", 0) > 0]
    durs = [p["durationMs"]["triggerExecution"] / 1000.0 for p in batches]
    rows = [p["numInputRows"] for p in batches]
    state = [op for p in batches for op in p.get("stateOperators", [])]
    out = {
        "micro_batches": len(batches),
        "input_rows": int(sum(rows)),
        "batch_latency_sec": {
            "mean": round(sum(durs) / len(durs), 3) if durs else None,
            "max": round(max(durs), 3) if durs else None,
            "min": round(min(durs), 3) if durs else None,
        },
    }
    if state:
        out["state"] = {
            "rows_total_final": int(state[-1].get("numRowsTotal", 0)),
            "memory_used_bytes_final": int(state[-1].get(
                "memoryUsedBytes", 0)),
        }
    return out


def _dir_bytes(path: str) -> int:
    return sum(os.path.getsize(os.path.join(dp, f))
               for dp, _dn, fns in os.walk(path) for f in fns)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--out", default=os.path.join(REPO, "STREAM_BENCH.json"))
    ap.add_argument("--files-per-trigger", type=int, default=3)
    ap.add_argument("--work", default="/tmp/stream_bench_work")
    args = ap.parse_args()

    from bench import loadavg

    from dbt_demo_spark.session import LOCAL_BENCH_CONF, get_spark
    from dbt_demo_spark.streaming.ingest import (clean_ingest,
                                                 read_document_stream)
    from dbt_demo_spark.streaming.rollup import (read_event_stream,
                                                 session_rollup)

    shutil.rmtree(args.work, ignore_errors=True)
    os.makedirs(args.work)
    spark = get_spark(app_name="stream-bench", shuffle_partitions=8,
                      conf=LOCAL_BENCH_CONF)
    load0 = loadavg()
    result = {"sf_dir": args.dir, "loadavg_start": list(load0),
              "files_per_trigger": args.files_per_trigger}

    # ---- ingest funnel -------------------------------------------------
    idx = os.path.join(args.work, "index")
    out_dir = os.path.join(args.work, "clean")
    ckpt = os.path.join(args.work, "ckpt_ingest")
    docs_src = os.path.join(args.dir, "documents.parquet")
    stream = read_document_stream(
        spark, docs_src, max_files_per_trigger=args.files_per_trigger)
    t0 = time.perf_counter()
    q = (clean_ingest(stream, idx, out_dir, ckpt)
         .trigger(availableNow=True).start())
    prog = _drain(q)
    wall = time.perf_counter() - t0
    accepted = spark.read.parquet(out_dir).count()
    st = _batch_stats(prog)
    st.update({
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(st["input_rows"] / wall, 1),
        "accepted_rows": int(accepted),
        "fingerprint_index_bytes": _dir_bytes(idx),
        "note": ("cross-batch state is the persisted fingerprint index, "
                 "not Spark streaming state; exactly-once via "
                 "sink-before-index-commit"),
    })
    result["ingest_funnel"] = st
    print("ingest", json.dumps(st), flush=True)

    # ---- sessionization ------------------------------------------------
    ckpt2 = os.path.join(args.work, "ckpt_sess")
    sink2 = os.path.join(args.work, "sessions")
    events = read_event_stream(spark, os.path.join(args.dir,
                                                   "events.parquet"))
    t0 = time.perf_counter()
    q = (session_rollup(events).writeStream
         .outputMode("append")
         .option("checkpointLocation", ckpt2)
         .format("parquet").option("path", sink2)
         .trigger(availableNow=True).start())
    prog = _drain(q)
    wall = time.perf_counter() - t0
    sessions = spark.read.parquet(sink2).count()
    st = _batch_stats(prog)
    st.update({
        "wall_sec": round(wall, 3),
        "events_per_sec": round(st["input_rows"] / wall, 1),
        "closed_sessions_emitted": int(sessions),
        "note": ("session_window + 2h watermark; state bounded by OPEN "
                 "sessions (engine stateOperators metrics above); "
                 "maxFilesPerTrigger=1 from read_event_stream"),
    })
    result["sessionization"] = st
    print("sessionization", json.dumps(st), flush=True)

    result["loadavg_end"] = list(loadavg())
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print("wrote", args.out)
    spark.stop()
    shutil.rmtree(args.work, ignore_errors=True)


if __name__ == "__main__":
    main()
