"""Scale up the driver's sf0.1 test tables by an integer factor K.

Produces a dataset with the same schema and per-copy distributions as
/root/testdata/sf0.1 but K times the fact rows, for measuring how the
engine's per-query constant amortizes with data volume (VERDICT r3 item 1b:
"run bench.py AND the DuckDB twin at sf1").  The driver's own generator is
seed-pinned and read-only, so scaling is done here by key-offset replication:

  * region / nation — fixed dimensions, copied once unchanged.
  * customer / supplier / part / orders / lineitem / events — K copies;
    every key column in copy i is offset by i * 1e9, applied consistently on
    both sides of each FK (o_custkey moves with c_custkey, l_orderkey with
    o_orderkey, ...), so join cardinalities scale exactly linearly.
  * documents — K copies with doc_id offset; the TEXT of copy i>0 is a
    seeded token shuffle of the original.  Plain replication would hand the
    near-dup operators K-way cliques of byte-identical docs — 45x the
    candidate pairs at K=10, a different workload, not a bigger one.  A
    token shuffle preserves token statistics (quality/lang-id/token-count
    queries see the same distributions) while destroying shingle adjacency,
    so dedup keeps finding only the organic near-dups within each copy.
  * embeddings — K copies with vec_id offset; copy i>0 components rotated
    by i*7 positions.  Rotation preserves norms and the pairwise-angle
    distribution within a copy but decorrelates copies, avoiding the same
    K-way-clique artifact for cosine near-dup / ANN.

Each scaled fact table is written as a DIRECTORY named {table}.parquet with
one part file per copy — Spark splits work across the parts (and row
groups); DuckDB reads the same layout via a glob.

Usage: python tools/make_scale.py [--src /root/testdata/sf0.1] --out /tmp/sf1 [--k 10]
"""

from __future__ import annotations

import argparse
import os
import random
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = 1_000_000_000

# key columns to offset, per table (FK pairs share the same stride so joins
# stay within-copy)
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}


def _copy_sql(src_file: str, table: str, i: int) -> str:
    cols = duckdb.connect().execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src_file}')").fetchall()
    off = set(OFFSET_COLS.get(table, ()))
    parts = [
        f"{c} + {i * STRIDE} AS {c}" if c in off else c
        for c, *_ in cols
    ]
    return f"SELECT {', '.join(parts)} FROM read_parquet('{src_file}')"


def scale_relational(src: str, out: str, k: int) -> None:
    con = duckdb.connect()
    for table in ("region", "nation"):
        dst = os.path.join(out, f"{table}.parquet")
        os.makedirs(dst, exist_ok=True)
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{dst}/part-0.parquet' (FORMAT PARQUET)")
    for table in OFFSET_COLS:
        dst = os.path.join(out, f"{table}.parquet")
        os.makedirs(dst, exist_ok=True)
        for i in range(k):
            sql = _copy_sql(f"{src}/{table}.parquet", table, i)
            con.execute(
                f"COPY ({sql}) TO '{dst}/part-{i}.parquet' (FORMAT PARQUET)")


def scale_documents(src: str, out: str, k: int) -> None:
    tbl = pq.read_table(f"{src}/documents.parquet")
    dst = os.path.join(out, "documents.parquet")
    os.makedirs(dst, exist_ok=True)
    pq.write_table(tbl, f"{dst}/part-0.parquet")
    doc_ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    for i in range(1, k):
        new_texts = []
        for doc_id, text in zip(doc_ids, texts):
            toks = text.split(" ")
            random.Random(f"{i}:{doc_id}").shuffle(toks)
            new_texts.append(" ".join(toks))
        out_tbl = tbl.set_column(
            tbl.schema.get_field_index("doc_id"), "doc_id",
            pa.array([d + i * STRIDE for d in doc_ids], pa.int64()))
        out_tbl = out_tbl.set_column(
            out_tbl.schema.get_field_index("text"), "text",
            pa.array(new_texts, tbl.schema.field("text").type))
        out_tbl = out_tbl.set_column(
            out_tbl.schema.get_field_index("n_chars"), "n_chars",
            pa.array([len(t) for t in new_texts], pa.int64()))
        pq.write_table(out_tbl, f"{dst}/part-{i}.parquet")


def scale_embeddings(src: str, out: str, k: int) -> None:
    tbl = pq.read_table(f"{src}/embeddings.parquet")
    dst = os.path.join(out, "embeddings.parquet")
    os.makedirs(dst, exist_ok=True)
    pq.write_table(tbl, f"{dst}/part-0.parquet")
    vec_ids = tbl.column("vec_id").to_pylist()
    vecs = tbl.column("embedding").to_pylist()
    emb_type = tbl.schema.field("embedding").type
    for i in range(1, k):
        rot = (i * 7) % 64
        rolled = [v[rot:] + v[:rot] for v in vecs]
        out_tbl = tbl.set_column(
            tbl.schema.get_field_index("vec_id"), "vec_id",
            pa.array([v + i * STRIDE for v in vec_ids], pa.int64()))
        out_tbl = out_tbl.set_column(
            out_tbl.schema.get_field_index("embedding"), "embedding",
            pa.array(rolled, emb_type))
        pq.write_table(out_tbl, f"{dst}/part-{i}.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    if os.path.exists(args.out):
        shutil.rmtree(args.out)
    os.makedirs(args.out)
    scale_relational(args.src, args.out, args.k)
    scale_documents(args.src, args.out, args.k)
    scale_embeddings(args.src, args.out, args.k)
    print(f"wrote {args.out} at {args.k}x {args.src}")


if __name__ == "__main__":
    main()
