#!/usr/bin/env python3
"""Deterministic scale-up of the driver's testdata (TESTDATA.md) for
LOCAL bench runs at scale factors the driver doesn't ship (sf1 = 10x
sf0.1). Never touches /root/testdata — writes under the repo (ignored
by git).

Scaling model (TPC-H-style copy replication): K shifted copies of every
fact table, key offsets chosen so referential integrity holds within
each copy (lineitem->orders->customer, lineitem->part/supplier); the
dimension tables (region, nation) stay fixed, so dim-join fan-in grows
Kx like a real scale-up. Text/vector payloads are perturbed per copy —
every 3rd token of a document is salted and embeddings are
component-rotated — so near-dup density and neighbor structure stay
O(corpus) instead of every row gaining K-1 planted twins (which would
quadratically inflate LSH candidate pairs and measure a different
workload than a real sf1).

Output layout matches the driver's (`{dir}/{table}.parquet`, one FILE
per table) but with bounded row groups (default 128k rows) so both
engines can split scans: the driver's files are single-row-group, which
serializes Spark's scan at any size (BASELINE.md round-1 note).

Usage: python scripts/gen_scale.py [K] [out_dir] [src_dir]
(defaults: 10, <repo>/.scratch/sf1, /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
ROW_GROUP = 128 * 1024

# key-shift strides: max key in sf0.1 rounded up to a clean power of 10
STRIDE = {
    "o_orderkey": 10_000_000,
    "o_custkey": 1_000_000,
    "l_orderkey": 10_000_000,
    "l_partkey": 1_000_000,
    "l_suppkey": 100_000,
    "c_custkey": 1_000_000,
    "s_suppkey": 100_000,
    "p_partkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

SHIFT_TABLES = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
}
COPY_TABLES = ["region", "nation"]


def write(tbl: pa.Table, out: str, name: str) -> None:
    pq.write_table(tbl, f"{out}/{name}.parquet", row_group_size=ROW_GROUP,
                   compression="snappy")
    print(f"  {name}: {tbl.num_rows} rows")


def scale_sql_tables(con: duckdb.DuckDBPyConnection, out: str, k: int) -> None:
    for name in COPY_TABLES:
        tbl = con.execute(f"FROM '{SRC}/{name}.parquet'").arrow()
        write(tbl, out, name)
    for name, keys in SHIFT_TABLES.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{name}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + i.i * {STRIDE[c]} AS {c}" if c in keys else c for c in cols
        )
        tbl = con.execute(
            f"SELECT {sel} FROM '{SRC}/{name}.parquet', range({k}) i(i) "
            f"ORDER BY i.i"
        ).arrow()
        write(tbl, out, name)


def scale_documents(con: duckdb.DuckDBPyConnection, out: str, k: int) -> None:
    """Salt every 3rd token per copy: with 3-gram shingles every shingle
    of copy i>0 contains a salted token, so cross-copy Jaccard ~ 0 and
    near-dup structure stays what the corpus plants, scaled Kx."""
    pdf = con.execute(f"FROM '{SRC}/documents.parquet'").df()
    out_frames = []
    for i in range(k):
        c = pdf.copy()
        c["doc_id"] = c["doc_id"] + i * STRIDE["doc_id"]
        if i > 0:
            salt = f"s{i}"
            c["text"] = c["text"].map(
                lambda t: " ".join(
                    w + salt if j % 3 == 0 else w
                    for j, w in enumerate(t.split(" "))
                )
            )
            c["n_chars"] = c["text"].str.len().astype("int64")
        out_frames.append(c)
    import pandas as pd

    allpdf = pd.concat(out_frames, ignore_index=True)
    write(pa.Table.from_pandas(allpdf, preserve_index=False), out, "documents")


def scale_embeddings(con: duckdb.DuckDBPyConnection, out: str, k: int) -> None:
    """Rotate vector components by copy index: norms preserved, neighbor
    structure decorrelated across copies (a straight copy would plant
    cosine==1.0 twins for every vector)."""
    tbl = con.execute(f"FROM '{SRC}/embeddings.parquet'").arrow()
    ids = tbl.column("vec_id").to_numpy()
    labels = tbl.column("label").to_numpy()
    V = np.stack(tbl.column("embedding").to_pylist()).astype("float32")
    frames = []
    for i in range(k):
        frames.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + i * STRIDE["vec_id"], pa.int64()),
                    "embedding": pa.array(
                        list(np.roll(V, i, axis=1)), pa.list_(pa.float32())
                    ),
                    "label": pa.array(labels, pa.int32()),
                }
            )
        )
    write(pa.concat_tables(frames), out, "embeddings")


def scale(out: str, k: int, src: str | None = None) -> None:
    global SRC
    if src:
        SRC = src
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    print(f"scaling {SRC} x{k} -> {out}")
    scale_sql_tables(con, out, k)
    scale_documents(con, out, k)
    scale_embeddings(con, out, k)
    print("done")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[2] if len(sys.argv) > 2 else f"{repo}/.scratch/sf1"
    src = sys.argv[3] if len(sys.argv) > 3 else None
    scale(out, k, src)


if __name__ == "__main__":
    main()
