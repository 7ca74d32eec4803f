#!/usr/bin/env python3
"""Round-8 BPE trainer measurements (VERDICT r7 #5):
- A/B the persist-chain storage level at a given sf (R=20)
- record the cold sf10 R=20 build for BOTH engines (the missing
  BASELINE row)

Usage:
  python scripts/exp_bpe_r8.py ab   <sf_dir> [reps=2]   # Spark chain-level A/B
  python scripts/exp_bpe_r8.py cold <sf_dir>            # one Spark + one DuckDB build
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F


def build_session():
    from duckdb_pipeline_spark.session import build_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return build_spark(
        "exp-bpe-r8",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )


def train(spark, sf_dir, rounds, level):
    """bpe_merges_from with a parameterized chain storage level."""
    from duckdb_pipeline_spark.queries.common import load
    from duckdb_pipeline_spark.queries.curation import _adjacent_pairs, _apply_merge

    docs = load(spark, sf_dir, "documents")
    syms = docs.select(F.split("text", " ").alias("s"))
    merges, prev, grand = [], None, None
    t0 = time.time()
    per_round = []
    for rnd in range(1, rounds + 1):
        r0 = time.time()
        counts = (
            syms.select(F.explode(_adjacent_pairs(F.col("s"))).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        top = counts.orderBy(F.desc("n"), "lhs", "rhs").limit(1).collect()
        if grand is not None:
            grand.unpersist()
            grand = None
        if not top:
            break
        x, y, n = top[0]["lhs"], top[0]["rhs"], top[0]["n"]
        merges.append((rnd, x, y, n))
        syms = _apply_merge(syms, x, y).persist(level)
        grand, prev = prev, syms
        per_round.append(round(time.time() - r0, 2))
    for c in (grand, prev):
        if c is not None:
            c.unpersist()
    return merges, time.time() - t0, per_round


def main():
    mode = sys.argv[1]
    sf_dir = sys.argv[2]
    if mode == "ab":
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        spark = build_session()
        levels = {
            "MEMORY_AND_DISK": StorageLevel.MEMORY_AND_DISK,
            "DISK_ONLY": StorageLevel.DISK_ONLY,
        }
        results = {k: [] for k in levels}
        ref = None
        for _ in range(reps):
            for name, lvl in levels.items():
                merges, wall, per_round = train(spark, sf_dir, 20, lvl)
                spark.catalog.clearCache()
                results[name].append(round(wall, 2))
                if ref is None:
                    ref = merges
                else:
                    assert merges == ref, "chain level changed results!"
                print(name, round(wall, 2), "per-round", per_round, flush=True)
        for k, v in results.items():
            print("TOTAL", k, "min", min(v), v)
    elif mode == "cold":
        import duckdb

        from duckdb_pipeline_spark.queries.curation import _bpe_sql

        spark = build_session()
        merges, wall, per_round = train(
            spark, sf_dir, 20, StorageLevel.MEMORY_AND_DISK
        )
        print("SPARK cold R=20", round(wall, 2), "per-round", per_round, flush=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'"
        )
        t0 = time.time()
        rows = con.execute(_bpe_sql(20)).fetchall()
        dt = time.time() - t0
        print("DUCKDB cold R=20", round(dt, 2), "rows", len(rows))
        got = {(r[0], r[1], r[2], r[3]) for r in rows}
        want = {(m[0], m[1], m[2], m[3]) for m in merges}
        print("identical:", got == want)
        print("RATIO", round(wall / dt, 2))


if __name__ == "__main__":
    main()
