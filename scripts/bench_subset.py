#!/usr/bin/env python3
"""Focused two-engine bench over a named query subset at an arbitrary
scale directory — built for the sf10 floor-crossover measurement of the
perf-weak register (BASELINE.md): the full headline is infeasible at
sf10 (two deliberately quadratic queries), but the floor-bound queries
are cheap in DuckDB and the question is precisely how their Spark
ratios move as volume grows past the per-query scheduling floor.

Usage: python scripts/bench_subset.py <sf_dir> <q1,q2,...> [passes=3]
Prints one JSON line: {sf_dir, queries: {name: {spark, duckdb, ratio}},
spark_total, duckdb_total, ratio}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from duckdb_pipeline_spark.session import build_spark

    spark = build_spark(
        "bench-subset",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    def srun(n: str) -> float:
        # REBUILD the DataFrame every pass (the caveat this script's
        # header always carried, violated by its own original srun):
        # reusing one DF across passes while clearCache() drops its
        # persists leaves InMemoryRelation nodes in the plan that
        # recompute per CONSUMER without re-caching — measured 4.7x
        # overstatement on tfidf_top_terms at sf10 (45.4 s stale-DF vs
        # 9.7 s rebuilt).
        df = qs[n](spark, sf_dir)
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    con = duckdb.connect()
    con.execute(f"SET threads={cpus}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS FROM '{p}'")

    def drun(n: str) -> float:
        t0 = time.time()
        con.execute(oracles[n]).fetchall()
        return time.time() - t0

    for n in names:  # warmup both engines
        srun(n)
        drun(n)
    ss: dict[str, list[float]] = {n: [] for n in names}
    ds: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        for n in names:
            ss[n].append(srun(n))
            ds[n].append(drun(n))

    out = {}
    st = dt = 0.0
    for n in names:
        a, b = min(ss[n]), min(ds[n])
        st += a
        dt += b
        out[n] = {"spark": round(a, 3), "duckdb": round(b, 3),
                  "ratio": round(a / b, 2) if b else None}
    print(json.dumps({
        "sf_dir": sf_dir,
        "queries": out,
        "spark_total": round(st, 3),
        "duckdb_total": round(dt, 3),
        "ratio": round(st / dt, 2) if dt else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
