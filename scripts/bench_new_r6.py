#!/usr/bin/env python3
"""Scale measurement for the round-6 session-2 queries at an arbitrary
sf dir (default .scratch/sf1): Spark (prebuilt plan, noop sink, warmup
+ min-of-3) vs the DuckDB oracle SQL on the same files — the same
methodology as scripts/bench_subset.py. Prints one line per query and
a totals line.

Usage: python scripts/bench_new_r6.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "dedup_bloom_probe",
    "dedup_span_exact",
    "similarity_adc_topk",
    "stream_dedup_events",
    "sketch_hll_merge",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else QUERIES

    import duckdb

    from duckdb_pipeline_spark.queries import collect_all
    from duckdb_pipeline_spark.session import build_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        "bench-new-r6",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    con = duckdb.connect()
    con.execute(f"SET threads={cpus}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS FROM '{p}'")

    qs = collect_all()
    tot_s = tot_d = 0.0
    for name in names:
        spec = qs[name]
        df = spec.fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()  # warmup
        # drop warmup's persisted intermediates before timing (round-7
        # protocol fix — see scripts/bench_r7_scale.py; none of this
        # script's round-6 queries persist, so its published rows stand)
        spark.catalog.clearCache()
        best_s = 1e9
        for _ in range(3):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            best_s = min(best_s, time.time() - t0)
            spark.catalog.clearCache()
        best_d = None
        if spec.oracle:
            con.execute(spec.oracle).fetchall()  # warmup
            best_d = 1e9
            for _ in range(3):
                t0 = time.time()
                con.execute(spec.oracle).fetchall()
                best_d = min(best_d, time.time() - t0)
        tot_s += best_s
        if best_d is not None:
            tot_d += best_d
            print(
                f"{name}: spark {best_s:.2f}s duckdb {best_d:.2f}s "
                f"ratio {best_s / best_d:.2f}"
            )
        else:
            print(f"{name}: spark {best_s:.2f}s (no oracle)")
    if tot_d:
        print(f"TOTAL (oracle-bearing): spark {tot_s:.2f}s duckdb {tot_d:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
