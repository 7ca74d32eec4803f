#!/usr/bin/env python3
"""Round-7 scale evidence (VERDICT r6 #3/#4/#5/#7): Spark vs DuckDB
twin for the curation quartet, the new round-7 queries, and the
plain-vs-bucketed pairs, at an arbitrary sf dir (default .scratch/sf1).
Same methodology as scripts/bench_new_r6.py (prebuilt plan, noop sink,
warmup + min-of-3, DuckDB oracle on the same files), with two
special-cased shapes:

- bpe_train_merges[_deep]: the trainer is EAGER (R collect jobs run at
  plan build — the argmax must become a literal for the next round's
  map-only rewrite), so the honest Spark number is the fn() wall, not
  a noop re-run of the literal result. Reported as `build`.
- q3/events bucketed twins: the one-time layout write happens on first
  fn() (content-stamped); reported as `layout` once, then the timed
  region is the probe — the plain twin is measured alongside for the
  pair delta. The DuckDB twin runs the shared oracle once per pair.

Usage: python scripts/bench_r7_scale.py [sf_dir] [name1,name2,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "dsir_importance",
    "corpus_overlap_matrix",
    "bpe_apply_tokenize",
    "dedup_recall_report",
    "ann_recall_report",
    "bpe_train_merges_deep",
    "q3_top_orders",
    "q3_top_orders_bucketed",
    "user_sessions_gap30",
    "user_sessions_gap30_bucketed",
    "retention_cohorts",
    "retention_cohorts_bucketed",
    "funnel_top_paths",
    "funnel_top_paths_bucketed",
]

EAGER = {"bpe_train_merges", "bpe_train_merges_deep"}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT

    import duckdb

    from duckdb_pipeline_spark.queries import collect_all
    from duckdb_pipeline_spark.session import build_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        "bench-r7-scale",
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
    seen_oracles: dict[str, float] = {}
    for name in names:
        spec = qs[name]
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        build = time.time() - t0
        if name in EAGER:
            # second build for a warm min (load cache, codegen warm)
            t0 = time.time()
            spec.fn(spark, sf_dir)
            build = min(build, time.time() - t0)
            best_s, tag = build, "build"
        else:
            if build > 5.0:
                print(f"{name}: layout/plan build {build:.2f}s (one-time)")
            df.write.mode("overwrite").format("noop").save()  # warmup
            # CRITICAL: drop the warmup's persisted intermediates
            # BEFORE the first timed pass — without this, queries with
            # an in-plan persist() ride the warmup's cache through
            # timed pass 1 and min-of-3 reports a warm-cache number
            # (the DuckDB twin re-executes cold every pass). Found in
            # round 7; the r6-era scale scripts had the same bias for
            # persisting queries (official bench.py always cleared).
            spark.catalog.clearCache()
            best_s, tag = 1e9, "spark"
            for _ in range(3):
                t0 = time.time()
                df.write.mode("overwrite").format("noop").save()
                best_s = min(best_s, time.time() - t0)
                spark.catalog.clearCache()
        best_d = None
        if spec.oracle:
            key = spec.oracle
            if key in seen_oracles:
                best_d = seen_oracles[key]
            else:
                con.execute(spec.oracle).fetchall()  # warmup
                best_d = 1e9
                for _ in range(3):
                    t0 = time.time()
                    con.execute(spec.oracle).fetchall()
                    best_d = min(best_d, time.time() - t0)
                seen_oracles[key] = best_d
        if best_d is not None:
            print(
                f"{name}: {tag} {best_s:.2f}s duckdb {best_d:.2f}s "
                f"ratio {best_s / best_d:.2f}",
                flush=True,
            )
        else:
            print(f"{name}: {tag} {best_s:.2f}s (no oracle)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
