#!/usr/bin/env python3
"""Per-query job/stage census at sf0.1: how many Spark jobs does each
headline query launch end-to-end? At sf0.1 the official-ratio floor is
scheduling machinery (BASELINE round-8 negative-result note), so a
query that launches 6 jobs pays ~6x the per-job constant of one that
launches 1 — job-count reduction is the lever that moves the sf0.1
headline without touching semantics.

Usage: python scripts/exp_jobcount_r8.py <sf_dir> <q1,q2,...> [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from duckdb_pipeline_spark.session import build_spark

    spark = build_spark(
        "exp-jobcount",
        master=f"local[{cpus}]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = entrymod.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    out = {}
    for n in names:
        walls = []
        jobs = stages = 0
        df = qs[n](spark, sf_dir)  # plan prebuilt, untimed (official protocol)
        for p in range(passes + 1):  # pass 0 = warmup
            sc.setJobGroup(f"{n}-{p}", n)
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            ids = tracker.getJobIdsForGroup(f"{n}-{p}")
            nst = 0
            for jid in ids:
                ji = tracker.getJobInfo(jid)
                if ji is not None:
                    nst += len(ji.stageIds)
            if p > 0:
                walls.append(dt)
                jobs, stages = len(ids), nst
            spark.catalog.clearCache()
        out[n] = {"wall_min": round(min(walls), 3), "jobs": jobs, "stages": stages}
        print(json.dumps({n: out[n]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
