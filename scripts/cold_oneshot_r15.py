#!/usr/bin/env python3
"""Cold one-shot timing for one declared query — the driver-shaped
measurement VERDICT r14 #1 demands for persist decisions: fresh session,
plan built once, then time the FIRST noop-sink pass (no warmup, no
min-of-N; every persist site pays its materialization barrier exactly
as a cold consumer does). Prints one JSON line.

Usage: python scripts/cold_oneshot_r15.py <query> [repo_dir]
Run it once per session; repeat N times / alternate variants outside.
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = sys.argv[2] if len(sys.argv) > 2 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)
sys.path.insert(0, repo)

import bench as benchmod  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod

    spark = benchmod._spark_session(cpus, sf_dir)
    qs = entrymod.queries()
    df = qs[name](spark, sf_dir)  # plan build (untimed, like bench.py)
    spark.sparkContext.setJobDescription(f"cold-oneshot:{name}")
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    print(json.dumps({"query": name, "repo": repo, "cold_oneshot_sec": round(dt, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
