#!/usr/bin/env python3
"""Isolated per-query timing (bench methodology: prebuilt plan, noop
sink, warmup + min of N passes, catalog cache cleared between passes).

Usage: python scripts/ab_isolated_r14.py name[,name...] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod

    spark = benchmod._spark_session(cpus, sf_dir)
    qs = entrymod.queries()
    dfs = {n: qs[n](spark, sf_dir) for n in names}

    def srun(name):
        spark.sparkContext.setJobDescription(f"ab:{name}")
        t0 = time.time()
        dfs[name].write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    for n in names:
        srun(n)  # warmup
    samples = {n: [] for n in names}
    for _ in range(passes):
        for n in names:
            samples[n].append(srun(n))
    for n in names:
        s = samples[n]
        print(f"{n}: min={min(s):.3f} med={sorted(s)[len(s)//2]:.3f} all={[round(x,3) for x in s]}")
    spark.stop()


if __name__ == "__main__":
    main()
