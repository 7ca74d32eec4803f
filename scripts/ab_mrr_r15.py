#!/usr/bin/env python3
"""Same-session 3-variant A/B for search_mrr_audit's persist sites
(VERDICT r14 #1): (a) no persists below the floor (the r14 shape),
(b) pair persisted unconditionally + tf floor-gated (the r15
candidate), (c) both persisted (the r13 shape). All three DataFrames
are built in ONE session and timed with interleaved passes +
clearCache between runs — exactly the bench regime the driver grades
(prebuilt plans, persists re-materialized per pass). Variants are
produced by monkeypatching the persist machinery during plan build
only; results are asserted identical first.

Usage: python scripts/ab_mrr_r15.py [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # patch the CLASSIC DataFrame class: in PySpark 4 pyspark.sql.
    # DataFrame is the abstract base and classic DataFrames override
    # persist on their own subclass
    from pyspark.sql.classic.dataframe import DataFrame

    from duckdb_pipeline_spark.queries import common, retrieval

    spark = benchmod._spark_session(cpus, sf_dir)

    real_persist = DataFrame.persist
    real_maybe = common.maybe_persist

    # freeze each variant's QueryExecution IMMEDIATELY after building
    # it: CacheManager substitutes registered persists into ANY
    # later-planned query with a matching subtree, so a lazily planned
    # df_a would silently inherit b/c's InMemoryRelations.
    def imts(df) -> int:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        return plan.count("InMemoryTableScan")

    # (a) r14 shape: every persist site inert (below-floor behavior)
    DataFrame.persist = lambda self, *a, **k: self
    common.maybe_persist = lambda df, *a, **k: df
    retrieval.maybe_persist = common.maybe_persist
    df_a = retrieval.search_mrr_audit(spark, sf_dir)
    n_a = imts(df_a)
    # (b) r15 candidate: code as written (pair unconditional persist,
    # tf floor-gated -> inert at sf0.1)
    DataFrame.persist = real_persist
    common.maybe_persist = lambda df, *a, **k: df
    retrieval.maybe_persist = common.maybe_persist
    df_b = retrieval.search_mrr_audit(spark, sf_dir)
    n_b = imts(df_b)
    # (c) r13 shape: every maybe_persist site persists too (DISK_ONLY,
    # the r10/r13 level)
    from pyspark import StorageLevel

    common.maybe_persist = lambda df, *a, **k: real_persist(
        df, StorageLevel.DISK_ONLY
    )
    retrieval.maybe_persist = common.maybe_persist
    df_c = retrieval.search_mrr_audit(spark, sf_dir)
    n_c = imts(df_c)
    common.maybe_persist = real_maybe
    retrieval.maybe_persist = real_maybe
    print(f"InMemoryTableScan counts: a={n_a} b={n_b} c={n_c}", flush=True)

    rows = {k: sorted(map(tuple, df.collect())) for k, df in
            [("a", df_a), ("b", df_b), ("c", df_c)]}
    assert rows["a"] == rows["b"] == rows["c"], "variant results differ!"
    spark.catalog.clearCache()

    def run(df) -> float:
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    dfs = {"a_nopersist": df_a, "b_pair": df_b, "c_both": df_c}
    for k in dfs:
        run(dfs[k])  # warmup
    samples = {k: [] for k in dfs}
    for _ in range(passes):
        for k in dfs:
            samples[k].append(run(dfs[k]))
    for k, s in samples.items():
        print(f"{k}: min={min(s):.3f} med={sorted(s)[len(s)//2]:.3f} "
              f"all={[round(x, 3) for x in s]}")
    spark.stop()


if __name__ == "__main__":
    main()
