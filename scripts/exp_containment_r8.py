#!/usr/bin/env python3
"""Round-8 experiment: job-fusion variants of dedup_containment at
sf0.1 under the bench conf. Variants share the oracle semantics
(validated separately by tests/oracle_check.py); this measures wall
only. Interleaved min-of-N A/B per the measurement discipline.

Usage: python scripts/exp_containment_r8.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from duckdb_pipeline_spark.operators.dedup import word_shingles
from duckdb_pipeline_spark.queries.common import load, spread
from duckdb_pipeline_spark.queries.dedup import dedup_containment
from duckdb_pipeline_spark.session import build_spark


def variant_fused(spark, sf_dir):
    """One eval-side aggregation (collect_set postings), persisted
    eval_post reused by sizes and matches."""
    max_df = 50
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    sh_d = word_shingles(
        spread(docs, bytes_per_split=256 * 1024),
        n=3,
        distinct=False,
        extra_cols=["source"],
    ).persist(StorageLevel.DISK_ONLY)
    # ONE eval-side aggregation: per-shingle eval postings (set
    # semantics give the per-doc distinct for free)
    ep = (
        sh_d.where(F.col("source") == "src0")
        .groupBy("shingle")
        .agg(F.collect_set("doc_id").alias("evs"))
        .persist()
    )
    dfc = (
        sh_d.join(F.broadcast(ep.select("shingle")), "shingle")
        .groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    rare = dfc.where(F.col("df") <= max_df).select("shingle")
    eval_post = (
        ep.join(F.broadcast(rare), "shingle")
        .select("shingle", F.explode("evs").alias("eval_id"))
        .persist()
    )
    sizes = eval_post.groupBy("eval_id").agg(F.count(F.lit(1)).alias("n_eval"))
    matches = (
        sh_d.where(F.col("source") != "src0")
        .select(F.col("doc_id").alias("train_id"), "shingle")
        .join(F.broadcast(eval_post), "shingle")
    )
    inter = matches.groupBy("eval_id", "train_id").agg(
        F.countDistinct("shingle").alias("ni")
    )
    cont = inter.join(F.broadcast(sizes), "eval_id").select(
        "eval_id",
        "train_id",
        (F.col("ni").cast("double") / F.col("n_eval")).alias("containment"),
    )
    return cont.where(F.col("containment") >= 0.2)


def variant_docscache(spark, sf_dir):
    """No shingle cache: persist only the raw (pre-explode, ~100x
    smaller) doc rows; each consumer re-runs the codegen explode.
    Trades 2 extra in-memory explodes for the corpus-shingle disk
    write + 2 disk reads."""
    max_df = 50
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    raw = spread(docs, bytes_per_split=256 * 1024).persist()
    sh_d = word_shingles(raw, n=3, distinct=False, extra_cols=["source"])
    ep = (
        sh_d.where(F.col("source") == "src0")
        .groupBy("shingle")
        .agg(F.collect_set("doc_id").alias("evs"))
        .persist()
    )
    dfc = (
        sh_d.join(F.broadcast(ep.select("shingle")), "shingle")
        .groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    rare = dfc.where(F.col("df") <= max_df).select("shingle")
    eval_post = (
        ep.join(F.broadcast(rare), "shingle")
        .select("shingle", F.explode("evs").alias("eval_id"))
        .persist()
    )
    sizes = eval_post.groupBy("eval_id").agg(F.count(F.lit(1)).alias("n_eval"))
    matches = (
        sh_d.where(F.col("source") != "src0")
        .select(F.col("doc_id").alias("train_id"), "shingle")
        .join(F.broadcast(eval_post), "shingle")
    )
    inter = matches.groupBy("eval_id", "train_id").agg(
        F.countDistinct("shingle").alias("ni")
    )
    cont = inter.join(F.broadcast(sizes), "eval_id").select(
        "eval_id",
        "train_id",
        (F.col("ni").cast("double") / F.col("n_eval")).alias("containment"),
    )
    return cont.where(F.col("containment") >= 0.2)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        "exp-containment-r8",
        master=f"local[{cpus}]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    variants = {"current": dedup_containment, "fused": variant_fused}
    # plan construction outside timing (bench protocol)
    dfs = {k: fn(spark, sf_dir) for k, fn in variants.items()}
    # warmup both
    for k, df in dfs.items():
        df.write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
    times = {k: [] for k in variants}
    for _ in range(passes):
        for k, df in dfs.items():
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            times[k].append(time.time() - t0)
            spark.catalog.clearCache()
    for k, ts in times.items():
        print(k, "min", round(min(ts), 3), [round(t, 3) for t in ts])
    # result equality check
    a = {tuple(r) for r in dfs["current"].collect()}
    b = {tuple(r) for r in dfs["fused"].collect()}
    print("identical:", a == b, len(a), len(b))


if __name__ == "__main__":
    main()
