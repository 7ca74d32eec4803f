#!/usr/bin/env python3
"""Round-8 second containment experiment: fuse the eval-postings and
df-count corpus aggregations into ONE pass.

Current shape (A): ep = corpus.where(src0).groupBy(shingle).collect_set
(shuffle 1) -> broadcast(ep.shingle) -> dfc = corpus x bcast ->
groupBy(shingle).countDistinct (2 shuffles) -> rare -> eval_post =
ep x broadcast(rare) -> window. Three broadcasts, ep materialized
twice (vocab + postings) when the size-adaptive cache is off.

Fused shape (B): vocab = src0 shingles DISTINCT (eval-sized shuffle)
-> ONE corpus pass: corpus x broadcast(vocab) -> groupBy(shingle)
.agg(countDistinct(doc_id) AS df, collect_set(eval doc_id) AS evs)
-> eval_post = filter df<=cap, explode evs, window n_eval. Two
broadcasts, one corpus-side aggregation instead of two.

Usage: python scripts/exp_containment_r8b.py <sf_dir> [passes=6]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_pipeline_spark.operators.dedup import word_shingles
from duckdb_pipeline_spark.queries.common import input_bytes, spread
from duckdb_pipeline_spark.session import build_spark

MAX_DF = 50


def shape_a(docs):
    nbytes = input_bytes(docs)
    big = nbytes is None or nbytes >= 32 * 1024 * 1024
    raw = spread(docs, bytes_per_split=256 * 1024)
    if big:
        raw = raw.persist()
    sh_d = word_shingles(raw, n=3, distinct=False, extra_cols=["source"])
    ep = (
        sh_d.where(F.col("source") == "src0")
        .groupBy("shingle")
        .agg(F.collect_set("doc_id").alias("evs"))
    )
    if big:
        ep = ep.persist()
    dfc = (
        sh_d.join(F.broadcast(ep.select("shingle")), "shingle")
        .groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    rare_ev = dfc.where(F.col("df") <= MAX_DF).select("shingle")
    eval_post = (
        ep.join(F.broadcast(rare_ev), "shingle")
        .select("shingle", F.explode("evs").alias("eval_id"))
        .withColumn("n_eval", F.count(F.lit(1)).over(Window.partitionBy("eval_id")))
    )
    matches = (
        sh_d.where(F.col("source") != "src0")
        .select(F.col("doc_id").alias("train_id"), "shingle")
        .join(F.broadcast(eval_post), "shingle")
    )
    inter = matches.groupBy("eval_id", "train_id").agg(
        F.countDistinct("shingle").alias("ni"),
        F.min("n_eval").alias("n_eval"),
    )
    cont = inter.select(
        "eval_id",
        "train_id",
        (F.col("ni").cast("double") / F.col("n_eval")).alias("containment"),
    )
    return cont.where(F.col("containment") >= 0.2)


def shape_b(docs):
    nbytes = input_bytes(docs)
    big = nbytes is None or nbytes >= 32 * 1024 * 1024
    raw = spread(docs, bytes_per_split=256 * 1024)
    if big:
        raw = raw.persist()
    sh_d = word_shingles(raw, n=3, distinct=False, extra_cols=["source"])
    vocab = sh_d.where(F.col("source") == "src0").select("shingle").distinct()
    stats = (
        sh_d.join(F.broadcast(vocab), "shingle")
        .groupBy("shingle")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.collect_set(
                F.when(F.col("source") == "src0", F.col("doc_id"))
            ).alias("evs"),
        )
    )
    eval_post = (
        stats.where(F.col("df") <= MAX_DF)
        .select("shingle", F.explode("evs").alias("eval_id"))
        .withColumn("n_eval", F.count(F.lit(1)).over(Window.partitionBy("eval_id")))
    )
    matches = (
        sh_d.where(F.col("source") != "src0")
        .select(F.col("doc_id").alias("train_id"), "shingle")
        .join(F.broadcast(eval_post), "shingle")
    )
    inter = matches.groupBy("eval_id", "train_id").agg(
        F.countDistinct("shingle").alias("ni"),
        F.min("n_eval").alias("n_eval"),
    )
    cont = inter.select(
        "eval_id",
        "train_id",
        (F.col("ni").cast("double") / F.col("n_eval")).alias("containment"),
    )
    return cont.where(F.col("containment") >= 0.2)


def main() -> None:
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        "exp-containment-b",
        master=f"local[{cpus}]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    dfa, dfb = shape_a(docs), shape_b(docs)
    na, nb = dfa.count(), dfb.count()
    spark.catalog.clearCache()
    assert na == nb, (na, nb)
    ra, rb = [], []
    for p in range(passes + 1):
        t0 = time.time()
        dfa.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        if p:
            ra.append(dt)
        t0 = time.time()
        dfb.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        if p:
            rb.append(dt)
    print("rows", na)
    print("A current min", round(min(ra), 3), sorted(round(x, 3) for x in ra))
    print("B fused   min", round(min(rb), 3), sorted(round(x, 3) for x in rb))
    spark.stop()


if __name__ == "__main__":
    main()
