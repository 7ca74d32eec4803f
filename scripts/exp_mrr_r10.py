#!/usr/bin/env python3
"""A/B harness for search_mrr_audit variants at an arbitrary sf dir.

Variants:
  orig     — no intermediate persists (3 full token-explodes)
  persist  — tf + pair persisted DISK_ONLY (current code)
  window   — pair computed once; self_score via a max-over-q_id window
             (no second pair branch, no self broadcast job)
  fold     — qterms collected at plan build (dim-fold precedent) so the
             probe vocabulary is a literal isin + literal map; tf
             persisted; self via window

Usage: python scripts/exp_mrr_r10.py <sf_dir> [passes=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_pipeline_spark.queries.common import dsum, load
from duckdb_pipeline_spark.queries.retrieval import _MRR_Q
from duckdb_pipeline_spark.session import build_spark

K1, B = 1.2, 0.75


def _build(spark, sf_dir, variant):
    docs = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.split("text", " ").alias("t"))
    qterms = (
        base.where(F.col("doc_id") < _MRR_Q)
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.expr("slice(t, 1, 3)")).alias("token"),
        )
        .distinct()
    )
    dl = base.select("doc_id", F.size("t").cast("long").alias("dl")).persist(
        StorageLevel.DISK_ONLY
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
    ).select("n_docs", (F.col("sum_dl") / F.col("n_docs")).alias("avgdl"))

    if variant == "fold":
        rows = qterms.collect()
        toks = sorted({r["token"] for r in rows})
        pairs = [(r["q_id"], r["token"]) for r in rows]
        qt = spark.createDataFrame(pairs, "q_id long, token string")
        tok_filter = F.col("token").isin(toks)
    else:
        qt = qterms
        tok_filter = None

    tf = base.select("doc_id", F.explode("t").alias("token"))
    if tok_filter is not None:
        tf = tf.where(tok_filter)
    else:
        tf = tf.join(F.broadcast(qterms.select("token").distinct()), "token")
    tf = tf.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    if variant in ("persist", "window", "fold"):
        tf = tf.persist(StorageLevel.DISK_ONLY)

    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(1.2) * (
        F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.col("avgdl"))
    )
    pair = (
        tf.join(F.broadcast(qt), "token")
        .join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "q_id", "doc_id",
            (idf * ((F.col("tf") * F.lit(2.2)) / norm)).alias("s"),
        )
        .groupBy("q_id", "doc_id")
        .agg(F.round(dsum("s"), 4).alias("score"))
    )
    if variant in ("window", "fold"):
        wq = Window.partitionBy("q_id")
        withself = pair.withColumn(
            "self_score",
            F.max(F.when(F.col("doc_id") == F.col("q_id"), F.col("score"))).over(wq),
        )
        better = (F.col("score") > F.col("self_score")) | (
            (F.col("score") == F.col("self_score"))
            & (F.col("doc_id") < F.col("q_id"))
        )
        out = withself.groupBy("q_id").agg(
            (F.sum(F.when(better, 1).otherwise(0)) + 1).alias("self_rank")
        )
    else:
        if variant == "persist":
            pair = pair.persist(StorageLevel.DISK_ONLY)
        self_s = (
            pair.where(F.col("q_id") == F.col("doc_id"))
            .select("q_id", F.col("score").alias("self_score"))
        )
        ranked = pair.join(F.broadcast(self_s), "q_id")
        better = (F.col("score") > F.col("self_score")) | (
            (F.col("score") == F.col("self_score"))
            & (F.col("doc_id") < F.col("q_id"))
        )
        out = ranked.groupBy("q_id").agg(
            (F.sum(F.when(better, 1).otherwise(0)) + 1).alias("self_rank")
        )
    return out.select(
        "q_id", "self_rank", (F.col("self_rank") <= 10).alias("hit_at_10")
    )


def main():
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    total = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir) if f.endswith(".parquet")
    )
    shp = max(1, cpus // 4, min(cpus, total // (16 * 1024 * 1024) + 1))
    spark = build_spark(
        "exp_mrr", master=f"local[{cpus}]", shuffle_partitions=int(shp),
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    variants = ["orig", "persist", "window", "fold"]
    results = {}
    baseline = None
    for v in variants:
        df = _build(spark, sf_dir, v)
        rows = sorted(map(tuple, df.collect()))
        if baseline is None:
            baseline = rows
        assert rows == baseline, f"{v} output differs!"
        spark.catalog.clearCache()
        ts = []
        for _ in range(passes):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            ts.append(time.time() - t0)
            spark.catalog.clearCache()
        results[v] = round(min(ts), 3)
        print(v, [round(t, 3) for t in ts], flush=True)
    print("RESULTS", results)
    spark.stop()


if __name__ == "__main__":
    main()
