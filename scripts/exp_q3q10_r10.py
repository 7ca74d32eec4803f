#!/usr/bin/env python3
"""Round-10 q3/q10 experiment: both queries already eager-agg the
lineitem side to order/customer grain; the remaining dominant Exchange
is the UNFILTERED-side fact shuffle (orders 14.5M rows for q3, the
customer join for q10). Candidate: broadcast the AGGREGATED small side
(q3: per-order revenue of the shipdate tail, ~1.1M skinny rows at
sf10; q10: per-customer returned revenue) so the big side never
shuffles. Usage: python scripts/exp_q3q10_r10.py <sf_dir> [passes]."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_pipeline_spark.queries.common import dsum_fp, load
from duckdb_pipeline_spark.queries.relational import (
    q3_top_orders,
    q10_returned_revenue,
)
from duckdb_pipeline_spark.session import build_spark


def q3_candidate(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    rev = li.groupBy("l_orderkey").agg(
        dsum_fp(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    return (
        orders.join(F.broadcast(rev), rev.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey")), orders.o_custkey == F.col("c_custkey"))
        .select("l_orderkey", "o_orderdate", "o_orderpriority", "revenue")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q10_candidate(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(dsum_fp(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    return (
        cust.join(F.broadcast(rev), rev.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "c_mktsegment", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def main() -> None:
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        "exp-q3q10",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    for cur, cand, tag in (
        (q3_top_orders, q3_candidate, "q3"),
        (q10_returned_revenue, q10_candidate, "q10"),
    ):
        a = [tuple(r) for r in cur(spark, sf_dir).collect()]
        b = [tuple(r) for r in cand(spark, sf_dir).collect()]
        print(tag, "equal:", a == b, flush=True)
        if a != b:
            continue

        def run(fn):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            spark.catalog.clearCache()
            return dt

        run(cur), run(cand)
        ts_cur = [run(cur) for _ in range(passes)]
        ts_cand = [run(cand) for _ in range(passes)]
        print(tag, "current ", [round(x, 3) for x in ts_cur], "min", round(min(ts_cur), 3))
        print(tag, "candidate", [round(x, 3) for x in ts_cand], "min", round(min(ts_cand), 3))


if __name__ == "__main__":
    main()
