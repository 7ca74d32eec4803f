#!/usr/bin/env python3
"""Round-10 q5 experiment (VERDICT r9 #3: attack the 12.8x sf10 join
constant). Candidate rewrite: eliminate the wide lineitem->orders
shuffle by (a) broadcasting the Asia-filtered supplier dim into a
map-side lineitem join, (b) pre-collapsing the ORDER SPINE
(orders x customer -> (o_orderkey, c_nationkey), both slim), and
(c) joining the two skinny sides on (orderkey, nationkey). Shuffle
volume drops from ~60M wide lineitem rows + an 8.6M-row custkey
re-shuffle to ~12M skinny (orderkey, natkey, unit) rows + the slim
spine build. Bitwise-identical output (same per-row fixed-point unit,
same limb aggregation).

Usage: python scripts/exp_q5_r10.py <sf_dir> [passes=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_pipeline_spark.queries.common import dsum_fp, load
from duckdb_pipeline_spark.queries.relational import q5_regional_revenue
from duckdb_pipeline_spark.session import build_spark


def q5_candidate(spark, sf_dir):
    nr = (
        load(spark, sf_dir, "nation")
        .join(
            load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
        .collect()
    )
    asia_keys = sorted(r["n_nationkey"] for r in nr)
    name_map = F.create_map(
        *[x for r in nr for x in (F.lit(r["n_nationkey"]), F.lit(r["n_name"]))]
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey").isin(asia_keys))
        .select("s_suppkey", "s_nationkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    a = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).select(
        "l_orderkey",
        "s_nationkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    spine = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    j = a.join(
        spine,
        (a.l_orderkey == spine.o_orderkey) & (a.s_nationkey == spine.c_nationkey),
    )
    return j.groupBy(name_map[F.col("s_nationkey")].alias("n_name")).agg(
        dsum_fp(F.col("rev")).alias("revenue")
    )


def main() -> None:
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        "exp-q5",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )

    # result equality first (bitwise)
    cur = {tuple(r) for r in q5_regional_revenue(spark, sf_dir).collect()}
    cand = {tuple(r) for r in q5_candidate(spark, sf_dir).collect()}
    print("equal:", cur == cand, flush=True)
    if cur != cand:
        print("cur:", sorted(cur))
        print("cand:", sorted(cand))
        sys.exit(1)

    def run(fn):
        # rebuild the DataFrame per pass (AQE shuffle-reuse caveat)
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    for fn, tag in ((q5_regional_revenue, "current"), (q5_candidate, "candidate")):
        run(fn)  # warmup
    ts = {"current": [], "candidate": []}
    for _ in range(passes):
        ts["current"].append(run(q5_regional_revenue))
        ts["candidate"].append(run(q5_candidate))
    for tag in ("current", "candidate"):
        print(tag, [round(x, 3) for x in ts[tag]], "min", round(min(ts[tag]), 3))


if __name__ == "__main__":
    main()


def q5_candidate_bcast(spark, sf_dir):
    """Candidate + explicit broadcast of the order spine: lineitem
    never shuffles at all (two broadcast probes + tiny final agg)."""
    nr = (
        load(spark, sf_dir, "nation")
        .join(
            load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
        .collect()
    )
    asia_keys = sorted(r["n_nationkey"] for r in nr)
    name_map = F.create_map(
        *[x for r in nr for x in (F.lit(r["n_nationkey"]), F.lit(r["n_name"]))]
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey").isin(asia_keys))
        .select("s_suppkey", "s_nationkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    a = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).select(
        "l_orderkey",
        "s_nationkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    spine = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    j = a.join(
        F.broadcast(spine),
        (a.l_orderkey == spine.o_orderkey) & (a.s_nationkey == spine.c_nationkey),
    )
    return j.groupBy(name_map[F.col("s_nationkey")].alias("n_name")).agg(
        dsum_fp(F.col("rev")).alias("revenue")
    )
