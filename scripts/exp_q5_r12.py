#!/usr/bin/env python3
"""Round-12 q5 experiment (VERDICT r11 #6: one more swing at the 4.27x
register entry, or close it formally). Candidate: a SERVING PROJECTION
analogous to q3's bucketed silver — lineitem denormalized at write time
with the supplier nation attribute (star-schema flattening at ingest, a
standard lake layout move), written once per corpus version:

  proj(l_orderkey, s_nationkey, rev = l_extendedprice*(1-l_discount))
  bucketBy(32, l_orderkey)  sortBy(s_nationkey)

Two probe variants measured against the current inline plan:

- V1 "denorm" (filter-agnostic layout): the nation filter
  s_nationkey IN (asia keys) hits the projection's sortBy(s_nationkey)
  zone maps, pruning ~80% of row groups before the scan; the year
  spine (orders x broadcast customer) broadcasts into the surviving
  rows — zero fact Exchange, supplier probe PRE-PAID at write time.
- V2 "asia-mv" (aggressive, filter-specific MV): the projection itself
  is Asia-only; probe = scan + broadcast-spine join + agg.

Both must be BITWISE-equal to the current plan's output (same per-row
fixed-point unit, same limb aggregation). Projection build time is
reported separately (at-rest accounting, the tf-projection precedent).

Usage: python scripts/exp_q5_r12.py <sf_dir> [passes=4]
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_pipeline_spark.queries.common import dsum_fp, load
from duckdb_pipeline_spark.queries.relational import q5_regional_revenue
from duckdb_pipeline_spark.session import build_spark

_N_BUCKETS = 32


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _asia(spark, sf_dir):
    nr = (
        load(spark, sf_dir, "nation")
        .join(
            load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
        .collect()
    )
    keys = sorted(r["n_nationkey"] for r in nr)
    name_map = F.create_map(
        *[x for r in nr for x in (F.lit(r["n_nationkey"]), F.lit(r["n_name"]))]
    )
    return keys, name_map


def build_projection(spark, sf_dir: str, asia_only: bool) -> tuple[str, float]:
    """Write the denormalized projection; returns (table, build_s)."""
    label = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    suffix = "asia" if asia_only else "all"
    tname = f"q5proj_{suffix}_{label}"
    path = os.path.join(_repo_root(), ".scratch", "q5proj", label, suffix)
    shutil.rmtree(path, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {tname}")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    if asia_only:
        keys, _ = _asia(spark, sf_dir)
        supp = supp.where(F.col("s_nationkey").isin(keys))
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    proj = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).select(
        "l_orderkey",
        "s_nationkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    t0 = time.time()
    (
        proj.repartition(_N_BUCKETS, F.col("l_orderkey"))
        .sortWithinPartitions("s_nationkey")
        .write.bucketBy(_N_BUCKETS, "l_orderkey")
        .sortBy("s_nationkey")
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(tname)
    )
    return tname, round(time.time() - t0, 3)


def _spine(spark, sf_dir):
    orders = (
        load(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )


def probe(spark, sf_dir, tname: str, asia_filter: bool):
    keys, name_map = _asia(spark, sf_dir)
    proj = spark.table(tname)
    if asia_filter:
        proj = proj.where(F.col("s_nationkey").isin(keys))
    # Asia-customer spine prefilter (the round-11 q5 pruning): only
    # Asia-nation customers can match the Asia fact side
    spine = _spine(spark, sf_dir).where(F.col("c_nationkey").isin(keys))
    j = proj.join(
        F.broadcast(spine),
        (proj.l_orderkey == spine.o_orderkey)
        & (proj.s_nationkey == spine.c_nationkey),
    )
    return j.groupBy(name_map[F.col("s_nationkey")].alias("n_name")).agg(
        dsum_fp(F.col("rev")).alias("revenue")
    )


def main() -> None:
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        "exp-q5-r12",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )

    t_all, build_all = build_projection(spark, sf_dir, asia_only=False)
    t_asia, build_asia = build_projection(spark, sf_dir, asia_only=True)
    print(f"build: denorm-all {build_all}s  asia-mv {build_asia}s", flush=True)

    cands = {
        "v1_denorm": lambda s, d: probe(s, d, t_all, asia_filter=True),
        "v2_asia_mv": lambda s, d: probe(s, d, t_asia, asia_filter=False),
    }
    cur = {tuple(r) for r in q5_regional_revenue(spark, sf_dir).collect()}
    for tag, fn in cands.items():
        got = {tuple(r) for r in fn(spark, sf_dir).collect()}
        print(f"equal[{tag}]:", got == cur, flush=True)
        if got != cur:
            print("cur:", sorted(cur))
            print("got:", sorted(got))
            sys.exit(1)

    def run(fn):
        # rebuild the DataFrame per pass (AQE shuffle-reuse caveat)
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    arms = {"current": q5_regional_revenue, **cands}
    for fn in arms.values():
        run(fn)  # warmup
    ts = {tag: [] for tag in arms}
    for _ in range(passes):
        for tag, fn in arms.items():
            ts[tag].append(run(fn))
    for tag in arms:
        print(tag, [round(x, 3) for x in ts[tag]], "min", round(min(ts[tag]), 3))


if __name__ == "__main__":
    main()
