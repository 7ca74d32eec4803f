#!/usr/bin/env python3
"""Round-7 engine-knob grid: run a representative headline subset at
sf0.1 under one config (given as JSON in argv[1], label argv[2]) and
print the per-query mins. Driven by exp_knobs_driver_r7.sh — one
process per config because SparkSession confs are immutable per JVM.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

extra = json.loads(sys.argv[1])
label = sys.argv[2]

from duckdb_pipeline_spark.session import build_spark

conf = {
    "spark.ui.showConsoleProgress": "false",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
}
conf.update(extra)
spark = build_spark(
    "knob",
    master="local[32]",
    shuffle_partitions=int(extra.get("spark.sql.shuffle.partitions", 32)),
    extra_conf=conf,
)
import __spark_entry__ as em

qs = em.queries()
NAMES = [
    "corpus_overlap_matrix",
    "dedup_minhash_lsh",
    "dedup_containment",
    "q3_top_orders",
    "q1_pricing_summary",
    "q16_supplier_variety",
    "timeseries_gap_fill",
    "stream_tumbling_hourly",
    "dedup_span_exact",
    "q10_returned_revenue",
    "range_join_next_10m",
]
dfs = {n: qs[n](spark, "/root/testdata/sf0.1") for n in NAMES}


def run(df):
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return dt


for n in NAMES:
    run(dfs[n])
ts = {n: [] for n in NAMES}
for _ in range(4):
    for n in NAMES:
        ts[n].append(run(dfs[n]))
tot = 0.0
parts = []
for n in NAMES:
    m = min(ts[n])
    tot += m
    parts.append(f"{n}={m:.3f}")
print(f"[{label}] total={tot:.3f}  " + " ".join(parts), flush=True)
spark.stop()
