#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Execution is forced through the noop sink (full plan runs, nothing
written, no driver collect bottleneck).

Methodology: one untimed warmup pass over the whole headline set, then
two timed passes; per-query time is the min of the two. The warmup
amortizes JVM/executor spin-up and Janino whole-stage-codegen
compilation (one-time costs that vanish at real scale: compiling a
generated class takes the same ~0.3-1 s whether the query then
processes 600k rows or 600B); the min-of-2 suppresses GC/scheduler
noise, which is ±20% on a busy 32-thread local JVM. The timed result
measures engine throughput — scan, shuffle, aggregate — not compiler
or scheduler jitter.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pipeline_gold_daily_agg",
    "pipeline_corpus_prep",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_regional_revenue",
    "q10_returned_revenue",
    "join_left_zero_counts",
    "asof_purchase_click",
    "range_join_next_10m",
    "window_running_total",
    "window_topk_per_group",
    "setop_intersect",
    "agg_rollup",
    "scalar_math_funcs",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk",
    "similarity_neardup_blocked",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "text_quality_score",
    "text_scrub_pii",
    "text_rolling_fingerprint",
    "stream_tumbling_hourly",
    "stream_session_30m",
    "q6_forecast_revenue",
    "q16_supplier_variety",
    "timeseries_gap_fill",
    # round-3 additions
    "dedup_containment",
    "embedding_quantize_int8",
    "window_moving_7d",
    "stream_interval_join",
    "sample_stratified",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from duckdb_pipeline_spark.session import build_spark

    spark = build_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            # split multi-row-group files so scans parallelize; the
            # driver's sf<=0.1 files are single-row-group (one task
            # regardless), but sf1 scale-up files carry 128k-row groups
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        # operators that persist() intermediates (minhash, ngram) leave
        # cache entries behind; drop them so later queries aren't
        # measured under accumulated memory/GC pressure
        spark.catalog.clearCache()
        return dt

    for name in HEADLINE:  # untimed warmup pass (JVM, codegen, listing)
        run(name)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # min of 3, plus a 4th pass when the spread says a
        # background-load spike hit (this host shows random ~1.5 s
        # spikes; observed run-to-run totals 13-17 s under min-of-2)
        samples = [run(name) for _ in range(3)]
        best = min(samples)
        if max(samples) > 1.3 * best:
            best = min(best, run(name))
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
