#!/usr/bin/env python3
"""Spark-only sf10 timing sweep over the declared inventory — the
hazard hunt that found ntile_quartiles' single-partition window (23 s
at sf10 while every *benched* query looked fine). One warm pass + one
timed pass per query through the noop sink; declared-quadratic
families and fixture-bounded queries are skipped (their cost is
constant or by-construction). Prints per-query seconds sorted
descending so the next hidden offender tops the list.

Usage: python scripts/sweep_sf10_spark.py [sf_dir] [skip_csv]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP_PREFIXES = (
    # declared-quadratic / exact-ANN ground truth (O(n^2 d) by contract)
    "knn_",
    "similarity_neardup_blocked",
    # exact all-pairs WITHIN A GIVEN LABEL (10 fixed blocks in this
    # corpus -> O(n^2/10) by contract; the learned-cell scale path is
    # dedup_semantic_cells, whose K grows with the corpus)
    "dedup_embedding_cosine",
    "similarity_adc_topk",  # exact twin; np/ivf paths benched separately
    "embedding_gram",
    "embedding_sim_calibration",
    # fixture-bounded (constant-size input regardless of sf)
    "multimodal_",
    "ann_recall_clustered",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    extra_skip = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else set()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from duckdb_pipeline_spark.session import build_spark

    spark = build_spark(
        "sweep-sf10",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = entrymod.queries()
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        if name in extra_skip or any(name.startswith(p) for p in SKIP_PREFIXES):
            continue
        try:
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()  # warm
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times[name] = round(time.time() - t0, 2)
            spark.catalog.clearCache()
            print(f"{times[name]:8.2f}  {name}", flush=True)
        except Exception as exc:  # record, keep sweeping
            errors[name] = f"{type(exc).__name__}: {str(exc)[:160]}"
            print(f"   ERR    {name}: {errors[name]}", flush=True)
    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"sf_dir": sf_dir, "slowest": ranked, "errors": errors}))


if __name__ == "__main__":
    main()
