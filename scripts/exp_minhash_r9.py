#!/usr/bin/env python3
"""Round-9 minhash job-floor experiment at sf0.1 (VERDICT r8 #1b).

The mapped LSH pipeline launches 6 jobs / 14 stages for 0.6 MB of
input; the wall is scheduling floor. Variants:

  V1 current: bands repartition(band,sig).persist(); AQE decides joins
  V2 no-persist: bands computed once per consumer (signature map runs
     twice), no repartition barrier; AQE joins
  V3 persist + explicit broadcast hints on pairs->text joins (skip AQE
     conversion machinery)
  V4 no-persist + broadcast band self-join + broadcast pairs (the
     all-small-regime shape: zero wide shuffles anywhere)

All bitwise-identical pair sets by construction (same kernel, same set
arithmetic). Usage: python scripts/exp_minhash_r9.py <sf_dir> [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def build_variant(df, variant, n=3, num_hashes=16, rows_per_band=4, threshold=0.5):
    from duckdb_pipeline_spark.operators.dedup import (
        _py_shingles,
        lsh_candidate_pairs,
        minhash_bands_mapped,
    )

    bands = minhash_bands_mapped(df, "doc_id", "text", n, num_hashes, rows_per_band)
    if variant == "V1":
        bands = bands.repartition(F.col("band"), F.col("sig")).persist()
        pairs = lsh_candidate_pairs(bands, "doc_id", broadcast_self_join=False)
    elif variant == "V2":
        pairs = lsh_candidate_pairs(bands, "doc_id", broadcast_self_join=False)
    elif variant == "V3":
        bands = bands.repartition(F.col("band"), F.col("sig")).persist()
        pairs = F.broadcast(
            lsh_candidate_pairs(bands, "doc_id", broadcast_self_join=False)
        )
    elif variant == "V4":
        pairs = F.broadcast(
            lsh_candidate_pairs(bands, "doc_id", broadcast_self_join=True)
        )
    else:
        raise ValueError(variant)

    ta = df.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    tb = df.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    both = ta.join(pairs, "doc_a").join(tb, "doc_b")

    def jac_batch(batches):
        for pdf in batches:
            rows = []
            for a, b, xa, xb in zip(
                pdf["doc_a"], pdf["doc_b"], pdf["text_a"], pdf["text_b"]
            ):
                sa = _py_shingles(xa, n)
                sb = _py_shingles(xb, n)
                if not sa or not sb:
                    continue
                ni = len(sa & sb)
                rows.append((a, b, ni / (len(sa) + len(sb) - ni)))
            yield pd.DataFrame(
                {
                    "doc_a": pd.Series([r[0] for r in rows], dtype="int64"),
                    "doc_b": pd.Series([r[1] for r in rows], dtype="int64"),
                    "jaccard": pd.Series([r[2] for r in rows], dtype="float64"),
                }
            )

    return both.mapInPandas(jac_batch, "doc_a long, doc_b long, jaccard double").where(
        F.col("jaccard") >= threshold
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from duckdb_pipeline_spark.queries.dedup import _dup_corpus
    from duckdb_pipeline_spark.session import build_spark

    spark = build_spark(
        "exp-minhash-r9",
        master=f"local[{cpus}]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    variants = ["V1", "V2", "V3", "V4"]
    walls = {v: [] for v in variants}
    meta = {}
    base = None
    for p in range(passes + 1):  # pass 0 = warmup + parity check
        for v in variants:
            df = build_variant(_dup_corpus(spark, sf_dir), v)
            if p == 0:
                got = sorted(map(tuple, df.collect()))
                if base is None:
                    base = got
                else:
                    assert got == base, f"{v} output differs!"
                spark.catalog.clearCache()
                continue
            sc.setJobGroup(f"{v}-{p}", v)
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            walls[v].append(time.time() - t0)
            ids = tracker.getJobIdsForGroup(f"{v}-{p}")
            nst = sum(
                len(tracker.getJobInfo(j).stageIds)
                for j in ids
                if tracker.getJobInfo(j) is not None
            )
            meta[v] = (len(ids), nst)
            spark.catalog.clearCache()
    for v in variants:
        j, s = meta[v]
        print(
            f"{v}: min={min(walls[v]):.3f}s med={sorted(walls[v])[len(walls[v])//2]:.3f}s"
            f" jobs={j} stages={s}"
        )


if __name__ == "__main__":
    main()
