#!/usr/bin/env python3
"""Round-7 storage-level audit (VERDICT r6 #6) for the two
corpus-sized persisted intermediates in the curation layer:

- dsir_importance's exploded bigram-occurrence table
  (queries/curation.py ``bi.persist()``) — corpus-sized, feeds two
  branches (bucket counts + scoring join);
- corpus_overlap_matrix's distinct (source, shingle) table
  (``sh.persist()``) — corpus-sized, feeds sizes + inversion.

At 100 TB a MEMORY_AND_DISK persist of an exploded intermediate is a
spill storm; the candidates are DISK_ONLY (serialize once, never
pressure the unified memory region) and NO-PERSIST (recompute the map
lineage per branch — explode is cheap, cache write isn't free).
This measures all three at a given sf dir and prints min-of-3.

Usage: python scripts/exp_persist_levels_r7.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F


def _dsir(docs, level):
    from duckdb_pipeline_spark.queries.curation import (
        _DSIR_BUCKETS,
        _DSIR_TARGET_LANG,
    )
    from duckdb_pipeline_spark.queries.common import dsum_fp

    toks = docs.select("doc_id", "lang", F.split("text", " ").alias("t"))
    bg = F.zip_with(
        F.col("t"),
        F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(1))),
        lambda a, b: F.when(b.isNotNull(), F.concat(a, F.lit(" "), b)),
    )
    bi = (
        toks.select("doc_id", "lang", F.explode(bg).alias("bg"))
        .where(F.col("bg").isNotNull())
        .select("doc_id", "lang", F.substring(F.md5("bg"), 1, 3).alias("bucket"))
    )
    if level is not None:
        bi = bi.persist(level)
    is_t = (F.col("lang") == _DSIR_TARGET_LANG).cast("long")
    counts = bi.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"), F.sum(is_t).alias("ct")
    )
    tot = counts.agg(
        F.sum("cr").cast("double").alias("tr"), F.sum("ct").cast("double").alias("tt")
    )
    B = F.lit(float(_DSIR_BUCKETS))
    lw = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.round(F.log((F.col("ct") + 1).cast("double") / (F.col("tt") + B)), 6)
            - F.round(F.log((F.col("cr") + 1).cast("double") / (F.col("tr") + B)), 6)
        ).alias("lw"),
    )
    agg = (
        bi.join(F.broadcast(lw), "bucket")
        .groupBy("doc_id")
        .agg(dsum_fp(F.col("lw")).alias("s"), F.count(F.lit(1)).alias("n_bigrams"))
    )
    return agg.select("doc_id", "n_bigrams", F.round("s", 6).alias("log_importance"))


def _overlap(docs, level):
    from duckdb_pipeline_spark.operators.dedup import word_shingles

    sh = word_shingles(docs, id_col="source", text_col="text", n=5, distinct=True)
    if level is not None:
        sh = sh.persist(level)
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    inv = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .where(F.size("ss") > 1)
    )
    combos = F.flatten(
        F.transform(
            F.col("ss"),
            lambda a, i: F.transform(
                F.slice(F.col("ss"), i + 2, F.size(F.col("ss"))),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )
    common = (
        inv.select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a")))
    zb = F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b")))
    return (
        common.join(za, "source_a")
        .join(zb, "source_b")
        .select(
            "source_a", "source_b", "n_common", "n_a", "n_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"

    from duckdb_pipeline_spark.queries.common import load
    from duckdb_pipeline_spark.session import build_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        "exp-persist-r7",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    docs = load(spark, sf_dir, "documents")
    levels = {
        "MEMORY_AND_DISK (current)": StorageLevel.MEMORY_AND_DISK,
        "MEMORY_AND_DISK_DESER": StorageLevel.MEMORY_AND_DISK_DESER,
        "DISK_ONLY": StorageLevel.DISK_ONLY,
        "no-persist (recompute)": None,
    }
    for qname, builder in (("dsir", _dsir), ("overlap", _overlap)):
        for lname, level in levels.items():
            df = builder(docs, level)
            df.write.mode("overwrite").format("noop").save()  # warmup
            spark.catalog.clearCache()
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                df.write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
                spark.catalog.clearCache()
            print(f"{qname:8s} {lname:28s} min {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
