#!/usr/bin/env python3
"""Round-7 experiment: corpus_overlap_matrix plan variants at sf0.1.

Variants under test (all must produce the identical result set):

- v0_current: two corpus shuffles (distinct (source,shingle) pass, then
  groupBy(shingle) inversion), sh persisted (the round-6 shape).
- v1_one_shuffle: ONE corpus shuffle — per-doc map-side array_distinct
  (local_distinct), straight into groupBy(shingle).collect_set(source);
  the inverted index (distinct-shingle-sized, aggregated) is persisted
  and BOTH source sizes and pair counts derive from it (sizes =
  explode+count, partial-aggregated to n_sources rows before its tiny
  shuffle).
- v2_one_shuffle_nolocal: v1 without the map-side per-doc dedup
  (collect_set dedups globally anyway) — isolates the local_distinct
  cost/benefit.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_pipeline_spark.queries.common import load
from duckdb_pipeline_spark.queries.curation import overlap_matrix_from
from duckdb_pipeline_spark.operators.dedup import word_shingles

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _pairs_and_sizes_from_inv(inv):
    """inv: (shingle, ss sorted distinct source array) — derive sizes
    and the pair matrix from the persisted inverted index alone."""
    inv = inv.persist()
    sizes = (
        inv.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
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
        inv.where(F.size("ss") > 1)
        .select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a")))
    zb = F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b")))
    return (
        common.join(za, "source_a")
        .join(zb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def v1_one_shuffle(docs):
    sh = word_shingles(
        docs, id_col="source", text_col="text", n=5, distinct=False,
        local_distinct=True,
    )
    inv = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    )
    return _pairs_and_sizes_from_inv(inv)


def v2_one_shuffle_nolocal(docs):
    sh = word_shingles(
        docs, id_col="source", text_col="text", n=5, distinct=False,
    )
    inv = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    )
    return _pairs_and_sizes_from_inv(inv)


def _matrix_from_setcounts(sc_df):
    """sc_df: (ss sorted distinct source array, cnt shingles with
    exactly that source set). Tiny (bounded by observed source-set
    combinations), so every downstream op is on near-empty data."""
    sc_df = sc_df.persist()
    sizes = (
        sc_df.select(F.explode("ss").alias("source"), "cnt")
        .groupBy("source")
        .agg(F.sum("cnt").alias("n"))
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
        sc_df.where(F.size("ss") > 1)
        .select(F.explode(combos).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
        .agg(F.sum("cnt").alias("n_common"))
    )
    za = F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a")))
    zb = F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b")))
    return (
        common.join(za, "source_a")
        .join(zb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def v3_setkey(docs):
    sh = word_shingles(
        docs, id_col="source", text_col="text", n=5, distinct=False,
    )
    inv = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    )
    sc_df = inv.groupBy("ss").agg(F.count(F.lit(1)).alias("cnt"))
    return _matrix_from_setcounts(sc_df)


def v4_setkey_dist(docs):
    """distinct (source,shingle) first (cheap hash-agg state vs
    collect_set), then set-key rollup."""
    sh = word_shingles(
        docs, id_col="source", text_col="text", n=5, distinct=True,
    )
    inv = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    )
    sc_df = inv.groupBy("ss").agg(F.count(F.lit(1)).alias("cnt"))
    return _matrix_from_setcounts(sc_df)


def v5_fused_diag(docs):
    """inv persisted (not sh); ONE tiny exchange computes pair counts
    AND per-source sizes together: each inv row explodes to its source
    pairs (a<b) plus per-source diagonal structs (a,a); one groupBy
    (a,b) counts both; assembly = two broadcast joins of the diagonal
    slice onto the off-diagonal slice of the persisted tiny aggregate."""
    sh = word_shingles(
        docs, id_col="source", text_col="text", n=5, distinct=False,
    )
    inv = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    )
    pairs_and_diag = F.flatten(
        F.transform(
            F.col("ss"),
            lambda a, i: F.concat(
                F.array(F.struct(a.alias("a"), a.alias("b"))),
                F.transform(
                    F.slice(F.col("ss"), i + 2, F.size(F.col("ss"))),
                    lambda b: F.struct(a.alias("a"), b.alias("b")),
                ),
            ),
        )
    )
    agg = (
        inv.select(F.explode(pairs_and_diag).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    diag = agg.where(F.col("a") == F.col("b"))
    za = F.broadcast(diag.select(F.col("a").alias("source_a"), F.col("cnt").alias("n_a")))
    zb = F.broadcast(diag.select(F.col("a").alias("source_b"), F.col("cnt").alias("n_b")))
    return (
        agg.where(F.col("a") != F.col("b"))
        .select(F.col("a").alias("source_a"), F.col("b").alias("source_b"), F.col("cnt").alias("n_common"))
        .join(za, "source_a")
        .join(zb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def main():
    from duckdb_pipeline_spark.session import build_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        "exp-overlap", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    docs = load(spark, SF_DIR, "documents")
    variants = {
        "v0_current": overlap_matrix_from(docs),
        "v1_one_shuffle": v1_one_shuffle(docs),
        "v2_one_shuffle_nolocal": v2_one_shuffle_nolocal(docs),
        "v3_setkey": v3_setkey(docs),
        "v4_setkey_dist": v4_setkey_dist(docs),
    }
    # equality gate first
    base = sorted(map(tuple, variants["v0_current"].collect()))
    for name, df in variants.items():
        got = sorted(map(tuple, df.collect()))
        print(name, "rows", len(got), "match", got == base, flush=True)
        assert got == base, name
    spark.catalog.clearCache()

    def run(df):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    for name, df in variants.items():
        run(df)  # warmup/codegen
    times = {n: [] for n in variants}
    for _ in range(5):
        for name, df in variants.items():
            times[name].append(run(df))
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f} all={[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
