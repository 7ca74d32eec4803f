"""Invariant tests for the round-9 operators: the full k-means
training loop (inertia partials, convergence on a planted corpus) and
the gap-fill single-pass spine. Oracle parity is covered by the driver
protocol (tests/oracle_check.py); these pin semantic invariants an
oracle diff would not explain well."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _planted(spark):
    """Two tight planted clusters around (0,0,1) and (1,0,0) plus the
    two seed vectors themselves (vec_id 0/1 so first-K seeding picks
    one from each cluster)."""
    rows = []
    for i in range(20):
        eps = (i % 5) * 0.01
        if i % 2 == 0:
            rows.append((i, [0.0 + eps, 0.0, 1.0 - eps]))
        else:
            rows.append((i, [1.0 - eps, 0.0, 0.0 + eps]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lloyd_inertia_partial_is_exact(spark):
    """The (cell=-1) inertia row must equal the sum over vectors of
    the MINIMUM per-cell fixed-point distance — recomputed here
    directly in numpy with the same floor/SCALE arithmetic — and be
    invariant to input partitioning (exact ints re-aggregate)."""
    from duckdb_pipeline_spark.operators.similarity import (
        SCALE,
        lloyd_step_partials,
    )

    emb = _planted(spark)
    rows = emb.orderBy("vec_id").collect()
    V = np.stack([np.asarray(r["embedding"], dtype="float64") for r in rows])
    C = V[:2]
    D = (
        np.floor((V[:, None, :] - C[None, :, :]) ** 2 * float(SCALE))
        .astype("int64")
        .sum(axis=2)
    )
    want = int(D.min(axis=1).sum())

    for nparts in (1, 7):
        parts = (
            lloyd_step_partials(
                emb.repartition(nparts), C, [0, 1], emit_inertia=True
            )
            .groupBy("cell")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        got = next(int(r["s"]) for r in parts if r["cell"] == -1)
        assert got == want
        # membership conservation rides the same rows
        nrow = next(int(r["n"]) for r in parts if r["cell"] == -1)
        assert nrow == len(rows)


def test_kmeans_trainer_converges_on_corpus(spark):
    """The full trainer over the smoke corpus: verdicts all true and
    the exact initial inertia is positive (the oracle anchors its
    value; here we pin the trajectory facts)."""
    from duckdb_pipeline_spark.queries.similarity import kmeans_train_audit

    row = kmeans_train_audit(spark, SF_SMOKE).collect()[0]
    assert row.inertia0_fp > 0
    assert row.n_vectors > 0
    assert row.inertia_decreased
    assert row.inertia_nonincreasing
    assert row.members_conserved


def test_gap_fill_spine_dense_and_zero_filled(spark):
    """Every hour between min and max appears exactly once; observed
    hours carry their counts, gap hours carry 0 (the lead-derived
    spine must not drop the trailing hour or double-emit boundaries)."""
    from duckdb_pipeline_spark.queries.timeseries import timeseries_gap_fill

    out = timeseries_gap_fill(spark, SF_SMOKE).collect()
    hours = [r.hour_ts for r in out]
    assert len(hours) == len(set(hours))
    lo, hi = min(hours), max(hours)
    assert len(hours) == int((hi - lo).total_seconds() // 3600) + 1
    total = sum(r.n_events for r in out)
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert total == ev.count()


def test_prefix_filter_join_equals_brute_force(spark):
    """The AllPairs/PPJoin prefix-filter join must be EXACT: identical
    pair set and jaccard values to the unfiltered brute-force join, on
    a corpus with planted twins (which must appear at jaccard 1.0)."""
    from duckdb_pipeline_spark.operators.dedup import (
        prefix_filter_jaccard_join,
        word_shingles,
    )

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    twins = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(twins)

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_filter_jaccard_join(corpus, 3, 5).collect()
    }

    # brute force: every pair sharing any shingle, no prefix filter
    sh = word_shingles(corpus)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    brute = {
        (r.doc_a, r.doc_b): r.ni / (r.na + r.nb - r.ni)
        for r in inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .where(5 * F.col("ni") >= 3 * (F.col("na") + F.col("nb") - F.col("ni")))
        .collect()
    }

    assert got == brute  # exact pair set AND exact values
    n_twins = twins.count()
    planted = [(a_, b_) for (a_, b_) in got if b_ - a_ == 10_000_000]
    assert len(planted) == n_twins  # every planted twin found at tau=0.6
    assert all(got[p] == 1.0 for p in planted)
