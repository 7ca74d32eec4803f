"""Invariant tests for the later round-9 operators: the exact k-NN
join (block-count invariance + brute-force numpy parity on planted
vectors) and the table profiler. Oracle parity is covered by the
driver protocol (tests/oracle_check.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _planted(spark, n=30, d=8):
    rng = np.random.RandomState(7)
    rows = [
        (i, [float(x) for x in rng.uniform(-1, 1, d).astype("float32")])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _merge_topk(part, k):
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        part.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .orderBy("vec_id", "rk")
    )


def test_knn_join_matches_numpy_bruteforce(spark):
    """Merged block partials must equal the exact numpy all-pairs
    top-k with the same fixed-point arithmetic and tiebreak."""
    from duckdb_pipeline_spark.operators.similarity import (
        SCALE,
        knn_join_partials,
    )

    emb = _planted(spark)
    k = 3
    got = _merge_topk(knn_join_partials(emb, k=k, n_blocks=4), k).collect()

    rows = emb.orderBy("vec_id").collect()
    V = np.stack([np.asarray(r["embedding"], dtype="float64") for r in rows])
    n = len(V)
    norms = np.sqrt(
        np.floor(V * V * SCALE).astype("int64").sum(axis=1).astype("float64")
    )
    want = []
    for i in range(n):
        dots = np.floor(V[i][None, :] * V * SCALE).astype("int64").sum(axis=1)
        cos = dots.astype("float64") / (norms[i] * norms)
        order = sorted(
            (j for j in range(n) if j != i), key=lambda j: (-cos[j], j)
        )[:k]
        for r, j in enumerate(order, 1):
            want.append((i, j, r, cos[j]))

    assert [(g["vec_id"], g["nbr_id"], g["rk"], g["cosine"]) for g in got] == want


def test_knn_join_block_count_invariance(spark):
    """The merged result must be identical for any block count —
    blocking is a physical distribution choice, not a semantic one."""
    from duckdb_pipeline_spark.operators.similarity import knn_join_partials

    emb = _planted(spark, n=25)
    results = []
    for B in (1, 3, 7):
        got = _merge_topk(knn_join_partials(emb, k=2, n_blocks=B), 2).collect()
        results.append([tuple(r) for r in got])
    assert results[0] == results[1] == results[2]


def test_knn_label_purity_bounds(spark):
    from duckdb_pipeline_spark.queries.similarity import knn_label_purity

    rows = knn_label_purity(spark, SF_SMOKE).collect()
    assert rows, "expected one row per label"
    for r in rows:
        assert 0 <= r["n_match"] <= r["n_vecs"]
        assert abs(r["purity"] - r["n_match"] / r["n_vecs"]) < 1e-15


def test_profile_table_summary_consistency(spark):
    from duckdb_pipeline_spark.queries.relational4 import profile_table_summary

    rows = {r["col_name"]: r for r in profile_table_summary(spark, SF_SMOKE).collect()}
    assert set(rows) == {"doc_id", "text", "lang", "source", "n_chars"}
    n = {r["n_rows"] for r in rows.values()}
    assert len(n) == 1, "every column profiles the same row count"
    doc = rows["doc_id"]
    assert doc["n_nulls"] == 0
    assert doc["n_distinct"] == doc["n_rows"], "doc_id is a key"
    assert rows["lang"]["n_distinct"] <= 30


def test_knn_ivf_matches_exact_within_cells(spark):
    """The IVF cell-blocked join must equal the EXACT kNN join
    recomputed over each cell's members alone (same arithmetic, same
    tiebreak) — i.e. the approximation is exactly 'restrict candidates
    to the cell', nothing else."""
    from duckdb_pipeline_spark.operators.similarity import (
        knn_join_partials,
        knn_join_within_cells,
    )

    emb = _planted(spark, n=40, d=8)
    got = knn_join_within_cells(emb, n_cells=4, k=2)
    cells = {
        r["vec_id"]: r["cell"]
        for r in got.select("vec_id", "cell").distinct().collect()
    }
    got_rows = sorted(
        (r["vec_id"], r["nbr_id"], r["rk"], r["cosine"]) for r in got.collect()
    )

    # exact join over each cell's members only, via the exact kernel
    want = []
    for cell in sorted(set(cells.values())):
        members = [v for v, c in cells.items() if c == cell]
        sub = emb.where(F.col("vec_id").isin(members))
        merged = _merge_topk(knn_join_partials(sub, k=2, n_blocks=2), 2)
        want += [
            (r["vec_id"], r["nbr_id"], r["rk"], r["cosine"])
            for r in merged.collect()
        ]
    assert got_rows == sorted(want)
