"""Semantic pins for the round-7 ANN recall audit (the oracle gate runs
in tests/oracle_check.py; these pin the audit's internal consistency).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_pipeline_spark.operators.similarity import ann_recall_audit
from duckdb_pipeline_spark.queries.similarity import ann_recall_report


def test_full_probe_recovers_brute_force_exactly(spark, sf_dir):
    """With n_probe == n_cells the IVF candidate set IS the corpus, so
    recall must be exactly 100% for every query — the audit's
    self-consistency invariant (a miss here means the two sides rank
    differently, i.e. the audit itself is broken)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rep = ann_recall_audit(
        emb, query_ids=list(range(8, 13)), k=10, n_cells=8, n_probe=8
    ).collect()
    assert len(rep) == 5
    for r in rep:
        assert r["n_true"] == 10
        assert r["n_hit"] == 10
        assert r["recall_pct"] == 100.0


def test_report_bounds_and_sample(spark, sf_dir):
    rows = ann_recall_report(spark, sf_dir).collect()
    assert [r["query_id"] for r in rows] == list(range(8, 18))
    for r in rows:
        assert 0 <= r["n_hit"] <= r["n_true"] <= 10
        assert abs(r["recall_pct"] - 100.0 * r["n_hit"] / r["n_true"]) < 1e-6


def test_missing_query_vectors_drop_out(spark, sf_dir):
    """Query ids absent from the corpus contribute no rows (mirrors the
    oracle's join semantics)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.agg(F.max("vec_id")).first()[0]
    rep = ann_recall_audit(
        emb, query_ids=[8, n + 1000], k=5, n_cells=8, n_probe=2
    ).collect()
    assert [r["query_id"] for r in rep] == [8]
