"""Semantic tests for the round-6 query additions: BM25 / tf-idf
ranked retrieval, near-dup keeper selection, SemDeDup-style learned-cell
embedding dedup, and the stateful-operator batch twin. The DuckDB
bitwise gate runs in tests/oracle_check.py; these tests pin the
SEMANTICS (ranking order, keeper policy, cell accounting) on the
driver's sf0.001 tables where answers are hand-checkable."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_pipeline_spark.queries.dedup import (
    dedup_cluster_canonical,
    dedup_components_star,
    dedup_semantic_cells,
)
from duckdb_pipeline_spark.queries.retrieval import (
    _TERMS,
    search_docs_bm25,
    tfidf_top_terms,
)
from duckdb_pipeline_spark.queries.streaming_like import stream_user_state_totals


def test_bm25_scores_descend_and_hit_terms(spark, sf_dir):
    rows = search_docs_bm25(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # every returned doc actually contains at least one query term
    ids = [r.doc_id for r in rows]
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id").isin(ids))
        .collect()
    )
    for d in docs:
        toks = set(d.text.split(" "))
        assert toks & set(_TERMS)


def test_bm25_rewards_tf_for_equal_length(spark):
    """Two docs of identical length; the one with more query-term
    occurrences must score higher (the tf saturation curve is
    monotone), and a doc without the term scores nothing."""
    import tempfile

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark pad pad pad", "en", "s", 30),
            (2, "spark pad pad pad pad pad", "en", "s", 26),
            (3, "pad pad pad pad pad pad", "en", "s", 23),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(f"{tmp}/documents.parquet")
        rows = {r.doc_id: r.bm25 for r in search_docs_bm25(spark, tmp).collect()}
    assert rows[1] > rows[2] > 0
    assert 3 not in rows


def test_tfidf_top_terms_shape(spark, sf_dir):
    out = tfidf_top_terms(spark, sf_dir)
    rows = out.collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert len(per_doc) == n_docs  # every doc gets a profile
    for members in per_doc.values():
        assert 1 <= len(members) <= 3
        by_rank = sorted(members, key=lambda r: r.rnk)
        assert [r.rnk for r in by_rank] == list(range(1, len(members) + 1))
        scores = [r.tfidf for r in by_rank]
        assert scores == sorted(scores, reverse=True)


def test_cluster_canonical_keeper_policy(spark, sf_dir):
    """The keeper reported per component is the longest member doc
    (ties -> min doc_id), checked against an independent recomputation
    from the component membership."""
    canon = {r.component: r for r in dedup_cluster_canonical(spark, sf_dir).collect()}
    assert canon
    cc = dedup_components_star(spark, sf_dir).collect()
    from duckdb_pipeline_spark.queries.dedup import _dup_corpus

    lens = {
        r.doc_id: len(r.text) for r in _dup_corpus(spark, sf_dir).collect()
    }
    members: dict[int, list[int]] = {}
    for r in cc:
        members.setdefault(r.component, []).append(r.doc_id)
    assert set(members) == set(canon)
    for comp, ids in members.items():
        rec = canon[comp]
        assert rec.component_size == len(ids)
        mx = max(lens[i] for i in ids)
        assert rec.max_chars == mx
        assert rec.keeper_id == min(i for i in ids if lens[i] == mx)


def test_semantic_cells_accounting(spark, sf_dir):
    rows = dedup_semantic_cells(spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_total for r in rows) == n_vecs  # every vector lands in a cell
    for r in rows:
        assert 0 <= r.cell < 8
        assert r.n_kept + r.n_dropped == r.n_total
        assert r.n_kept >= 1  # dropping keeps the lower id, never a whole cell


def test_user_state_totals_matches_plain_agg(spark, sf_dir):
    got = {
        r.user_id: r
        for r in stream_user_state_totals(spark, sf_dir).collect()
    }
    plain = {
        r.user_id: r
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(got) == set(plain)
    for uid, p in plain.items():
        g = got[uid]
        assert g.n_events == p.n_events
        assert abs(g.total_value - p.total_value) < 1e-6
        assert g.last_ts == p.last_ts
