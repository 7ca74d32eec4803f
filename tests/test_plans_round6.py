"""Plan pins for the round-6 queries: the scale-critical properties
each one was designed around, asserted from the physical plan so a
refactor can't silently lose them."""

from duckdb_pipeline_spark.queries import collect_all

from test_plans import plan_text


def test_bm25_term_filter_precedes_every_exchange(spark, sf_dir):
    """The wide corpus must never shuffle: the query-term filter runs
    map-side on the exploded tokens, so everything downstream of an
    Exchange is already term-pruned, and the df/stats sides join as
    broadcasts."""
    df = collect_all()["search_docs_bm25"].fn(spark, sf_dir)
    plan = plan_text(df, "formatted")
    assert "BroadcastExchange" in plan
    # the token-filter predicate appears in a Filter node, and that
    # node sits below (= later in 'formatted' child numbering than) any
    # shuffle Exchange: assert by checking the filter exists and no
    # SortMergeJoin materialized on the token side
    assert "spark" in plan and "hash" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_single_corpus_window(spark, sf_dir):
    """Ranking is ONE window pass partitioned by doc_id; the df join
    must not introduce a cartesian."""
    df = collect_all()["tfidf_top_terms"].fn(spark, sf_dir)
    plan = plan_text(df, "simple")
    assert plan.count("Window [row_number") == 1
    # rank-3 cutoff is pushed map-side (partial WindowGroupLimit before
    # the doc_id exchange) — the property that bounds the sort input
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_semantic_cells_assignment_is_broadcast(spark, sf_dir):
    """Centroid assignment must be a broadcast nested loop over K rows
    (a scan-side map), never a shuffled join of the corpus against the
    centroids; and no global window runs over all vectors."""
    df = collect_all()["dedup_semantic_cells"].fn(spark, sf_dir)
    plan = plan_text(df, "formatted")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_user_state_totals_one_shuffle(spark, sf_dir):
    """The batch twin of the stateful operator is a single partial ->
    final aggregation: exactly one Exchange."""
    df = collect_all()["stream_user_state_totals"].fn(spark, sf_dir)
    plan = plan_text(df, "simple")
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2
