"""Declared query inventory (SURVEY.md §2 coverage).

Each module exports ``QUERIES: dict[name, QuerySpec]``. ``collect_all()``
merges them for ``__spark_entry__``. Every entry is a (spark_fn,
duckdb_oracle_sql) pair; oracle_sql is None only for genuinely
non-SQL-expressible operators (driver then records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


# The round driver oracle-checks the declared inventory in iteration
# order and caps at ~50 queries (observed in CORRECTNESS_r01/r02:
# exactly the leading entries of collect_all() get rows). The inventory
# exceeds the cap, so ordering decides WHICH get a driver correctness
# row. This list pins the window: every north-star operator (pipeline,
# dedup, similarity, LLM text, streaming, timeseries, sketches), every
# query NEW or changed this round, and one representative per
# relational family; queries rotated out (driver-green in BOTH rounds
# 1 and 2, unchanged since) follow in module order.
PRIORITY: tuple[str, ...] = (
    # ---- round 12 window (VERDICT r11 #1: drain the r11 re-verification
    # debt — every query whose PLAN changed in round 11 outside that
    # round's window, every never-checked newcomer, and the oldest rows
    # in the staleness ledger). Composition (recomputed this round by
    # aggregating CORRECTNESS_r01-r11 against collect_all(); matches the
    # verdict's recount):
    #   (a) 3 r11 newcomers (never driver-checked) + the 1 r12 newcomer
    #       `toktf_append_equals_rebuild` (VERDICT r11 #2 explicitly
    #       requires a passing CORRECTNESS entry, overriding the
    #       freeze-out-newcomers default);
    #   (b) the 9 r11 serving-rewired queries whose latest driver rows
    #       predate their tokcache/bucketed-serving plans, plus
    #       q5_regional_revenue (r11 spine prefilter, last row r9);
    #   (c) the 3 r5 holdovers (no more deferrals);
    #   (d) the 10 r6-stale rows not already in (b) (vocab_top_tokens is
    #       both r6-stale and serving-rewired — counted once);
    #   (e) fill to 50 with 23 of the 26 r7-stale rows not already in
    #       (b). Excluded, staying at r7 into round 13:
    #       sketch_approx_quantiles + sketch_hll_merge (rows-only
    #       estimates by design — a driver row carries the least
    #       information; their hash-checked *_audit twins rotate in
    #       r13 per VERDICT r11 #7) and q1_pricing_summary_fast
    #       (plan-variant twin of in-window q1_pricing_summary).
    # After this window lands green: no query's latest driver row is
    # older than r7, satisfying the verdict's Done criterion.
    #
    # (a) newcomers:
    "stream_neardup_gate",
    "snapshot_vacuum_audit",
    "sketch_mg_heavyhitters_audit",
    "toktf_append_equals_rebuild",
    # (b) serving-rewired + q5:
    "tfidf_top_terms",
    "vocab_top_tokens",
    "quality_zipf_audit",
    "text_unigram_xent",
    "search_docs_bm25",
    "search_mrr_audit",
    "quality_gopher_repetition",
    "quality_expectations_gate",
    "q3_top_orders",
    "q5_regional_revenue",
    # (c) r5 holdovers:
    "pipeline_clean_events",
    "pipeline_hourly_type_counts",
    "sample_topk_per_group",
    # (d) r6-stale:
    "corpus_filter_funnel",
    "funnel_view_to_purchase",
    "histogram_prices",
    "join_salted_skew",
    "ngram_lm_counts",
    "search_docs_keywords",
    "stats_trimmed_mean",
    "text_rolling_fingerprint",
    "text_udtf_sentences",
    "unnest_tokens",
    # (e) r7-stale fill:
    "agg_rollup",
    "bpe_apply_tokenize",
    "bpe_train_merges",
    "corpus_mix_allocation",
    "corpus_overlap_matrix",
    "dedup_semantic_cells",
    "dedup_span_exact",
    "dedup_span_scrub",
    "funnel_top_paths",
    "fuzzy_match_names",
    "multimodal_decode_features",
    "multimodal_phash_groups",
    "multimodal_wav_frames",
    "q1_pricing_summary",
    "quality_logreg_score",
    "range_join_next_10m",
    "similarity_adc_topk",
    "similarity_adc_topk_np",
    "similarity_topk_ivf",
    "sketch_cms_user_counts",
    "stream_dedup_events",
    "stream_user_state_totals",
    "user_sessions_gap30",
    # ---- round-13 window candidates (lead the next rotation):
    # (a) the r12 newcomers frozen out per policy: q3_top_orders_plain
    # (the resurrected plain-layout bench row) and
    # dedup_exact_normalized (normalization-keyed exact dedup tier);
    # (b) sketch_ndv_audit / sketch_quantiles_audit /
    # sketch_hll_merge_audit (r8; VERDICT r11 #7) plus the 2 rows-only
    # estimates excluded above and q1_pricing_summary_fast (r7);
    # (c) the remaining 42 r8-stale rows.
    # Rotated out round 12 (driver-green r11, unchanged): the full r11
    # window; earlier rotation history is in git.
)


def collect_all() -> dict[str, QuerySpec]:
    from . import (
        analytics,
        bucketed,
        curation,
        dedup,
        llmtext,
        pipeline,
        relational,
        relational2,
        quality,
        relational3,
        relational4,
        retrieval,
        similarity,
        sketches,
        streaming_like,
        timeseries,
        tokcache,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (
        pipeline,
        bucketed,
        relational,
        relational2,
        relational3,
        relational4,
        dedup,
        similarity,
        sketches,
        timeseries,
        llmtext,
        retrieval,
        quality,
        curation,
        streaming_like,
        analytics,
        tokcache,
    ):
        for name, spec in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = spec
    missing = [n for n in PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"PRIORITY names not declared: {missing}")
    ordered = {n: merged[n] for n in PRIORITY}
    ordered.update((n, s) for n, s in merged.items() if n not in ordered)
    return ordered
