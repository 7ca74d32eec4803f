"""Semantics of the model-based quality filters (bitwise gate runs in
tests/oracle_check.py; here: directional behavior on hand-built docs)."""

from __future__ import annotations

import tempfile

from duckdb_pipeline_spark.queries.quality import (
    quality_logreg_score,
    text_unigram_xent,
)

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _with_docs(spark, rows, fn):
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(rows, _SCHEMA).write.parquet(f"{tmp}/documents.parquet")
        return fn(tmp)


def test_unigram_xent_rare_tokens_score_higher(spark):
    # doc 1 = the corpus's dominant tokens; doc 2 = singletons
    rows = [
        (1, "common common common common", "en", "s", 27),
        (2, "rare1 rare2 rare3 rare4", "en", "s", 23),
        (3, "common common common common", "en", "s", 27),
    ]
    out = _with_docs(
        spark, rows, lambda tmp: {r.doc_id: r for r in text_unigram_xent(spark, tmp).collect()}
    )
    assert out[2].xent > out[1].xent > 0
    assert out[1].n_tokens == 4
    # identical docs score identically
    assert out[1].xent == out[3].xent


def test_logreg_prefers_stopword_rich_prose(spark):
    rows = [
        (1, "the cat sat on the mat and it is a good mat for a cat", "en", "s", 50),
        (2, "zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz", "en", "s", 50),
    ]
    out = _with_docs(
        spark,
        rows,
        lambda tmp: {r.doc_id: r for r in quality_logreg_score(spark, tmp).collect()},
    )
    assert 0.0 < out[2].quality_prob < out[1].quality_prob < 1.0
    for r in out.values():
        assert r.keep == (r.quality_prob >= 0.5)


def test_gopher_repetition_flags_planted_repeats(spark):
    """A doc that is one 2-gram repeated over and over fails the
    repetition gates; a varied doc passes with zero dup fraction."""
    from duckdb_pipeline_spark.queries.quality import quality_gopher_repetition

    rows = _with_docs(
        spark,
        [
            (1, "spam ham " * 30 + "spam ham", "en", "s", 0),
            (2, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 0),
        ],
        lambda tmp: {
            r.doc_id: r for r in quality_gopher_repetition(spark, tmp).collect()
        },
    )
    spam, ok = rows[1], rows[2]
    assert spam.gopher_keep == 0
    assert spam.top_word_frac > 0.4  # 'spam' is half the doc
    assert spam.dup_2gram_frac > 0.9  # nearly every 2-gram repeats
    assert ok.gopher_keep == 1
    assert ok.dup_2gram_frac == 0.0
    # all 2-grams distinct in doc 2: top fraction = 1/(n-1)
    assert abs(ok.top_2gram_frac - 1.0 / 7) < 1e-6
