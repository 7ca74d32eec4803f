"""Round-14 operator tests: unicode-tier perplexity, derived twin
shifts, band-index append v2 (anchored within-batch components +
exact-Jaccard hit confirmation), and the closed streaming gate loop."""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_twin_shift_floor_and_derived(spark):
    """At oracle scales the derived power-of-ten sits far below every
    module floor, so twin_shift returns the floor EXACTLY (static
    oracle SQL literals stay valid); with a floor below the corpus max
    the derived branch takes over with the next power of ten."""
    from duckdb_pipeline_spark.queries.common import load, twin_shift

    assert twin_shift(spark, SF, floor=1_000_000) == 1_000_000
    mx = load(spark, SF, "documents").agg(F.max("doc_id")).collect()[0][0]
    derived = twin_shift(spark, SF, floor=1)
    assert derived > mx
    assert derived == 10 ** len(str(mx))


def test_bigram_xent_unicode_tier_ties_decorated_twins(spark):
    """The tier contract behind quality_perplexity_buckets' oracle row:
    a comma+uppercase decorated twin scores BITWISE equal to its
    original under the unicode tokenizer (identical token stream), and
    NOT equal under the space tokenizer (punctuation glues into
    tokens, pushing bigrams to the OOV floor). This is what makes the
    driver hash pin the tier, not just the rollup arithmetic."""
    from duckdb_pipeline_spark.queries.quality import text_bigram_xent

    # doc 2 reuses src0 vocabulary so its base xent is NOT the
    # constant all-OOV floor (an all-OOV doc and its all-OOV twin
    # score the same under ANY tokenizer, which would mask the tier)
    base = spark.createDataFrame(
        [
            (1, "src0", "key agg row scan slow fast table value part"),
            (2, "src1", "key agg row scan table value part slow fast"),
        ],
        "doc_id long, source string, text string",
    )
    twins = base.select(
        (F.col("doc_id") + 100).alias("doc_id"),
        F.lit("twin").alias("source"),
        F.upper(F.replace(F.col("text"), F.lit(" "), F.lit(", "))).alias("text"),
    )
    corpus = base.unionByName(twins)

    uni = {
        r.doc_id: (r.n_bigrams, r.xent)
        for r in text_bigram_xent(spark, SF, tokenizer="unicode", docs=corpus).collect()
    }
    assert uni[101] == uni[1] and uni[102] == uni[2]

    sp = {
        r.doc_id: (r.n_bigrams, r.xent)
        for r in text_bigram_xent(spark, SF, tokenizer="space", docs=corpus).collect()
    }
    assert sp[101] != sp[1] and sp[102] != sp[2]


def test_bigram_xent_rejects_unknown_tokenizer(spark):
    from duckdb_pipeline_spark.queries.quality import text_bigram_xent

    with pytest.raises(ValueError, match="unknown tokenizer"):
        text_bigram_xent(spark, SF, tokenizer="bpe")


def test_append_doc_tf_rejects_null_ids_even_when_gated(spark, tmp_path):
    """ADVICE r13: NULL doc_ids are an integrity invariant, rejected
    even on the gated-admission path (check_duplicates=False)."""
    from duckdb_pipeline_spark.queries.tokcache import append_doc_tf

    corpus_dir = str(tmp_path / "corpus")
    os.makedirs(corpus_dir, exist_ok=True)
    spark.createDataFrame(
        [(1, "a b c", "src0"), (2, "b c d", "src1")],
        "doc_id long, text string, source string",
    ).write.mode("overwrite").parquet(os.path.join(corpus_dir, "documents.parquet"))

    batch = spark.createDataFrame(
        [(None, "x y z", "src0")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError, match="NULL"):
        append_doc_tf(spark, corpus_dir, batch, check_duplicates=False)
