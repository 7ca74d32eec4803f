"""End-to-end LLM-corpus dedup pipeline: the declared operators chained
the way a production ingest actually composes them —

  batch-2 arrives -> Bloom EXACT-membership gate (cheap, broadcast)
  -> MinHash band-index PROBE for near-dups vs the indexed corpus
  (no rescan of batch-1 text) -> union with batch-internal exact dedup
  -> keeper selection -> span scrub of the kept docs -> packed corpus.

Each stage is individually oracle-checked as a declared query; this
test pins the COMPOSITION: stage outputs feed the next stage's inputs
with consistent ids, and the end-to-end row accounting closes (every
batch-2 doc is exactly one of: exact-dup, near-dup, or kept)."""

import pytest
from pyspark.sql import functions as F

from duckdb_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_band_index_probe,
    minhash_band_index_write,
)
from duckdb_pipeline_spark.queries.common import load


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    batch1 = docs.where(F.col("doc_id") % 3 != 0)
    # batch 2: new docs + re-uploads of indexed docs (shifted ids, same
    # text -> cross-batch exact AND near dups) + an internal twin
    fresh = docs.where(F.col("doc_id") % 3 == 0)
    reupload = batch1.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
    )
    twin = fresh.limit(5).select((F.col("doc_id") + 6_000_000).alias("doc_id"), "text")
    return batch1, fresh.unionByName(reupload).unionByName(twin)


def test_pipeline_accounting_closes(spark, corpus, tmp_path):
    batch1, batch2 = corpus
    n2 = batch2.count()

    # 1. Bloom gate (exact membership vs batch-1 text): re-uploads hit
    member = batch2.join(batch1.select("text").distinct(), "text", "left_semi")
    exact_cross = {r.doc_id for r in member.select("doc_id").collect()}
    assert exact_cross, "re-uploaded docs must hit the membership gate"

    # 2. near-dup probe against the persisted band index (no batch-1
    # text rescan); survivors of the gate only
    idx_dir = str(tmp_path / "band_index")
    minhash_band_index_write(batch1, idx_dir)
    rest = batch2.join(batch1.select("text").distinct(), "text", "left_anti")
    probed = minhash_band_index_probe(spark, idx_dir, rest)
    near_cross = {r.doc_id for r in probed.select("doc_id").distinct().collect()}

    # 3. batch-internal exact dedup on what remains
    remaining = rest.where(~F.col("doc_id").isin(list(near_cross)) if near_cross else F.lit(True))
    groups = exact_dedup(remaining)
    kept_keepers = {r.keeper_id for r in groups.select("keeper_id").collect()}
    n_internal_dup = remaining.count() - len(kept_keepers)
    assert n_internal_dup >= 1  # the planted twin collapses

    # accounting: every batch-2 doc is exactly one of the three buckets
    assert len(exact_cross) + len(near_cross) + n_internal_dup + len(kept_keepers) == n2

    # 4. the kept set carries no duplicate text
    kept = remaining.where(F.col("doc_id").isin(list(kept_keepers)))
    assert kept.select("text").distinct().count() == kept.count()


def test_scrub_and_pack_close_the_pipeline(spark, corpus):
    """Stages 5-6: the kept docs flow through span scrub (duplicated
    substrings removed) and sequence packing (token offsets) — no doc
    lost, scrubbed token counts consistent, offsets contiguous."""
    from duckdb_pipeline_spark.queries import dedup as dedup_queries
    from duckdb_pipeline_spark.queries.dedup import dedup_span_scrub
    from pyspark.sql import Window

    batch1, _ = corpus
    orig = dedup_queries.load
    dedup_queries.load = lambda spark, sf_dir, name: batch1
    try:
        scrubbed = dedup_span_scrub(spark, "unused")
        rows = scrubbed.collect()
    finally:
        dedup_queries.load = orig
    assert len(rows) == batch1.count()
    for r in rows:
        kept_tokens = len(r.clean_text.split(" ")) if r.clean_text else 0
        assert kept_tokens == r.n_tokens - r.n_removed_tokens

    packed = scrubbed.select(
        "doc_id", (F.col("n_tokens") - F.col("n_removed_tokens")).alias("len")
    ).withColumn(
        "offset",
        F.coalesce(
            F.sum("len").over(
                Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    p = packed.orderBy("doc_id").collect()
    pos = 0
    for r in p:
        assert r.offset == pos
        pos += r.len
