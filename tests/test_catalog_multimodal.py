"""Tests for polymorphic source resolution (catalog) and the
multimodal binary-column plumbing (schema, Arrow batching, stub
decode)."""

import pytest
from pyspark.sql import functions as F

from duckdb_pipeline_spark.catalog import looks_like_path, register, resolve
from duckdb_pipeline_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    documents_as_media,
    extract_features,
)


def test_looks_like_path_heuristics():
    assert looks_like_path("/lake/silver/x.parquet")
    assert looks_like_path("s3a://bucket/key")
    assert looks_like_path("bronze/2024-10-01/00/*")
    assert looks_like_path("events.csv")
    assert not looks_like_path("gharchive_clean")


def test_resolve_table_name_and_paths(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    register(docs, "docs_view")
    assert resolve(spark, "docs_view").count() == docs.count()
    assert resolve(spark, f"{sf_dir}/documents.parquet").count() == docs.count()

    csv_dir = str(tmp_path / "csv")
    docs.select("doc_id", "lang").write.option("header", "true").csv(csv_dir)
    assert resolve(spark, f"{csv_dir}/*.csv").count() == docs.count()


def test_media_meta_is_jvm_side_and_checksummed(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = documents_as_media(docs)
    rows = media.select("media_id", "meta.n_bytes", "meta.checksum").collect()
    assert len(rows) == 20
    assert all(r.n_bytes > 0 and len(r.checksum) == 64 for r in rows)


def test_extract_features_stub_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    feats = extract_features(documents_as_media(docs))
    assert feats.schema == FEATURE_SCHEMA
    a = {r.media_id: r.feat_mean for r in feats.collect()}
    b = {r.media_id: r.feat_mean for r in feats.collect()}
    assert a == b and len(a) == 50
    assert all(0.0 <= v <= 255.0 for v in a.values())


def test_extract_features_real_decode_raises(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        extract_features(documents_as_media(docs), decode_stub=False).collect()
