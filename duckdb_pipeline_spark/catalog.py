"""Polymorphic source resolution.

DuckDB's replacement scan lets ``FROM '<s>'`` resolve a string as either
a registered table name or a file/glob path — the reference relies on
both (table name at /root/reference/data_lake_transformer.py:46,103; s3
glob at :124). This module gives the Spark engine the same ergonomic:

    resolve(spark, "gharchive_clean")            -> spark.table(...)
    resolve(spark, "/lake/silver/2024-10-01/*/*.parquet") -> read.parquet
    resolve(spark, "/lake/bronze/2024-10-01/00/*")        -> read.json
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources import read_json_auto

_PATHY = ("/", "s3://", "s3a://", "file:", "hdfs:")


def looks_like_path(ref: str) -> bool:
    return ref.startswith(_PATHY) or "*" in ref or ref.endswith(
        (".parquet", ".json", ".json.gz", ".csv")
    )


def resolve(spark: SparkSession, ref: str, schema=None) -> DataFrame:
    """Resolve a string reference to a DataFrame (table-or-path)."""
    if not looks_like_path(ref):
        return spark.table(ref)
    if ".parquet" in ref:
        return spark.read.parquet(ref)
    if ".csv" in ref:
        return spark.read.option("header", "true").csv(ref)
    # default: JSON (bronze globs have no extension in their glob tail)
    return read_json_auto(spark, ref, schema=schema)


def register(df: DataFrame, name: str) -> DataFrame:
    """``CREATE OR REPLACE TABLE name AS ...`` equivalent.

    The reference materializes every stage eagerly
    (data_lake_transformer.py:81,106,127). Spark-first we register a
    lazy temp view — Catalyst then plans scan+project+write as a single
    stage, which is strictly better at scale (no intermediate
    materialization). Call ``df.cache()`` explicitly when a stage is
    reused more than once.
    """
    df.createOrReplaceTempView(name)
    return df
