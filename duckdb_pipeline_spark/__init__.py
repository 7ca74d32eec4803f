"""duckdb_pipeline_spark — a PySpark-native analytics engine with the
capabilities of pracdata/duckdb-pipeline, generalized to a full query
surface and LLM-data-pipeline operators, designed for 100 TB scale.

Layout:
    session.py    SparkSession factory (S3A wiring, AQE, Arrow, UTC)
    config.py     ini/env configuration (reference: config.ini.template)
    paths.py      partition-path / filename codecs (reference F1-F3)
    catalog.py    polymorphic source resolution (table name or path)
    sources.py    schema-pinned readers (JSON DROPMALFORMED, parquet globs)
    sinks.py      parquet sinks incl. single-file export parity
    ingest.py     bronze landing (HTTP -> partitioned object store)
    transform.py  medallion bronze->silver->gold pipeline (Spark-first)
    operators/    relational extensions (as-of/range joins, top-k, dedup,
                  similarity, text analysis, multimodal plumbing)
    streaming/    Structured Streaming variants (windows, watermarks)
    queries/      declared query inventory + DuckDB oracle SQL
"""

__version__ = "0.1.0"
