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


def collect_all() -> dict[str, QuerySpec]:
    from . import (
        dedup,
        llmtext,
        pipeline,
        relational,
        relational2,
        similarity,
        sketches,
        streaming_like,
        timeseries,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (
        pipeline,
        relational,
        relational2,
        dedup,
        similarity,
        sketches,
        timeseries,
        llmtext,
        streaming_like,
    ):
        for name, spec in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = spec
    return merged
