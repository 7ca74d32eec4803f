"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full declared inventory (SURVEY.md §2 +
north-star ops) for the driver's DuckDB differential check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_pipeline_spark.queries import collect_all  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _prepare(spark: SparkSession) -> None:
    """Session settings the engine relies on (UTC timestamps for
    deterministic oracle comparison; AQE for runtime re-planning)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # events.parquet uses TIMESTAMP(NANOS); read as long + convert
    # (queries/common.load) to match DuckDB's micros truncation
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the regional-revenue 6-way join (scan, filter
    pushdown, broadcast + shuffle joins, exact decimal aggregation)."""
    _prepare(spark)
    specs = collect_all()
    return specs["q5_regional_revenue"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in collect_all().items():
        def make(fn):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                _prepare(spark)
                return fn(spark, sf_dir)

            return run

        out[name] = make(spec.fn)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect equivalents for every query (all entries have
    one in round 1)."""
    return {name: spec.oracle for name, spec in collect_all().items() if spec.oracle}
