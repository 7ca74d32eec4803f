#!/usr/bin/env python3
"""Daily silver→gold entry point (ref scripts/run_agg_silver_data.py:13-25).

Process date = UTC midnight minus 1 day.
"""
import logging
import os
import sys
from datetime import datetime, timezone

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_pipeline_spark.paths import process_day
from duckdb_pipeline_spark.session import build_spark
from duckdb_pipeline_spark.transform import DataLakeTransformer

logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s")


def main():
    try:
        spark = build_spark("agg-silver-data")
        transformer = DataLakeTransformer("gharchive/events", spark)
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        process_date = process_day(now)
        transformer.aggregate_silver_data(process_date)
        logging.info("Successfully aggregated silver data for %s", process_date)
    except Exception as e:
        logging.error("Error in agg_silver_data: %s", e)


if __name__ == "__main__":
    main()
