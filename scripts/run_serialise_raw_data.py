#!/usr/bin/env python3
"""Hourly bronze→silver entry point (ref scripts/run_serialise_raw_data.py:13-25).

Process date = current UTC hour minus 1 hour. (The reference's comment
says 2 hours; its code subtracts 1 — we preserve the code's behavior.)
"""
import logging
import os
import sys
from datetime import datetime, timezone

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_pipeline_spark.paths import process_hour
from duckdb_pipeline_spark.session import build_spark
from duckdb_pipeline_spark.transform import DataLakeTransformer

logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s")


def main():
    try:
        spark = build_spark("serialise-raw-data")
        transformer = DataLakeTransformer("gharchive/events", spark)
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        process_date = process_hour(now)
        transformer.serialise_raw_data(process_date)
        logging.info("Successfully serialised raw data for %s", process_date)
    except Exception as e:
        logging.error("Error in serialise_raw_data: %s", e)


if __name__ == "__main__":
    main()
