#!/usr/bin/env python3
"""Hourly ingest entry point (ref scripts/run_ingest_source_data.py:13-25).

Process date = current UTC hour minus 1 hour (observed behavior).
"""
import logging
import os
import sys
from datetime import datetime, timezone

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_pipeline_spark.ingest import DataLakeIngester
from duckdb_pipeline_spark.paths import process_hour

logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s")


def main():
    try:
        ingester = DataLakeIngester("gharchive/events")
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        process_date = process_hour(now)
        ingester.ingest_hourly_gharchive(process_date)
        logging.info("Successfully ingested data for %s", process_date)
    except Exception as e:  # match reference: log, exit 0
        logging.error("Error in ingest_source_data: %s", e)


if __name__ == "__main__":
    main()
