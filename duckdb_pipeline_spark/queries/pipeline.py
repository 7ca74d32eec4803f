"""Reference-pipeline parity queries, mapped onto the driver's `events`
table (the gharchive stand-in — same shape class: id, timestamp, actor,
type, payload; TESTDATA.md).

Covers SURVEY.md §2.3-2.4: projection+rename (P1), payload field
extraction (P2 analog — JSON props instead of structs), CAST (P3),
DATE_TRUNC→DATE (P4), COUNT(*) (A1), GROUP BY ALL (A2).

Scale notes: the daily/hourly rollups shuffle once on the group keys
(partial aggregation map-side first); key cardinality = types × days —
never skewed. The clean projection is shuffle-free and column-pruned at
the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import QuerySpec
from .common import load


def clean_events(spark, sf_dir):
    """P1/P2/P3: projection + rename + JSON payload extract + cast.

    Mirrors clean_raw_gharchive
    (/root/reference/data_lake_transformer.py:92-104): prune the wide
    record, flatten the payload, pass the timestamp through.
    """
    return load(spark, sf_dir, "events").select(
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("ts").alias("event_ts"),
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        F.col("value").alias("event_value"),
    )


CLEAN_EVENTS_SQL = """
SELECT event_id,
       user_id,
       event_type,
       ts AS event_ts,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       value AS event_value
FROM events
"""


def gold_daily_agg(spark, sf_dir):
    """A1/A2/P4: the gold daily roll-up shape (GROUP BY ALL + count),
    with DuckDB's DATE_TRUNC('day')->DATE semantics via to_date
    (/root/reference/data_lake_transformer.py:116-126)."""
    events = load(spark, sf_dir, "events")
    return (
        events.select(
            "event_type", F.to_date(F.col("ts").cast("timestamp")).alias("event_date")
        )
        .groupBy("event_type", "event_date")
        .agg(F.count(F.lit(1)).alias("event_count"))
    )


GOLD_DAILY_SQL = """
SELECT event_type,
       DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS event_date,
       count(*) AS event_count
FROM events
GROUP BY ALL
"""


def hourly_type_counts(spark, sf_dir):
    """Hourly batch granularity (the pipeline's cadence): TIMESTAMP
    date_trunc, distinct users per hour per type."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("event_hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.countDistinct("user_id").alias("unique_users"),
        )
    )


HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS event_hour,
       event_type,
       count(*) AS event_count,
       count(DISTINCT user_id) AS unique_users
FROM events
GROUP BY ALL
"""


QUERIES = {
    "pipeline_clean_events": QuerySpec(clean_events, CLEAN_EVENTS_SQL, "silver clean projection"),
    "pipeline_gold_daily_agg": QuerySpec(gold_daily_agg, GOLD_DAILY_SQL, "gold daily rollup"),
    "pipeline_hourly_type_counts": QuerySpec(hourly_type_counts, HOURLY_SQL, "hourly rollup + ndv"),
}
