"""Pipeline-stage tests with the reference's own literal fixtures.

Golden values from /root/reference/tests/test_dl_transformer.py:46-74
(clean) and :100-120 (aggregate); end-to-end bronze→silver→gold run
over generated .json.gz fixtures mirrors the cron lifecycle (SURVEY §3).
"""

import gzip
import json
import os
from datetime import date, datetime

import pytest

from duckdb_pipeline_spark.config import EngineConfig
from duckdb_pipeline_spark.transform import (
    DataLakeTransformer,
    clean_projection,
    daily_aggregate,
)

RAW_ROWS = [
    {
        "id": 1,
        "actor": {"id": 101, "login": "user1", "display_login": "User One"},
        "type": "PushEvent",
        "repo": {"id": 201, "name": "repo1", "url": "https://github.com/user1/repo1"},
        "created_at": "2023-01-01 12:00:00",
    },
    {
        "id": 2,
        "actor": {"id": 102, "login": "user2", "display_login": "User Two"},
        "type": "IssuesEvent",
        "repo": {"id": 202, "name": "repo2", "url": "https://github.com/user2/repo2"},
        "created_at": "2023-01-02 13:00:00",
    },
]

SILVER_ROWS = [
    ("PushEvent", 1, "repo1", "http://repo1.com", "2023-01-01 10:00:00"),
    ("PushEvent", 1, "repo1", "http://repo1.com", "2023-01-01 11:00:00"),
    ("IssueEvent", 2, "repo2", "http://repo2.com", "2023-01-01 12:00:00"),
    ("PushEvent", 1, "repo1", "http://repo1.com", "2023-01-02 10:00:00"),
]


@pytest.fixture()
def raw_df(spark):
    from duckdb_pipeline_spark.sources import GHARCHIVE_EVENT_SCHEMA

    return spark.createDataFrame(
        [json.loads(json.dumps(r)) for r in RAW_ROWS], schema=GHARCHIVE_EVENT_SCHEMA
    )


def test_clean_raw_gharchive(spark, raw_df):
    clean = clean_projection(raw_df)
    rows = clean.orderBy("event_id").collect()
    assert len(rows) == 2
    assert clean.columns == [
        "event_id",
        "user_id",
        "user_name",
        "user_display_name",
        "event_type",
        "repo_id",
        "repo_name",
        "repo_url",
        "event_date",
    ]
    assert rows[0].user_id == 101
    assert rows[0].user_name == "user1"
    assert rows[0].user_display_name == "User One"
    assert rows[0].repo_id == 201
    assert rows[0].event_date == "2023-01-01 12:00:00"  # string passthrough


def test_aggregate_raw_gharchive(spark):
    silver = spark.createDataFrame(
        SILVER_ROWS, "event_type string, repo_id long, repo_name string, repo_url string, event_date string"
    )
    agg = daily_aggregate(silver)
    out = {
        (r.event_type, r.repo_id, r.event_date): r.event_count
        for r in agg.collect()
    }
    assert len(out) == 3
    assert out[("PushEvent", 1, date(2023, 1, 1))] == 2
    assert out[("IssueEvent", 2, date(2023, 1, 1))] == 1
    assert out[("PushEvent", 1, date(2023, 1, 2))] == 1
    assert dict(agg.dtypes)["event_date"] == "date"
    assert dict(agg.dtypes)["event_count"] == "bigint"


def test_end_to_end_medallion(spark, tmp_path):
    """bronze .json.gz → silver parquet → gold parquet, exact filenames."""
    lake = tmp_path / "lake"
    cfg = EngineConfig(
        bronze_bucket=str(lake / "bronze"),
        silver_bucket=str(lake / "silver"),
        gold_bucket=str(lake / "gold"),
        scheme="",
    )
    process_date = datetime(2023, 1, 1, 12)
    bronze_dir = lake / "bronze" / "gharchive/events" / "2023-01-01" / "12"
    os.makedirs(bronze_dir)
    payload = b"\n".join(json.dumps(r).encode() for r in RAW_ROWS)
    # interleave a malformed line: DROPMALFORMED must skip it
    payload += b'\n{"id": broken!!\n'
    with gzip.open(bronze_dir / "2023-1-1-12.json.gz", "wb") as f:
        f.write(payload)

    t = DataLakeTransformer("gharchive/events", spark, cfg)
    silver_file = t.serialise_raw_data(process_date)
    assert silver_file.endswith("2023-01-01/12/clean_20230101_12.parquet")
    assert os.path.isfile(silver_file)

    gold_file = t.aggregate_silver_data(datetime(2023, 1, 1))
    assert gold_file.endswith("2023-01-01/agg_20230101.parquet")
    gold = spark.read.parquet(gold_file)
    rows = {(r.event_type, r.event_date): r.event_count for r in gold.collect()}
    assert rows == {
        ("PushEvent", date(2023, 1, 1)): 1,
        ("IssuesEvent", date(2023, 1, 2)): 1,
    }


def test_end_to_end_bucketed_silver_gold_exchange_free(spark, tmp_path):
    """Round-8 medallion layout (VERDICT r7 #7): two bronze hours →
    day-partitioned repo-bucketed silver table → gold aggregation that
    (a) equals the plain path's daily aggregate and (b) plans with
    ZERO shuffle Exchanges — the silver writer paid the one shuffle at
    ingest time."""
    lake = tmp_path / "lake"
    cfg = EngineConfig(
        bronze_bucket=str(lake / "bronze"),
        silver_bucket=str(lake / "silver"),
        gold_bucket=str(lake / "gold"),
        scheme="",
    )
    for hour, rows in ((12, RAW_ROWS), (13, RAW_ROWS[:1])):
        bronze_dir = lake / "bronze" / "gharchive/events" / "2023-01-01" / str(hour)
        os.makedirs(bronze_dir)
        payload = b"\n".join(json.dumps(r).encode() for r in rows)
        with gzip.open(bronze_dir / f"2023-1-1-{hour}.json.gz", "wb") as f:
            f.write(payload)

    t = DataLakeTransformer("gharchive/events", spark, cfg)
    try:
        tname = t.serialise_raw_data_bucketed(datetime(2023, 1, 1, 12))
        assert t.serialise_raw_data_bucketed(datetime(2023, 1, 1, 13)) == tname

        silver = spark.table(tname)
        assert silver.count() == 3  # both hourly appends landed
        # idempotence guard (ADVICE r8): replaying an already-ingested
        # hour is a no-op — no duplicate rows, no gold double-count
        assert t.serialise_raw_data_bucketed(datetime(2023, 1, 1, 12)) == tname
        assert spark.table(tname).count() == 3
        # layout facts: day partition dirs + one file per bucket write
        tdir = lake / "silver" / "gharchive/events" / "clean_bucketed"
        assert (tdir / "process_day=2023-01-01").is_dir()

        gold = t.aggregate_silver_data_bucketed(datetime(2023, 1, 1))
        got = {
            (r.event_type, r.repo_id, r.event_date): r.event_count
            for r in gold.collect()
        }
        assert got == {
            ("PushEvent", 201, date(2023, 1, 1)): 2,
            ("IssuesEvent", 202, date(2023, 1, 2)): 1,
        }

        from tests.test_plans import plan_text
        from tests.test_plans_round7 import _shuffle_exchanges

        plan = plan_text(gold, "simple")
        assert _shuffle_exchanges(plan) == 0, plan
        assert "Bucketed: true" in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t._bucketed_silver_table()}")


def test_ingester_local_landing(tmp_path):
    """Bronze byte-copy landing to a local-dir bucket (no network)."""
    import io

    from duckdb_pipeline_spark.ingest import DataLakeIngester

    cfg = EngineConfig(bronze_bucket=str(tmp_path / "bronze"), scheme="")
    ing = DataLakeIngester("gharchive/events", cfg)
    seen = []
    ing._progress_callback = lambda n: seen.append(n)  # ref :116-120 contract
    out = ing.upload(
        io.BytesIO(b"payload"),
        cfg.bronze_bucket,
        "gharchive/events/2024-10-01/07/2024-10-1-7.json.gz",
    )
    with open(out, "rb") as f:
        assert f.read() == b"payload"
    assert seen == [len(b"payload")]


def test_read_parquet_glob_merge_schema_evolution(spark, tmp_path):
    """Lake schema evolution: a column added partway through a table's
    life must union-read (old files NULL-fill) under merge_schema=True;
    the default read keeps the fast single-footer path."""
    from duckdb_pipeline_spark.sources import read_parquet_glob

    old = spark.createDataFrame([(1, "a")], "id long, v string")
    new = spark.createDataFrame([(2, "b", 9.5)], "id long, v string, score double")
    old.write.parquet(str(tmp_path / "d" / "p1"))
    new.write.parquet(str(tmp_path / "d" / "p2"))

    merged = read_parquet_glob(spark, str(tmp_path / "d" / "p*"), merge_schema=True)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 9.5
