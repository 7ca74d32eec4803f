"""Structured Streaming tests: drain the sf0.001 events through
readStream (Trigger.AvailableNow) and check each streaming job's result
equals its oracle-checked batch twin.
"""

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from duckdb_pipeline_spark.queries.common import load
from duckdb_pipeline_spark.streaming import (
    dedup_stream,
    read_event_stream,
    run_available_now,
    session_windows,
    stateful_user_running_totals,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def landing(spark, sf_dir, tmp_path_factory):
    """A landing dir with the events split across 3 files (3 source
    splits for the stream to discover)."""
    d = str(tmp_path_factory.mktemp("landing"))
    # load() normalizes the driver's TIMESTAMP(NANOS) ts to micros so
    # the landed files carry a true timestamp column
    events = load(spark, sf_dir, "events")
    events.repartition(3).write.mode("overwrite").parquet(d)
    return d


def _mem_name() -> str:
    return "m" + uuid.uuid4().hex[:10]


def test_tumbling_stream_equals_batch(spark, sf_dir, landing):
    stream = tumbling_counts(read_event_stream(spark, landing))
    got = run_available_now(stream, _mem_name()).orderBy("window_start", "event_type")

    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
        .orderBy("window_start", "event_type")
    )
    g, b = got.collect(), batch.collect()
    assert len(g) == len(b) > 0
    for rg, rb in zip(g, b):
        assert rg.window_start == rb.window_start
        assert rg.event_type == rb.event_type
        assert rg.n == rb.n
        assert rg.sum_value == pytest.approx(rb.sum_value)


def test_session_stream_equals_batch(spark, sf_dir, landing):
    stream = session_windows(read_event_stream(spark, landing))
    got = run_available_now(stream, _mem_name())
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert got.count() == batch.count() > 0
    assert got.agg(F.sum("n_events")).first()[0] == batch.agg(F.sum("n_events")).first()[0]


def test_dedup_stream_drops_replayed_file(spark, sf_dir, landing, tmp_path):
    """Replay (copy) one landed file — a classic at-least-once source
    duplication — and check streaming dedup restores exactly-once
    counts."""
    dup_dir = str(tmp_path / "dup_landing")
    shutil.copytree(landing, dup_dir)
    part = next(f for f in os.listdir(dup_dir) if f.endswith(".parquet"))
    shutil.copy(
        os.path.join(dup_dir, part), os.path.join(dup_dir, "replayed_" + part)
    )

    raw_n = spark.read.parquet(dup_dir).count()
    distinct_n = load(spark, sf_dir, "events").count()
    assert raw_n > distinct_n  # the replay really duplicated rows

    stream = dedup_stream(read_event_stream(spark, dup_dir))
    got = run_available_now(stream, _mem_name(), output_mode="append")
    assert got.count() == distinct_n


def test_sliding_stream_equals_batch(spark, sf_dir, landing):
    from duckdb_pipeline_spark.streaming import sliding_counts

    stream = sliding_counts(read_event_stream(spark, landing))
    got = run_available_now(stream, _mem_name())
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert got.count() == batch.count() > 0
    assert got.agg(F.sum("n")).first()[0] == batch.agg(F.sum("n")).first()[0]


def test_foreach_batch_parquet_sink(spark, sf_dir, landing, tmp_path):
    """foreachBatch: arbitrary batch logic per micro-batch — here an
    idempotent parquet append keyed by batch id."""
    out = str(tmp_path / "out")
    seen = []

    def sink(batch_df, batch_id):
        seen.append(batch_id)
        batch_df.write.mode("append").parquet(out)

    q = (
        read_event_stream(spark, landing, max_files_per_trigger=1)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(seen) == 3  # one micro-batch per landed file
    assert spark.read.parquet(out).count() == load(spark, sf_dir, "events").count()


def test_stateful_running_totals(spark, sf_dir, landing):
    stream = stateful_user_running_totals(read_event_stream(spark, landing))
    got = run_available_now(stream, _mem_name(), output_mode="update")
    # one batch -> exactly one update per user, equal to the batch agg
    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
    g = {r.user_id: (r.n_events, r.total_value) for r in got.collect()}
    b = {r.user_id: (r.n_events, r.total_value) for r in batch.collect()}
    assert set(g) == set(b)
    for uid in b:
        assert g[uid][0] == b[uid][0]
        assert g[uid][1] == pytest.approx(b[uid][1])


def test_checkpoint_restart_is_incremental_exactly_once(spark, sf_dir, tmp_path):
    """The streaming twin of the reference's hourly incrementality:
    restarting a checkpointed stream processes only files landed since
    the last run, and reprocesses nothing."""
    from duckdb_pipeline_spark.streaming import write_parquet_stream

    src = str(tmp_path / "incr_src")
    out = str(tmp_path / "incr_out")
    ckpt = str(tmp_path / "incr_ckpt")
    events = load(spark, sf_dir, "events")
    first = events.where(F.col("event_id") % 2 == 0)
    second = events.where(F.col("event_id") % 2 == 1)

    first.coalesce(1).write.mode("append").parquet(src)
    q = write_parquet_stream(
        read_event_stream(spark, src), out, ckpt, available_now=True
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == first.count()

    # land more data, restart from the SAME checkpoint
    second.coalesce(1).write.mode("append").parquet(src)
    q2 = write_parquet_stream(
        read_event_stream(spark, src), out, ckpt, available_now=True
    )
    q2.awaitTermination()

    got = spark.read.parquet(out)
    assert got.count() == events.count()  # everything exactly once
    assert got.select("event_id").distinct().count() == events.count()
