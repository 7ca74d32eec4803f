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


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, landing):
    """Stream-stream attribution join (both sides watermarked, time-
    bounded condition) drains to exactly the batch twin's rows."""
    from duckdb_pipeline_spark.streaming import stream_stream_interval_join

    src = read_event_stream(spark, landing)
    stream = stream_stream_interval_join(
        src.where(F.col("event_type") == "click"),
        src.where(F.col("event_type") == "purchase"),
    )
    # stream-stream joins emit in append mode only
    got = run_available_now(stream, _mem_name(), output_mode="append")

    events = load(spark, sf_dir, "events")
    batch = stream_stream_interval_join(
        events.where(F.col("event_type") == "click"),
        events.where(F.col("event_type") == "purchase"),
    )
    key = lambda r: (r.purchase_id, r.click_id)
    g = sorted(got.collect(), key=key)
    b = sorted(batch.collect(), key=key)
    assert len(g) == len(b) > 0
    assert [key(r) for r in g] == [key(r) for r in b]


def test_watermark_drops_late_data_across_restarts(spark, sf_dir, tmp_path):
    """Event-time correctness under late data: rows arriving behind the
    checkpointed watermark are DROPPED from the windowed aggregation —
    the exact semantics a 100 TB pipeline relies on to bound state.
    Phase 1 lands the corpus and finalizes its windows; phase 2 lands
    rows 6 hours behind the stream's max event time into an hour bucket
    that phase 1 never produced; their window must not appear."""
    from duckdb_pipeline_spark.streaming import write_parquet_stream

    src = str(tmp_path / "late_src")
    out = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")

    events = load(spark, sf_dir, "events")
    lo = events.select(F.min("ts")).first()[0]
    events.coalesce(1).write.mode("append").parquet(src)
    q = write_parquet_stream(
        tumbling_counts(read_event_stream(spark, src), watermark="2 hours"),
        out, ckpt, available_now=True,
    )
    q.awaitTermination()

    # phase 2: replay 50 events time-shifted into the hour before the
    # corpus begins — far behind the watermark (max ts - 2h) persisted
    # in the checkpoint
    late = (
        events.limit(50)
        .withColumn("ts", F.expr(f"date_trunc('hour', timestamp'{lo}') - interval 30 minutes"))
    )
    late.coalesce(1).write.mode("append").parquet(src)
    q2 = write_parquet_stream(
        tumbling_counts(read_event_stream(spark, src), watermark="2 hours"),
        out, ckpt, available_now=True,
    )
    q2.awaitTermination()

    got = spark.read.parquet(out)
    late_ws = late.select(F.date_trunc("hour", "ts").alias("w")).first().w
    assert got.where(F.col("window_start") == late_ws).count() == 0
    # control: batch (no watermark) WOULD count them
    assert late.groupBy(F.window("ts", "1 hour")).count().first()[1] == 50


def test_stream_upsert_gold_table_idempotent(spark, sf_dir, landing, tmp_path):
    """foreachBatch MERGE sink: a per-type count aggregation streamed
    into a parquet gold table equals the batch answer; re-draining the
    SAME source from a FRESH checkpoint (a full replay — stronger than
    a duplicate micro-batch) re-merges every key to the same final
    state, proving the upsert is idempotent by effect."""
    from duckdb_pipeline_spark.streaming import (
        read_event_stream,
        write_stream_upsert,
    )

    gold = str(tmp_path / "gold_counts")

    def drain(ckpt: str):
        stream = (
            read_event_stream(spark, landing)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = write_stream_upsert(
            stream, gold, str(tmp_path / ckpt), keys=["event_type"],
            available_now=True,
        )
        q.awaitTermination()

    drain("ckpt1")
    batch = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got1 = {r.event_type: r.n for r in spark.read.parquet(gold).collect()}
    want = {r.event_type: r.n for r in batch.collect()}
    assert got1 == want

    drain("ckpt2")  # full replay into the existing table
    got2 = {r.event_type: r.n for r in spark.read.parquet(gold).collect()}
    assert got2 == want


def test_keyed_dedup_stream_matches_batch_twin_keys(spark, sf_dir, landing):
    """Keyed streaming dedup (user_id, event_type) drains to exactly
    one survivor per key — the same key set (and count) the declared
    batch twin stream_dedup_events produces. The surviving ROW is
    arrival-order-dependent in the stream (file discovery order), so
    parity is asserted on the keyed cardinality, which eviction bugs
    or key-mangling would break."""
    from duckdb_pipeline_spark.queries.streaming_like import stream_dedup_events

    stream = dedup_stream(
        read_event_stream(spark, landing), keys=["user_id", "event_type"]
    )
    got = run_available_now(stream, _mem_name(), output_mode="append")
    twin = stream_dedup_events(spark, sf_dir)
    assert got.count() == twin.count() > 0
    g = {(r.user_id, r.event_type) for r in got.select("user_id", "event_type").collect()}
    t = {(r.user_id, r.event_type) for r in twin.select("user_id", "event_type").collect()}
    assert g == t


def test_stateful_scd2_closed_intervals_equal_batch(spark, sf_dir, tmp_path):
    """Drain a ts-ordered 3-chunk replay through the incremental SCD2
    maintainer; the emitted CLOSED intervals must equal the batch
    twin's closed intervals exactly (values, counts, and timestamps).
    Chunks are contiguous in (ts, event_id) order, so cross-batch
    arrival respects the operator's ordering contract."""
    from pyspark.sql import Window

    from duckdb_pipeline_spark.queries.timeseries import scd2_user_attributes
    from duckdb_pipeline_spark.streaming import stateful_scd2_intervals

    d = str(tmp_path / "scd2_landing")
    events = load(spark, sf_dir, "events")
    n = events.count()
    ranked = events.withColumn(
        "rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    for k in range(3):
        (
            ranked.where(
                (F.col("rn") > k * n // 3) & (F.col("rn") <= (k + 1) * n // 3)
            )
            .drop("rn")
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )
    stream = stateful_scd2_intervals(
        read_event_stream(spark, d, max_files_per_trigger=1)
    )
    got = run_available_now(stream, _mem_name(), output_mode="append")
    want = scd2_user_attributes(spark, sf_dir).where(
        F.col("valid_to").isNotNull()
    )
    key = lambda r: (r.user_id, r.attr_value, r.valid_from, r.valid_to, r.n_events)
    g = sorted(key(r) for r in got.collect())
    b = sorted(key(r) for r in want.collect())
    assert g == b and len(g) > 0


def test_neardup_gate_stream_matches_batch_probe(spark, sf_dir, tmp_path):
    """Streaming admission gate: drain a landing dir of incoming docs
    (fresh docs + exact re-uploads of already-indexed docs under new
    ids) through neardup_gate_stream against the persisted band index.
    Every re-upload must be flagged (kept=False) with a resolved
    dup_of/component; the full verdict set must equal the batch probe's
    answer; and a full replay from a fresh checkpoint must rewrite the
    gate table to identical content (per-batch overwrite idempotence)."""
    from duckdb_pipeline_spark.operators.dedup import minhash_band_index_probe
    from duckdb_pipeline_spark.queries.dedup import ID_SHIFT, _ensure_band_index
    from duckdb_pipeline_spark.streaming import neardup_gate_stream

    idx = _ensure_band_index(spark, sf_dir)  # indexes doc_id % 4 != 0
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    fresh = docs.where(F.col("doc_id") % 4 == 0)
    # re-uploads of docs that are CERTAIN to be indexed (%4 == 1)
    reup = docs.where(F.col("doc_id") % 4 == 1).select(
        (F.col("doc_id") + ID_SHIFT).alias("doc_id"), "text"
    )
    batch = fresh.unionByName(reup)
    landing = str(tmp_path / "doc_landing")
    batch.repartition(2).write.mode("overwrite").parquet(landing)
    out = str(tmp_path / "gate")

    def drain(ckpt: str):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)  # force >1 micro-batch
            .parquet(landing)
        )
        # append_admitted=False: this test targets probe parity and
        # replay idempotence against the SHARED stamp-governed
        # _ensure_band_index scratch index, which only its owner may
        # mutate (the closed-loop append path has its own test below
        # on a private index copy)
        q = neardup_gate_stream(
            stream, idx, out, str(tmp_path / ckpt), available_now=True,
            append_admitted=False,
        )
        q.awaitTermination()

    drain("ck1")
    got = spark.read.parquet(out)
    rows = {r.doc_id: r for r in got.collect()}
    assert set(rows) == {r.doc_id for r in batch.select("doc_id").collect()}
    # batch-probe parity on the flagged set
    flagged = {
        r.doc_id
        for r in minhash_band_index_probe(spark, idx, batch)
        .select("doc_id").distinct().collect()
    }
    assert {d for d, r in rows.items() if not r.kept} == flagged
    # every exact re-upload is caught and resolves to a cluster
    for r in rows.values():
        if r.doc_id >= ID_SHIFT:
            assert not r.kept and r.dup_of is not None
            assert r.component is not None
        if r.kept:
            assert r.dup_of is None

    verdict1 = {(r.doc_id, r.kept, r.dup_of, r.component) for r in rows.values()}
    drain("ck2")  # full replay, fresh checkpoint, same out dir
    verdict2 = {
        (r.doc_id, r.kept, r.dup_of, r.component)
        for r in spark.read.parquet(out).collect()
    }
    assert verdict2 == verdict1
