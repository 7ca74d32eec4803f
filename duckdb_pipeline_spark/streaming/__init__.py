"""Structured Streaming surface.

The reference's incrementality is cron + hourly path partitioning
(`/root/reference/scripts/run_*.py`, SURVEY.md §1.1 "micro-batch
time-series"): each wall-clock hour is one batch. This package is the
streaming-native generalization: the same logical plans as
``queries/streaming_like.py`` (tumbling / sliding / session windows,
dedup) declared over ``readStream`` file sources with watermarks, plus
a custom stateful operator (``applyInPandasWithState``) for semantics
the built-in windows can't express.

Batch/stream parity is the design invariant: every streaming job here
reuses the exact groupBy/window expressions of its oracle-checked batch
twin, so correctness is established in batch (DuckDB differential
check) and carried to streaming by construction.
"""

from .jobs import (
    EVENTS_SCHEMA,
    dedup_stream,
    read_event_stream,
    run_available_now,
    session_windows,
    sliding_counts,
    stateful_scd2_intervals,
    stateful_user_running_totals,
    stream_stream_interval_join,
    tumbling_counts,
    write_parquet_stream,
    neardup_gate_stream,
    write_stream_upsert,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_event_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_windows",
    "dedup_stream",
    "stateful_scd2_intervals",
    "stateful_user_running_totals",
    "stream_stream_interval_join",
    "run_available_now",
    "write_parquet_stream",
    "write_stream_upsert",
    "neardup_gate_stream",
]
