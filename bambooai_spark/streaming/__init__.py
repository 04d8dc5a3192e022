"""Structured Streaming surface for the events table (SURVEY M5 — net-new
capability; the reference has no data-plane streaming, §1.2)."""

from bambooai_spark.streaming.events import (
    read_events_stream,
    stream_hourly_events,
    stream_session_windows,
    stream_dedup_events,
    stream_interval_join,
    stream_running_totals,
)
from bambooai_spark.streaming.memory import stream_upsert

__all__ = [
    "read_events_stream",
    "stream_hourly_events",
    "stream_session_windows",
    "stream_dedup_events",
    "stream_interval_join",
    "stream_running_totals",
    "stream_upsert",
]
