"""Structured Streaming surface for the events and documents tables
(SURVEY M5 — net-new capability; the reference has no data-plane
streaming, §1.2)."""

from bambooai_spark.streaming.corpus import (
    stream_corpus_inserts,
    stream_resume_check,
)
from bambooai_spark.streaming.documents import (
    ingest_documents,
    ingest_to_corpus,
    read_documents_stream,
    stream_ingest_documents,
    stream_ingest_to_corpus,
)
from bambooai_spark.streaming.events import (
    read_events_stream,
    stream_hourly_events,
    stream_sliding_events,
    stream_session_windows,
    stream_dedup_events,
    stream_enrich,
    stream_interval_join,
    stream_running_totals,
)
from bambooai_spark.streaming.memory import stream_upsert

__all__ = [
    "ingest_documents",
    "ingest_to_corpus",
    "stream_ingest_to_corpus",
    "read_documents_stream",
    "read_events_stream",
    "stream_hourly_events",
    "stream_sliding_events",
    "stream_ingest_documents",
    "stream_session_windows",
    "stream_dedup_events",
    "stream_enrich",
    "stream_interval_join",
    "stream_running_totals",
    "stream_upsert",
    "stream_corpus_inserts",
    "stream_resume_check",
]
