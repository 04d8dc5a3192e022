"""Streaming twins of the batch event operators (SURVEY M5).

Design rule: each streaming operator is the SAME dataframe expression as its
batch twin in suite.py, applied to a ``readStream`` source with a watermark —
Spark's unified batch/streaming semantics make the twin relationship exact:

- ``stream_hourly_events``   ↔ suite ``hourly_events``   (tumbling window)
- ``stream_session_windows`` ↔ suite ``sessionize_events`` (session_window —
  the built-in stateful twin of the batch lag+running-sum construction)
- ``stream_dedup_events``    ↔ dedup.exact_dedup (dropDuplicatesWithinWatermark
  bounds the dedup state the way the batch groupBy is bounded by the data)

State stance at scale: every operator carries a watermark so state is
evicted; without one, windowed state grows unboundedly on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bambooai_spark.io import _nanos_timestamp_columns, normalize_timestamps
from bambooai_spark.numeric import dec, epoch_us


def read_events_stream(
    spark: SparkSession, sf_dir: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-stream source over the events table with the same ns→us
    timestamp normalization as the batch loader (io.load_table)."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    for c in _nanos_timestamp_columns(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return normalize_timestamps(df)


def stream_hourly_events(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1h aggregate — the exact ``hourly_events`` expression on a
    stream; the watermark lets Spark finalize+evict each hour's state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")).cast("double"), 2).alias("sum_value"),
        )
        .select(
            epoch_us(F.col("w.start")).alias("hour_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sliding_events(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window aggregate — each event lands in window/slide
    overlapping windows (the moving-average shape on a stream; completes
    the tumbling/sliding/session window matrix). State per open window is
    one partial aggregate; the watermark finalizes and evicts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")).cast("double"), 2).alias("sum_value"),
        )
        .select(
            epoch_us(F.col("w.start")).alias("win_start_us"),
            epoch_us(F.col("w.end")).alias("win_end_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_session_windows(
    events: DataFrame, *, gap: str = "6 hours", watermark: str = "12 hours"
) -> DataFrame:
    """Session windows per user — the built-in stateful twin of the batch
    ``sessionize`` (lag + running sum). ``session_window`` merges events
    within ``gap`` into one growing window; the watermark closes sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")).cast("double"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            epoch_us(F.col("w.start")).alias("session_start_us"),
            epoch_us(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup_events(
    events: DataFrame, *, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked streaming dedup — drops repeats of the key arriving
    within the watermark window, with bounded state (the streaming analog of
    exact_dedup's hash-groupBy)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_interval_join(
    purchases: DataFrame,
    events: DataFrame,
    *,
    window_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join — the streaming twin of the batch
    ``range_count_events``: every purchase opens a ``window_seconds``-long
    interval and joins every event landing inside it.

    Spark refuses stream-stream joins without an equality predicate (state
    would be un-partitionable), so this reuses the batch ``range_join``
    bucketization: quantize time into window-sized bins, explode each
    interval over the ≤2 bins it covers, equi-join on the bin, refine with
    the exact range predicate. Both sides carry watermarks and the join
    condition bounds event-time distance, so buffered rows are evicted once
    they can never match again — state stays O(watermark · rate). Emits one
    row per (purchase, matched event); aggregating downstream gives the
    batch twin's per-interval counts."""
    w_us = int(window_seconds) * 1_000_000
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("p_ts"),
        F.explode(
            F.sequence(
                F.floor(epoch_us("ts") / w_us),
                # end-exclusive: last covered bin holds (start + window - 1µs)
                F.floor((epoch_us("ts") + w_us - 1) / w_us),
            )
        ).alias("bin"),
    )
    e = events.withWatermark("ts", watermark).select(
        F.col("event_id").alias("matched_id"),
        F.col("ts").alias("e_ts"),
        F.col("value").alias("e_value"),
        F.floor(epoch_us("ts") / w_us).alias("bin"),
    )
    return p.join(
        e,
        (p.bin == e.bin)
        & (F.col("e_ts") >= F.col("p_ts"))
        & (
            F.col("e_ts")
            < F.col("p_ts") + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
        ),
        "inner",
    ).drop("bin")


def stream_enrich(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment — the remaining join shape in the matrix
    (tumbling/sliding/session aggs, watermark dedup, stream-STREAM
    interval join, and now stream-STATIC): every micro-batch equi-joins
    the static dimension, which Spark plans per batch like any batch join
    — NO streaming state is kept for the join at all (the stateless
    shape; unmatched stream rows pass through with NULLs under the
    default left join, the lossless choice for an enrichment). The dim
    is re-read per micro-batch, so a catalog-backed dim picks up
    slowly-changing updates between batches for free.

    ``broadcast=True`` (default) hints the dim to broadcast — right for
    the common small-dimension case. Pass ``broadcast=False`` for a dim
    too large to ship to every executor each micro-batch and let Spark's
    size-based planning pick the join strategy."""
    return events.join(F.broadcast(dim) if broadcast else dim, on, how)


def run_to_memory(
    df: DataFrame,
    query_name: str,
    *,
    output_mode: str = "append",
    available_now: bool = True,
):
    """Drain a (bounded) stream into an in-memory table — the test/demo
    sink. ``output_mode`` must match the query shape: "complete" for
    aggregations (hourly/session windows), "append" (default) for
    row-level streams like the watermark dedup. Returns the
    StreamingQuery after it stops."""
    writer = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
    )
    if not available_now:
        # continuous trigger: return the LIVE handle — trigger() rejects
        # availableNow=False, and awaiting a continuous query never returns
        return writer.start()
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return q


def stream_running_totals(
    events: DataFrame,
    *,
    key: str = "user_id",
    value: str = "value",
    scale: int = 2,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running event count and value total, re-emitted (outputMode "update")
    every micro-batch a key appears in — the pattern for stateful logic the
    built-in windowed aggregates can't express (counters, custom sessions,
    fraud scores).

    State is ``(n: bigint, cents: bigint)`` — the value is accumulated in
    integer 10^-scale units so cross-batch accumulation is exact and
    order-independent; the double surfaces only in the emitted row. State
    lives per key in the state store (RocksDB on a real cluster), grouped
    by hash of the key — the same partitioning story as a batch groupBy.
    ``idle_timeout_ms`` evicts state for keys idle longer than that
    processing-time window (unbounded-key hygiene at scale).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    mult = 10**scale
    out_schema = f"{key} bigint, n_events bigint, total_value double"
    state_schema = "n bigint, cents bigint"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def update(key_tuple, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            v = pd.to_numeric(pdf[value], errors="coerce").fillna(0.0)
            n += len(pdf)
            cents += int((v * mult).round().astype("int64").sum())
        state.update((n, cents))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {key: [key_tuple[0]], "n_events": [n], "total_value": [cents / mult]}
        )

    return events.groupBy(key).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )
