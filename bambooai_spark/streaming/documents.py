"""Streaming ingest pipeline for the documents table (SURVEY M5 extension).

The 100 TB ingest-time shape: documents arrive as files; each micro-batch
is quality-gated, PII-scrubbed, and fingerprinted ON ARRIVAL, so the
curated store never holds raw text and downstream dedup works off
precomputed fingerprints. All three stages are STATELESS column
expressions — the streaming plan is literally the batch plan applied per
micro-batch, so the batch-twin equality is exact (same rule as
streaming/events.py).

Exact dedup across batches belongs to the stateful layer:
``dropDuplicatesWithinWatermark`` on the fingerprint (see
``stream_dedup_events`` for the event-stream version) or the
foreachBatch MERGE in streaming/memory.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bambooai_spark.functions.text import (
    fingerprint,
    quality_filter,
    scrub_pii,
)


def read_documents_stream(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream source over the documents table (schema pinned from one
    batch footer read, as the events source does)."""
    path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.option("pathGlobFilter", "documents.parquet").parquet(sf_dir)


def ingest_documents(docs: DataFrame) -> DataFrame:
    """The per-batch ingest projection — works identically on a batch or a
    streaming DataFrame: quality gate (keep + reason), PII scrub, and the
    dedup fingerprint of the SCRUBBED text (the stored corpus is the
    scrubbed one, so fingerprints must match what is stored)."""
    qf = quality_filter("text")
    pii = scrub_pii("text")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        qf["n_words"].alias("n_words"),
        qf["keep"].alias("keep"),
        qf["reason"].alias("reason"),
        (pii["n_emails"] + pii["n_ips"] + pii["n_phones"]).alias("n_pii"),
        pii["scrubbed"].alias("text"),
    ).withColumn("fp", fingerprint("text", normalize=True))


def stream_ingest_documents(docs_stream: DataFrame) -> DataFrame:
    """Streaming twin — the same expression; named separately so call
    sites document intent."""
    return ingest_documents(docs_stream)


def stream_ingest_to_corpus(
    docs_stream: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...] = ("lang",),
    token_col: str | None = "n_words",
    max_records_per_file: int | None = 100_000,
    available_now: bool = True,
    checkpoint_location: str | None = None,
):
    """The COMPLETE streaming pipeline in one sink:
    ingest → quality gate → PII scrub → exact dedup → curated corpus.

    ``foreachBatch`` hands each micro-batch over as a normal DataFrame;
    the batch runs the stateless ingest projection, drops gated-out
    documents, and flows through the TRANSACTIONAL
    :func:`operators.writer.append_corpus_txn`, keyed by the micro-batch
    id — whose fingerprint-ledger anti-join dedups the batch against
    EVERYTHING already stored (earlier batches included) and delta-merges
    the manifest in O(batch). The guarantee is EXACTLY-ONCE under
    crash-replay: each batch stages its corpus parquet and ledger rows
    under ``_staging/batch_id=N`` and commits via resumable deterministic
    renames + a ``_commits`` marker, so a batch replayed by Structured
    Streaming after a crash at ANY point (including between the corpus
    and ledger writes — the former at-least-once window) resumes the
    commit instead of re-appending. See ``append_corpus_txn``'s docstring
    for the protocol and its rename-atomicity assumptions.

    ``checkpoint_location`` — pass a durable path in production: it is
    what makes Structured Streaming re-deliver a crashed batch with the
    SAME batch_id on restart (without it a restarted query begins a new
    run at batch 0 and re-reads the source — still duplicate-free here
    thanks to the ledger anti-join, but O(source) re-work).

    With ``available_now=True`` (default) the call drains the source,
    awaits termination, and returns the final manifest DataFrame (None if
    every batch was empty or fully gated/deduped away). With
    ``available_now=False`` the query runs continuously — the call
    returns the live ``StreamingQuery`` handle immediately (awaiting a
    continuous query would block forever); read the manifest from disk.
    """
    import hashlib  # noqa: PLC0415
    import uuid  # noqa: PLC0415

    from bambooai_spark.operators.writer import append_corpus_txn  # noqa: PLC0415

    # micro-batch ids are only unique within one checkpointed query
    # lineage — namespace the transaction ids so a FRESH run's batch 0
    # can't hit a previous run's commit marker. With a checkpoint the
    # namespace is stable across restarts (that's what makes replay
    # detection work); without one, each call is its own namespace and
    # cross-run dedup falls back to the fingerprint ledger (no replays
    # happen without a checkpoint anyway).
    ns = (
        hashlib.md5(checkpoint_location.encode("utf-8")).hexdigest()[:8]
        if checkpoint_location
        else uuid.uuid4().hex[:8]
    )
    holder: dict = {"manifest": None}

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        ingested = (
            ingest_documents(batch_df)
            .filter(F.col("keep"))
            .drop("keep", "reason")
        )
        if ingested.isEmpty():
            return
        holder["manifest"] = append_corpus_txn(
            ingested,
            path,
            f"{ns}-{batch_id}",
            partition_by=partition_by,
            id_col="doc_id",
            text_col="text",
            max_records_per_file=max_records_per_file,
            token_col=token_col,
        )

    writer = docs_stream.writeStream.foreachBatch(_append)
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if not available_now:
        return writer.start()
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return holder["manifest"]
