"""Streaming SOURCE over a transactional corpus — the push twin of the
pull-style :func:`~bambooai_spark.operators.writer.read_corpus_changes`.

``stream_corpus_inserts`` turns the corpus into an insert stream a
downstream Structured Streaming job can follow (feature extraction,
index refresh, mirroring): Spark's file source lists new files per
trigger and its checkpoint log delivers each file exactly once.

What makes a plain ``readStream.parquet(corpus)`` WRONG and this
wrapper right is the ``pathGlobFilter`` on ``b*-*`` — only the txn
appends' committed files enter the stream:

- **Compaction never replays the corpus.** ``compact_corpus`` rewrites
  every live row into fresh ``c<id>-`` files; an unfiltered file stream
  would see them all as new and re-deliver 100 TB. Filtered, the
  rewrite is invisible (the consumed ``b``-files' log entries remain in
  the checkpoint; their deletion is harmless to the source).
- **Takedowns are not resurrections.** A delete's ``d<id>-`` kept-rows
  rewrites carry mostly already-delivered rows; unfiltered they would
  re-deliver them. Filtered, deletes are simply not observed —
  the same inserts-only contract as ``read_corpus_changes`` (consumers
  that must mirror takedowns reconcile against live ids, e.g.
  :func:`~bambooai_spark.operators.vector_store.prune_vector_store`).
- **Plain (non-txn) appends are invisible** — they write bare
  ``part-`` files. Corpora feeding a streaming consumer should ingest
  through the txn path (the streaming sink always does).

Three caveats inherent to a file source: rows of one txn batch may
split across micro-batches (per-FILE atomicity, not per-batch — poll
``read_corpus_changes`` where batch atomicity matters); a file of a
batch that froze mid-commit can be delivered before its commit marker
lands (its remaining files follow when the replay finishes; under the
single-writer lease a frozen batch is always eventually resumed or
recovered, never half-abandoned); and a maintenance rewrite DESTROYS
the ``b``-files of batches a LAGGING consumer has not yet drained —
the rewritten rows live on only in excluded base files, so those rows
would silently never arrive. Call :func:`stream_resume_check` with the
consumer's last drained watermark before resuming after downtime; it
raises the CDC re-baseline error exactly when that happened. Schedule
compaction after consumers drain, as with the pull path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_corpus_inserts(
    spark: SparkSession,
    path: str,
    *,
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of the corpus's txn-append inserts (see
    module doc). ``schema`` defaults to the manifest's recorded unified
    schema — the same evolution-aware pin ``read_corpus`` uses — and is
    required for a legacy corpus without one."""
    if schema is None:
        from bambooai_spark.operators.writer import (  # noqa: PLC0415
            _stored_schema,
        )

        schema = _stored_schema(spark, path)
        if schema is None:
            raise ValueError(
                f"no recorded schema under {path}; pass schema= (a "
                "streaming source cannot infer one)"
            )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.option("pathGlobFilter", "b*-*").parquet(path)


def stream_resume_check(
    spark: SparkSession, path: str, last_drained_batch: int | str
) -> None:
    """Guard a LAGGING consumer against silent row loss across
    maintenance: compaction/delete rewrite committed ``b<id>-`` files
    into base files the insert stream's glob excludes, so rows of
    batches the consumer had NOT yet drained would simply never arrive.
    Call this before restarting the stream, passing the watermark the
    consumer recorded at its last drain (``latest_committed_batch`` at
    drain time); it raises the same "re-baseline" ValueError as
    :func:`~bambooai_spark.operators.writer.read_corpus_changes` when a
    rewrite postdates that watermark — the consumer must then re-sync
    from a full ``read_corpus`` instead of resuming the stream. (It IS
    that function's floor guard: a zero-width change read at the
    watermark raises exactly when attribution at or below it is gone.)
    Operationally: schedule compaction after consumers have drained, as
    with the CDC pull path."""
    from pyspark.sql.types import (  # noqa: PLC0415
        StringType,
        StructField,
        StructType,
    )

    from bambooai_spark.operators.writer import (  # noqa: PLC0415
        read_corpus_changes,
    )

    # the zero-width window (after == until) selects zero files by
    # construction, so the probe never reads data — but WITHOUT a schema
    # that empty selection raises the generic "no committed batch files
    # ... pass schema=" ValueError, which on a healthy LEGACY corpus
    # (manifest without a recorded schema) a caller following this
    # function's contract would misread as the re-baseline signal
    # (ADVICE r8). The dummy schema routes the healthy case to the typed
    # empty-DataFrame return; the genuine re-baseline conditions (floor
    # guard, composite-id rewrite evidence) raise BEFORE the selection
    # is consulted, so they still surface.
    read_corpus_changes(
        spark, path,
        after_batch=last_drained_batch, until_batch=last_drained_batch,
        schema=StructType([StructField("_probe", StringType())]),
    )
