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

Two caveats inherent to a file source: rows of one txn batch may split
across micro-batches (per-FILE atomicity, not per-batch — poll
``read_corpus_changes`` where batch atomicity matters), and a file of a
batch that froze mid-commit can be delivered before its commit marker
lands (its remaining files follow when the replay finishes; under the
single-writer lease a frozen batch is always eventually resumed or
recovered, never half-abandoned).
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
            _load_manifest_doc,
        )

        doc = _load_manifest_doc(spark, path)
        if doc and doc.get("schema"):
            from pyspark.sql.types import StructType  # noqa: PLC0415

            try:
                schema = StructType.fromJson(doc["schema"])
            except (KeyError, TypeError, ValueError):
                schema = None
        if schema is None:
            raise ValueError(
                f"no recorded schema under {path}; pass schema= (a "
                "streaming source cannot infer one)"
            )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.option("pathGlobFilter", "b*-*").parquet(path)
