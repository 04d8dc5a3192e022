"""Streaming memory ingestion — the streaming twin of the batch MERGE
(operators/memory.py ``upsert_with_dedup``), via ``foreachBatch``.

``foreachBatch`` is Structured Streaming's escape hatch for sinks that need
set-based logic per micro-batch: each batch is handed over as a normal
DataFrame and merged with the rank-gate + semantic-dedup semantics of the
batch operator (reference qa_retrieval.py:146-202 ``add_record``, batched).

Scale stance: here the post-merge table is re-checkpointed per batch (the
test/demo shape); on a real cluster the merge target is a transactional
table format and the body of ``_merge`` becomes a MERGE INTO against it —
``foreachBatch`` + MERGE is the canonical exactly-once streaming-upsert
recipe (Spark docs, Structured Streaming programming guide). The dedup
math is identical either way.

Note the fold semantics: batches merge IN ARRIVAL ORDER, so two same-batch
near-duplicates dedup against each other while cross-batch ones dedup
against the already-merged store — exactly the reference's one-record-at-a-
time ``add_record`` semantics, generalized to batch-sized steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from bambooai_spark.operators.memory import upsert_with_dedup


def stream_upsert(
    stream: DataFrame,
    initial: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    rank_col: str,
    threshold: float = 0.94,
    min_rank: int = 6,
    available_now: bool = True,
) -> DataFrame:
    """Fold a (bounded) stream of records into the memory table with the
    batch MERGE per micro-batch. Returns the post-merge table after the
    stream drains (``available_now=False`` instead returns the live
    StreamingQuery — stop it, then read the merge target).
    ``localCheckpoint`` truncates the per-batch lineage the same way the
    iterative operators do."""
    holder = {"df": initial.localCheckpoint(eager=True)}

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        holder["df"] = upsert_with_dedup(
            holder["df"],
            batch_df,
            id_col=id_col,
            vec_col=vec_col,
            rank_col=rank_col,
            threshold=threshold,
            min_rank=min_rank,
        ).localCheckpoint(eager=True)

    writer = stream.writeStream.foreachBatch(_merge)
    if not available_now:
        # continuous trigger: hand back the live query — the fold result
        # is only meaningful once the caller stops the stream; trigger()
        # rejects availableNow=False and awaiting would block forever
        return writer.start()
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return holder["df"]
