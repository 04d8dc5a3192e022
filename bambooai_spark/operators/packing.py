"""Sequence packing — the concat-and-chunk step that turns a filtered,
deduplicated corpus into fixed-length training windows (GPT-style
pretraining packing: documents are concatenated in a deterministic order
and sliced into ``budget``-token chunks; a document may straddle a chunk
boundary).

This is the last hop of the LLM data pipeline the other operators feed
(dedup → quality filter → sample → PACK): every doc gets its global token
offset inside its stream, from which its chunk id and in-chunk offset are
pure integer arithmetic. Deterministic by construction: (stream, id) order,
integer token counts, no floats.

Scale: one window aggregation PARTITIONED BY the stream columns
(language/source) — streams pack in parallel, no single-partition funnel;
the per-stream exclusive prefix sum is the only shuffle. For one giant
stream, the prefix sum generalizes two-phase exactly like
``functions.ranking.distributed_dense_rank`` (range partition + local
cumsum + per-partition total prefix bridge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def est_bpe_tokens(text_col: str | Column) -> Column:
    """ceil(chars/4) — the common LLM token estimate; identical to
    ``functions.text.token_stats``'s ``est_bpe_tokens`` so packing and
    token accounting agree."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.ceil(F.length(c) / F.lit(4.0)).cast("long")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    budget: int = 2048,
    stream_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Assign every document its packed position: ``(id, streams…, n_tok,
    chunk_id, chunk_offset)`` where ``chunk_id = offset // budget`` and
    ``chunk_offset = offset % budget`` over the exclusive prefix sum of
    token counts in (stream, id) order."""
    n_tok = est_bpe_tokens(text_col).alias("n_tok")
    w = (
        Window.partitionBy(*stream_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = df.select(F.col(id_col), *[F.col(c) for c in stream_cols], n_tok)
    off = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    # integer DIV, not floor(double/) — offsets in a 100 TB corpus flirt
    # with 2^53, where double division starts misrounding
    return base.select(
        id_col, *stream_cols, "n_tok", off.alias("_off")
    ).select(
        id_col,
        *stream_cols,
        "n_tok",
        F.expr(f"_off DIV {int(budget)}").cast("long").alias("chunk_id"),
        (F.col("_off") % F.lit(budget)).cast("long").alias("chunk_offset"),
    )
