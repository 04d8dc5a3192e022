"""Search-RAG pipeline operators (reference A19,
bambooai/google_search.py:159-190 chunking, :237-259 ranking).

The reference chunks fetched articles into 512-word windows, embeds
question+chunks, ranks by dot product, keeps top-6. The fetch/LLM steps are
driver-side (network); the chunk-and-rank core is a Spark pipeline so the
same ranking runs over a *corpus* (the documents table) instead of six
articles:

- ``chunk_texts``  — fixed-size word-window chunking via slice/posexplode
  (pure JVM, 1:N fan-out).
- ``rank_chunks``  — embed chunks (operators.embed, Arrow-batched), score
  against the question embedding (JVM dot product over a broadcast
  literal), top-k via TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bambooai_spark.operators.embed import Embedder, embed_texts, hash_embedder


def chunk_texts(
    df: DataFrame,
    text_col: str,
    *,
    id_cols: list[str],
    chunk_words: int = 512,
    out_col: str = "chunk",
) -> DataFrame:
    """Split text into fixed-size word windows (reference
    google_search.py:159-190: 512-word chunks). slice+transform+posexplode —
    no UDF; emits (ids…, chunk_idx, chunk, n_chunk_words)."""
    w = F.split(F.col(text_col), r"\s+")
    n_chunks = F.ceil(F.size(w) / F.lit(chunk_words)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    chunks = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.slice(w, i * chunk_words + 1, chunk_words)
        ),
    )
    return df.select(
        *id_cols,
        F.posexplode(chunks).alias("chunk_idx", out_col),
    ).withColumn(
        "n_chunk_words", F.size(F.split(F.col(out_col), r"\s+")).cast("long")
    )


def rank_chunks(
    chunks: DataFrame,
    question: str,
    *,
    chunk_col: str = "chunk",
    id_cols: list[str] | None = None,
    k: int = 6,
    dim: int = 64,
    embedder: Embedder | None = None,
) -> DataFrame:
    """Embed chunks + question, rank by dot product, keep top-k (reference
    google_search.py:237-259, top-6). The question vector is a broadcast
    literal; scoring is a JVM fold; top-k is TakeOrderedAndProject."""
    emb = embedder or hash_embedder(dim)
    ids = id_cols or []
    carry = [c for c in chunks.columns if c != chunk_col]
    embedded = embed_texts(
        chunks, chunk_col, dim=dim, id_cols=carry + [chunk_col], embedder=emb
    )
    qv = emb([question])[0]
    q = F.array(*[F.lit(float(x)) for x in qv])
    score = F.aggregate(
        F.zip_with(F.col("embedding"), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        embedded.withColumn("score", F.round(score, 6))
        .orderBy(F.desc("score"), *ids, "chunk_idx")
        .drop("embedding")
        .limit(k)
    )
