"""Embedding operator (reference A16, qa_retrieval.py:14-35 ``vectorize``).

The reference embeds one intent string at a time through an API client.
At pipeline scale the same operator is an Arrow-batched ``mapInPandas``
stage: text batches cross to Python once per Arrow batch, the embedder is
called per batch (amortizing API/model overhead), and the output schema is
declared so Catalyst plans downstream similarity ops normally.

``embedder`` is pluggable: production passes a model/API wrapper taking a
list of strings and returning a list of float vectors. The default is a
deterministic hash-based STUB (no embedding model ships in this container)
— explicitly NOT a semantic embedding, but shape-, norm- and
determinism-correct so the distributed plumbing is fully testable.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

Embedder = Callable[[list[str]], list[list[float]]]


def hash_embedder(dim: int = 64) -> Embedder:
    """Deterministic fake embedder: token hashes folded into ``dim`` buckets,
    L2-normalized. Stable across processes/partitions (md5, no PYTHONHASHSEED
    dependence)."""

    def embed(texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            v = [0.0] * dim
            for tok in (t or "").split():
                h = int.from_bytes(
                    hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
                )
                v[h % dim] += 1.0 if (h >> 8) % 2 == 0 else -1.0
            norm = math.sqrt(sum(x * x for x in v)) or 1.0
            out.append([x / norm for x in v])
        return out

    return embed


def embed_texts(
    df: DataFrame,
    text_col: str,
    *,
    dim: int = 64,
    id_cols: list[str] | None = None,
    embedder: Embedder | None = None,
    out_col: str = "embedding",
) -> DataFrame:
    """text column → ``array<float>`` embedding column via batched
    mapInPandas. Swap ``embedder`` for a real model/API wrapper."""
    ids = id_cols or []
    emb = embedder or hash_embedder(dim)
    out_schema = StructType(
        [df.schema[c] for c in ids]
        + [StructField(out_col, ArrayType(FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[ids].copy() if ids else pd.DataFrame(index=pdf.index)
            out[out_col] = emb(pdf[text_col].fillna("").tolist())
            yield out

    sel = ids + ([text_col] if text_col not in ids else [])
    return df.select(*sel).mapInPandas(run, out_schema)
