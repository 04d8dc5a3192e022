"""Similarity search over an embedding column (``array<float>``).

The reference's top-k vector search (qa_retrieval.py:100-144: cosine kNN,
threshold 0.80, rerank) runs against Pinecone/Qdrant with a handful of
records. Here the same semantics run distributed:

- ``knn_brute_force`` — exact top-k: broadcast the query vector, score every
  row JVM-side, ``ORDER BY score DESC LIMIT k``. Catalyst turns that into
  TakeOrderedAndProject — per-partition top-k then a k-row merge on the
  driver; no global sort materialization. This is the 100 TB-safe baseline
  (one scan, no shuffle beyond k rows/partition).
- ``knn_lsh`` — random-hyperplane LSH: deterministic projection matrix →
  sign-bit bucket per row; candidates = rows in the query's bucket (probing
  neighboring buckets raises recall). Scan prunes to matching buckets; if
  the table is written bucketed/partitioned by the signature, partition
  pruning skips the rest entirely.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bambooai_spark.functions.vectors import as_double, cosine, dot
from bambooai_spark.numeric import dec


def _query_df(df: DataFrame, id_col: str, vec_col: str, query_id) -> DataFrame:
    return df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_q")
    )


def knn_brute_force(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    query_id,
    k: int = 10,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Exact cosine top-k against the row identified by ``query_id``."""
    q = _query_df(df, id_col, vec_col, query_id)
    scored = (
        df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .withColumn("_cos", cosine(vec_col, "_q"))
    )
    return (
        scored.orderBy(F.desc("_cos"), F.col(id_col))
        .select(
            id_col,
            *(extra_cols or []),
            F.round("_cos", 6).alias("cosine"),
        )
        .limit(k)
    )


def hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic random-projection matrix (public LSH construction:
    Charikar, STOC'02 — sign of dot with gaussian hyperplanes)."""
    rs = np.random.RandomState(seed)
    return rs.standard_normal((n_bits, dim))


def lsh_bucket(vec_col, planes: np.ndarray):
    """Sign-bit bucket id from the projection matrix (column expression)."""
    v = as_double(vec_col)
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in row]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0
        ).cast("long")
        for row in planes
    ]
    out = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        out = out + F.shiftleft(b, i)
    return out


def _vector_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from the SCHEMA when it's a fixed-size type,
    else from one bounded row (``limit(1)`` — never a full-table job)."""
    rows = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not rows:
        raise ValueError(f"cannot infer dim: {vec_col} table is empty")
    return rows[0]["d"]


def precompute_buckets(
    df: DataFrame,
    vec_col: str,
    *,
    dim: int,
    n_bits: int = 8,
    seed: int = 42,
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """Attach the hyperplane-sign bucket id as a column — run ONCE at ingest
    and write the table ``partitionBy(bucket_col)`` so every later query is
    a partition-pruned scan of ~1/2^n_bits of the data instead of a
    recomputation over the full table."""
    planes = hyperplanes(dim, n_bits, seed)
    return df.withColumn(bucket_col, lsh_bucket(vec_col, planes))


def knn_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    query_id,
    k: int = 10,
    n_bits: int = 8,
    seed: int = 42,
    dim: int | None = None,
    bucket_col: str | None = None,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate top-k: score only rows whose hyperplane-sign bucket
    matches the query's. At 8 bits this scans ~1/256 of the table (plus
    same-bucket skew).

    Scale path: pass ``bucket_col`` pointing at a column written by
    ``precompute_buckets`` (table partitioned by it) — the bucket filter
    becomes partition pruning and nothing is recomputed per query. Without
    it, buckets are computed on the fly (one scan). ``dim`` avoids any
    driver-side inference; when omitted it's read from one ``limit(1)`` row.
    """
    if bucket_col is None:
        if dim is None:
            dim = _vector_dim(df, vec_col)
        bucketed = precompute_buckets(
            df, vec_col, dim=dim, n_bits=n_bits, seed=seed, bucket_col="_bkt"
        )
        bucket_col = "_bkt"
    else:
        bucketed = df
    q = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_q"), F.col(bucket_col).alias("_qbkt")
    )
    scored = (
        bucketed.join(F.broadcast(q), F.col(bucket_col) == F.col("_qbkt"))
        .filter(F.col(id_col) != query_id)
        .withColumn("_cos", cosine(vec_col, "_q"))
    )
    return (
        scored.orderBy(F.desc("_cos"), F.col(id_col))
        .select(id_col, *(extra_cols or []), F.round("_cos", 6).alias("cosine"))
        .limit(k)
    )


def label_centroids(
    df: DataFrame, label_col: str, vec_col: str, *, dim: int
) -> DataFrame:
    """Per-label centroid, one value per (label, dimension) row.

    Explode by position and aggregate with exact decimal sums — deterministic
    at any parallelism (float accumulation order never leaks into results).
    This is the building block for IVF coarse quantization: centroids from a
    sample, then assign + search nearest cells.
    """
    pos = F.explode(F.sequence(F.lit(1), F.lit(dim))).alias("pos")
    flat = df.select(F.col(label_col).alias("label"), pos, as_double(vec_col).alias("_v"))
    val = F.element_at("_v", F.col("pos"))
    return (
        flat.select("label", "pos", dec(val, 7).alias("x"))
        .groupBy("label", "pos")
        .agg(
            F.round(F.sum("x").cast("double") / F.count("x"), 6).alias("centroid")
        )
    )
