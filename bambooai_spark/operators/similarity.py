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


def knn_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    query_id,
    k: int = 10,
    n_bits: int = 8,
    seed: int = 42,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate top-k: score only rows whose hyperplane-sign bucket
    matches the query's. At 8 bits this scans ~1/256 of the table (plus the
    same-bucket skew); write the table partitioned by bucket to turn the
    filter into partition pruning."""
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_bits, seed)
    bucketed = df.withColumn("_bkt", lsh_bucket(vec_col, planes))
    q = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_q"), F.col("_bkt").alias("_qbkt")
    )
    scored = (
        bucketed.join(F.broadcast(q), F.col("_bkt") == F.col("_qbkt"))
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
