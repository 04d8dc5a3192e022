"""Semantic memory operators (reference A16-A18, qa_retrieval.py).

The reference's episodic memory writes one record at a time against
Pinecone/Qdrant. Here the same semantics run as set-based Spark jobs over an
embeddings table — the MERGE-style batch form of the reference's
``add_record`` (qa_retrieval.py:146-202):

- new records below ``min_rank`` are dropped (rank gate, :160);
- each surviving new record is matched against its most-similar existing
  record at ``threshold`` (the "strong" threshold, 0.8 + 0.7·0.2 = 0.94 in
  the reference, :162-165);
- strong match & new rank strictly higher → new replaces old (:198-200);
  strong match otherwise → new is dropped (:196);
  no match → new is inserted (:201-202).

Scale: the similarity join is blocked (``block_col`` — cluster label / LSH
bucket from similarity.precompute_buckets), so cost is Σ_block |new_b|·|old_b|,
not |new|·|old|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bambooai_spark.functions.vectors import cosine


def upsert_with_dedup(
    existing: DataFrame,
    new: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    rank_col: str,
    threshold: float = 0.94,
    min_rank: int = 6,
    block_col: str | None = None,
) -> DataFrame:
    """Batch MERGE with semantic dedup — returns the post-merge table
    (same schema as the inputs). See module docstring for the exact
    reference semantics being reproduced."""
    eligible = new.filter(F.col(rank_col) >= min_rank)

    n = eligible.select(
        F.col(id_col).alias("_nid"),
        F.col(vec_col).alias("_nv"),
        F.col(rank_col).alias("_nrank"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    )
    e = existing.select(
        F.col(id_col).alias("_oid"),
        F.col(vec_col).alias("_ov"),
        F.col(rank_col).alias("_orank"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    )
    joined = n.join(e, ["_blk"]) if block_col else n.crossJoin(e)
    pairs = joined.withColumn("_cos", cosine("_nv", "_ov")).filter(
        F.col("_cos") >= threshold
    )
    # the reference consults the single most-similar existing record —
    # deterministic argmax: best cosine, then lowest existing id
    w = Window.partitionBy("_nid").orderBy(F.desc("_cos"), "_oid")
    best = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("_nid", "_oid", "_nrank", "_orank")
    )

    replaces = best.filter(F.col("_nrank") > F.col("_orank"))
    blocked_ids = best.filter(F.col("_nrank") <= F.col("_orank")).select("_nid")

    inserted = eligible.join(
        blocked_ids, eligible[id_col] == blocked_ids["_nid"], "left_anti"
    )
    survivors = existing.join(
        replaces.select("_oid"), existing[id_col] == replaces["_oid"], "left_anti"
    )
    return survivors.unionByName(inserted)
