"""Distributed global ranking — removing the single-partition window sort.

A bare ``Window.orderBy(...)`` (no partitionBy) funnels the whole relation
through ONE task — the classic global-rank scalability cliff. The standard
two-phase fix (range-partition + local rank + prefix-sum bridge) is exact:

1. ``repartitionByRange`` on the order keys: partitions are non-overlapping
   ranges and EQUAL KEYS COLOCATE, so no dense-rank tie can span a boundary;
2. rank locally inside each partition (parallel, memory-bounded);
3. bridge partitions with a prefix sum of per-partition distinct-key counts
   — a driver-side array of ``num_partitions`` longs, never row data.

Reference parity: the reference re-IDs activities with a pandas
``rank(method='dense')`` over the whole frame (web_app/app.py:354-373); this
computes the identical ranking distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_dense_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    *,
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``dense_rank() OVER (ORDER BY order_cols)`` without a
    single-partition sort. Adds ``out_col`` (long, 1-based).

    The only driver materialization is one long per range partition (the
    local distinct-count), independent of row count. NULL order keys sort
    first (Spark's asc default) — match the oracle's NULLS FIRST if they
    can occur."""
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.dense_rank().over(w))
    )
    # read twice (count pass + final projection) — cache the ranked relation
    # so the range shuffle and per-partition sort run once
    local = local.persist()
    counts = {
        r["_pid"]: r["c"]
        for r in local.groupBy("_pid").agg(F.max("_lr").alias("c")).collect()
    }
    offsets: list[Column] = []
    acc = 0
    for pid in sorted(counts):  # range partitioner: pid order == key order
        offsets += [F.lit(pid), F.lit(acc)]
        acc += counts[pid]
    if not offsets:
        local.unpersist()
        return df.withColumn(out_col, F.lit(None).cast("long"))
    omap = F.create_map(*offsets)
    out = (
        local.withColumn(
            out_col, (F.col("_lr") + omap[F.col("_pid")]).cast("long")
        )
        .drop("_pid", "_lr")
        # the count pass above already materialized the ranked relation into
        # cache; one more map-side pass checkpoints the final projection so
        # the cache can be released HERE instead of living for the session
        # (localCheckpoint blocks are reference-tracked and cleaned when the
        # returned frame is garbage-collected, unlike CacheManager entries)
        .localCheckpoint(eager=True)
    )
    local.unpersist()
    return out
