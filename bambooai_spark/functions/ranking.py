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


def grouped_top_k(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str | Column],
    k: int,
    *,
    out_col: str = "rn",
) -> DataFrame:
    """Exact ``row_number() OVER (PARTITION BY groups ORDER BY order) <= k``
    that stays parallel when the group count is SMALL (the 25-brand /
    5-language case, where ``Window.partitionBy(group)`` collapses to one
    task per group regardless of cluster size).

    Two-phase: a local window per (input partition, group) keeps each
    partition's own top-k — the global top-k is always a subset of the
    union of per-partition top-ks — then the final window ranks only the
    ≤ ``num_partitions · k`` survivors per group. The second exchange
    moves a bounded candidate set, never the relation.

    Adds ``out_col`` (int, 1-based) and returns only rows with
    ``out_col <= k``.
    """
    local = Window.partitionBy(
        "_pid", *group_cols
    ).orderBy(*order_cols)
    survivors = (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrn", F.row_number().over(local))
        .filter(F.col("_lrn") <= k)
        .drop("_lrn")
    )
    final = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        survivors.drop("_pid")
        .withColumn(out_col, F.row_number().over(final))
        .filter(F.col(out_col) <= k)
    )


def grouped_ntile(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str | Column],
    n_buckets: int,
    *,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (PARTITION BY groups ORDER BY order)`` that
    stays parallel on few, giant groups — the case where the plain window
    is one task per group.

    NTILE needs each row's global rank within its group plus the group
    total; both come from the two-phase bridge (range-partition on
    (group, order) → local row_number → per-(partition, group) count
    prefix on the driver, ~#partitions rows). The bucket is then pure
    arithmetic: with n rows and k buckets the first ``n mod k`` buckets
    take ``n div k + 1`` rows (standard SQL NTILE).
    """
    from bambooai_spark.functions.twophase import (
        grouped_prefix_bridge,
        stream_key,
    )

    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        df.repartitionByRange(n, *group_cols, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_skey", stream_key(group_cols))
        .persist()
    )
    bridge = grouped_prefix_bridge(part, F.count(F.lit(1)))
    if bridge is None:
        part.unpersist()
        return df.withColumn(out_col, F.lit(None).cast("int")).limit(0)
    offset, total = bridge
    wloc = Window.partitionBy("_pid", "_skey").orderBy(*order_cols)
    rn = (F.row_number().over(wloc) + offset).cast("long")
    ntot = total.cast("long")
    k = F.lit(int(n_buckets)).cast("long")
    q = F.floor(ntot / k).cast("long")
    r = ntot % k
    big = (q + F.lit(1)) * r  # rows covered by the size-(q+1) buckets
    bucket = F.when(
        rn <= big, F.floor((rn - 1) / (q + 1)) + 1
    ).otherwise(
        # q == 0 makes this branch unreachable (big == ntot); greatest()
        # keeps the divisor legal under ANSI anyway
        r + F.floor((rn - big - 1) / F.greatest(q, F.lit(1))) + 1
    ).cast("int")
    out = (
        part.withColumn(out_col, bucket)
        .drop("_pid", "_skey")
        .localCheckpoint(eager=True)
    )
    part.unpersist()
    return out
