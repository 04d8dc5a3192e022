"""Distributed global ranking — removing the single-partition window sort.

A bare ``Window.orderBy(...)`` (no partitionBy) funnels the whole relation
through ONE task — the classic global-rank scalability cliff. The standard
two-phase fix (range-partition + local rank + prefix-sum bridge) is exact:

1. ``repartitionByRange`` on the order keys: partitions are non-overlapping
   ranges and EQUAL KEYS COLOCATE, so no dense-rank tie can span a boundary;
2. rank locally inside each partition (parallel, memory-bounded);
3. bridge partitions with a prefix sum of per-partition distinct-key counts
   — a driver-side array of ``num_partitions`` longs, never row data.

The bridge re-enters the plan as a broadcast hash join of the small
prefix relation (one row per partition), not a ``create_map`` literal —
at cluster partition counts a map literal is a multi-MB plan expression
with O(entries) lookups per row (see ``functions.twophase``).

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
    checkpoint: bool = True,
) -> DataFrame:
    """Exact global ``dense_rank() OVER (ORDER BY order_cols)`` without a
    single-partition sort. Adds ``out_col`` (long, 1-based).

    The only driver materialization is one long per range partition (the
    local distinct-count), independent of row count. NULL order keys sort
    first (Spark's asc default) — match the oracle's NULLS FIRST if they
    can occur.

    The locally-ranked relation is persisted across the count pass and
    the final projection (``repartitionByRange`` re-samples its bounds on
    recompute, so partition ids must be pinned); the output is then
    eagerly localCheckpoint'ed so the cache entry can be released here —
    checkpoint blocks are reference-tracked and reclaimed on GC, unlike
    CacheManager entries which live for the session. ``checkpoint=False``
    keeps the lazy plan inspectable (plan tests); the persisted
    intermediate then stays cached until the caller clears it."""
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.dense_rank().over(w))
        .persist()
    )
    counts = {
        r["_pid"]: r["c"]
        for r in local.groupBy("_pid").agg(F.max("_lr").alias("c")).collect()
    }
    if not counts:
        local.unpersist()
        return df.withColumn(out_col, F.lit(None).cast("long"))
    rows = []
    acc = 0
    for pid in sorted(counts):  # range partitioner: pid order == key order
        rows.append((pid, acc))
        acc += counts[pid]
    bridge = spark.createDataFrame(rows, "_pid INT, _offset LONG")
    out = (
        local.join(F.broadcast(bridge), ["_pid"], "left")
        .withColumn(out_col, (F.col("_lr") + F.col("_offset")).cast("long"))
        .drop("_pid", "_lr", "_offset")
    )
    if checkpoint:
        out = out.localCheckpoint(eager=True)
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
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
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


def grouped_relative_standing(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str | Column],
    *,
    pr_col: str = "percent_rank",
    cd_col: str = "cume_dist",
    num_partitions: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Exact ``percent_rank()`` and ``cume_dist()``
    ``OVER (PARTITION BY groups ORDER BY order)`` that stay parallel on
    few, giant groups — where the plain window is one task per group.

    Both functions are arithmetic on quantities the two-phase bridge
    already provides: pr = (rank − 1) / (n − 1) (0 when n == 1, the SQL
    standard's single-row case) and cd = peers_cumulative / n. Rank and
    the peers-inclusive cumulative count come from local windows after a
    ``repartitionByRange`` on (group, order): ranges are non-overlapping
    and EQUAL KEYS COLOCATE, so a tie on the order expression (an equal
    (group, order) tuple) never spans a partition boundary — local
    ``rank()`` plus the earlier-slices row-count offset is the global
    rank, and the local RANGE-framed count plus the same offset is the
    global peers-cumulative. The bridge is ~#slices rows, broadcast-hash-
    joined (see module docstring).

    Adds ``pr_col`` and ``cd_col`` (double). Divisions are double: both
    operands are exact integers well under 2^53, so the correctly-rounded
    IEEE result is engine-independent. ``checkpoint`` as in
    :func:`distributed_dense_rank` (False keeps the plan inspectable;
    the persisted intermediate then stays cached until the caller clears
    it).
    """
    from bambooai_spark.functions.twophase import (
        grouped_prefix_bridge,
        stream_key,
        with_bridge,
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
        return (
            df.withColumn(pr_col, F.lit(None).cast("double"))
            .withColumn(cd_col, F.lit(None).cast("double"))
            .limit(0)
        )
    wloc = Window.partitionBy("_pid", "_skey").orderBy(*order_cols)
    # rank() ignores the frame; count() takes the default RANGE frame
    # (unbounded preceding → current row), which is exactly the
    # peers-INCLUSIVE cumulative count cume_dist needs
    out = (
        with_bridge(part, bridge)
        .withColumn(
            "_rk", (F.rank().over(wloc) + F.col("_offset")).cast("long")
        )
        .withColumn(
            "_pk",
            (F.count(F.lit(1)).over(wloc) + F.col("_offset")).cast("long"),
        )
        .withColumn(
            pr_col,
            F.when(
                F.col("_total") > 1,
                (F.col("_rk") - F.lit(1)) / (F.col("_total") - F.lit(1)),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(cd_col, F.col("_pk") / F.col("_total"))
        .drop("_pid", "_skey", "_offset", "_total", "_rk", "_pk")
    )
    if checkpoint:
        out = out.localCheckpoint(eager=True)
        part.unpersist()
    return out


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
    prefix, broadcast-joined back, ~#slices rows). The bucket is then
    pure integer arithmetic: with n rows and k buckets the first
    ``n mod k`` buckets take ``n DIV k + 1`` rows (standard SQL NTILE).
    All divisions are integer ``DIV`` — double division starts
    misrounding near 2^53, the same stance as ``packing.pack_sequences``.
    """
    from bambooai_spark.functions.twophase import (
        grouped_prefix_bridge,
        stream_key,
        with_bridge,
    )

    if n_buckets < 1:
        # NTILE(0) raises in ANSI SQL; silently NULL buckets would hide it
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
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
    wloc = Window.partitionBy("_pid", "_skey").orderBy(*order_cols)
    k = int(n_buckets)
    out = (
        with_bridge(part, bridge)
        .withColumn(
            "_rn",
            (F.row_number().over(wloc) + F.col("_offset")).cast("long"),
        )
        .withColumn("_q", F.expr(f"_total DIV {k}"))
        .withColumn("_r", F.col("_total") % F.lit(k))
        # rows covered by the size-(q+1) buckets
        .withColumn("_big", (F.col("_q") + F.lit(1)) * F.col("_r"))
        .withColumn(
            out_col,
            F.when(
                F.col("_rn") <= F.col("_big"),
                F.expr("(_rn - 1) DIV (_q + 1)") + F.lit(1),
            )
            .otherwise(
                # q == 0 makes this branch unreachable (big == total);
                # greatest() keeps the divisor legal anyway
                F.col("_r")
                + F.expr("(_rn - _big - 1) DIV greatest(_q, 1L)")
                + F.lit(1)
            )
            .cast("int"),
        )
        .drop("_pid", "_skey", "_offset", "_total", "_rn", "_q", "_r", "_big")
        .localCheckpoint(eager=True)
    )
    part.unpersist()
    return out
