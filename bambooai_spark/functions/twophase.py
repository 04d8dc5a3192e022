"""The two-phase prefix-bridge scaffold, shared.

Several operators remove the "few giant groups = few tasks" window cliff
with the same construction: range-partition on (group, order) so one
group spans many ordered partitions, aggregate locally per
(partition, group) slice, and bridge the slices with a driver-side prefix
of per-slice totals (~#partitions small rows, never row data). Users:
``functions.ranking.grouped_ntile``, ``operators.packing.pack_sequences``
and ``mixture_sample`` (``functions.ranking.distributed_dense_rank`` is
the group-less sibling with its own max-rank bridge).

This module holds the shared, tricky parts so they cannot silently
diverge: the INJECTIVE group key (a JSON-encoded struct — separator
characters inside values collided two distinct streams when this was a
``concat_ws`` in one of the copies) and the collect → sort → prefix
assembly (sorted by (group, partition id); range partitioning guarantees
pid order == key order within a group; an all-NULL aggregate slice
contributes zero).

The bridge re-enters the plan as a BROADCAST HASH JOIN of the small
prefix relation, not a literal ``create_map``: a map literal carries one
entry per (partition, group) slice INSIDE the plan tree, which at
cluster partition counts (tens of thousands) becomes a multi-MB
expression with O(entries) ``GetMapValue`` work per row. The broadcast
relation keeps plan size O(1) and the lookup a hash probe, and its row
count is the same provably-small slice count either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def stream_key(group_cols: tuple[str, ...] | list[str]) -> Column:
    """Single-string group key, injective for arbitrary values (JSON
    escaping) with NULLs kept as their own value — matching
    ``Window.partitionBy``'s NULL group."""
    return F.to_json(
        F.struct(*[F.col(c) for c in group_cols]),
        {"ignoreNullFields": "false"},
    )


def grouped_prefix_bridge(
    part: DataFrame,
    agg: Column,
    *,
    pid_col: str = "_pid",
    key_col: str = "_skey",
) -> DataFrame | None:
    """Collect per-(partition, group) totals of ``agg`` (must aggregate to
    an integer type) and return the SMALL bridge relation
    ``(pid_col, key_col, _offset, _total)``: ``_offset`` = the group's
    running total over all EARLIER partitions (exclusive prefix),
    ``_total`` = the group's grand total. Returns ``None`` on empty input
    (no slices — callers keep their typed empty paths).

    ``part`` must be pinned (persisted or localCheckpoint'ed) by the
    caller: the collect here and the caller's final pass must see the
    same partition ids, and ``repartitionByRange`` re-samples its
    boundaries on recompute.

    Join the result back with :func:`with_bridge` — a broadcast hash
    join, never a plan-embedded map literal (see module docstring).
    """
    totals = part.groupBy(pid_col, key_col).agg(agg.alias("_t")).collect()
    if not totals:
        return None
    acc: dict = {}
    rows: list[tuple] = []
    # None-safe sort key: cross-group order is irrelevant (offsets are
    # per-group), so NULL group keys sort first behind a comparable
    # placeholder — a plain (key, pid) key would TypeError on NULL
    for row in sorted(
        totals,
        key=lambda r: (
            r[key_col] is not None,
            r[key_col] if r[key_col] is not None else 0,
            r[pid_col],
        ),
    ):
        g = row[key_col]
        rows.append((row[pid_col], g, acc.get(g, 0)))
        # an all-NULL slice (e.g. NULL-valued rows only) sums to None —
        # contributes nothing to the running offset
        acc[g] = acc.get(g, 0) + (row["_t"] or 0)
    key_type = part.schema[key_col].dataType
    schema = StructType(
        [
            StructField(pid_col, IntegerType(), False),
            StructField(key_col, key_type, True),
            StructField("_offset", LongType(), False),
            StructField("_total", LongType(), False),
        ]
    )
    # one LOCAL relation with both columns — a bridge⋈totals join of two
    # local frames would plan real (tiny, pure-overhead) shuffle stages
    return part.sparkSession.createDataFrame(
        [(p, g, int(o), int(acc[g])) for p, g, o in rows], schema
    )


def with_bridge(
    part: DataFrame,
    bridge: DataFrame,
    *,
    pid_col: str = "_pid",
    key_col: str = "_skey",
) -> DataFrame:
    """Broadcast-join the bridge relation onto ``part``; every row gains
    ``_offset`` and ``_total``. Null-safe on the group key (a NULL group
    is its own group, as in ``Window.partitionBy``); the pid side is an
    ``Integer`` from ``spark_partition_id`` and never NULL. Every
    (pid, key) slice of ``part`` exists in the bridge by construction, so
    the left join never produces NULL offsets."""
    b = bridge.withColumnRenamed(pid_col, "_bpid").withColumnRenamed(
        key_col, "_bkey"
    )
    cond = (F.col(pid_col) == F.col("_bpid")) & F.col(key_col).eqNullSafe(
        F.col("_bkey")
    )
    return part.join(F.broadcast(b), cond, "left").drop("_bpid", "_bkey")
