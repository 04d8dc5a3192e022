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
``concat_ws`` in one of the copies) and the collect → sort → prefix-map
assembly (sorted by (group, partition id); range partitioning guarantees
pid order == key order within a group; an all-NULL aggregate slice
contributes zero).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
) -> tuple[Column, Column] | None:
    """Collect per-(partition, group) totals of ``agg`` and return
    ``(offset, total)`` column expressions for rows of ``part``:
    ``offset`` = the group's running total over all EARLIER partitions
    (exclusive prefix), ``total`` = the group's grand total. Returns
    ``None`` on empty input (no slices — callers keep their typed empty
    paths).

    The map key is ``pid|group-key``: pid is an integer, so splitting at
    the first ``|`` is unambiguous whatever the group key contains.
    """
    totals = part.groupBy(pid_col, key_col).agg(agg.alias("_t")).collect()
    if not totals:
        return None
    acc: dict = {}
    entries: list[Column] = []
    for row in sorted(totals, key=lambda r: (r[key_col], r[pid_col])):
        g = row[key_col]
        entries += [F.lit(f"{row[pid_col]}|{g}"), F.lit(acc.get(g, 0))]
        # an all-NULL slice (e.g. NULL-valued rows only) sums to None —
        # contributes nothing to the running offset
        acc[g] = acc.get(g, 0) + (row["_t"] or 0)
    omap = F.create_map(*entries)
    tmap = F.create_map(*[F.lit(x) for g in sorted(acc) for x in (g, acc[g])])
    offset = omap[F.concat_ws("|", F.col(pid_col), F.col(key_col))]
    total = tmap[F.col(key_col)]
    return offset, total
