"""Mergeable distinct-count sketches — the 100 TB rollup pattern for
COUNT(DISTINCT): pre-aggregate an HLL sketch per grain (day, partition,
shard), store the sketch BYTES next to the rollup, and answer any
coarser-grain distinct question by UNIONING sketches — no re-scan of the
raw data, no shuffle of raw keys, bounded error (~1.6 % relative
standard error at the default lgConfigK=12; RSE scales as
1/sqrt(registers), so each +1 lgk buys ~1.41x at 2x the bytes —
halving the error costs +2).

Built on Spark 4's Apache DataSketches functions (``hll_sketch_agg``,
``hll_union_agg``, ``hll_sketch_estimate`` — JVM-side aggregates, no
Python boundary). HLL building is order- and partitioning-insensitive
(each register keeps a MAX over hashed values), so sketch estimates are
deterministic for a given input SET — safe to store, merge across days,
and compare across runs. Exact distinct at 100 TB needs a full shuffle
of every key; a stored sketch answers in O(sketch bytes).

The reference has no sketch surface (its only distinct is pandas
``nunique``, utils.py:76-84); this is net-new scale capability per
SURVEY §7, the "novel sketch" operator family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bambooai_spark.numeric import col_of

DEFAULT_LGK = 12  # 2^12 registers ≈ 1.6 % relative standard error


def hll_sketch(col: str | Column, lgk: int = DEFAULT_LGK) -> Column:
    """Aggregate: build an HLL sketch (binary) of the column's values."""
    return F.hll_sketch_agg(col_of(col), F.lit(lgk))


def hll_merge(
    sketch_col: str | Column, *, allow_different_lgk: bool = False
) -> Column:
    """Aggregate: union previously built sketches into one (re-aggregable
    to any coarser grain). Mixed-precision unions ERROR by default —
    a union silently downgrades to the LOWEST lgk involved, so a rollup
    that mixes legacy lgk=12 sketches into an lgk=14 store would quietly
    lose the precision the caller paid for; pass
    ``allow_different_lgk=True`` only when that downgrade is intended
    (e.g. migrating a rollup between precisions)."""
    return F.hll_union_agg(col_of(sketch_col), F.lit(allow_different_lgk))


def hll_estimate(sketch_col: str | Column) -> Column:
    """Scalar: the distinct-count estimate of a sketch (long)."""
    return F.hll_sketch_estimate(col_of(sketch_col))


def distinct_rollup(
    df: DataFrame,
    value_col: str,
    grain_cols: list[str | Column],
    *,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Per-grain sketch rollup: one row per grain with the sketch bytes
    (store these) and its estimate (serve this). ONE pass over the data,
    map-side partial sketches combine before the grain shuffle — the
    write-time half of the pattern. The estimate derives from the stored
    sketch post-aggregation (one sketch build per group, not two)."""
    return df.groupBy(*grain_cols).agg(
        hll_sketch(value_col, lgk).alias(sketch_col)
    ).withColumn(estimate_col, hll_estimate(sketch_col))


def rollup_distinct(
    rollup: DataFrame,
    group_cols: list[str | Column],
    *,
    sketch_col: str = "sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Re-aggregate a stored rollup to a coarser grain by sketch union —
    the read-time half: answers distinct questions over any grain
    combination without touching raw data. Overlapping sets union
    correctly (a key seen on two days counts once), which additive
    counts cannot do."""
    return rollup.groupBy(*group_cols).agg(
        hll_estimate(hll_merge(sketch_col)).alias(estimate_col)
    )
