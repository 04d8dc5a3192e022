"""Aggregation operators (SURVEY §2.B "Aggregations").

Reference semantics reproduced:
- ``compute_dataframe_index_function`` (ttl:444-462, yaml:25-43): per-group
  agg dict {first, min, max, |max-min|, mean} → ``group_index``.
- column statistics / profile (utils.py:52-86) → ``summary_stats``.
- correlation (yaml:1339) and linregress slope (ttl:346-348) → exact
  closed-form versions over decimal sums (deterministic at any parallelism;
  the built-in ``corr``/``regr_slope`` accumulate doubles and drift with
  partitioning).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bambooai_spark.numeric import col_of, dec, epoch_us


def group_index(
    df: DataFrame,
    group_by: str,
    *,
    first_by_ts: dict[str, str] | None = None,
    ts_col: str | None = None,
    range_cols: list[str] | None = None,
    mean_cols: list[str] | None = None,
    scale: int = 2,
) -> DataFrame:
    """Per-group index row — the reference's canonical group-by-agg-dict
    (ttl:444-462): first-by-time attributes, time span, |max-min| ranges,
    means, and row count.

    ``first`` in pandas depends on row order; here it's ``min_by(col, ts)``
    (deterministic given unique (group, ts)). One shuffle, all aggregates in
    a single pass (partial aggregation map-side).
    """
    aggs: list[Column] = []
    for out, src in (first_by_ts or {}).items():
        aggs.append(F.min_by(src, ts_col).alias(out))
    if ts_col:
        aggs += [
            F.min(epoch_us(ts_col)).alias(f"first_{ts_col}_us"),
            F.max(epoch_us(ts_col)).alias(f"last_{ts_col}_us"),
            F.round(
                (F.max(epoch_us(ts_col)) - F.min(epoch_us(ts_col)))
                / F.lit(1000000.0),
                6,
            ).alias("duration_sec"),
        ]
    for c in range_cols or []:
        aggs.append(
            (F.max(dec(c, scale)) - F.min(dec(c, scale)))
            .cast("double")
            .alias(f"{c}_range")
        )
    for c in mean_cols or []:
        aggs.append(
            F.round(F.sum(dec(c, scale)).cast("double") / F.count(c), 6).alias(
                f"avg_{c}"
            )
        )
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return df.groupBy(group_by).agg(*aggs)


def summary_stats(df: DataFrame, numeric_cols: list[str], scale: int = 2) -> DataFrame:
    """Per-column profile: rows×(count, nulls, min, max, mean, distinct) —
    the reference's ``dataframe_summary_to_string`` numeric path
    (utils.py:69-74) as ONE aggregate pass + a tiny unpivot.

    The wide agg computes every column's stats in a single scan (the
    reference rescans per column); the union-of-selects runs on the 1-row
    aggregate result, so it's free.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in numeric_cols:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.min(c).cast("double").alias(f"_min_{c}"),
            F.max(c).cast("double").alias(f"_max_{c}"),
            F.sum(dec(c, scale)).cast("double").alias(f"_sum_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
        ]
    wide = df.agg(*aggs)
    parts = [
        wide.select(
            F.lit(c).alias("column_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nn_{c}").alias("n_nonnull"),
            (F.col("_n") - F.col(f"_nn_{c}")).alias("n_null"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
            F.round(F.col(f"_sum_{c}") / F.col(f"_nn_{c}"), 6).alias("mean_value"),
            F.col(f"_nd_{c}").alias("n_distinct"),
        )
        for c in numeric_cols
    ]
    return reduce(DataFrame.unionByName, parts)


def exact_corr(
    df: DataFrame, x: str, y: str, *, scale: int = 2, out_scale: int = 6
) -> DataFrame:
    """Pearson correlation from exact decimal moments (yaml:1339).

    corr = (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²)) with every Σ
    an exact decimal — the only fp ops are the final scalar arithmetic, which
    is deterministic on identical inputs. Single pass, no shuffle beyond the
    global agg.
    """
    dx, dy = dec(x, scale), dec(y, scale)
    s = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return s.select(F.round(num / den, out_scale).alias(f"corr_{x}_{y}"))


def regr_slope_exact(
    df: DataFrame,
    group_by: str,
    x_int: Column,
    y: str,
    *,
    y_scale: int = 2,
    out_scale: int = 9,
    out_col: str = "slope",
    min_n: int = 2,
) -> DataFrame:
    """Per-group OLS slope (the reference's HR-drift ttl:346-348,
    scipy.stats.linregress) from exact integer/decimal sums:
    slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²).

    ``x_int`` must be an integer column expression (e.g. elapsed seconds) so
    Σx, Σxx stay exact; y is decimal-cast. One shuffle on the group key.
    """
    dy = dec(y, y_scale)
    dx = x_int.cast("decimal(18,0)")
    s = df.groupBy(group_by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
    )
    n = F.col("n")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        s.filter(n >= min_n)
        .select(group_by, F.round(slope, out_scale).alias(out_col))
    )


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[Column, str]],
    *,
    salts: int = 16,
    salt_src: str | Column | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation: groupBy(keys + salt) partial →
    groupBy(keys) final. Semantics identical to a direct groupBy — the
    point is physical: a hot key's rows land in ``salts`` different reduce
    partitions in stage 1, so no single task receives the whole key.
    (AQE skew handling covers joins; aggregation skew still needs salting.)

    Only decomposable aggregates are supported: each value of ``aggs`` is
    ``(stage1_expr, combiner)`` where combiner ∈ {"sum", "min", "max"}
    re-aggregates the partials (COUNT combines with "sum"). Means should be
    expressed as (sum, count) and divided at the edge (numeric.py policy
    does anyway).

    ``salt_src``: column hashed into the salt (deterministic; defaults to
    ``spark_partition_id()`` which spreads uniformly without reading data).
    """
    _COMBINE = {"sum": F.sum, "min": F.min, "max": F.max}
    for name, (_, comb) in aggs.items():
        if comb not in _COMBINE:
            raise ValueError(f"{name}: combiner {comb!r} not decomposable")
    if salt_src is None:
        salt = F.spark_partition_id() % salts
    else:
        salt = F.pmod(F.xxhash64(col_of(salt_src)), F.lit(salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return partial.groupBy(*group_cols).agg(
        *[
            _COMBINE[comb](name).alias(name)
            for name, (_, comb) in aggs.items()
        ]
    )
