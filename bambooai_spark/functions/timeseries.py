"""Window / time-series operators (SURVEY §2.B "Window / time-series").

Reference semantics reproduced (file:line cites into /root/reference):
- rolling mean over fixed row counts — ontology ttl:510-516 (FTP = 1200-row
  rolling mean), ttl:536-541 (mean-max curve), yaml:309-310 (MA20/MA50).
- cumulative sum per group — web_app/app.py:381-383.
- pct_change — default_prompts.yaml:308.
- elapsed time within group — ttl:329.
- fixed-width segmentation with incomplete-trailing-bucket → NULL —
  ttl:589-648 (determine_segments_function).
- dense re-ranking of IDs by first timestamp — web_app/app.py:354-373.
- session windows / as-of joins are rebuild extensions (SURVEY §2.B notes,
  §4 item 3), natural for the telemetry domain.

All operators partition by a key column — at 100 TB the window shuffle is the
dominant cost, so every op takes an explicit ``partition_by`` and reuses one
``Window`` spec; downstream ops over the same key reuse the same shuffle
(Spark reuses the exchange when the partitioning matches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from bambooai_spark.caching import track
from bambooai_spark.numeric import col_of, dec, epoch_us


def _ordered_window(partition_by, order_by) -> WindowSpec:
    pb = [partition_by] if isinstance(partition_by, (str, Column)) else list(partition_by)
    ob = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    return Window.partitionBy(*pb).orderBy(*ob)


def rolling_mean(
    value: str | Column,
    partition_by,
    order_by,
    n_rows: int,
    *,
    centered: bool = False,
    scale: int = 2,
    out_scale: int = 6,
) -> Column:
    """Rolling mean over the trailing ``n_rows`` rows (reference ttl:510-516).

    ``centered=True`` matches pandas ``rolling(center=True)`` (ttl:338-339).
    Exact decimal sum / window count → deterministic across partitionings.
    """
    if centered:
        frame = (-(n_rows // 2), n_rows - n_rows // 2 - 1)
    else:
        frame = (-(n_rows - 1), 0)
    w = _ordered_window(partition_by, order_by).rowsBetween(*frame)
    return F.round(
        F.sum(dec(value, scale)).over(w).cast("double")
        / F.count(col_of(value)).over(w),
        out_scale,
    )


def rolling_mean_max(
    df: DataFrame,
    value: str,
    partition_by: str,
    order_by: str,
    n_rows: int,
    scale: int = 2,
) -> DataFrame:
    """Mean-max: the max over the partition of the n-row rolling mean
    (reference ttl:536-541 — best 20-min power etc.)."""
    rolled = rolling_mean(value, partition_by, order_by, n_rows, scale=scale)
    return (
        df.withColumn("_rolled", rolled)
        # incomplete leading windows excluded, as the reference's rolling()
        # yields NaN for the first n-1 rows
        .withColumn(
            "_rn", F.row_number().over(_ordered_window(partition_by, order_by))
        )
        .filter(F.col("_rn") >= n_rows)
        .groupBy(partition_by)
        .agg(F.max("_rolled").alias(f"mean_max_{value}"))
    )


def calculate_pace(
    df: DataFrame,
    speed_col: str,
    activity_col: str,
    *,
    run: str = "run",
    swim: str = "swim",
    ride: str = "ride",
    out_col: str = "pace",
) -> DataFrame:
    """Per-sport conditional pace column (reference ttl:352-388,
    calculate_pace_function) — the §2.B masked-assignment operator.

    Exact reference semantics: drop rows with speed<=0 or null activity;
    run → 1000/(speed·60) min/km, swim → 100/(speed·60) min/100m,
    ride → speed·3.6 km/h, other activities → NULL; drop null/<=0 pace.
    The pandas ``df.loc[mask, 'pace'] = ...`` chain collapses to one
    ``when/otherwise`` expression — no UDF, single pass.
    """
    s, a = F.col(speed_col), F.lower(F.col(activity_col))
    pace = (
        F.when(a == run.lower(), F.lit(1000.0) / (s * 60))
        .when(a == swim.lower(), F.lit(100.0) / (s * 60))
        .when(a == ride.lower(), s * 3.6)
        .otherwise(F.lit(None))
    )
    return (
        df.filter((s > 0) & F.col(activity_col).isNotNull())
        .withColumn(out_col, pace)
        .filter(F.col(out_col).isNotNull() & (F.col(out_col) > 0))
    )


def cumulative_sum(
    value: str | Column, partition_by, order_by, *, scale: int = 2, out_scale: int = 2
) -> Column:
    """Running total per group (reference web_app/app.py:381-383)."""
    w = _ordered_window(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return F.round(F.sum(dec(value, scale)).over(w).cast("double"), out_scale)


def pct_change(
    value: str | Column, partition_by, order_by, *, out_scale: int = 6
) -> Column:
    """value / lag(value) - 1 (reference yaml:308, daily returns).

    A zero previous value yields NULL (``try_divide``), not ±inf/ANSI error
    — pandas would give inf; NULL is the portable policy (SQL mirror:
    ``NULLIF(lag(value), 0)``) and what downstream aggregation wants.

    Rounding goes through an intermediate 9-dp decimal: Spark's round()
    on a raw double rounds the SHORTEST decimal representation (via
    BigDecimal.valueOf), so a quotient a hair below a tie (…74999…) rounds
    UP while engines that round the true binary value round down — observed
    at sf0.1. At 9 dp both representations coincide, making the final
    6-dp round engine-portable (SQL mirror: ROUND(CAST(x AS
    DECIMAL(18,9)), 6)).
    """
    w = _ordered_window(partition_by, order_by)
    prev = F.lag(col_of(value), 1).over(w)
    raw = F.try_divide(col_of(value), prev) - 1
    return F.round(raw.cast("decimal(18,9)"), out_scale).cast("double")


def elapsed_seconds(ts: str | Column, partition_by, *, out_scale: int = 6) -> Column:
    """Seconds since the group's first timestamp (reference ttl:329).

    Integer epoch-micros subtraction then one double division — exact.
    """
    pb = [partition_by] if isinstance(partition_by, (str, Column)) else list(partition_by)
    w = Window.partitionBy(*pb)
    return F.round(
        (epoch_us(ts) - F.min(epoch_us(ts)).over(w)) / F.lit(1000000.0), out_scale
    )


def determine_segments(
    df: DataFrame,
    measure: str | Column,
    partition_by: str,
    segment_width: float,
    *,
    out_col: str = "segment_id",
) -> DataFrame:
    """Fixed-width bucketing with the reference's incomplete-trailing-bucket
    rule (ttl:589-648): ``segment = floor(measure / width)``, NULL when the
    segment index reaches ``floor(group_max / width)`` (the trailing partial
    segment is not a complete segment).

    The reference does this with ``groupby().apply``; here it collapses to
    two window-free expressions plus one partition-only window — no UDF,
    single shuffle on the group key.
    """
    m = col_of(measure)
    w = Window.partitionBy(partition_by)
    seg = F.floor(m / F.lit(segment_width))
    complete = F.floor(F.max(m).over(w) / F.lit(segment_width))
    return df.withColumn(out_col, F.when(seg < complete, seg).otherwise(F.lit(None)))


def dense_reid_by_first_ts(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    *,
    out_col: str = "new_id",
    max_broadcast_ids: int = 1_000_000,
) -> DataFrame:
    """Re-number IDs 1..n by each ID's first timestamp (reference
    web_app/app.py:354-373, transform_sweatstack_longitudinal_data).

    Aggregates to one row per ID before ranking, so the ranking relation
    is |distinct ids| rows, not |rows|. The reference's use (dozens of
    athlete activities) makes that relation tiny, so the default path is
    a global window over it plus a broadcast join back — but a LIBRARY
    caller re-IDing a high-cardinality key would funnel 100M ids through
    one sort task and then OOM the driver broadcasting them, so the
    per-id relation is counted first (exact — one count job over the
    persisted aggregate BOTH paths need anyway, cheaper than a separate
    probe scan of the raw input) and above ``max_broadcast_ids`` the rank
    routes through the two-phase range-partition bridge
    (:func:`bambooai_spark.functions.ranking.distributed_dense_rank`) and
    rejoins with an ordinary shuffle join. Both paths are exact and both
    emit ``out_col`` as LONG (the output type must not flip at the scale
    transition); the guard makes the call eager — the price of picking a
    physical plan from the data. The small path's ranked relation is
    pinned with an eager ``localCheckpoint`` (bounded at
    ``max_broadcast_ids`` rows; the two-phase path checkpoints
    internally) so the groupBy is not recomputed per downstream action.
    """
    firsts = (
        df.groupBy(id_col).agg(F.min(ts_col).alias("_first_ts")).persist()
    )
    try:
        if firsts.count() > max_broadcast_ids:
            from bambooai_spark.functions.ranking import (
                distributed_dense_rank,
            )

            ranked = distributed_dense_rank(
                firsts, ["_first_ts", id_col], out_col=out_col
            ).drop("_first_ts")
            return df.join(ranked, id_col)
        # persist + eager materialize, NOT localCheckpoint: checkpoint
        # blocks have no recompute path, so an executor loss (dynamic
        # allocation, spot instances) would permanently fail every later
        # action on the join — persist recomputes on block loss (review
        # r8). track() registers the bounded entry for release_caches().
        ranked = track(
            firsts.withColumn(
                out_col,
                F.dense_rank()
                .over(Window.orderBy("_first_ts", id_col))
                .cast("long"),
            )
            .drop("_first_ts")
            .persist()
        )
        ranked.count()
        return df.join(F.broadcast(ranked), id_col)
    finally:
        firsts.unpersist()


SEMICIRCLE_TO_DEG = 180.0 / 2**31  # reference web_app/app.py:393


def normalize_longitudinal(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    ts_col: str,
    speed_col: str,
    duration_col: Column | None = None,
    semicircle_cols: tuple[str, ...] = (),
    order_tiebreak: str | None = None,
    new_id_col: str = "new_id",
    distance_col: str = "distance",
) -> DataFrame:
    """The reference's full ingest-normalization pipeline
    (transform_sweatstack_longitudinal_data, web_app/app.py:343-401):

    1. dense re-ID of ``id_col`` within each ``group_col`` by first
       timestamp (app.py:354-373) — rank over the aggregated per-id
       relation, broadcast back;
    2. per-(group, id) running distance = cumsum(speed·duration)
       (app.py:381-383);
    3. semicircle → degrees unit conversion (app.py:393, ×180/2³¹);

    One shuffle on the group key dominates; the re-ID rank runs on the tiny
    per-id relation, never the raw rows.
    """
    dur = duration_col if duration_col is not None else F.lit(1.0)
    firsts = df.groupBy(group_col, id_col).agg(F.min(ts_col).alias("_first_ts"))
    ranked = firsts.withColumn(
        new_id_col,
        F.dense_rank().over(
            Window.partitionBy(group_col).orderBy("_first_ts", id_col)
        ).cast("long"),
    ).drop("_first_ts")
    out = df.join(F.broadcast(ranked), [group_col, id_col])
    ob = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    w = (
        Window.partitionBy(group_col, id_col)
        .orderBy(*ob)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn(
        distance_col, F.round(F.sum(col_of(speed_col) * dur).over(w), 6)
    )
    for c in semicircle_cols:
        out = out.withColumn(f"{c}_deg", F.round(col_of(c) * F.lit(SEMICIRCLE_TO_DEG), 9))
    return out


def sessionize(
    df: DataFrame,
    ts: str,
    partition_by: str,
    gap_seconds: int,
    *,
    order_tiebreak: str | None = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since the
    previous event exceeds ``gap_seconds``. Classic lag + running-sum; one
    shuffle on the partition key. (Streaming equivalent:
    ``session_window(ts, gap)`` — streaming/events.py.)"""
    ob = [ts] + ([order_tiebreak] if order_tiebreak else [])
    w = _ordered_window(partition_by, ob)
    prev = F.lag(epoch_us(ts), 1).over(w)
    new_sess = F.when(
        prev.isNull() | ((epoch_us(ts) - prev) > gap_seconds * 1000000), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(new_sess).over(wsum))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of (most-recent-prior) join: for each left row, attach the right row
    with the greatest ``right_ts <= left_ts`` within the same key.

    Spark-first implementation — the *union-merge* trick (SURVEY §2.B joins):
    union both sides tagged, sort within key by time, and carry the last
    non-null right value forward with ``last(..., ignorenulls=True)``. One
    shuffle on the key, no row explosion — at 100 TB this beats the naive
    join+filter+argmax (which explodes to |left|×|matching right| rows).

    Ties on ``right_ts``: the row with the greatest ``tiebreak`` wins
    (rows sorted so the winner is last before the event).
    """
    lcols = left.columns
    tb = tiebreak or right_value_cols[0]
    r = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tb).alias("_tb"),
        F.struct(*[F.col(c) for c in right_value_cols]).alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c) for c in lcols],
    )
    # order: time, then right rows before left rows at the same instant
    # (<= semantics), then tiebreak so the winning right row is last.
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        "_last_rv", F.last("_rv", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_last_rv.{c}").alias(c) for c in right_value_cols],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int,
) -> DataFrame:
    """Interval (range) join: pair every point row with every interval row
    whose ``[start_ts, end_ts)`` contains ``point_ts`` — no equi-key needed.

    Spark has no native range-join strategy, so a raw ``ts >= start AND
    ts < end`` join plans as BroadcastNestedLoopJoin — O(|points|·|intervals|)
    comparisons, unrunnable at scale. This is the bucketized construction
    instead: quantize time into ``bucket_seconds``-wide bins, explode each
    interval over the bins it covers, map each point to its single bin, and
    equi-join on the bin — a plain shuffled hash/sort-merge join — then
    refine with the exact predicate. Work is O(points + intervals·spanbins +
    true matches). Pick ``bucket_seconds`` ≈ typical interval length so the
    explosion factor stays ~2; hot bins (bursty points) are AQE skew-join
    territory, already on in session.py.

    Column names of the two inputs must be disjoint (pre-select/alias).
    Intervals with ``end_ts <= start_ts`` match nothing and are dropped.
    """
    w_us = int(bucket_seconds) * 1_000_000
    p_bin = F.floor(epoch_us(point_ts) / w_us)
    i_lo = F.floor(epoch_us(start_ts) / w_us)
    # end is exclusive: the last covered bin is the one holding end-1µs
    i_hi = F.floor((epoch_us(end_ts) - 1) / w_us)
    iv = intervals.filter(
        col_of(end_ts) > col_of(start_ts)
    ).withColumn("_bin", F.explode(F.sequence(i_lo, i_hi)))
    pt = points.withColumn("_bin", p_bin)
    return (
        pt.join(iv, on="_bin", how="inner")
        .filter(
            (col_of(point_ts) >= col_of(start_ts))
            & (col_of(point_ts) < col_of(end_ts))
        )
        .drop("_bin")
    )


def multi_grain_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    grains: tuple[str, ...] = ("hour", "day", "month"),
    scale: int = 2,
    materialize: bool = False,
) -> DataFrame:
    """Hypertable-style continuous aggregate: one rollup per time grain,
    where each coarser grain re-aggregates the FINER grain's partials
    instead of rescanning raw rows (count combines by sum; sums stay
    decimal so the chain is bit-identical to aggregating raw data).

    Output: ``grain, bucket_start_us, n_events, total_value`` — one row per
    (grain, bucket). At 100 TB this is the whole point of a hypertable: the
    daily rollup reads |hours| rows, the monthly reads |days|; with
    ``materialize=True`` each level is persisted so the union computes every
    level exactly once (a real deployment would write each level to its own
    table and refresh incrementally).

    ``grains`` must be ordered fine→coarse and be valid ``date_trunc``
    fields; raw rows are only touched by the first.
    """
    level = df.select(
        F.date_trunc(grains[0], col_of(ts_col)).alias("_bucket"),
        F.lit(1).cast("bigint").alias("_n"),
        dec(value_col, scale).alias("_v"),
    ).groupBy("_bucket").agg(
        F.sum("_n").alias("_n"), F.sum("_v").alias("_v")
    )
    out_levels = []
    for i, g in enumerate(grains):
        if i > 0:
            level = (
                level.select(
                    F.date_trunc(g, F.col("_bucket")).alias("_bucket"),
                    "_n",
                    "_v",
                )
                .groupBy("_bucket")
                .agg(F.sum("_n").alias("_n"), F.sum("_v").alias("_v"))
            )
        if materialize and i < len(grains) - 1:
            level = track(level.persist())
        out_levels.append(
            level.select(
                F.lit(g).alias("grain"),
                epoch_us(F.col("_bucket")).alias("bucket_start_us"),
                F.col("_n").alias("n_events"),
                F.round(F.col("_v").cast("double"), scale).alias("total_value"),
            )
        )
    out = out_levels[0]
    for lv in out_levels[1:]:
        out = out.unionByName(lv)
    return out
