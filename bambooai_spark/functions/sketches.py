"""Mergeable sketches — the 100 TB rollup pattern: pre-aggregate a
small sketch per grain (day, partition, shard), store the sketch BYTES
next to the rollup, and answer any coarser-grain question by MERGING
sketches — no re-scan of the raw data, no shuffle of raw keys, bounded
error. Three families, all on Spark 4's Apache DataSketches aggregates
(JVM-side, no Python boundary):

- **HLL** (``hll_*``): COUNT(DISTINCT) by sketch union. ~1.6 % relative
  standard error at the default lgConfigK=12; RSE scales as
  1/sqrt(registers), so each +1 lgk buys ~1.41x at 2x the bytes.
- **KLL** (``kll_*``): quantiles/percentiles by sketch merge — the
  piece ``approx_percentile`` cannot give you, because its state is not
  storable: a stored KLL column answers p50/p95/p99 at ANY coarser
  grain later, without the raw values. Normalized rank error ~0.8 % at
  the default k=800 (ε ≈ 2.296/k^0.9, two-sided PAC per the KLL
  paper); error halves per ~2.2x k at linear byte cost.
- **Theta** (``theta_*``): distinct counts with full SET ALGEBRA —
  union, INTERSECTION, DIFFERENCE. HLL can only union; theta sketches
  keep a hash sample below an adaptive threshold, so |A∩B| and |A\\B|
  are estimable from stored bytes — corpus overlap and contamination
  ESTIMATES between 100 TB corpora without ever joining them. Exact
  (not approximate) while a set's retained entries stay under the
  2^lgk nominal, estimation mode beyond.

HLL/theta building is order- and partitioning-insensitive (registers
keep maxes; theta keeps the k smallest hashes), so their estimates are
deterministic for a given input SET — safe to store, merge across days,
and compare across runs. KLL compaction is randomized BY DESIGN
(SPARK-KLL uses a seeded generator per sketch instance; merges of
differently-built sketches may differ in which retained values
represent a rank) — treat KLL estimates as reproducible only within
the pinned error band, never byte-identical across partitionings.

The reference has no sketch surface (its only distinct is pandas
``nunique``, utils.py:76-84; its only percentile is pandas
``quantile``); this is net-new scale capability per SURVEY §7, the
"novel sketch" operator family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bambooai_spark.numeric import col_of

DEFAULT_LGK = 12  # 2^12 registers ≈ 1.6 % relative standard error
DEFAULT_KLL_K = 800  # ~0.8 % normalized rank error, ~12 kB per sketch


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


# --- KLL: mergeable quantiles ------------------------------------------


def kll_sketch(col: str | Column, k: int = DEFAULT_KLL_K) -> Column:
    """Aggregate: build a KLL quantile sketch (binary) of the column.
    Values are cast to double — one sketch dtype for the whole store, so
    int and float grains merge (the ``_double`` DataSketches family;
    doubles hold every long the testdata or a token count produces
    exactly up to 2^53)."""
    return F.kll_sketch_agg_double(col_of(col).cast("double"), F.lit(k))


def kll_merge(sketch_col: str | Column, k: int = DEFAULT_KLL_K) -> Column:
    """Aggregate: merge previously built KLL sketches into one. ``k``
    sizes the MERGED sketch — keep it equal to the build-time k (merging
    into a smaller k silently widens the error band)."""
    return F.kll_merge_agg_double(col_of(sketch_col), F.lit(k))


def kll_quantile(sketch_col: str | Column, q: float) -> Column:
    """Scalar: the value at normalized rank ``q`` (0..1) of a sketch
    (double). The returned value is always one actually present in the
    input (KLL retains sampled input values, no interpolation)."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile must be in [0, 1], got {q}")
    return F.kll_sketch_get_quantile_double(col_of(sketch_col), F.lit(q))


def kll_rank(sketch_col: str | Column, value: float | Column) -> Column:
    """Scalar: the normalized rank (0..1) of ``value`` in a sketch —
    the inverse of :func:`kll_quantile`; e.g. the fraction of documents
    at or under a token budget. Spark requires the value to be FOLDABLE
    (a literal or constant expression) — a computed column, including a
    composed :func:`kll_quantile`, is rejected at analysis time."""
    v = value if isinstance(value, Column) else F.lit(float(value))
    return F.kll_sketch_get_rank_double(col_of(sketch_col), v)


def kll_n(sketch_col: str | Column) -> Column:
    """Scalar: the exact number of values the sketch has seen (long) —
    KLL tracks n losslessly, so rollup row counts come free with the
    quantiles."""
    return F.kll_sketch_get_n_double(col_of(sketch_col))


def _qname(q: float) -> str:
    """p50 / p99 / p99_9 — a column-safe name for a quantile."""
    s = f"{q * 100:.10g}"
    return "p" + s.replace(".", "_").replace("-", "m")


def quantile_rollup(
    df: DataFrame,
    value_col: str,
    grain_cols: list[str | Column],
    *,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    k: int = DEFAULT_KLL_K,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Per-grain quantile rollup: one row per grain with the KLL sketch
    bytes (store these), the exact row count ``n``, and one ``p..``
    estimate column per requested quantile (serve these). ONE pass,
    map-side partial sketches combine before the grain shuffle."""
    agg = df.groupBy(*grain_cols).agg(
        kll_sketch(value_col, k).alias(sketch_col)
    )
    out = agg.withColumn("n", kll_n(sketch_col))
    for q in quantiles:
        out = out.withColumn(_qname(q), kll_quantile(sketch_col, q))
    return out


def rollup_quantiles(
    rollup: DataFrame,
    group_cols: list[str | Column],
    *,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    k: int = DEFAULT_KLL_K,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Re-aggregate a stored quantile rollup to a coarser grain by
    sketch merge — p50/p95/p99 over any grain combination without the
    raw values. This is what ``approx_percentile`` cannot do: its
    intermediate state is not a storable column."""
    merged = rollup.groupBy(*group_cols).agg(
        kll_merge(sketch_col, k).alias("_m")
    )
    out = merged.withColumn("n", kll_n("_m"))
    for q in quantiles:
        out = out.withColumn(_qname(q), kll_quantile("_m", q))
    return out.drop("_m")


# --- Theta: distinct counts with set algebra ---------------------------


def theta_sketch(col: str | Column, lgk: int = DEFAULT_LGK) -> Column:
    """Aggregate: build a Theta sketch (binary) of the column's values.
    Exact below 2^lgk retained entries, ~1/sqrt(2^lgk) relative error
    in estimation mode beyond."""
    return F.theta_sketch_agg(col_of(col), F.lit(lgk))


def theta_merge(sketch_col: str | Column, lgk: int = DEFAULT_LGK) -> Column:
    """Aggregate: UNION previously built theta sketches into one."""
    return F.theta_union_agg(col_of(sketch_col), F.lit(lgk))


def theta_intersect(sketch_col: str | Column) -> Column:
    """Aggregate: INTERSECT previously built theta sketches — the keys
    present in EVERY input sketch (e.g. users active on all days of the
    grain). No lgk: intersection inherits the tightest input theta."""
    return F.theta_intersection_agg(col_of(sketch_col))


def theta_estimate(sketch_col: str | Column) -> Column:
    """Scalar: the distinct-count estimate of a theta sketch (long)."""
    return F.theta_sketch_estimate(col_of(sketch_col))


def set_overlap(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    *,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Estimate the set relationship between two key columns WITHOUT
    joining them — the scale path for "how much does corpus A overlap
    corpus B" (contamination screening, crawl-snapshot churn, audience
    overlap) at sizes where a distinct-join is a 100 TB shuffle.

    Each side collapses to ONE theta sketch (map-side partial sketches,
    a 1-row shuffle); the pairwise theta union / intersection /
    difference then yield every cell of the Venn diagram from sketch
    bytes alone. Returns one row:
    ``n_left, n_right, n_both, n_either, n_left_only, n_right_only,
    jaccard`` (counts long, jaccard double; NULL jaccard for two empty
    inputs). Estimates are EXACT while each side's distinct count stays
    under 2^lgk — raise ``lgk`` to widen the exact regime, or accept
    ~1/sqrt(2^lgk) relative error beyond it.

    Reference parity: the closest reference capability is the pandas
    ``isin``-based benchmark-contamination check (SURVEY §2; exact and
    single-node); this is the sketch-estimate analog that never moves
    either corpus. For exact small-side contamination the broadcast scan
    in ``operators/dedup.py`` (``contamination_scan``) remains the tool.
    """
    ls = left.agg(theta_sketch(key_col, lgk).alias("_ls"))
    rs = right.agg(theta_sketch(key_col, lgk).alias("_rs"))
    both = F.theta_sketch_estimate(F.theta_intersection("_ls", "_rs"))
    either = F.theta_sketch_estimate(F.theta_union("_ls", "_rs", F.lit(lgk)))
    return (
        ls.crossJoin(rs)
        .select(
            theta_estimate("_ls").alias("n_left"),
            theta_estimate("_rs").alias("n_right"),
            both.alias("n_both"),
            either.alias("n_either"),
            F.theta_sketch_estimate(
                F.theta_difference("_ls", "_rs")
            ).alias("n_left_only"),
            F.theta_sketch_estimate(
                F.theta_difference("_rs", "_ls")
            ).alias("n_right_only"),
            F.when(
                either > 0, both.cast("double") / either.cast("double")
            ).alias("jaccard"),
        )
    )
