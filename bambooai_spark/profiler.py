"""Profiler / sample surface (reference A8, A10-A12) — the bounded-context
operators that feed every LLM prompt. Format parity with the reference
matters (SURVEY M0): prompts were tuned against these exact strings.

Reference semantics reproduced (file:line into /root/reference):
- ``dataframe_summary_to_string`` — bambooai/utils.py:52-86: per column,
  numeric → ``col: numeric(n=..) range=lo-hi mean=m``; categorical →
  ``col: categorical(n=..) unique=u values=[top-3]`` (≤10 uniques) or
  ``samples=[2 values...]``; `` missing=k`` suffix when nulls exist.
- ``dataframe_to_string`` — utils.py:89-133: head rows [25:30) (fallback
  start 1 when the frame is short) + the summary, as one prompt block.
- ``computeDataframeSample`` — utils.py:252-271: first 100 rows.
- ``get_dataframe_columns`` — utils.py:190-203: comma-joined names.
- ``compute_aux_dataset_sample`` HTML sink — utils.py:273-321.
- top-k value_counts — utils.py:77-80.

Scale stance: ONE wide aggregate pass computes every column's stats (the
reference rescans per column); the only per-column jobs are the tiny top-3
value_counts for low-cardinality categoricals. Head/sample/HTML are bounded
``limit``/``offset`` collects — the only places rows reach the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, NumericType


def _is_numeric(df: DataFrame, col: str) -> bool:
    return isinstance(df.schema[col].dataType, NumericType)


def value_counts_topk(df: DataFrame, col: str, k: int = 3) -> DataFrame:
    """Top-k most frequent values (reference utils.py:77-80,
    ``value_counts().head(3)``). Deterministic tie-break on the value."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), col)
        .limit(k)
    )


def _batched_topk(df: DataFrame, cols: list[str], k: int = 3) -> dict[str, list[str]]:
    """Exact top-k frequent values for MANY columns in ONE job: explode each
    row into (col, value) pairs (single column-pruned scan), one shuffle on
    the pair key, per-column row_number window. Replaces the one-job-per-
    column ``value_counts_topk().collect()`` loop, which at 100 TB was one
    full column scan per low-cardinality categorical.

    Values ride as strings (the union needs one type); booleans are mapped
    back to Python's ``True``/``False`` spelling so the profile string is
    byte-identical to the native-value path. Same deterministic tie-break as
    ``value_counts_topk`` (count desc, value asc)."""
    bool_cols = {
        c for c in cols if isinstance(df.schema[c].dataType, BooleanType)
    }
    pairs = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col"),
                            F.col(c).cast("string").alias("value"),
                        )
                        for c in cols
                    ]
                )
            ).alias("p")
        )
        .select("p.col", "p.value")
        .filter(F.col("value").isNotNull())
    )
    w = Window.partitionBy("col").orderBy(F.desc("cnt"), "value")
    top = (
        pairs.groupBy("col", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    out: dict[str, list[tuple[int, str]]] = {}
    for r in top.collect():
        v = r["value"]
        if r["col"] in bool_cols:
            v = {"true": "True", "false": "False"}.get(v, v)
        out.setdefault(r["col"], []).append((r["rn"], v))
    return {c: [v for _rn, v in sorted(vs)] for c, vs in out.items()}


def _batched_first_nonnull(
    df: DataFrame, cols: list[str], n: int = 2, probe_rows: int = 100
) -> dict[str, list]:
    """First ``n`` non-null values per column from ONE bounded
    ``limit(probe_rows)`` collect (replacing a ``limit(2)`` job per column).
    Columns null-heavier than the probe share ONE union-all fallback pass —
    a single action regardless of how many columns are deficient, each leg
    an early-terminating ``filter(isNotNull).limit(n)``. Fallback values
    ride as strings (the union needs one type); the profile formats every
    sample through ``str``, and Spark's string cast matches Python's
    spelling for the non-numeric types that reach this path (string,
    timestamp, date)."""
    out: dict[str, list] = {c: [] for c in cols}
    for row in df.select(*cols).limit(probe_rows).collect():
        for c in cols:
            if len(out[c]) < n and row[c] is not None:
                out[c].append(row[c])
    need = [c for c in cols if len(out[c]) < n]
    if need:
        legs = [
            df.select(
                F.lit(c).alias("col"), F.col(c).cast("string").alias("value")
            )
            .filter(F.col("value").isNotNull())
            .limit(n)
            for c in need
        ]
        u = legs[0]
        for leg in legs[1:]:
            u = u.unionAll(leg)
        for c in need:
            out[c] = []
        for r in u.collect():
            if len(out[r["col"]]) < n:
                out[r["col"]].append(r["value"])
    return out


def dataframe_summary_to_string(
    df: DataFrame, *, max_unique_for_values: int = 10
) -> str:
    """Reference utils.py:52-86 — byte-compatible per-column profile string.

    Three bounded jobs regardless of column count: one wide agg for
    n/nulls/min/max/mean/nunique of every column, one batched top-3
    value_counts over all low-cardinality categoricals, one bounded probe
    for the high-cardinality 2-row samples.
    """
    cols = df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
        if _is_numeric(df, c):
            aggs += [
                F.min(c).cast("double").alias(f"_min_{c}"),
                F.max(c).cast("double").alias(f"_max_{c}"),
                F.avg(F.col(c).cast("double")).alias(f"_mean_{c}"),
            ]
    stats = df.agg(*aggs).collect()[0].asDict()

    lowcard = [
        c
        for c in cols
        if not _is_numeric(df, c)
        and stats[f"_nd_{c}"] <= max_unique_for_values
    ]
    highcard = [
        c
        for c in cols
        if not _is_numeric(df, c) and stats[f"_nd_{c}"] > max_unique_for_values
    ]
    topk = _batched_topk(df, lowcard, 3) if lowcard else {}
    firsts = _batched_first_nonnull(df, highcard, 2) if highcard else {}

    lines = []
    for c in cols:
        n = stats[f"_nn_{c}"]
        missing = stats["_n"] - n
        missing_info = f" missing={missing}" if missing > 0 else ""
        if _is_numeric(df, c):
            if n > 0:
                lines.append(
                    f"{c}: numeric(n={n}) "
                    f"range={stats[f'_min_{c}']:.1f}-{stats[f'_max_{c}']:.1f} "
                    f"mean={stats[f'_mean_{c}']:.1f}{missing_info}"
                )
            else:
                lines.append(f"{c}: numeric all_missing")
        else:
            unique = stats[f"_nd_{c}"]
            if unique <= max_unique_for_values:
                top = topk.get(c, [])
                samples = f" values=[{', '.join(str(v) for v in top)}]"
            else:
                two = firsts.get(c, [])
                samples = f" samples=[{', '.join(str(v) for v in two)}...]"
            lines.append(
                f"{c}: categorical(n={n}) unique={unique}{samples}{missing_info}"
            )
    return "\n".join(lines)


def dataframe_to_string(
    df: DataFrame, num_rows: int = 5, *, order_by: str | None = None
) -> str:
    """Reference utils.py:89-133 — "DF Head" (rows [25:25+num_rows), start 1
    when the frame is short) + "DF Summary" as one prompt block.

    Positional slicing needs an explicit order in Spark; ``order_by`` pins it
    (defaults to the first column so repeat calls show the same rows). The
    length probe is a bounded ``limit().count()`` — never a full count.
    """
    first_row = 25
    probe = first_row + num_rows * 2
    if df.limit(probe + 1).count() < probe:
        first_row = 1
    ordered = df.orderBy(order_by or df.columns[0])
    head_pdf = ordered.offset(first_row).limit(num_rows).toPandas()
    head_string = head_pdf.to_string(index=False)
    return (
        f"DF Head:\n{head_string}\n\n"
        f"DF Summary:\n{dataframe_summary_to_string(df)}"
    )


def dataframe_sample(df: DataFrame, n: int = 100) -> DataFrame:
    """Reference utils.py:252-271 (``df.head(100)``) — bounded sample."""
    return df.limit(n)


def get_dataframe_columns(df: DataFrame, *, with_dtypes: bool = False) -> str:
    """Reference utils.py:190-203; remote variant includes dtypes."""
    if with_dtypes:
        return ", ".join(f"{c} ({t})" for c, t in df.dtypes)
    return ", ".join(df.columns)


def dataframe_to_html(df: DataFrame, max_rows: int = 100) -> str:
    """Reference utils.py:273-321 — bounded HTML preview for the UI."""
    return df.limit(max_rows).toPandas().to_html(index=False)
