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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


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


def dataframe_summary_to_string(
    df: DataFrame, *, max_unique_for_values: int = 10
) -> str:
    """Reference utils.py:52-86 — byte-compatible per-column profile string.

    One wide agg computes n/nulls/min/max/mean/nunique for every column in a
    single scan; low-cardinality categoricals get a top-3 value_counts each
    (tiny key-limited jobs), high-cardinality ones a 2-row sample.
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
                top = [r[0] for r in value_counts_topk(df, c, 3).collect()]
                samples = f" values=[{', '.join(str(v) for v in top)}]"
            else:
                two = [
                    r[0]
                    for r in df.select(c)
                    .filter(F.col(c).isNotNull())
                    .limit(2)
                    .collect()
                ]
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
