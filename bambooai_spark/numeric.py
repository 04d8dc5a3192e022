"""Deterministic numeric policy.

Problem: floating-point SUM/AVG depend on accumulation order, which differs
between Spark (partial aggregation across partitions) and any single-node
oracle — and between runs of Spark itself once partitioning changes. At
100 TB that's millions of partials; results must still be reproducible.

Policy (used by every aggregate in the suite):
1. Cast inputs to DECIMAL before SUM — decimal aggregation is exact and
   order-independent, so Spark and DuckDB agree bit-for-bit.
2. Do divisions (means, ratios, slopes) in DOUBLE on the exact decimal sums —
   one deterministic fp op on identical operands yields identical results.
3. ROUND once, at the output edge.

Integer math (counts, epoch micros) is naturally exact; timestamps are
compared as integer epoch micros (``unix_micros``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def col_of(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dec(c: str | Column, scale: int = 2, precision: int = 18) -> Column:
    """Cast to exact decimal. Data with k decimal digits must use scale>=k."""
    return col_of(c).cast(DecimalType(precision, scale))


def dsum(c: str | Column, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent exact sum, surfaced as double."""
    return F.sum(dec(c, scale, precision)).cast("double")


def dmean(c: str | Column, scale: int = 2, out_scale: int = 6) -> Column:
    """Exact-sum mean: decimal SUM / COUNT(col), rounded."""
    return F.round(
        F.sum(dec(c, scale)).cast("double") / F.count(col_of(c)), out_scale
    )


def epoch_us(c: str | Column) -> Column:
    """Timestamp → integer epoch microseconds (exact; matches DuckDB
    ``epoch_us``).

    Defensively casts to ``TIMESTAMP`` first: ``unix_micros`` rejects
    ``TIMESTAMP_NTZ`` (how Spark 4 reads parquet ``timestamp[us]`` with
    ``isAdjustedToUTC=false``), and with the session TZ pinned to UTC the
    cast is an exact re-tag of the same micros value. No-op on columns that
    are already ``TIMESTAMP``."""
    return F.unix_micros(col_of(c).cast("timestamp"))


# --- SQL-side mirrors (string builders keep the DuckDB oracle in sync) ---


def sql_dec(expr: str, scale: int = 2, precision: int = 18) -> str:
    return f"CAST({expr} AS DECIMAL({precision},{scale}))"


def sql_dsum(expr: str, scale: int = 2, precision: int = 18) -> str:
    return f"CAST(SUM({sql_dec(expr, scale, precision)}) AS DOUBLE)"


def sql_dmean(expr: str, scale: int = 2, out_scale: int = 6) -> str:
    return f"ROUND({sql_dsum(expr, scale)} / COUNT({expr}), {out_scale})"
