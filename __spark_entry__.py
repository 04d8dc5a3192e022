"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are generated from
``bambooai_spark.suite.SPECS`` — every implemented operator from
SURVEY.md §2 (plus the BASELINE-mandated dedup/similarity/text operators)
is one spec holding the PySpark builder and its DuckDB oracle SQL side by
side, with a shared deterministic numeric policy (bambooai_spark/numeric.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bambooai_spark import suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return suite.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the same parquet
    views. Keys absent here (minhash/simhash/LSH-ANN) are probabilistic or
    hash-function-specific and get the rows-only check."""
    return suite.oracle_sql()
