"""Vector column expressions over ``array<float|double>`` embeddings.

The reference computes cosine similarity driver-side in numpy
(qa_retrieval.py:100-144); here the same math is a JVM-side fold over the
array column — distributable over any number of rows.

Arrays are cast to ``array<double>`` first so the arithmetic is
double-precision end-to-end (matching the DuckDB oracle's
``CAST(v AS DOUBLE[])`` + sequential fold).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bambooai_spark.numeric import col_of


def as_double(v: str | Column) -> Column:
    return col_of(v).cast("array<double>")


def dot(a: str | Column, b: str | Column) -> Column:
    """Sequential left-fold dot product (same order as a scalar loop)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: str | Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
