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


def quantize_int8(v: str | Column) -> dict[str, Column]:
    """Symmetric per-vector int8 quantization — the standard 4× memory
    reduction for embedding indexes (scale = max|v|/127, q_i =
    round(v_i/scale)). At 100 TB the ANN candidate tables store the int8
    codes + one float scale per row; exact rescoring on the float column
    happens only for the shortlist.

    Pure column expressions (transform + aggregate folds). Zero vectors get
    scale=0 and all-zero codes — dequantizing reproduces them exactly.
    Rounding is HALF_UP via ``round()`` in both Spark and DuckDB, so the
    codes are oracle-exact cross-engine.

    The ``codes`` expression binds ``maxabs`` ONCE per row through a
    single-element ``transform`` (a poor man's let): higher-order
    functions evaluate interpreted, so inlining the max-abs fold into
    the per-element lambda — the naive form — re-runs an O(dim) fold
    for EVERY element, O(dim²) per row (r13 measurement: the dominant
    cost of quantize_embeddings). Same arithmetic per element
    (``x / (maxabs / 127.0)``), so codes are bit-identical."""
    d = as_double(v)
    maxabs = F.aggregate(
        d, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = maxabs / F.lit(127.0)
    codes = F.transform(
        F.array(maxabs),
        lambda m: F.when(
            m > 0,
            F.transform(d, lambda x: F.round(x / (m / F.lit(127.0))).cast("int")),
        ).otherwise(F.transform(d, lambda x: F.lit(0))),
    )[0]
    return {"scale": scale, "codes": codes}


def dequantize_dot(codes_a, scale_a, codes_b, scale_b) -> Column:
    """Dot product in the quantized domain: int code fold × the two scales
    — one multiply per element on 4-byte ints, the cheap first-pass score
    before exact float rescoring."""
    acc = F.aggregate(
        F.zip_with(
            col_of(codes_a),
            col_of(codes_b),
            lambda x, y: (x * y).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return acc.cast("double") * col_of(scale_a) * col_of(scale_b)
