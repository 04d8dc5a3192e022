"""Table loading — the reference's ingestion operators (SURVEY §2.A A1-A5)
re-expressed as ``spark.read`` with explicit schema capture.

Reference behavior being reproduced:
- ``web_app/app.py:205-223`` (CSV scan + datetime coercion) →
  ``spark.read.csv(header, inferSchema)`` + ``to_timestamp``.
- ``web_app/app.py:226-244`` (Parquet scan + tz strip) →
  ``spark.read.parquet`` with session TZ pinned to UTC.

Scale notes: only parquet *footers* are read for schema (pyarrow); data reads
are lazy and columnar so Catalyst prunes columns/partitions. A 100 TB table
is a directory of many files — we inspect a single footer for timestamp-unit
detection, never data.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from bambooai_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _first_parquet_file(path: str) -> str | None:
    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    return os.path.join(root, f)
    return None


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS): Spark surfaces them as raw
    long nanos (with ``nanosAsLong``); we convert them back to timestamps.
    Footer-only read — O(KB) regardless of table size."""
    f = _first_parquet_file(path)
    if f is None:
        return []
    schema = pq.read_schema(f)
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast every ``TIMESTAMP_NTZ`` column to session-zoned ``TIMESTAMP``.

    Parquet ``timestamp[us]`` with ``isAdjustedToUTC=false`` surfaces in
    Spark 4 as ``TIMESTAMP_NTZ``, which ``unix_micros`` (and every epoch-
    based operator downstream) rejects. With the session TZ pinned to UTC
    (session.py), the cast is a pure re-tag — the stored micros value is
    reinterpreted as a UTC instant bit-for-bit, matching DuckDB's
    ``epoch_us`` on the same file. Metadata-only: no data rewrite, the
    parquet scan underneath is unchanged (pushdown/pruning preserved).
    """
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


# (schema, nanos columns) per testdata path — METADATA, not data: the
# tables under a scale-factor dir are immutable fixtures, and
# ``spark.read.parquet`` without a schema runs a footer-inference job on
# EVERY call (measured 78-94 ms; an explicit schema read is ~12 ms).
# Every query builder loads 1-3 tables per build, so the inference tax
# was paid hundreds of times per bench run for the same ten schemas.
_TABLE_META: dict[str, tuple] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with timestamps normalized to TimestampType.

    Nanosecond columns are floored to microseconds with integer division
    (``DIV 1000``) — exactly DuckDB's ns→us truncation, so both engines see
    identical instants. Microsecond NTZ columns are re-tagged as UTC
    timestamps (see ``normalize_timestamps``).
    """
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    got = _TABLE_META.get(path)
    if got is None:
        df = spark.read.parquet(path)
        got = (df.schema, tuple(_nanos_timestamp_columns(path)))
        _TABLE_META[path] = got
    else:
        # the cached schema was inferred under the same runtime confs
        # (nanosAsLong applied above), so the explicit-schema read is
        # bit-identical to re-inferring — it just skips the footer job
        df = spark.read.schema(got[0]).parquet(path)
    for c in got[1]:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return normalize_timestamps(df)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | list[str] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    *,
    path: str | None = None,
    sort: bool = True,
) -> str:
    """Write a bucketed (hash-clustered) catalog table on the join key.

    The 100 TB co-location play: bucket the fact AND its dimension on the
    join key with the same bucket count, and every downstream equi-join on
    that key reads co-partitioned buckets — the per-query shuffle of the
    big table disappears entirely (amortized into the one-time write).
    ``sortBy`` additionally pre-sorts within buckets so sort-merge joins
    skip their sort. Returns the table name.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
    return table
