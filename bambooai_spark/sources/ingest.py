"""Ingestion operators (reference A1, A3, A4).

- ``load_csv_with_datetime`` — the reference's primary ingest path
  (web_app/app.py:205-223): read CSV with header+inferSchema, then
  best-effort coerce every string column to timestamp. The reference tries
  ``pd.to_datetime`` per column and keeps the column unchanged if parsing
  fails; here the probe is ONE wide aggregate over all string columns
  (count unparseable non-nulls), then a single ``withColumns`` cast — two
  scans total regardless of column count, both pushed to the CSV reader.
- ``aux_datasets_to_string`` — bounded 5-row previews
  (bambooai/utils.py:135-188): ``limit(n)`` pushes into the scan; for
  parquet only the first row group is read, for CSV only the head split.
- ``get_aux_datasets_columns`` — header-only schema scan
  (utils.py:205-250): parquet footers via pyarrow, CSV first line — no
  Spark job, no data read.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# timestamp shapes the reference's coercion accepts (app.py:211 parses
# '%Y-%m-%d %H:%M:%S%z' then falls back to pandas' general parser; Spark's
# to_timestamp covers ISO forms; date-only columns coerce via to_date).
_TS_CANDIDATES = ("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss")


def _try_ts(c):
    """NULL-on-failure timestamp parse (ANSI mode makes to_timestamp throw)."""
    return F.try_to_timestamp(c)


def _try_date(c):
    return F.call_function("try_to_date", c)


def _coercible_string_cols(df: DataFrame, cols: list[str]) -> dict[str, str]:
    """One wide agg: for each string column, count non-null values that fail
    timestamp and date parsing. A column coerces iff zero failures (and at
    least one success) — mirroring the reference's all-or-nothing
    try/except per column."""
    aggs = []
    for c in cols:
        v = F.col(c)
        ts_fail = F.sum(
            F.when(v.isNotNull() & _try_ts(v).isNull(), 1).otherwise(0)
        ).alias(f"_tsf_{c}")
        ts_ok = F.sum(
            F.when(_try_ts(v).isNotNull(), 1).otherwise(0)
        ).alias(f"_tso_{c}")
        d_fail = F.sum(
            F.when(v.isNotNull() & _try_date(v).isNull(), 1).otherwise(0)
        ).alias(f"_df_{c}")
        d_ok = F.sum(F.when(_try_date(v).isNotNull(), 1).otherwise(0)).alias(
            f"_do_{c}"
        )
        aggs += [ts_fail, ts_ok, d_fail, d_ok]
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict[str, str] = {}
    for c in cols:
        if row[f"_tsf_{c}"] == 0 and row[f"_tso_{c}"] > 0:
            out[c] = "timestamp"
        elif row[f"_df_{c}"] == 0 and row[f"_do_{c}"] > 0:
            out[c] = "date"
    return out


def load_csv_with_datetime(
    spark: SparkSession, path: str, *, coerce_datetimes: bool = True
) -> DataFrame:
    """CSV scan + datetime coercion (reference web_app/app.py:205-223).

    Timestamps land tz-naive-as-UTC (session TZ is pinned to UTC —
    session.py), matching the reference's ``utc=True → tz_localize(None)``.
    """
    df = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .option("timestampFormat", _TS_CANDIDATES[0])
        .csv(path)
    )
    if not coerce_datetimes:
        return df
    str_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    if not str_cols:
        return df
    coercions = _coercible_string_cols(df, str_cols)
    for c, kind in coercions.items():
        df = df.withColumn(
            c,
            F.try_to_timestamp(F.col(c)) if kind == "timestamp" else _try_date(F.col(c)),
        )
    return df


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (reference web_app/app.py:226-244); tz handling comes
    from the UTC session timezone, schema from the footer."""
    return spark.read.parquet(path)


def load_jsonl(
    spark: SparkSession, path: str, *, coerce_datetimes: bool = True
) -> DataFrame:
    """JSON-Lines scan with the same datetime coercion as the CSV loader —
    the arrival format of most raw document corpora (one JSON object per
    line; also reads a directory of ``.jsonl``/``.json`` shards). The
    reference reads only CSV/parquet; this is the document-pipeline
    extension: ``load_jsonl → ingest_documents → append_corpus`` is the
    batch twin of the streaming ingest. Schema inference samples the
    data once (JVM-side); string columns that parse fully as
    timestamps/dates coerce exactly like CSV's."""
    df = spark.read.json(path)
    if not coerce_datetimes:
        return df
    str_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
    ]
    if not str_cols:
        return df
    for c, kind in _coercible_string_cols(df, str_cols).items():
        df = df.withColumn(
            c,
            F.try_to_timestamp(F.col(c))
            if kind == "timestamp"
            else _try_date(F.col(c)),
        )
    return df


def _read_head(spark: SparkSession, path: str, num_rows: int) -> DataFrame | None:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        return (
            spark.read.option("header", True)
            .option("inferSchema", True)
            .csv(path)
            .limit(num_rows)
        )
    if ext in (".parquet", ".pq"):
        return spark.read.parquet(path).limit(num_rows)
    if ext in (".jsonl", ".json", ".ndjson"):
        return spark.read.json(path).limit(num_rows)
    return None


def aux_table_name(path: str) -> str:
    """The deterministic ``aux_<sanitized basename>`` table name — ONE
    definition shared by the local sandbox and the executor service so the
    split deployment agrees on ``aux['<name>']`` keys."""
    base = os.path.splitext(os.path.basename(path))[0]
    return "aux_" + "".join(c if c.isalnum() else "_" for c in base)


def load_aux_tables(
    spark: SparkSession, file_paths: list[str]
) -> dict[str, DataFrame]:
    """``name -> DataFrame`` for each loadable auxiliary file, registered
    as temp views under the DETERMINISTIC ``aux_<sanitized basename>``
    name. Shared by the local sandbox (orchestrator aux context) and the
    executor service's api-mode ``/execute`` — the names must agree across
    the split so code generated against ``aux['<name>']`` runs identically
    server-side. Unloadable files are skipped (the preview string carries
    the error to the prompt)."""
    from bambooai_spark.sources.registry import DatasetRegistry  # noqa: PLC0415

    reg = DatasetRegistry(spark)
    tables: dict[str, DataFrame] = {}
    for path in file_paths:
        name = aux_table_name(path)
        try:
            name = reg.register_file(path, name)
            tables[name] = reg.get(name)
        except Exception:  # noqa: BLE001
            continue
    return tables


def aux_datasets_to_string(
    spark: SparkSession, file_paths: list[str], num_rows: int = 5
) -> str:
    """Bounded aux previews with the reference's exact layout
    (utils.py:135-188): numbered ``Path:``/``Head:`` blocks, per-file errors
    inline instead of failing the batch."""
    if not file_paths:
        return "No auxiliary datasets provided."
    blocks = []
    for i, path in enumerate(file_paths, 1):
        try:
            if not os.path.exists(path):
                blocks.append(f"{i}.\nPath: {path}\nError: File not found")
                continue
            head = _read_head(spark, path, num_rows)
            if head is None:
                blocks.append(f"{i}.\nPath: {path}\nError: Unsupported file format")
                continue
            head_str = head.toPandas().to_string(index=False)
            blocks.append(f"{i}.\nPath: {path}\nHead:\n{head_str}")
        except Exception as e:
            blocks.append(f"{i}.\nPath: {path}\nError: {e}")
    return "\n\n".join(blocks)


def get_aux_datasets_columns(file_paths: list[str]) -> str:
    """Header-only column scan (utils.py:205-250) — parquet footer / CSV
    first line; zero Spark jobs, zero data read (O(KB) at any table size)."""
    if not file_paths:
        return "No auxiliary datasets provided."
    blocks = []
    for i, path in enumerate(file_paths, 1):
        ext = os.path.splitext(path)[1].lower()
        try:
            if not os.path.exists(path):
                blocks.append(f"{i}.\nPath: {path}\nError: File not found")
                continue
            if ext == ".csv":
                import csv as _csv

                with open(path, newline="", encoding="utf-8") as fh:
                    columns = next(_csv.reader(fh))
            elif ext in (".parquet", ".pq"):
                columns = pq.ParquetFile(path).schema.names
            else:
                blocks.append(f"{i}.\nPath: {path}\nError: Unsupported file format")
                continue
            blocks.append(f"{i}.\nPath: {path}\nColumns:\n{', '.join(columns)}")
        except StopIteration:
            blocks.append(
                f"{i}.\nPath: {path}\nError: CSV file is empty or has no header"
            )
        except Exception as e:
            blocks.append(f"{i}.\nPath: {path}\nError: {e}")
    return "\n\n".join(blocks)
