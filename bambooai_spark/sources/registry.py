"""Dataset registry — the reference's df_id → DataFrame LRU cache
(web_app/code_executor_api.py:33-65, ``DataFrameCache(max_size=1)``)
replaced by the Spark catalog.

The reference needs a thread-locked single-slot cache because pandas frames
are mutable heap objects. Spark DataFrames are immutable plans over shared
storage, so the registry is just name → DataFrame with temp views for SQL,
``persist()`` for hot tables, and no eviction pressure (unpersist is a
metadata op; blocks drop lazily).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)

from bambooai_spark.sources.ingest import (
    load_csv_with_datetime,
    load_jsonl,
    load_parquet,
)


class DatasetRegistry:
    """Primary + auxiliary table registry (reference A5 upload semantics:
    file → df_id → cache; here file → view name → catalog)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}

    def register(self, df: DataFrame, name: str | None = None, *, persist: bool = False) -> str:
        name = name or f"df_{uuid.uuid4().hex[:8]}"
        if persist:
            df = df.persist()
        df.createOrReplaceTempView(name)
        self._tables[name] = df
        return name

    def register_file(self, path: str, name: str | None = None, *, persist: bool = False) -> str:
        if path.lower().endswith((".parquet", ".pq")):
            df = load_parquet(self.spark, path)
        elif path.lower().endswith((".jsonl", ".json", ".ndjson")):
            df = load_jsonl(self.spark, path)
        else:
            df = load_csv_with_datetime(self.spark, path)
        return self.register(df, name, persist=persist)

    def get(self, name: str) -> DataFrame:
        return self._tables[name]

    def names(self) -> list[str]:
        return sorted(self._tables)

    def drop(self, name: str) -> None:
        df = self._tables.pop(name)
        df.unpersist()
        self.spark.catalog.dropTempView(name)
