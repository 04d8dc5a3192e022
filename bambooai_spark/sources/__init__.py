"""Ingestion sources (reference A1-A5) — CSV/Parquet scans with datetime
coercion, bounded aux previews, header-only schema scans, and the dataset
registry that replaces the reference's df_id LRU cache with the Spark
catalog."""

from bambooai_spark.sources.ingest import (
    load_csv_with_datetime,
    load_jsonl,
    load_parquet,
    aux_datasets_to_string,
    get_aux_datasets_columns,
)
from bambooai_spark.sources.registry import DatasetRegistry

__all__ = [
    "load_csv_with_datetime",
    "load_jsonl",
    "load_parquet",
    "aux_datasets_to_string",
    "get_aux_datasets_columns",
    "DatasetRegistry",
]
