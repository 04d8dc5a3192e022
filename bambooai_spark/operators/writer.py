"""Curated-corpus writer — the terminal sink of the LLM data pipeline
(dedup → filter → sample → pack → WRITE): partitioned, size-capped parquet
shards plus a manifest the training dataloader reads instead of listing
the filesystem.

Scale shape: ``partitionBy`` gives one directory per partition value
(language/source/shard), ``maxRecordsPerFile`` splits each into bounded
files WITHOUT a shuffle (the writer rolls files as it streams rows), and
the manifest is computed from one aggregation over the written files'
metadata (``input_file_name()``), not a driver-side directory walk over
what could be millions of shard files. Pair with
``operators.shuffle.shuffle_shards`` for a deterministic global order:
``partition_by=('shard',)`` after sharding yields resumable, evenly-sized
training streams.

The reference has no batch sink beyond per-query CSV harvest
(bambooai/code_executor.py:187-199 generated-dataset listing); this is the
100 TB-mandate counterpart.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_corpus_manifest.json"


def write_corpus(
    df: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...] = ("lang",),
    max_records_per_file: int | None = 100_000,
    mode: str = "overwrite",
    token_col: str | None = None,
) -> DataFrame:
    """Write ``df`` as a partitioned parquet corpus and return (and
    persist alongside it) the manifest: one row per partition value with
    file count, row count, byte size, and (optionally) token totals.

    ``token_col`` — a LONG column to sum per partition (e.g. a
    precomputed ``n_tokens``); omitted → no token totals.
    """
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_by).parquet(path)

    manifest = build_manifest(
        df.sparkSession, path, partition_by=partition_by, token_col=token_col
    )
    rows = [r.asDict() for r in manifest.collect()]  # one row per partition
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(
            {"partition_by": list(partition_by), "partitions": rows},
            fh,
            indent=2,
            default=str,
        )
    return manifest


def build_manifest(
    spark: SparkSession,
    path: str,
    *,
    partition_by: tuple[str, ...] = ("lang",),
    token_col: str | None = None,
) -> DataFrame:
    """Manifest from the written files themselves (re-runnable on any
    existing corpus dir): group by partition columns, count rows and
    DISTINCT data files, and read each file's on-disk size via the
    ``_metadata`` hidden column — aggregation-side, no driver listing."""
    back = spark.read.parquet(path)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.col("_metadata.file_path")).alias("n_files"),
        # each file's size repeats per row; sum one size per distinct file
        F.sum(
            F.when(
                F.col("_metadata.row_index") == 0,
                F.col("_metadata.file_size"),
            ).otherwise(F.lit(0))
        ).alias("n_bytes"),
    ]
    if token_col:
        aggs.append(F.sum(F.col(token_col)).cast("long").alias("n_tokens"))
    cols = [*partition_by, "_metadata"] + ([token_col] if token_col else [])
    return (
        back.select(*cols)
        .groupBy(*partition_by)
        .agg(*aggs)
        .orderBy(*partition_by)
    )
