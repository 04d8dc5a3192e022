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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_corpus_manifest.json"
# underscore prefix → invisible to spark.read.parquet(corpus_path), so the
# ledger can live inside the corpus directory without polluting reads
LEDGER_DIR = "_fingerprints"


def _fs(spark: SparkSession, path: str):
    """Hadoop FileSystem + Path for ``path`` — ONE bookkeeping API for
    plain local paths, ``file://``, ``hdfs://`` and ``s3a://`` URIs, so
    the manifest/ledger live wherever the corpus parquet lives. (The
    former ``os.path``/``open`` bookkeeping silently skipped ledger
    seeding on any URI — even ``file://`` — then crashed writing the
    manifest after the data append.)"""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _fs_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = _fs(spark, path)
    return bool(fs.exists(jpath))


def _fs_read_text(spark: SparkSession, path: str) -> str:
    fs, jpath = _fs(spark, path)
    stream = fs.open(jpath)
    try:
        # commons-io ships on Spark's classpath
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, jpath = _fs(spark, path)
    out = fs.create(jpath, True)  # overwrite
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _join(path: str, name: str) -> str:
    """URI-safe child path (os.path.join would break scheme URIs)."""
    return path.rstrip("/") + "/" + name


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

    from pyspark.errors import AnalysisException  # noqa: PLC0415

    try:
        manifest = build_manifest(
            df.sparkSession, path,
            partition_by=partition_by, token_col=token_col,
        )
    except AnalysisException:
        # an empty df writes only _SUCCESS — no footer to read a schema
        # from; the manifest is legitimately empty
        manifest = _empty_manifest(
            df.sparkSession, partition_by, token_col, source_df=df
        )
    _write_manifest_json(df.sparkSession, path, partition_by, manifest.collect())
    return manifest


def _write_manifest_json(spark: SparkSession, path: str, partition_by, rows) -> None:
    _fs_write_text(
        spark,
        _join(path, MANIFEST_NAME),
        json.dumps(
            {
                "partition_by": list(partition_by),
                "partitions": [
                    r.asDict() if hasattr(r, "asDict") else dict(r)
                    for r in rows
                ],
            },
            indent=2,
            default=str,
        ),
    )


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


def _empty_manifest(
    spark: SparkSession,
    partition_by,
    token_col: str | None,
    source_df: DataFrame | None = None,
) -> DataFrame:
    """Typed empty manifest; partition columns copy the SOURCE df's types
    (a LONG shard key must not come back STRING on the empty path)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    fields = []
    for c in partition_by:
        dt = (
            source_df.schema[c].dataType
            if source_df is not None and c in source_df.columns
            else StringType()
        )
        fields.append(StructField(c, dt))
    fields += [
        StructField("n_rows", LongType()),
        StructField("n_files", LongType()),
        StructField("n_bytes", LongType()),
    ]
    if token_col:
        fields.append(StructField("n_tokens", LongType()))
    return spark.createDataFrame([], StructType(fields))


def append_corpus(
    new_docs: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...] = ("lang",),
    id_col: str = "doc_id",
    text_col: str = "text",
    max_records_per_file: int | None = 100_000,
    token_col: str | None = None,
    full_manifest: bool = False,
) -> DataFrame:
    """Incremental corpus update — the batch twin of the streaming ingest:
    drop arriving documents whose exact fingerprint already exists in the
    corpus (or repeats within the batch, min-id wins; fully identical rows
    collapse to one), append only the survivors, refresh the manifest.
    Returns the updated manifest.

    Dedup against history goes through a FINGERPRINT LEDGER — a narrow
    (fp-only) parquet relation under ``<path>/_fingerprints`` — so at
    100 TB the anti-join reads a ledger that is a tiny fraction of corpus
    bytes instead of re-fingerprinting every stored document. The ledger
    directory's underscore prefix keeps it invisible to corpus reads. A
    pre-ledger corpus gets its ledger SEEDED from the corpus text once
    (the fps are written, not just read — otherwise the second append
    would dedup against a ledger missing every original document).
    One shuffle on the fingerprint key (batch-side groupBy + left_anti);
    the corpus itself is never rewritten — parquet append only.

    Manifest cost: by default the append merges the batch's per-partition
    row/token deltas into the existing manifest JSON — O(batch), with
    ``n_files``/``n_bytes`` dropped from the merged entries (they would
    need a corpus scan). Pass ``full_manifest=True`` (or call
    :func:`build_manifest`) for the exact O(corpus) rebuild.
    """
    from bambooai_spark.functions.text import fingerprint  # noqa: PLC0415
    from bambooai_spark.operators.dedup import exact_dedup  # noqa: PLC0415

    spark = new_docs.sparkSession
    ledger_path = _join(path, LEDGER_DIR)

    ledger_exists = _fs_exists(spark, ledger_path)
    if not ledger_exists and _fs_exists(spark, path):
        from pyspark.errors import AnalysisException  # noqa: PLC0415

        try:
            # seed a pre-ledger corpus's ledger COMPLETELY, once
            spark.read.parquet(path).select(
                fingerprint(text_col, normalize=True).alias("fp")
            ).write.parquet(ledger_path)
            ledger_exists = True
        except AnalysisException:
            pass  # dir holds no data files (empty write_corpus) — no history

    # within-batch exact dedup: exact_dedup's min-id representative per
    # fingerprint; dropDuplicates collapses fully identical rows the
    # min-id join would keep
    keep = exact_dedup(new_docs, text_col, id_col, normalize=True).select(
        F.col("fp").alias("_fp"), F.col("keep_id").alias(id_col)
    )
    batch = (
        new_docs.withColumn("_fp", fingerprint(text_col, normalize=True))
        .join(keep, [id_col, "_fp"])
        .dropDuplicates(["_fp"])
    )

    if ledger_exists:
        from pyspark.errors import AnalysisException  # noqa: PLC0415

        try:
            hist = spark.read.parquet(ledger_path).select(
                F.col("fp").alias("_fp")
            )
            batch = batch.join(hist, "_fp", "left_anti")
        except AnalysisException:
            pass  # ledger dir holds only _SUCCESS (empty first append)

    # two consumers (corpus append + ledger append) — materialize once
    batch = batch.localCheckpoint(eager=True)

    writer = batch.drop("_fp").write.mode("append")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_by).parquet(path)
    batch.select(F.col("_fp").alias("fp")).write.mode("append").parquet(
        ledger_path
    )

    if full_manifest:
        manifest = build_manifest(
            spark, path, partition_by=partition_by, token_col=token_col
        )
        _write_manifest_json(spark, path, partition_by, manifest.collect())
        return manifest

    # O(batch) delta merge: aggregate only the appended rows, fold into
    # the existing manifest JSON
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col:
        aggs.append(F.sum(F.col(token_col)).cast("long").alias("n_tokens"))
    delta = {
        tuple(r[c] for c in partition_by): r.asDict()
        for r in batch.groupBy(*partition_by).agg(*aggs).collect()
    }
    existing: dict[tuple, dict] = {}
    mpath = _join(path, MANIFEST_NAME)
    if _fs_exists(spark, mpath):
        loaded = json.loads(_fs_read_text(spark, mpath))
        for p in loaded.get("partitions", []):
            existing[tuple(p[c] for c in partition_by)] = dict(p)
    for key, d in delta.items():
        cur = existing.setdefault(
            key, {c: v for c, v in zip(partition_by, key)}
        )
        cur["n_rows"] = int(cur.get("n_rows") or 0) + d["n_rows"]
        if token_col:
            cur["n_tokens"] = (
                int(cur.get("n_tokens") or 0) + (d.get("n_tokens") or 0)
            )
        # file/byte counts need a corpus scan — dropped in delta mode
        cur.pop("n_files", None)
        cur.pop("n_bytes", None)
    rows = [existing[k] for k in sorted(existing)]
    # uniform keys across rows (delta-touched entries dropped file/byte
    # counts; untouched ones may still carry them)
    all_keys = sorted({k for r in rows for k in r}, key=str)
    rows = [{k: r.get(k) for k in all_keys} for r in rows]
    _write_manifest_json(spark, path, partition_by, rows)
    if not rows:
        # an entirely-empty batch against an empty corpus
        return _empty_manifest(
            spark, partition_by, token_col, source_df=new_docs
        )
    return spark.createDataFrame(rows)
