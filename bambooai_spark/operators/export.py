"""Sharded JSONL export — the training-consumer egress sink.

The corpus side of this engine is parquet (columnar, transactional —
``operators/writer.py``); the CONSUMERS of a training corpus are tokenizer
and dataloader pipelines that overwhelmingly read newline-delimited JSON
shards in a fixed order. This module writes that handoff format with the
three properties those pipelines assume:

- **Deterministic permutation**: record order is the md5-keyed global
  shuffle from ``operators/shuffle.py`` — independent of input file
  layout, reproducible from the public algorithm alone (seed + id).
- **Deterministic shard bytes**: every shard is exactly ONE file whose
  content is a pure function of (data, seed, n_shards). Hash partitioning
  on the *shard value* sends all rows of a shard to exactly one task (a
  value's hash is a function of the value; collisions only co-locate two
  shards, which ``partitionBy`` then splits into separate directories at
  write), and ``sortWithinPartitions`` fixes the row order inside it — so
  re-running the export yields byte-identical shards.
- **A driver-readable manifest**: one JSON file listing each shard's
  file, row count, and byte size, in read order. O(n_shards) driver work.

Spark shape: ONE exchange — ``shuffle_shards(num_partitions=n_shards)``
hash-partitions on the shard value up front, which satisfies the ranking
window's required distribution (no second exchange) and lands every
shard whole in one task; then a local sort per task. At 100 TB pick
``n_shards`` >> executor count (e.g. 10k): each shard is written
independently, no global sort, no driver row traffic.

Reference parity: the reference's only egress is bounded CSV/HTML previews
(bambooai/utils.py:135-188, df_ontology.py render paths); sharded-corpus
export is net-new scale capability per SURVEY §7.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bambooai_spark.operators.shuffle import shuffle_shards

MANIFEST_NAME = "_export_manifest.json"


def export_jsonl_shards(
    df: DataFrame,
    out_path: str,
    id_col: str,
    *,
    n_shards: int = 16,
    seed: str = "",
    compression: str | None = None,
    keep_pos: bool = False,
    overwrite: bool = False,
) -> dict:
    """Write ``df`` as ``n_shards`` JSONL shard files under
    ``out_path/shard=<i>/`` in the deterministic md5 permutation, plus a
    manifest. Returns the manifest dict.

    ``compression``: Spark codec name (``gzip``, ``zstd``, ...) or None
    for plain text. ``keep_pos=True`` includes each record's 1-based
    position within its shard in the emitted JSON (otherwise order is
    implicit in line order). The shard id itself lives in the directory
    name — ``partitionBy`` never writes partition columns into the data
    files. Null-valued fields ARE emitted (``ignoreNullFields=false``):
    every line carries the full key set, which an additively-evolved
    corpus (history = NULL for later columns) needs for a uniform
    record contract.

    ``id_col`` must be NON-NULL and UNIQUE: the md5 permutation key is a
    function of it, so a NULL id has no shard (detected and raised after
    the write — the rows land in Hive's default-partition directory) and
    duplicate ids tie the intra-shard order, breaking byte determinism
    (not detected — a uniqueness scan would double the job; the corpus
    writers already enforce unique doc ids upstream).

    The manifest is written AFTER the data (a reader that sees the
    manifest sees every shard it lists), with files in shard order — the
    concatenation in manifest order IS the permutation. A CRASHED export
    therefore leaves no manifest and is invisible to manifest-trusting
    readers; re-run it with ``overwrite=True`` to replace the partial
    tree (the default ``False`` refuses to clobber an existing path, so
    two exports can never interleave into one directory).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if id_col not in df.columns:
        raise ValueError(f"id column {id_col!r} not in {df.columns}")
    for c in ("shard", "pos"):
        if c in df.columns:
            raise ValueError(
                f"column {c!r} collides with the export bookkeeping "
                "columns; rename it first"
            )
    spark = df.sparkSession
    sharded = shuffle_shards(
        df, id_col, n_shards=n_shards, seed=seed, num_partitions=n_shards
    )
    out = sharded.sortWithinPartitions("shard", "pos")
    if not keep_pos:
        out = out.drop("pos")  # projection preserves the sort order
    writer = (
        out.write.mode("overwrite" if overwrite else "error")
        .partitionBy("shard")
        .option("ignoreNullFields", "false")
        # static overwrite truncates the WHOLE path: a re-export with
        # fewer shards must not leave stale shard dirs (or the previous
        # manifest) behind, which session-level dynamic mode would
        .option("partitionOverwriteMode", "static")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(out_path)

    manifest = _build_manifest(spark, out_path, n_shards, seed, compression)
    _write_manifest(spark, out_path, manifest)
    return manifest


def _build_manifest(
    spark: SparkSession,
    out_path: str,
    n_shards: int,
    seed: str,
    compression: str | None,
) -> dict:
    """ONE recursive listing (a single streaming RPC on HDFS/S3A — never
    one round-trip per shard, which is 10k RPCs at production shard
    counts), no data reads. Line counts come from one distributed pass
    over the shard files (``spark.read.text``), never ``collect`` of row
    data."""
    jvm_fs, root = _fs(spark, out_path)
    # qualify to match listFiles' fully-qualified status paths
    root_uri = jvm_fs.makeQualified(root).toString().rstrip("/")
    found: dict[int, list] = {}
    it = jvm_fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        # skip files under ANY hidden ancestor (committer _temporary
        # trees nest real-looking shard dirs), not just hidden basenames
        rel = p.toString()[len(root_uri):].lstrip("/")
        if any(part.startswith(("_", ".")) for part in rel.split("/")):
            continue
        parent = p.getParent().getName()
        if parent == "shard=__HIVE_DEFAULT_PARTITION__":
            # NULL ids have no md5 key and no shard — partitionBy banishes
            # those rows here, OUTSIDE every manifest entry. Fail loudly
            # instead of publishing a manifest that silently omits them.
            raise ValueError(
                "export input has rows with a NULL id: they carry no "
                f"shard and landed under {parent}; drop or key them and "
                "re-export"
            )
        if parent.startswith("shard="):
            found.setdefault(int(parent.split("=", 1)[1]), []).append(st)
    shards = []
    for i in range(n_shards):
        data = found.get(i, [])
        if not data:
            # a shard with zero rows writes no directory — record it
            # explicitly so readers don't misread absence as corruption
            shards.append(
                {"shard": i, "file": None, "rows": 0, "bytes": 0}
            )
            continue
        if len(data) != 1:
            raise RuntimeError(
                f"shard={i} has {len(data)} data files; the hash "
                "repartition guarantees exactly one — was the directory "
                "written by something else?"
            )
        st = data[0]
        shards.append(
            {
                "shard": i,
                "file": f"shard={i}/{st.getPath().getName()}",
                "rows": None,  # filled by the distributed count below
                "bytes": int(st.getLen()),
            }
        )
    present = [s for s in shards if s["file"] is not None]
    if present:
        counts = {
            r["f"]: r["n"]
            for r in spark.read.text(
                [f"{out_path}/{s['file']}" for s in present]
            )
            .select(F.input_file_name().alias("f"))
            .groupBy("f")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # input_file_name returns fully-qualified URIs; key once by the
        # unambiguous "shard=<i>/<name>" suffix (O(files), not O(files^2))
        by_suffix = {
            "/".join(f.rsplit("/", 2)[-2:]): n for f, n in counts.items()
        }
        for s in present:
            s["rows"] = by_suffix.get(s["file"], 0)
    return {
        "format": "jsonl",
        "n_shards": n_shards,
        "seed": seed,
        "compression": compression,
        "total_rows": sum(s["rows"] or 0 for s in shards),
        "shards": shards,
    }


def _write_manifest(spark: SparkSession, out_path: str, manifest: dict):
    from bambooai_spark.operators.writer import _fs_write_text_atomic, _join

    _fs_write_text_atomic(
        spark, _join(out_path, MANIFEST_NAME), json.dumps(manifest, indent=1)
    )


def _fs(spark: SparkSession, path: str):
    from bambooai_spark.operators.writer import _fs as writer_fs

    return writer_fs(spark, path)
