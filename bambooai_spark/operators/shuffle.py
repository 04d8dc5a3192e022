"""Deterministic global shuffle for training-data pipelines.

Training runs need the corpus in a reproducible pseudorandom order that is
(a) independent of input file layout, (b) stable across re-runs and engine
versions, and (c) computable without a global sort. The standard trick:
key every record by a cryptographic-ish hash of its id, bucket the keyspace
into shards, and order within a shard by the hash — any reader that walks
shards in order sees the same permutation, and each shard is writable by
one task.

Spark shape: the shard assignment is a pure column expression (no
shuffle); the intra-shard position is one ``row_number`` window over the
shard key — a single hash-partitioned exchange with ``n_shards``-way
parallelism. At 100 TB you pick ``n_shards`` >> executor count (e.g.
10k), write with ``partitionBy("shard")``, and never sort globally.

md5 (not xxhash64) keys the permutation so external systems — including
the DuckDB oracle — can reproduce it from the public algorithm alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bambooai_spark.numeric import col_of


def shard_key(id_col: str | Column, seed: str = "") -> Column:
    """Hex md5 of (seed || id) — the permutation key."""
    return F.md5(F.concat(F.lit(seed), col_of(id_col).cast("string")))


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    *,
    n_shards: int = 16,
    seed: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """→ input columns + (shard, pos): a deterministic global permutation.

    ``shard``: first 8 hex digits of the key mod ``n_shards`` (uniform);
    ``pos``: 1-based rank of the key inside its shard, ties broken by id
    so the permutation is total even under md5 collisions (NOT under
    duplicate ids — a non-unique ``id_col`` leaves tied rows in task
    order; callers needing byte-stable output must feed unique ids).

    ``num_partitions`` pre-partitions on the shard value with that task
    count BEFORE the ranking window — the explicit hash partitioning
    satisfies the window's required distribution, so the plan carries ONE
    exchange instead of two, and every shard lands whole in exactly one
    task (what a one-file-per-shard writer needs). Default None keeps
    the window's own ``spark.sql.shuffle.partitions`` exchange.
    """
    key = shard_key(id_col, seed)
    shard = F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    out = df.withColumn("_key", key).withColumn("shard", shard)
    if num_partitions:
        out = out.repartition(num_partitions, F.col("shard"))
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return out.withColumn(
        "pos", F.row_number().over(w).cast("long")
    ).drop("_key")
