"""Similarity search over an embedding column (``array<float>``).

The reference's top-k vector search (qa_retrieval.py:100-144: cosine kNN,
threshold 0.80, rerank) runs against Pinecone/Qdrant with a handful of
records. Here the same semantics run distributed:

- ``knn_brute_force`` — exact top-k: broadcast the query vector, score every
  row JVM-side, ``ORDER BY score DESC LIMIT k``. Catalyst turns that into
  TakeOrderedAndProject — per-partition top-k then a k-row merge on the
  driver; no global sort materialization. This is the 100 TB-safe baseline
  (one scan, no shuffle beyond k rows/partition).
- ``knn_lsh`` — random-hyperplane LSH: deterministic projection matrix →
  sign-bit bucket per row; candidates = rows in the query's bucket (probing
  neighboring buckets raises recall). Scan prunes to matching buckets; if
  the table is written bucketed/partitioned by the signature, partition
  pruning skips the rest entirely.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bambooai_spark.functions.vectors import as_double, cosine, dot
from bambooai_spark.numeric import dec


def _conf_bytes(spark, key: str, default: int) -> int:
    """A byte-size conf value ("256m" / "134217728") as an int."""
    try:
        raw = spark.conf.get(key)
    except Exception:
        return default
    if raw is None:
        return default
    raw = str(raw).strip().lower()
    mult = 1
    for suf, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("t", 1 << 40)):
        if raw.endswith(suf + "b"):
            raw, mult = raw[:-2], m
            break
        if raw.endswith(suf):
            raw, mult = raw[:-1], m
            break
    if raw.endswith("b"):
        raw = raw[:-1]
    try:
        return int(raw) * mult
    except ValueError:
        return default


def _scan_is_narrow(df: DataFrame, need: int) -> bool:
    """Whether ``df``'s file scan will plan FEWER than ``need`` tasks —
    decided from the file listing and Spark's own maxSplitBytes/packing
    math (one ``inputFiles()`` call + a stat per file, only when the
    file count alone cannot answer), NOT from
    ``df.rdd.getNumPartitions()``: that call compiles the full physical
    plan to an RDD, measured 40-75 ms of pure driver planning per probe
    — paid once per spread site per query build. Non-file relations
    (checkpoint RDDs, in-memory frames) fall back to the RDD probe.

    The file-count short-circuit is exact, not heuristic: a split packs
    a second file only when ``maxSplitBytes`` exceeds the per-file
    ``openCostInBytes`` charge, which requires ``bytesPerCore`` (total
    over ``minPartitionNum``) above the open cost — and in that regime
    the split count lands at ~``minPartitionNum`` >= cores >= need, so
    ``n_files >= need`` already implies "not narrow" either way."""
    spark = df.sparkSession
    try:
        files = df.inputFiles()
    except Exception:
        files = None
    if files:
        try:
            min_pn_sc = int(spark.conf.get("spark.sql.files.minPartitionNum"))
        except Exception:
            try:
                min_pn_sc = int(
                    spark.conf.get("spark.sql.leafNodeDefaultParallelism")
                )
            except Exception:
                min_pn_sc = spark.sparkContext.defaultParallelism
        if len(files) >= need and need <= min_pn_sc:
            # exact in this regime: a split only packs a second file when
            # bytesPerCore exceeds the open cost, and then the split
            # count lands at ~minPartitionNum >= need; unpacked, splits
            # >= n_files >= need (needs no file stats either way)
            return False
        try:
            import os  # noqa: PLC0415
            from urllib.parse import unquote, urlparse  # noqa: PLC0415

            sizes = []
            for f in files:
                if f.startswith("file:"):
                    sizes.append(
                        os.stat(unquote(urlparse(f).path)).st_size
                    )
                else:
                    from bambooai_spark.operators.writer import (  # noqa: PLC0415
                        _fs,
                    )

                    fs, jp = _fs(spark, f)
                    sizes.append(fs.getFileStatus(jp).getLen())
            open_cost = _conf_bytes(
                spark, "spark.sql.files.openCostInBytes", 4 << 20
            )
            max_pb = _conf_bytes(
                spark, "spark.sql.files.maxPartitionBytes", 128 << 20
            )
            try:
                min_pn = int(spark.conf.get("spark.sql.files.minPartitionNum"))
            except Exception:
                try:
                    min_pn = int(
                        spark.conf.get("spark.sql.leafNodeDefaultParallelism")
                    )
                except Exception:
                    min_pn = spark.sparkContext.defaultParallelism
            total = sum(s + open_cost for s in sizes)
            max_split = min(
                max_pb, max(open_cost, total // max(1, min_pn))
            )
            # mirror FilePartition: chunk each file at maxSplitBytes
            # (length-descending), then pack chunks greedily with the
            # open cost charged per chunk
            chunks = []
            for s in sorted(sizes, reverse=True):
                while s > max_split:
                    chunks.append(max_split)
                    s -= max_split
                chunks.append(s)
            n = cur = 0
            has = False
            for c in chunks:
                if has and cur + c > max_split:
                    n += 1
                    cur = 0
                    has = False
                cur += c + open_cost
                has = True
            if has:
                n += 1
            return n < need
        except Exception:
            pass  # stat failed — fall through to the RDD probe
    return df.rdd.getNumPartitions() < need


def spread_if_narrow(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition on high-cardinality key(s) ONLY when the relation
    has fewer partitions than half the session cores. Row-local stages
    (the r13 ``ivf_assign_exact``/``pq_encode_exact`` rewrites) inherit
    the scan's partitioning; over a single-split local file that is ONE
    task, so the heavy downstream fan-out (the within-cell pair join's
    cosine loop) would run single-core — the old crossJoin+groupBy plans
    only spread it by accident of their join-back exchange. At real
    scale the input is many splits and this is a no-op; keying on the
    id avoids the keyless form's determinism sort (SPARK-23207). The
    narrowness probe reads the file listing, not the compiled RDD —
    see :func:`_scan_is_narrow`."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if _scan_is_narrow(df, max(2, target // 2)):
        return df.repartition(target, *[F.col(k) for k in keys])
    return df


def _query_df(df: DataFrame, id_col: str, vec_col: str, query_id) -> DataFrame:
    return df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_q")
    )


def knn_brute_force(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    query_id,
    k: int = 10,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Exact cosine top-k against the row identified by ``query_id``."""
    q = _query_df(df, id_col, vec_col, query_id)
    scored = (
        df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .withColumn("_cos", cosine(vec_col, "_q"))
    )
    return (
        scored.orderBy(F.desc("_cos"), F.col(id_col))
        .select(
            id_col,
            *(extra_cols or []),
            F.round("_cos", 6).alias("cosine"),
        )
        .limit(k)
    )


def hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic random-projection matrix (public LSH construction:
    Charikar, STOC'02 — sign of dot with gaussian hyperplanes)."""
    rs = np.random.RandomState(seed)
    return rs.standard_normal((n_bits, dim))


def lsh_bucket(vec_col, planes: np.ndarray):
    """Sign-bit bucket id from the projection matrix (column expression)."""
    v = as_double(vec_col)
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in row]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0
        ).cast("long")
        for row in planes
    ]
    out = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        out = out + F.shiftleft(b, i)
    return out


def _vector_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from the SCHEMA when it's a fixed-size type,
    else from one bounded row (``limit(1)`` — never a full-table job)."""
    rows = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not rows:
        raise ValueError(f"cannot infer dim: {vec_col} table is empty")
    return rows[0]["d"]


def precompute_buckets(
    df: DataFrame,
    vec_col: str,
    *,
    dim: int,
    n_bits: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    bucket_prefix: str = "lsh_bucket",
) -> DataFrame:
    """Attach one hyperplane-sign bucket id column PER hash table
    (``{bucket_prefix}_0..{n_tables-1}``) — run ONCE at ingest. At scale,
    materialize each table's (bucket, id, vector) index partitioned by its
    bucket column so a query probes L partition-pruned scans of ~N/2^n_bits
    rows each instead of recomputing signatures over the full table.

    OR-amplification (classic multi-table LSH): a row is a candidate if it
    matches the query in ANY table — recall 1-(1-p^b)^L per neighbor, where
    p = 1-θ/π is the per-bit collision probability. A single table's p^b is
    small for mid-range cosine (measured 0.0-0.2 recall@10 on the synthetic
    clusters); 16 tables lift it to the 0.9+ regime while still scanning a
    vanishing fraction at scale.

    Implementation: ALL n_tables·n_bits projections as ONE numpy matmul per
    Arrow batch (mapInPandas). The column-expression form (one nested
    fold per bit) explodes whole-stage codegen at 64 bits — measured 4.2s
    vs 0.5s for the same work at sf0.1.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    all_planes = np.vstack(
        [hyperplanes(dim, n_bits, seed + t) for t in range(n_tables)]
    )  # (n_tables*n_bits, dim)
    weights = (1 << np.arange(n_bits, dtype=np.int64))  # bit → bucket fold
    bcols = [f"{bucket_prefix}_{t}" for t in range(n_tables)]
    out_schema = StructType(
        list(df.schema.fields) + [StructField(c, LongType()) for c in bcols]
    )

    def run(batches):
        for pdf in batches:
            vecs = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if len(vecs) == 0:
                yield pdf.reindex(columns=pdf.columns.tolist() + bcols)
                continue
            bits = (vecs @ all_planes.T) > 0  # (rows, n_tables*n_bits)
            out = pdf.copy()
            for t in range(n_tables):
                tb = bits[:, t * n_bits : (t + 1) * n_bits]
                out[bcols[t]] = (tb * weights).sum(axis=1).astype("int64")
            yield out

    return df.mapInPandas(run, out_schema)


def knn_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    query_id,
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    dim: int | None = None,
    bucket_prefix: str | None = None,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate top-k: score only rows sharing at least one hash-table
    bucket with the query (multi-table random-hyperplane LSH, Charikar
    STOC'02 + OR-amplification).

    Scale path: ``bucket_prefix`` points at columns written by
    ``precompute_buckets`` (tables partitioned/bucketed by them) — nothing
    recomputed per query, probes prune to matching partitions. Without it,
    signatures are computed on the fly in the same scan. ``dim`` avoids any
    driver-side inference; when omitted it's read from one ``limit(1)`` row.
    """
    if bucket_prefix is None:
        if dim is None:
            dim = _vector_dim(df, vec_col)
        df = precompute_buckets(
            df, vec_col, dim=dim, n_bits=n_bits, n_tables=n_tables, seed=seed,
            bucket_prefix="_bkt",
        )
        bucket_prefix = "_bkt"
    bcols = [f"{bucket_prefix}_{t}" for t in range(n_tables)]
    q = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_q"),
        *[F.col(c).alias(f"_q{c}") for c in bcols],
    )
    any_match = None
    for c in bcols:
        eq = F.col(c) == F.col(f"_q{c}")
        any_match = eq if any_match is None else (any_match | eq)
    scored = (
        df.crossJoin(F.broadcast(q))
        .filter(any_match & (F.col(id_col) != query_id))
        .withColumn("_cos", cosine(vec_col, "_q"))
    )
    return (
        scored.orderBy(F.desc("_cos"), F.col(id_col))
        .select(id_col, *(extra_cols or []), F.round("_cos", 6).alias("cosine"))
        .limit(k)
    )


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str,
    *,
    n_cells: int = 16,
    sample: int = 1024,
    iters: int = 3,
) -> np.ndarray:
    """IVF coarse quantizer: k-means (Lloyd) on a BOUNDED sample, trained
    driver-side in numpy — the standard IVF recipe (train small, assign
    big). Deterministic: init = evenly spaced rows of the first ``sample``
    vectors (no RNG), so retraining yields identical cells."""
    rows = df.select(vec_col).limit(sample).collect()
    if not rows:
        raise ValueError("cannot train IVF centroids: table is empty")
    vecs = np.asarray([np.asarray(r[0], dtype=np.float64) for r in rows])
    idx = np.linspace(0, len(vecs) - 1, num=min(n_cells, len(vecs)), dtype=int)
    cents = vecs[idx].copy()
    for _ in range(iters):
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = vecs[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    *,
    out_col: str = "ivf_cell",
) -> DataFrame:
    """Attach the nearest-centroid cell id (L2) — run ONCE at ingest and
    write partitioned by cell for partition-pruned probes. Vectorized: one
    numpy distance computation per Arrow batch."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = np.asarray(centroids, dtype=np.float64)
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, IntegerType())]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.reindex(columns=pdf.columns.tolist() + [out_col])
                continue
            vecs = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            out = pdf.copy()
            out[out_col] = d.argmin(axis=1).astype("int32")
            yield out

    return df.mapInPandas(run, out_schema)


def knn_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    query_id,
    k: int = 10,
    centroids: np.ndarray | None = None,
    n_cells: int = 16,
    nprobe: int = 4,
    cell_col: str | None = None,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """IVF approximate top-k (the inverted-file ANN scale path): probe only
    the ``nprobe`` cells whose centroids are nearest the query — with the
    table written partitioned by cell, that's nprobe partition-pruned scans
    of ~N/n_cells rows. Scores of returned rows are exact cosines (the
    approximation only restricts WHICH rows are considered, like knn_lsh).
    """
    if centroids is None:
        centroids = train_ivf_centroids(df, vec_col, n_cells=n_cells)
    cents = np.asarray(centroids, dtype=np.float64)
    if cell_col is None:
        df = ivf_assign(df, vec_col, cents, out_col="_cell")
        cell_col = "_cell"
    qrow = df.filter(F.col(id_col) == query_id).select(vec_col).limit(1).collect()
    if not qrow:
        raise ValueError(f"query_id {query_id!r} not found")
    qv = np.asarray(qrow[0][0], dtype=np.float64)
    d = ((cents - qv[None, :]) ** 2).sum(axis=1)
    probe_cells = [int(c) for c in d.argsort()[:nprobe]]
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("_q"))
    scored = (
        df.filter(F.col(cell_col).isin(probe_cells))
        .filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .withColumn("_cos", cosine(vec_col, "_q"))
    )
    return (
        scored.orderBy(F.desc("_cos"), F.col(id_col))
        .select(id_col, *(extra_cols or []), F.round("_cos", 6).alias("cosine"))
        .limit(k)
    )


def md5_centroids(
    df: DataFrame, id_col: str, vec_col: str, n_cells: int
) -> list[list[float]]:
    """Deterministic pseudo-random centroid sample: the vectors of the
    ``n_cells`` rows with the smallest ``(md5(id), id)``; cell id = rank
    in that order. Engine-portable (any SQL engine reproduces the same
    cells), the oracle-reproducible twin of :func:`train_ivf_centroids`.
    Returns plain lists of doubles (storable in JSON metadata)."""
    rows = (
        df.select(F.col(id_col), as_double(vec_col).alias("_v"))
        .withColumn("_m", F.md5(F.col(id_col).cast("string")))
        .orderBy("_m", id_col)
        .limit(n_cells)
        .select("_v")
        .collect()
    )
    if not rows:
        raise ValueError("cannot build IVF cells: table is empty")
    return [[float(x) for x in r["_v"]] for r in rows]


def ivf_assign_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids,
    *,
    out_col: str = "ivf_cell",
) -> DataFrame:
    """Engine-portable nearest-centroid assignment: squared L2 via the
    dot-product expansion ``<v,v> − 2<v,c> + <c,c>`` with cell-id
    tie-break, all in SQL expressions — bit-identical across engines
    where :func:`ivf_assign`'s numpy path is only mathematically equal.
    Costs a broadcast join with an n_cells-row relation instead of one
    vectorized numpy pass; use it when downstream comparison demands
    cross-engine exactness (the oracle specs), numpy otherwise.
    Runs entirely row-local: the centroid table is a literal array of
    ``(cv, cell)`` structs and the argmin is ``array_min`` over the
    per-cell ``struct(d, cell)`` values — ``array_min`` and the
    ``min(struct(...))`` aggregate share one interpreted ordering
    (NULLS-FIRST struct fields, NaN greatest), so this is the former
    crossJoin + min(struct) groupBy + join-back plan with the exchange,
    the SortAggregate pair (min-of-struct has a non-mutable buffer) and
    the join-back broadcast all removed; the per-(row, cell) distance
    arithmetic is the same left-fold expression, so results are
    bit-identical. ``id_col`` stays in the signature for call-site
    compatibility (the assignment no longer needs a key)."""
    del id_col  # row-local now; kept in the signature for callers
    cells = F.array(
        *[
            F.struct(
                F.lit([float(x) for x in c])
                .cast("array<double>")
                .alias("_cv"),
                F.lit(int(i)).cast("int").alias("_cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    v = as_double(vec_col)
    best = F.array_min(
        F.transform(
            cells,
            lambda c: F.struct(
                (dot(v, v) - 2 * dot(v, c["_cv"]) + dot(c["_cv"], c["_cv"]))
                .alias("_d"),
                c["_cell"].alias("_cell"),
            ),
        )
    )
    return df.withColumn(out_col, best["_cell"])


def knn_ivf_md5(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    query_id,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 4,
) -> DataFrame:
    """Oracle-reproducible IVF twin of :func:`knn_ivf` (same role as
    ``dedup.minhash_md5_near_dup`` for LSH): every stage is deterministic
    and engine-portable so DuckDB reproduces the WHOLE inverted-file
    construction, not just recall.

    - centroids = the ``n_cells`` rows with the smallest
      ``(md5(id), id)`` — a deterministic pseudo-random sample; cell id =
      rank in that order;
    - assignment = argmin squared L2 to the centroids via the
      dot-product expansion ``<v,v> - 2<v,c> + <c,c>`` (sequential-fold
      dots in both engines), ties broken by cell id;
    - probe set = the ``nprobe`` cells whose centroids are nearest the
      query, same metric and tie-break;
    - scores of probed rows are exact cosines; top-k by
      ``(cosine DESC, id)``.

    Production keeps the Lloyd-trained quantizer + numpy Arrow batches
    (:func:`train_ivf_centroids`/:func:`ivf_assign`); this twin trades
    quantizer quality for cross-engine byte-exactness. The only driver
    materialization is the ``n_cells`` centroid rows."""
    spark = df.sparkSession
    cents = md5_centroids(df, id_col, vec_col, n_cells)
    cdf = F.broadcast(
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)],
            "_cell INT, _cv ARRAY<DOUBLE>",
        )
    )

    def dist(a, b):  # squared L2 via the expansion — matches the oracle
        return dot(a, a) - 2 * dot(a, b) + dot(b, b)

    # ONE assignment implementation (ivf_assign_exact) — the expression
    # is oracle-parity-critical, so it must not exist in two copies
    va = ivf_assign_exact(
        df.select(F.col(id_col), F.col(vec_col)), id_col, vec_col, cents,
        out_col="_cell",
    ).select(F.col(id_col), as_double(vec_col).alias("_v"), "_cell")
    # probe-cell scan + exact cosine runs on va's partitioning (row-local
    # assignment keeps the scan's single local split — spread it)
    va = spread_if_narrow(va, id_col)
    q = _query_df(df, id_col, vec_col, query_id)
    probe = (
        cdf.crossJoin(q)
        .withColumn("_d", dist("_cv", "_q"))
        .orderBy("_d", "_cell")
        .limit(nprobe)
        .select("_cell")
    )
    scored = (
        va.join(F.broadcast(probe), "_cell")
        .filter(F.col(id_col) != query_id)
        .crossJoin(q)
        .withColumn("_cos", cosine("_v", "_q"))
    )
    return (
        scored.orderBy(F.desc("_cos"), F.col(id_col))
        .select(id_col, F.round("_cos", 6).alias("cosine"))
        .limit(k)
    )


def label_centroids(
    df: DataFrame, label_col: str, vec_col: str, *, dim: int
) -> DataFrame:
    """Per-label centroid, one value per (label, dimension) row.

    Explode by position and aggregate with exact decimal sums — deterministic
    at any parallelism (float accumulation order never leaks into results).
    This is the building block for IVF coarse quantization: centroids from a
    sample, then assign + search nearest cells.
    """
    pos = F.explode(F.sequence(F.lit(1), F.lit(dim))).alias("pos")
    flat = df.select(F.col(label_col).alias("label"), pos, as_double(vec_col).alias("_v"))
    val = F.element_at("_v", F.col("pos"))
    return (
        flat.select("label", "pos", dec(val, 7).alias("x"))
        .groupBy("label", "pos")
        .agg(
            F.round(F.sum("x").cast("double") / F.count("x"), 6).alias("centroid")
        )
    )


def cluster_profile(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    centroids=None,
    n_cells: int = 16,
    assign: str = "numpy",
) -> DataFrame:
    """Per-cluster corpus profile — the curation signal behind
    cluster-balanced data mixing (the SemDeDup/DoReMi-family recipe of
    clustering a corpus to weight or prune domains): assign every vector
    to its nearest centroid and report, per cluster, the member count
    and the mean cosine of members to their centroid (coherence — a
    low-coherence cluster is a grab-bag the quantizer failed to
    separate; a tiny high-coherence one is near-duplicate mass).

    Returns ``(cell, n, coherence)`` sorted by cell. The mean is an
    exact decimal sum over per-member cosines rounded to 7 decimals
    (the ``label_centroids`` determinism recipe) so the result is
    stable at any parallelism, and — with ``assign="exact"`` +
    :func:`md5_centroids` — replays hash-exact in any SQL engine.

    100 TB story: one assignment pass (Arrow-batched numpy, or the
    broadcast-expansion join for the exact path), one groupBy on the
    cell id with map-side partials. Nothing is ever pairwise.
    """
    if centroids is None:
        centroids = train_ivf_centroids(df, vec_col, n_cells=n_cells)
    cents = [[float(x) for x in c] for c in np.asarray(centroids)]
    if assign == "exact":
        assigned = ivf_assign_exact(
            df.select(F.col(id_col), F.col(vec_col)), id_col, vec_col,
            cents, out_col="_cell",
        )
    else:
        assigned = ivf_assign(
            df.select(F.col(id_col), F.col(vec_col)), vec_col,
            np.asarray(cents, dtype=np.float64), out_col="_cell",
        )
    spark = df.sparkSession
    cdf = F.broadcast(
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)],
            "_cell INT, _cv ARRAY<DOUBLE>",
        )
    )
    # the per-member cosine loop is the heavy stage and runs pre-exchange
    # on the assignment's partitioning (one split locally — spread it)
    scored = spread_if_narrow(assigned, id_col).join(cdf, "_cell").select(
        "_cell", dec(F.round(cosine(vec_col, "_cv"), 7), 7).alias("_cos")
    )
    return (
        scored.groupBy("_cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum("_cos").cast("double") / F.count(F.lit(1)), 6
            ).alias("coherence"),
        )
        .select(F.col("_cell").alias("cell"), "n", "coherence")
        .orderBy("cell")
    )
