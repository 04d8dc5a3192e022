"""Persisted IVF vector corpus — the ANN layout that makes 100 TB of
embeddings queryable without scanning them.

The query-time operators (``operators/similarity.py``) assign cells on
the fly; this module makes the inverted file DURABLE: vectors are
written partitioned by their nearest-centroid cell
(``ivf_cell=<n>/...``), the coarse quantizer (centroids + parameters)
is pinned in ``_vector_store.json`` at the store root, and a query
reads ONLY the ``nprobe`` probed cells — at the FileSourceScan level
(``PartitionFilters``), so the other ``n_cells − nprobe`` directories
are never listed, opened, or decoded. Per query that is ~``nprobe/
n_cells`` of the corpus bytes; everything else about the score is
exact (cosines of the probed rows — the approximation only restricts
WHICH rows compete, as in ``knn_ivf``).

Appends assign against the PINNED centroids — an index must never
silently re-cluster under its data (cells would stop matching their
directories); retrain deliberately by rewriting the store.

Build parity: ``assign="numpy"`` (default) uses the vectorized
Arrow-batch assignment; ``assign="exact"`` uses the engine-portable
SQL dot-product expansion with cell-id tie-break, which is what lets
the suite spec verify the WHOLE persisted pipeline (build → layout →
probe → score) against DuckDB when paired with
:func:`~bambooai_spark.operators.similarity.md5_centroids`.

Reference parity: the reference's vector search is a driver-side
top-k over a handful of records (qa_retrieval.py:100-144); this is the
disk-layout scale path its semantics imply at corpus size.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bambooai_spark.functions.vectors import as_double, cosine, dot
from bambooai_spark.operators.pq import (
    pq_adc_score,
    pq_adc_score_joined,
    pq_encode,
    pq_encode_exact,
    pq_lut,
    train_pq_codebooks,
)
from bambooai_spark.operators.similarity import (
    ivf_assign,
    ivf_assign_exact,
    train_ivf_centroids,
)
from bambooai_spark.operators.writer import (
    _fs_delete,
    _fs_exists,
    _fs_read_text,
    _fs_write_text_atomic,
    _join,
)

META_NAME = "_vector_store.json"
CELL_COL = "ivf_cell"
PQ_COL = "pq_code"
REBUILD_FLAG = "_REBUILD.json"


def _load_meta(spark: SparkSession, path: str) -> dict:
    """Store metadata for READERS and incremental writers: refuses while
    a rebuild swap is in flight — mid-swap the cell directories and the
    pinned quantizer disagree, and probing old centroids against new
    cells (or vice versa) silently returns wrong neighbors. Resume with
    :func:`rebuild_vector_store`."""
    if _fs_exists(spark, _join(path, REBUILD_FLAG)):
        raise RuntimeError(
            f"vector store at {path} is mid-rebuild (a prior "
            "rebuild_vector_store crashed during its swap) — run "
            "rebuild_vector_store(spark, path) to resume and complete it"
        )
    return _load_meta_raw(spark, path)


def _load_meta_raw(spark: SparkSession, path: str) -> dict:
    mpath = _join(path, META_NAME)
    if not _fs_exists(spark, mpath):
        staged = mpath + ".new"
        if _fs_exists(spark, staged):
            # a meta replace crashed between delete and rename — the
            # staged copy is complete (it was written atomically);
            # finish the swap rather than brick the store
            from bambooai_spark.operators.writer import _fs  # noqa: PLC0415

            fs, dest = _fs(spark, mpath)
            fs.rename(_fs(spark, staged)[1], dest)
        if not _fs_exists(spark, mpath):
            raise FileNotFoundError(
                f"no vector store at {path} ({META_NAME} missing) — build "
                "one with write_vector_corpus first"
            )
    return json.loads(_fs_read_text(spark, mpath))


def write_vector_corpus(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    centroids=None,
    assign: str = "numpy",
    max_records_per_file: int | None = None,
    bloom_filter_ids: bool = False,
    pq_m: int | None = None,
    pq_ksub: int = 256,
    pq_codebooks=None,
) -> dict:
    """Build (or rebuild) the persisted inverted file: train or accept
    ``centroids``, assign every row, write parquet partitioned by
    ``ivf_cell``, pin the quantizer in the store metadata. Returns the
    metadata dict. OVERWRITES any prior store at ``path`` (retraining
    is deliberate; incremental growth goes through
    :func:`append_vector_corpus`).

    ``bloom_filter_ids`` — write parquet bloom filters on the id column
    (recorded in the metadata so appends keep them): the id predicate
    of :func:`stored_vector` is a data filter over every cell, and the
    bloom lets the reader skip row groups without decoding — the cheap
    fix for that documented full-scan economics.

    ``pq_m`` / ``pq_ksub`` / ``pq_codebooks`` — IVF-PQ: train (or
    accept) per-subspace product-quantization codebooks
    (``operators/pq.py``), encode every row's ``pq_code`` column at
    write time, and pin the codebooks in the metadata; appends and
    rebuilds keep the column. Queries opt in with ``use_pq=True`` to
    ADC-score the probed cells on the m-int code column and touch the
    float vectors only for the rescore shortlist — the memory-scale
    complement to the cell-scale probe pruning."""
    if assign not in ("numpy", "exact"):
        raise ValueError(f"assign must be numpy|exact, got {assign!r}")
    spark = df.sparkSession
    if centroids is None:
        centroids = train_ivf_centroids(df, vec_col, n_cells=n_cells)
    cents = [[float(x) for x in c] for c in np.asarray(centroids)]
    if not cents:
        raise ValueError("no centroids")
    pq_meta = None
    if pq_codebooks is not None or pq_m is not None:
        caller_books = pq_codebooks is not None
        if pq_codebooks is None:
            pq_codebooks = train_pq_codebooks(
                df, vec_col, m=pq_m, ksub=pq_ksub
            )
        books = [
            [[float(x) for x in c] for c in book] for book in pq_codebooks
        ]
        if len(books) * len(books[0][0]) != len(cents[0]):
            raise ValueError(
                f"pq codebooks cover dim {len(books) * len(books[0][0])} "
                f"!= store dim {len(cents[0])}"
            )
        # ksub = ACTUAL codebook size (the ADC index stride);
        # ksub_requested survives separately so a small-corpus training
        # clamp doesn't permanently cap resolution — rebuilds retrain at
        # the requested size once the corpus can support it (review r10)
        pq_meta = {
            "m": len(books),
            "ksub": len(books[0]),
            "ksub_requested": int(
                len(books[0]) if caller_books else pq_ksub
            ),
            "codebooks": books,
        }
    _write_assigned(
        df, path, id_col, vec_col, cents, assign, max_records_per_file,
        mode="overwrite",
        bloom_cols=(id_col,) if bloom_filter_ids else (),
        pq_books=pq_meta["codebooks"] if pq_meta else None,
    )
    meta = {
        "id_col": id_col,
        "vec_col": vec_col,
        "n_cells": len(cents),
        "dim": len(cents[0]),
        "assign": assign,
        "bloom_ids": bool(bloom_filter_ids),
        # pinned column set: appends must match it exactly, or reads
        # (one arbitrary footer decides the schema) silently drop or
        # null the drifted columns — same hazard the corpus writer's
        # drift guard exists for. pq_code is NOT in it: the writer
        # derives it, so appends keep passing raw rows.
        "columns": sorted(df.columns),
        "centroids": cents,
    }
    if pq_meta:
        meta["pq"] = pq_meta
    _rewrite_meta(spark, path, meta)
    return meta


def append_vector_corpus(
    df: DataFrame,
    path: str,
    *,
    max_records_per_file: int | None = None,
) -> dict:
    """Grow the store: assign the new vectors against the PINNED
    centroids (never retrain — the on-disk cells must keep matching
    their quantizer) and append into the cell directories."""
    spark = df.sparkSession
    meta = _load_meta(spark, path)
    if sorted(df.columns) != meta.get("columns", sorted(df.columns)):
        raise ValueError(
            f"append columns {sorted(df.columns)} != the store's pinned "
            f"columns {meta['columns']} — mixed parquet schemas read back "
            "as one arbitrary footer's column set; align the frame or "
            "rebuild the store"
        )
    _write_assigned(
        df, path, meta["id_col"], meta["vec_col"], meta["centroids"],
        meta["assign"], max_records_per_file, mode="append",
        bloom_cols=(meta["id_col"],) if meta.get("bloom_ids") else (),
        pq_books=(meta.get("pq") or {}).get("codebooks"),
    )
    return meta


def _write_assigned(
    df, path, id_col, vec_col, cents, assign, max_records_per_file, *,
    mode, bloom_cols=(), pq_books=None,
):
    schema = {f.name: f for f in df.schema.fields}
    if id_col not in schema or vec_col not in schema:
        raise ValueError(
            f"columns ({id_col!r}, {vec_col!r}) not both present in "
            f"{sorted(schema)}"
        )
    if CELL_COL in schema:
        raise ValueError(f"input already has a {CELL_COL!r} column")
    if pq_books is not None and PQ_COL in schema:
        raise ValueError(f"input already has a {PQ_COL!r} column")
    dim_probe = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if dim_probe and dim_probe[0]["d"] != len(cents[0]):
        raise ValueError(
            f"vector dim {dim_probe[0]['d']} != store dim {len(cents[0])}"
        )
    if assign == "exact":
        assigned = ivf_assign_exact(
            df, id_col, vec_col, cents, out_col=CELL_COL
        )
    else:
        assigned = ivf_assign(
            df, vec_col, np.asarray(cents, dtype=np.float64),
            out_col=CELL_COL,
        )
    if pq_books is not None:
        # same engine-parity split as the cell assignment: the exact
        # path must stay SQL-replayable end-to-end for the oracle spec
        if assign == "exact":
            assigned = pq_encode_exact(
                assigned, id_col, vec_col, pq_books, out_col=PQ_COL
            )
        else:
            assigned = pq_encode(
                assigned, vec_col,
                np.asarray(pq_books, dtype=np.float64), out_col=PQ_COL,
            )
    # static overwrite regardless of session config: under dynamic
    # partition-overwrite a rebuild with fewer cells would leave the
    # dropped cells' directories alive with stale vectors (the same
    # hazard export.py guards)
    writer = assigned.write.mode(mode).option(
        "partitionOverwriteMode", "static"
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if bloom_cols:
        from bambooai_spark.operators.filestats import (  # noqa: PLC0415
            apply_bloom_options,
        )

        writer = apply_bloom_options(writer, bloom_cols)
    writer.partitionBy(CELL_COL).parquet(path)


def probe_cells(
    spark: SparkSession, path: str, query_vec, *, nprobe: int, meta=None
) -> list[int]:
    """The ``nprobe`` cell ids nearest the query — computed with the
    SAME engine-portable expansion + tie-break as the exact assignment
    (one job over the n_cells-row centroid relation, metadata-scale).
    Pass ``meta`` when already loaded — every metadata read is a paid
    GET on an object store (writer.py's load-once rule)."""
    if meta is None:
        meta = _load_meta(spark, path)
    qv = [float(x) for x in query_vec]
    if len(qv) != meta["dim"]:
        raise ValueError(f"query dim {len(qv)} != store dim {meta['dim']}")
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(meta["centroids"])],
        "_cell INT, _cv ARRAY<DOUBLE>",
    )
    q = F.lit(qv)
    d = dot("_cv", "_cv") - 2 * dot("_cv", q) + dot(q, q)
    rows = (
        cdf.withColumn("_d", d).orderBy("_d", "_cell").limit(nprobe).collect()
    )
    return [int(r["_cell"]) for r in rows]


def _where_column(where):
    """Filtered-ANN predicate → Column: a Column passes through, a SQL
    string parses, (col, op, value) triples AND-combine through the
    file-skipping module's builder. Filtering happens BEFORE top-k, so
    the result is the true top-k AMONG matching rows (post-filtering a
    top-k would under-fill it)."""
    from pyspark.sql import Column  # noqa: PLC0415

    if isinstance(where, Column):
        return where
    if isinstance(where, str):
        return F.expr(where)
    from bambooai_spark.operators.filestats import (  # noqa: PLC0415
        normalize_predicates,
        predicate_column,
    )

    # same validation as the corpus readers: a malformed triple or a
    # bad op fails with the contract's ValueError, not a raw KeyError
    return predicate_column(normalize_predicates(where, None))


def query_vector_corpus(
    spark: SparkSession,
    path: str,
    query_vec,
    *,
    k: int = 10,
    nprobe: int = 4,
    exclude_id=None,
    extra_cols: list[str] | None = None,
    where=None,
    use_pq: bool = False,
    refine: int = 4,
) -> DataFrame:
    """Approximate top-k against the persisted store: probe the
    ``nprobe`` nearest cells and read ONLY those partitions (the scan's
    ``PartitionFilters`` carries the cell predicate — the other
    directories are never touched), exact cosines within, top-k by
    ``(cosine DESC, id)``. ``exclude_id`` drops the query row itself
    when querying by a stored vector.

    ``where`` — metadata-filtered ANN (Column, SQL string, or (col, op,
    value) triples over the store's payload columns): the predicate
    applies to the probed rows BEFORE the top-k, so the answer is the
    true top-k among matching rows, and it reaches the parquet scan as
    a pushed filter (row-group stats / blooms skip JVM-side).

    ``use_pq=True`` (stores built with ``pq_m=``) inserts the ADC
    stage: the probed cells are first scored on the m-int ``pq_code``
    column alone — column pruning keeps the wide float vectors out of
    that scan entirely — and only the best ``refine * k`` ids are
    rescored with exact cosines, through an id-IN predicate that
    reaches the parquet scan as a pushed filter (row-group stats +
    the optional id blooms skip most of the probed bytes). The
    returned scores are exact cosines either way; PQ only restricts
    WHICH rows are rescored. ``where``/``exclude_id`` apply BEFORE the
    shortlist, so the answer stays the true top-k among matching rows."""
    meta = _load_meta(spark, path)
    cells = probe_cells(spark, path, query_vec, nprobe=nprobe, meta=meta)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    qv = [float(x) for x in query_vec]
    scan = spark.read.parquet(path).filter(F.col(CELL_COL).isin(cells))
    if where is not None:
        scan = scan.filter(_where_column(where))
    if exclude_id is not None:
        scan = scan.filter(F.col(id_col) != exclude_id)
    if use_pq:
        pq = meta.get("pq")
        if not pq:
            raise ValueError(
                "use_pq=True but the store was built without PQ codebooks "
                "(write_vector_corpus(pq_m=...))"
            )
        lut = pq_lut(qv, pq["codebooks"])
        short_ids = [
            r[id_col]
            for r in scan.withColumn(
                "_adc",
                F.round(pq_adc_score(PQ_COL, lut, int(pq["ksub"])), 9),
            )
            .orderBy("_adc", id_col)
            .limit(refine * k)
            .select(id_col)
            .collect()
        ]
        scan = scan.filter(F.col(id_col).isin(short_ids))
    scored = scan.withColumn(
        "_cos", cosine(as_double(vec_col), F.lit(qv))
    )
    return (
        scored.orderBy(F.desc("_cos"), F.col(id_col))
        .select(
            id_col, *(extra_cols or []), F.round("_cos", 6).alias("cosine")
        )
        .limit(k)
    )


def query_vector_corpus_many(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    k: int = 10,
    nprobe: int = 4,
    broadcast_queries: bool = True,
    exclude_self: bool = False,
    checkpoint: bool = True,
    where=None,
    use_pq: bool = False,
    refine: int = 4,
) -> DataFrame:
    """BATCH top-k: one pass answers every query in ``queries`` —
    contamination screens and retrieval pipelines ask thousands of
    queries, and per-query driver round-trips would dominate.

    ``use_pq=True`` (PQ stores) inserts the distributed ADC stage: the
    candidate scan reads only ``(id, cell, pq_code, qid)`` — never the
    float vectors — scores each (candidate, query) pair directly from
    the codes + the query subvectors + a broadcast flattened codebook
    (:func:`~bambooai_spark.operators.pq.pq_adc_score_joined`, fold
    order bit-identical to the single-query LUT so both paths shortlist
    the same rows), keeps ``refine * k`` per query via the two-phase
    grouped top-k, and rescores only those pairs with exact cosines.

    Per query the semantics are IDENTICAL to
    :func:`query_vector_corpus` (same expansion + tie-break probe, exact
    cosines, top-k by ``(cosine DESC, id)``); the plan differs:

    - probe assignment is a distributed |Q| x n_cells cross against the
      broadcast centroid relation, per-query top-``nprobe`` on the
      high-cardinality qid (never a funnel);
    - the scan filter is the DISTINCT union of probed cells — bounded
      by n_cells, so it collects to a literal ``isin`` and the scan
      keeps its static ``PartitionFilters`` (a join-produced filter
      would read every cell);
    - rows join probes on the cell id (``broadcast_queries=True`` for
      query sets that fit an executor — |Q|*nprobe vectors; turn it
      off for very large batches and let AQE pick), and per-query
      top-k runs through the two-phase ``grouped_top_k`` so a SMALL
      query batch over a huge corpus still parallelizes.

    Returns ``(qid, id, cosine)``, at most k rows per query. The
    store's ``id_col`` must not itself be named ``qid`` (the output
    needs both columns). ``checkpoint=False`` keeps the lazy plan
    inspectable (plan tests); the persisted probe relation then stays
    cached until the caller clears it — as in
    ``functions.ranking.distributed_dense_rank``."""
    from bambooai_spark.functions.ranking import grouped_top_k  # noqa: PLC0415

    meta = _load_meta(spark, path)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    if id_col == "qid":
        raise ValueError(
            "the store's id_col is named 'qid', which collides with the "
            "batch output's query-id column — rename one of them"
        )
    # one bounded job validates the whole batch: a wrong-dim vector
    # would make every distance NULL (zip_with pads with null) and
    # return garbage instead of the single-query path's ValueError, and
    # a duplicate qid would mix two vectors' distances in one probe
    # ranking
    chk = queries.agg(
        F.min(F.size(qvec_col)).alias("mn"),
        F.max(F.size(qvec_col)).alias("mx"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(qid_col)).alias("nd"),
    ).collect()[0]
    if chk["n"] == 0:
        raise ValueError("queries frame is empty")
    if chk["mn"] != meta["dim"] or chk["mx"] != meta["dim"]:
        raise ValueError(
            f"query dims {chk['mn']}..{chk['mx']} != store dim "
            f"{meta['dim']}"
        )
    if chk["nd"] != chk["n"]:
        raise ValueError(
            f"duplicate {qid_col!r} values ({chk['n']} rows, "
            f"{chk['nd']} distinct) — each query needs a unique id"
        )
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(meta["centroids"])],
        "_cell INT, _cv ARRAY<DOUBLE>",
    )
    qv = as_double("_qv")
    d = dot(qv, qv) - 2 * dot(qv, "_cv") + dot("_cv", "_cv")
    from pyspark.sql import Window  # noqa: PLC0415

    # persisted in BOTH modes: the cells collect below and the join are
    # two actions — unpersisted, a non-deterministic queries lineage
    # (limit/sample) could probe one row set and join another, silently
    # dropping matches at the pruned scan (review r8 pass 3)
    probes = (
        queries.select(
            F.col(qid_col).alias("_qid"), as_double(qvec_col).alias("_qv")
        )
        .crossJoin(F.broadcast(cdf))
        .withColumn("_d", d)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_qid").orderBy("_d", "_cell")
            ),
        )
        .filter(F.col("_rn") <= nprobe)
        .select("_qid", F.col("_cell").alias(CELL_COL), "_qv")
    ).persist()
    # bounded by n_cells — a literal isin keeps static partition pruning
    cells = [
        r[CELL_COL]
        for r in probes.select(CELL_COL).distinct().collect()
    ]
    probes_join = F.broadcast(probes) if broadcast_queries else probes
    scan = spark.read.parquet(path).filter(F.col(CELL_COL).isin(cells))
    if where is not None:
        # filtered ANN, same contract as the single-query path: the
        # predicate restricts the candidate rows BEFORE the per-query
        # top-k and pushes to the scan
        scan = scan.filter(_where_column(where))
    scored = scan.join(probes_join, [CELL_COL])
    if exclude_self:
        # query-by-stored-id convention: qids share the store id space
        # and a query must not return its own row. OFF by default —
        # external query ids could coincidentally collide with store ids
        scored = scored.filter(~F.col(id_col).eqNullSafe(F.col("_qid")))
    if use_pq:
        pq = meta.get("pq")
        if not pq:
            raise ValueError(
                "use_pq=True but the store was built without PQ codebooks "
                "(write_vector_corpus(pq_m=...))"
            )
        m, ksub = int(pq["m"]), int(pq["ksub"])
        dsub = int(meta["dim"]) // m
        flat = [
            float(x) for book in pq["codebooks"] for c in book for x in c
        ]
        # the flattened codebook rides a broadcast 1-row relation, not a
        # plan literal — 8x256x8 doubles would bloat codegen as a literal
        bdf = F.broadcast(
            spark.createDataFrame([(flat,)], "_books ARRAY<DOUBLE>")
        )
        adc = F.round(
            pq_adc_score_joined(
                PQ_COL, "_qv", "_books", m=m, ksub=ksub, dsub=dsub
            ),
            9,
        )
        shortlist = grouped_top_k(
            scored.select("_qid", F.col(id_col), F.col(PQ_COL), "_qv")
            .crossJoin(bdf)
            .withColumn("_adc", adc)
            .select("_qid", F.col(id_col), F.col("_adc")),
            ["_qid"],
            [F.col("_adc").asc(), F.col(id_col)],
            refine * k,
        ).select("_qid", id_col)
        scored = scored.join(
            F.broadcast(shortlist) if broadcast_queries else shortlist,
            ["_qid", id_col],
        )
    scored = scored.withColumn("_cos", cosine(as_double(vec_col), "_qv"))
    out = grouped_top_k(
        scored.select("_qid", F.col(id_col), F.col("_cos")),
        ["_qid"],
        [F.col("_cos").desc(), F.col(id_col)],
        k,
    ).select(
        F.col("_qid").alias("qid"), id_col,
        F.round("_cos", 6).alias("cosine"),
    )
    if checkpoint:
        out = out.localCheckpoint(eager=True)
        probes.unpersist()
    return out


def stored_vector(spark: SparkSession, path: str, vec_id) -> list[float]:
    """Fetch one stored vector by id (drives query-by-stored-id).

    Convenience, NOT the scale path: the id predicate is a data filter,
    not a partition filter, so this lists every cell directory and
    relies on row-group stats at best — a full-store read in the worst
    case. A repeated query-by-id workload should keep its query vectors
    outside the store (or memoize this lookup); the partition-pruned
    economics the module header describes apply to the PROBE, which the
    query vector itself does not get."""
    meta = _load_meta(spark, path)
    rows = (
        spark.read.parquet(path)
        .filter(F.col(meta["id_col"]) == vec_id)
        .select(meta["vec_col"])
        .limit(1)
        .collect()
    )
    if not rows:
        raise ValueError(f"id {vec_id!r} not in the vector store")
    return [float(x) for x in rows[0][0]]


def _rewrite_meta(spark: SparkSession, path: str, meta: dict) -> None:
    """Replace the store metadata without a no-meta crash window: stage
    ``.new`` (atomic write), delete the old file, rename the staged copy
    in. The meta file is the ONLY copy of the quantizer — a crash
    between the delete and the rename leaves the complete ``.new``,
    which :func:`_load_meta` finishes renaming on its next read; a
    plain delete-then-write would leave nothing."""
    from bambooai_spark.operators.writer import _fs  # noqa: PLC0415

    mpath = _join(path, META_NAME)
    staged = mpath + ".new"
    _fs_delete(spark, staged)
    _fs_write_text_atomic(spark, staged, json.dumps(meta))
    _fs_delete(spark, mpath)
    fs, dest = _fs(spark, mpath)
    if not fs.rename(_fs(spark, staged)[1], dest):
        raise RuntimeError(f"vector-store meta replace failed: {mpath}")


def set_corpus_watermark(
    spark: SparkSession, path: str, batch: int | str
) -> dict:
    """Pin the store's corpus watermark — the txn batch id of the
    document corpus this store is synced THROUGH. The build pattern:
    capture ``latest_committed_batch(corpus)`` BEFORE the snapshot read
    that feeds :func:`write_vector_corpus`, build, then pin it here;
    batches landing during the build are re-processed by the first
    :func:`refresh_vector_store` and de-duplicated by its anti-join."""
    meta = _load_meta(spark, path)
    meta["corpus_watermark"] = batch
    _rewrite_meta(spark, path, meta)
    return meta


def refresh_vector_store(
    spark: SparkSession,
    corpus_path: str,
    store_path: str,
    embed=None,
    *,
    after_batch: int | str | None = None,
    until_batch: int | str | None = None,
    dedup: bool = True,
    max_records_per_file: int | None = None,
) -> dict:
    """Incremental index refresh: read ONLY the corpus txn batches
    committed since the store's watermark (:func:`~bambooai_spark
    .operators.writer.read_corpus_changes` — never a corpus scan),
    map them to vectors, append into the pinned-cell layout, advance
    the watermark. The 100 TB pattern: an index that follows a growing
    corpus at per-batch cost.

    ``embed`` — callable mapping the changed-documents DataFrame to a
    frame with exactly the store's pinned columns (id + vector + any
    payload). ``None`` when the corpus rows already carry them.

    Idempotent under crash-replay when ``dedup=True`` (default): the
    incoming ids anti-join the store's existing ids (an id-column-only
    store scan — the cheap fraction of store bytes), so a crash between
    the append and the watermark write re-processes the window without
    duplicating vectors. With ``dedup=False`` the append is
    at-least-once and the caller owns replay hygiene.

    Deletes are NOT mirrored here (CDC is inserts-only — takedowns
    destroy the pre-image); run :func:`prune_vector_store` periodically
    to drop vectors whose documents left the corpus."""
    from bambooai_spark.operators.writer import (  # noqa: PLC0415
        _walk_files,
        latest_committed_batch,
        read_corpus_changes,
    )

    meta = _load_meta(spark, store_path)
    wm = after_batch if after_batch is not None else meta.get("corpus_watermark")
    if wm is None:
        raise ValueError(
            "the store has no corpus watermark; pin one with "
            "set_corpus_watermark (or pass after_batch=) — typically the "
            "corpus's latest_committed_batch captured before the build's "
            "snapshot read"
        )
    # ONE corpus listing shared by the watermark probe and the change
    # read: at millions of files, per-refresh listings are the cost this
    # incremental path exists to avoid. until is derived from the same
    # listing, which is what makes sharing it race-free (see
    # read_corpus_changes's snapshot note).
    files = _walk_files(spark, corpus_path)
    until = until_batch
    if until is None:
        ns = None
        if isinstance(wm, str) and "." in wm:
            ns = wm.rpartition(".")[0]
        until = latest_committed_batch(
            spark, corpus_path, namespace=ns, _files=files
        )
    if until is None or until == wm:
        return {"n_new": 0, "watermark": wm, "meta": meta}
    changes = read_corpus_changes(
        spark, corpus_path, after_batch=wm, until_batch=until, _files=files
    )
    vecs = embed(changes) if embed is not None else changes
    if sorted(vecs.columns) != meta.get("columns", sorted(vecs.columns)):
        raise ValueError(
            f"embed produced columns {sorted(vecs.columns)} != the "
            f"store's pinned columns {meta['columns']}"
        )
    if dedup:
        existing = spark.read.parquet(store_path).select(meta["id_col"])
        vecs = vecs.join(existing, meta["id_col"], "left_anti")
    vecs = vecs.persist()
    try:
        n_new = vecs.count()
        if n_new:
            append_vector_corpus(
                vecs, store_path, max_records_per_file=max_records_per_file
            )
    finally:
        vecs.unpersist()
    # watermark LAST: a crash before this line re-processes the window
    # on retry, and the dedup anti-join keeps that replay exact
    meta = _load_meta(spark, store_path)
    meta["corpus_watermark"] = until
    _rewrite_meta(spark, store_path, meta)
    return {"n_new": n_new, "watermark": until, "meta": meta}


def prune_vector_store(
    spark: SparkSession, corpus_path: str, store_path: str
) -> dict:
    """Delete-side reconciliation: drop every stored vector whose id no
    longer exists in the corpus (takedowns destroy pre-images, so CDC
    cannot stream them — this is the periodic sweep). Rewrites ONLY the
    cells that contain a dead vector, via dynamic partition overwrite;
    untouched cells' files are never read, moved, or rewritten.

    Cost: one id-column scan of each side plus a rewrite of the
    affected cells. Maintenance-window op like compact_corpus: single
    writer, and a reader during the rewrite can briefly see a cell's
    rows missing."""
    from bambooai_spark.operators.writer import read_corpus  # noqa: PLC0415

    meta = _load_meta(spark, store_path)
    id_col = meta["id_col"]
    corpus = read_corpus(spark, corpus_path)
    if id_col not in corpus.columns:
        raise ValueError(
            f"store id column {id_col!r} is not a corpus column "
            f"({sorted(corpus.columns)}) — liveness cannot be derived"
        )
    live = corpus.select(id_col)
    store = spark.read.option("basePath", store_path).parquet(store_path)
    dead = store.join(live, id_col, "left_anti").select(id_col, CELL_COL)
    dead = dead.persist()
    try:
        affected = sorted(
            r[CELL_COL] for r in dead.select(CELL_COL).distinct().collect()
        )
        n_dead = dead.count()
        if not affected:
            return {"removed": 0, "cells_rewritten": []}
        kept = store.filter(F.col(CELL_COL).isin(affected)).join(
            live, id_col, "left_semi"
        )
        kept = kept.persist()
        try:
            with_rows = {
                r[CELL_COL]
                for r in kept.select(CELL_COL).distinct().collect()
            }
            writer = kept.write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            )
            if meta.get("bloom_ids"):
                from bambooai_spark.operators.filestats import (  # noqa: PLC0415
                    apply_bloom_options,
                )

                writer = apply_bloom_options(writer, (id_col,))
            writer.partitionBy(CELL_COL).parquet(store_path)
        finally:
            kept.unpersist()
        # dynamic overwrite replaces only partitions it WRITES — a cell
        # whose rows all died gets no output and its stale directory
        # survives (the documented dynamic-overwrite hazard); drop it
        for c in set(affected) - with_rows:
            _fs_delete(spark, _join(store_path, f"{CELL_COL}={c}"))
    finally:
        dead.unpersist()
    return {"removed": n_dead, "cells_rewritten": affected}


def vector_store_skew(
    spark: SparkSession, path: str, *, _meta: dict | None = None
) -> dict:
    """Cell-balance report — the drift signal for
    :func:`rebuild_vector_store`. A store whose appends pinned stale
    centroids ends up with a few huge cells: every probe that hits one
    reads ``max_cell/mean_cell`` times its fair share of bytes, and
    recall degrades as true neighbors concentrate where the quantizer
    no longer separates them. One job over the partition column only
    (the scan decodes no vector bytes — cell ids come from directory
    names). ``skew`` is max/mean over the CONFIGURED cell count (empty
    cells are the quantizer's wasted capacity and count against it).
    ``_meta`` lets the advisor pass already-loaded metadata (one
    bookkeeping read per advisor call, review r10)."""
    meta = _meta if _meta is not None else _load_meta(spark, path)
    counts = {
        int(r[CELL_COL]): int(r["n"])
        for r in spark.read.parquet(path)
        .groupBy(CELL_COL)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_cells = int(meta["n_cells"])
    rows = sum(counts.values())
    mx = max(counts.values(), default=0)
    mean = rows / n_cells if n_cells else 0.0
    return {
        "n_cells": n_cells,
        "nonempty_cells": len(counts),
        "rows": rows,
        "max_cell": mx,
        "mean_cell": mean,
        "skew": (mx / mean) if mean else 0.0,
    }


def validate_vector_store(
    spark: SparkSession,
    path: str,
    *,
    corpus_path: str | None = None,
    deep: bool = False,
    _meta: dict | None = None,
    _frozen: bool | None = None,
) -> "DataFrame":
    """Consistency audit of a vector store — the fsck twin of
    :func:`~bambooai_spark.operators.writer.validate_corpus` (VERDICT
    r9 #7). One row per check: ``(check, ok, detail)``. Default checks
    are O(bookkeeping) — meta + flag + staging stats, never a data-tree
    walk; ``deep=True`` adds the tree-walk checks.

    Checks:
    - ``meta``              — ``_vector_store.json`` present + parseable
      (everything else is skipped without it).
    - ``frozen_rebuild``    — a rebuild crashed mid-swap; readers refuse
      until ``rebuild_vector_store`` resumes it. Detail carries the
      frozen generation and the flag's AGE, so monitoring can tell a
      swap in progress from one abandoned for hours.
    - ``orphan_staging``    — ``_rebuild_tmp`` with NO flag: an attempt
      abandoned before its publish point (harmless to readers; wasted
      bytes — the next rebuild clears it, or delete the directory).
    - ``swap_leftovers``    (deep) — hidden ``_swap-r*-`` files with no
      frozen rebuild to account for them: should never survive a
      completed swap.
    - ``stale_generations`` (deep) — live ``r<k>-`` files of a
      generation other than the meta's ``rebuild_gen``: the completed
      swap should have deleted them (double-counted neighbors).
    - ``cells_vs_meta``     (deep) — ``ivf_cell=K`` directories outside
      ``[0, n_cells)``: rows assigned under a different quantizer than
      the pinned one (probes will never visit or wrongly visit them).
    - ``watermark``         (with ``corpus_path``) — the store's corpus
      watermark vs the corpus's maintenance floor (``as_of_floor``):
      a watermark BELOW the floor means compaction/delete rewrote the
      batches the next refresh would replay — attribution is gone and
      incremental refresh is unsound; re-baseline with a snapshot
      rebuild. (Refresh LAG — watermark behind the head — is the
      advisor's job, not a corruption.)

    ``_meta``/``_frozen`` let the advisor pass already-established
    bookkeeping state (one read per advisor call, review r10).
    """
    import time  # noqa: PLC0415

    from bambooai_spark.operators.writer import (  # noqa: PLC0415
        _fs,
        _load_manifest_doc,
        _walk_files,
    )

    rows: list[tuple[str, bool, str]] = []

    def _df_of() -> DataFrame:
        return spark.createDataFrame(
            rows, "check string, ok boolean, detail string"
        )

    try:
        meta = _meta if _meta is not None else _load_meta_raw(spark, path)
        rows.append(("meta", True, f"{len(meta.get('columns') or [])} "
                     f"pinned columns, {meta.get('n_cells')} cells"))
    except Exception as exc:  # noqa: BLE001
        rows.append(("meta", False, f"unreadable store metadata: {exc}"))
        return _df_of()

    pq = meta.get("pq")
    if pq:
        # O(bookkeeping): the codebooks must tile the store's dim, or
        # every ADC query indexes the LUT with the wrong stride
        try:
            m, ksub = int(pq["m"]), int(pq["ksub"])
            books = pq["codebooks"]
            ok = (
                len(books) == m
                and all(len(b) == ksub for b in books)
                and m * len(books[0][0]) == int(meta["dim"])
            )
            detail = (
                f"m={m} ksub={ksub} tiles dim {meta['dim']}"
                if ok
                else f"codebooks {len(books)}x"
                f"{[len(b) for b in books][:4]} do not tile "
                f"dim {meta['dim']} at m={m} ksub={ksub} — rebuild "
                "or rewrite with matching pq_m"
            )
            rows.append(("pq_meta", ok, detail))
        except Exception as exc:  # noqa: BLE001
            rows.append(("pq_meta", False, f"malformed pq metadata: {exc}"))

    flag = _join(path, REBUILD_FLAG)
    frozen = _frozen if _frozen is not None else _fs_exists(spark, flag)
    if frozen:
        # race-tolerant (review r10): a concurrent rebuild can complete
        # and delete the flag between the exists check and these reads —
        # that is the HEALED state, report it as such instead of raising
        try:
            fs, jflag = _fs(spark, flag)
            age_s = max(
                0, int(time.time() - fs.getFileStatus(jflag)
                       .getModificationTime() / 1000)
            )
            gen = json.loads(_fs_read_text(spark, flag)).get("gen")
        except Exception:  # noqa: BLE001
            frozen = _fs_exists(spark, flag)
            age_s, gen = None, None
        if frozen:
            rows.append((
                "frozen_rebuild", False,
                f"rebuild gen {gen} frozen mid-swap for "
                f"{age_s if age_s is not None else '?'}s — readers "
                "refuse; rebuild_vector_store(spark, path) resumes it",
            ))
        else:
            rows.append((
                "frozen_rebuild", True,
                "a rebuild completed its swap during this check",
            ))
    else:
        rows.append(("frozen_rebuild", True, "no rebuild in flight"))

    staging = _join(path, "_rebuild_tmp")
    if _fs_exists(spark, staging) and not frozen:
        rows.append((
            "orphan_staging", False,
            "_rebuild_tmp exists with no _REBUILD.json — an attempt "
            "abandoned before its publish point; the next rebuild "
            "clears it (or delete the directory)",
        ))
    else:
        rows.append(("orphan_staging", True, "none"))

    if deep:
        files = _walk_files(spark, path)
        cur_gen = int(meta.get("rebuild_gen") or 0)
        swap = _walk_files(spark, path, want_hidden_prefix="_swap-")
        if swap and not frozen:
            rows.append((
                "swap_leftovers", False,
                f"{len(swap)} hidden _swap-* files with no frozen "
                f"rebuild (e.g. {swap[0].rsplit('/', 1)[1]!r}) — a "
                "completed swap never leaves these",
            ))
        else:
            rows.append(("swap_leftovers", True, "none"))
        import re  # noqa: PLC0415

        stale = set()
        for f in files:
            m = re.match(r"r(\d+)-", f.rsplit("/", 1)[1])
            if m and int(m.group(1)) != cur_gen:
                stale.add(int(m.group(1)))
        if stale and not frozen:
            rows.append((
                "stale_generations", False,
                f"live files of rebuild generation(s) "
                f"{sorted(stale)} != current {cur_gen} — the swap "
                "should have deleted them (duplicate neighbors); "
                "re-run rebuild_vector_store",
            ))
        else:
            rows.append(("stale_generations", True, f"gen {cur_gen}"))
        n_cells = int(meta["n_cells"])
        bad_cells = sorted({
            int(m.group(1))
            for f in files
            for m in [re.search(rf"{CELL_COL}=(-?\d+)/", f)]
            if m and not (0 <= int(m.group(1)) < n_cells)
        })
        if bad_cells:
            rows.append((
                "cells_vs_meta", False,
                f"cell dirs {bad_cells} outside the pinned quantizer's "
                f"[0, {n_cells}) — assigned under a different quantizer; "
                "probes will mis-route around them; rebuild the store",
            ))
        else:
            rows.append(("cells_vs_meta", True,
                         f"all cell dirs within [0, {n_cells})"))

    if corpus_path is not None:
        wm = meta.get("corpus_watermark")
        doc = _load_manifest_doc(spark, corpus_path) or {}
        floor = doc.get("as_of_floor")
        composite = isinstance(wm, str) and "." in str(wm)
        if (
            wm is not None and floor is not None and not composite
            and int(wm) < int(floor)
        ):
            rows.append((
                "watermark", False,
                f"store watermark {wm!r} predates the corpus's "
                f"maintenance floor {floor} — compaction/delete rewrote "
                "the replay window; incremental refresh is unsound, "
                "re-baseline with a snapshot rebuild "
                "(write_vector_corpus + set_corpus_watermark)",
            ))
        elif wm is None:
            rows.append((
                "watermark", True,
                "no corpus watermark pinned (the advisor flags the "
                "refresh-lag setup; not a corruption)",
            ))
        elif composite:
            # namespaced watermarks are not comparable with the numeric
            # floor — do NOT claim the window is intact (review r10);
            # refresh itself still fails loudly on rewritten evidence
            rows.append((
                "watermark", True,
                f"composite watermark {wm!r}: not comparable with the "
                f"numeric maintenance floor ({floor!r}) — window "
                "soundness is enforced at refresh time, not provable "
                "here",
            ))
        else:
            rows.append((
                "watermark", True,
                f"watermark {wm!r} within the replay window "
                f"(floor {floor!r})",
            ))
    return _df_of()


def rebuild_vector_store(
    spark: SparkSession,
    path: str,
    *,
    n_cells: int | None = None,
    assign: str | None = None,
    max_records_per_file: int | None = None,
    lease=None,
) -> dict:
    """Retrain the coarse quantizer on the CURRENT corpus and re-assign
    every stored vector — the compaction analog for the IVF index
    (VERDICT r8 #5: pinned centroids skew cells as a drifting corpus
    appends; nothing else re-balances them). Staged-swap, crash-safe:

    1. read the live store, train fresh centroids (``n_cells`` default:
       the store's current cell count), assign, and write the NEW layout
       fully into the hidden ``_rebuild_tmp/data`` staging tree;
    2. publish ``_REBUILD.json`` (atomic) freezing the new quantizer +
       generation — from here the swap is resumable and every reader
       refuses (mid-swap, cells and quantizer disagree; see
       :func:`_load_meta`);
    3. per-file swap, same protocol as ``compact_corpus``: stage hidden
       (``_swap-r<gen>-``), delete files of every other generation,
       unhide to ``r<gen>-`` names, drop emptied cell directories;
    4. pin the new metadata (watermark and pinned columns carried over),
       drop the flag and staging.

    A crash anywhere re-enters at the flag: re-running this function
    resumes the swap idempotently (file moves are skipped when the
    destination exists). Readers during the swap window get the loud
    refusal, never silently-wrong neighbors. Returns the new metadata."""
    from bambooai_spark.operators.writer import (  # noqa: PLC0415
        _fs,
        _lease_beat,
        _lease_ensure,
        _move_staged_files,
        _unhide_swapped,
        _walk_files,
    )

    _lease_beat(lease)
    tmp = _join(path, "_rebuild_tmp")
    tmp_data = _join(tmp, "data")
    flag = _join(path, REBUILD_FLAG)
    if not _fs_exists(spark, flag):
        meta = _load_meta_raw(spark, path)
        gen = int(meta.get("rebuild_gen") or 0) + 1
        use_assign = assign if assign is not None else meta["assign"]
        if use_assign not in ("numpy", "exact"):
            raise ValueError(
                f"assign must be numpy|exact, got {use_assign!r}"
            )
        df = spark.read.parquet(path).select(*meta["columns"])
        cents = train_ivf_centroids(
            df, meta["vec_col"],
            n_cells=int(n_cells or meta["n_cells"]),
        )
        cents = [[float(x) for x in c] for c in np.asarray(cents)]
        pq_meta = meta.get("pq")
        if pq_meta:
            # PQ codebooks drift with the corpus exactly like the coarse
            # quantizer — a rebuild retrains BOTH, at the REQUESTED ksub
            # (not the possibly-clamped actual), so a store first built
            # on a tiny corpus regains full codebook resolution once the
            # grown corpus can support it
            want_ksub = int(
                pq_meta.get("ksub_requested") or pq_meta["ksub"]
            )
            books = train_pq_codebooks(
                df, meta["vec_col"],
                m=int(pq_meta["m"]), ksub=want_ksub,
            )
            books = [
                [[float(x) for x in c] for c in book] for book in books
            ]
            # ksub records the ACTUAL codebook size (the trainer clamps
            # to the sample row count), so ADC indexes the right stride
            pq_meta = {
                "m": len(books),
                "ksub": len(books[0]),
                "ksub_requested": want_ksub,
                "codebooks": books,
            }
        _fs_delete(spark, tmp)  # stale staging from an abandoned attempt
        _write_assigned(
            df, tmp_data, meta["id_col"], meta["vec_col"], cents,
            use_assign, max_records_per_file, mode="overwrite",
            bloom_cols=(meta["id_col"],) if meta.get("bloom_ids") else (),
            pq_books=pq_meta["codebooks"] if pq_meta else None,
        )
        new_meta = {
            **meta,
            "n_cells": len(cents),
            "dim": len(cents[0]),
            "assign": use_assign,
            "centroids": cents,
            "rebuild_gen": gen,
        }
        if pq_meta:
            new_meta["pq"] = pq_meta
        _lease_ensure(lease)  # last check before the swap becomes due
        _fs_write_text_atomic(
            spark, flag, json.dumps({"gen": gen, "meta": new_meta})
        )
    info = json.loads(_fs_read_text(spark, flag))
    gen, new_meta = int(info["gen"]), info["meta"]
    hidden = f"_swap-r{gen}-"
    _lease_ensure(lease)
    # (1) stage hidden, per file, resumable (tmp may already be empty on
    # a resume — every move is exists-checked)
    if _fs_exists(spark, tmp_data):
        _move_staged_files(spark, tmp_data, path, gen, prefix=hidden)
    # (2) delete every other generation's live files (the pre-rebuild
    # layout, including txn-append files); re-runs skip the already-
    # unhidden r<gen>- files
    fs, _root = _fs(spark, path)
    jvm = spark._jvm
    for f in _walk_files(spark, path):
        if not f.rsplit("/", 1)[1].startswith(f"r{gen}-"):
            fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
    # (3) unhide: _swap-r<gen>-X → r<gen>-X
    _unhide_swapped(spark, path, hidden)
    # (4) drop cell directories the new quantizer emptied (dynamic-
    # overwrite-style leftovers would otherwise linger as empty dirs)
    for st in fs.listStatus(_fs(spark, path)[1]):
        nm = st.getPath().getName()
        if (
            st.isDirectory()
            and nm.startswith(f"{CELL_COL}=")
            and not fs.listStatus(st.getPath())
        ):
            fs.delete(st.getPath(), True)
    _lease_ensure(lease)
    _rewrite_meta(spark, path, new_meta)
    _fs_delete(spark, flag)
    _fs_delete(spark, tmp)
    return new_meta
