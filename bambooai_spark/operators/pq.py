"""Product quantization (PQ) for embedding columns — the IVF-PQ memory
scale path (Jégou, Douze, Schmid, TPAMI 2011, "Product Quantization for
Nearest Neighbor Search", public method).

Each d-dim vector splits into ``m`` subvectors of d/m dims; every subspace
gets its own ``ksub``-centroid codebook; a vector stores as ``m`` small
codes instead of ``d`` floats (64-dim float32 -> 8 bytes at m=8, a 32x
reduction). Search uses ADC (asymmetric distance computation): ONE
m x ksub lookup table of exact query-to-centroid partial distances is
built per query driver-side, then every stored vector's approximate
distance is an m-term table fold over its codes — no float vector is
touched until the shortlist rescore.

100 TB story: the candidate scan reads only the code column (m ints) —
the wide float embedding column stays pruned out of the scan entirely
(columnar parquet) until the ``refine * k``-row shortlist joins it back
by id. The LUT is a plan literal (m*ksub doubles, ~16 KB at 8x256) —
broadcast once per query, no shuffle; the shortlist selection is a
TakeOrderedAndProject (per-partition top-R, only R rows reach the
driver-side merge). Training is the standard "train small, assign big"
recipe: Lloyd on a bounded sample driver-side, Arrow-batched argmin for
the corpus encode.

Two parallel constructions, same split as IVF (similarity.py):

- production: :func:`train_pq_codebooks` (per-subspace Lloyd, numpy) +
  :func:`pq_encode` (vectorized Arrow batches);
- oracle twin: :func:`md5_pq_codebooks` (deterministic pseudo-random
  codebooks = subvectors of the ksub smallest-``(md5(id), id)`` rows) +
  :func:`pq_encode_exact` (argmin via the dot-product expansion in pure
  SQL expressions) + :func:`knn_pq_md5` — every stage engine-portable,
  so DuckDB replays encode -> ADC -> shortlist -> exact rescore
  hash-exact (the suite's ``knn_pq_embeddings`` spec).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bambooai_spark.functions.vectors import as_double, cosine, dot
from bambooai_spark.numeric import col_of


def _split_dims(dim: int, m: int) -> list[tuple[int, int]]:
    """1-based (start, length) slice per subspace; dim must divide by m."""
    if dim % m != 0:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    d = dim // m
    return [(j * d + 1, d) for j in range(m)]


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str,
    *,
    m: int = 8,
    ksub: int = 256,
    sample: int = 2048,
    iters: int = 5,
) -> np.ndarray:
    """Per-subspace Lloyd k-means on a BOUNDED sample, driver-side numpy —
    the PQ training recipe (train small, encode big). Deterministic: the
    sample is the ``sample`` lowest rows by ``xxhash64(vec)`` — a
    value-derived total order, so retraining a stable corpus yields
    identical codebooks regardless of partitioning or scan order (a bare
    ``limit`` has neither guarantee; ADVICE r10) — and init = evenly
    spaced sample rows per subspace, no RNG. The orderBy+limit compiles
    to TakeOrderedAndProject: per-partition top-k, never a full sort.
    (Exact-duplicate vectors can swap at the boundary under hash ties —
    identical values, so the training data is unchanged.) Returns
    ``(m, ksub_eff, d/m)`` with ``ksub_eff = min(ksub, sample rows)``."""
    rows = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col)))
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("cannot train PQ codebooks: table is empty")
    vecs = np.asarray([np.asarray(r[0], dtype=np.float64) for r in rows])
    dim = vecs.shape[1]
    if dim % m != 0:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    d = dim // m
    k_eff = min(ksub, len(vecs))
    books = np.empty((m, k_eff, d), dtype=np.float64)
    idx = np.linspace(0, len(vecs) - 1, num=k_eff, dtype=int)
    for j in range(m):
        sub = vecs[:, j * d : (j + 1) * d]
        cents = sub[idx].copy()
        for _ in range(iters):
            dist = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)
            for c in range(k_eff):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks: np.ndarray,
    *,
    out_col: str = "pq_code",
) -> DataFrame:
    """Attach the ``m``-code PQ encoding (``array<int>``) — run ONCE at
    ingest, exactly like ``ivf_assign``. Vectorized: one numpy distance
    pass per subspace per Arrow batch, never per row."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    books = np.asarray(codebooks, dtype=np.float64)
    m, _, d = books.shape
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(IntegerType()))]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.reindex(columns=pdf.columns.tolist() + [out_col])
                continue
            vecs = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = np.empty((len(vecs), m), dtype=np.int32)
            for j in range(m):
                sub = vecs[:, j * d : (j + 1) * d]
                dist = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(
                    axis=2
                )
                codes[:, j] = dist.argmin(axis=1)
            out = pdf.copy()
            out[out_col] = [c.tolist() for c in codes]
            yield out

    return df.mapInPandas(run, out_schema)


def _seq_dot(a: list[float], b: list[float]) -> float:
    """Sequential left-fold dot product in IEEE doubles — the same
    operation sequence as ``functions.vectors.dot`` and DuckDB's
    ``list_dot_product``, so driver-side scalars slot bit-exactly into
    expressions both engines evaluate."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def pq_lut(query_vec, codebooks) -> list[float]:
    """The ADC lookup table for one query: exact squared L2 from each
    query subvector to each codebook centroid, flattened row-major to
    ``lut[j * ksub + c]`` so the score fold is one ``element_at`` per
    subspace. Each entry is computed as the dot-product expansion
    ``<q,q> - 2<q,c> + <c,c>`` with sequential left-fold dots — the
    IDENTICAL operation sequence as the repo's SQL expansion
    (``functions.vectors.dot`` / DuckDB ``list_dot_product``), so the
    oracle's LUT CTE reproduces every entry bit-exact; a squared-
    difference fold, though mathematically equal, diverges by ~1e-13
    per entry and could flip a shortlist rounding boundary (review
    r10)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, k_eff, d = books.shape
    q = [float(x) for x in query_vec]
    lut: list[float] = []
    for j in range(m):
        qj = q[j * d : (j + 1) * d]
        qq = _seq_dot(qj, qj)
        for c in range(k_eff):
            cv = [float(y) for y in books[j][c]]
            lut.append(qq - 2 * _seq_dot(qj, cv) + _seq_dot(cv, cv))
    return lut


def pq_adc_score(code_col: str | Column, lut: list[float], ksub: int) -> Column:
    """Approximate squared L2 of a stored vector to the query: sum of LUT
    entries picked by the vector's codes. Pure column expressions — the
    LUT rides the plan as an array literal, evaluated JVM-side inside
    whole-stage codegen; only the m-int code column is read."""
    lut_col = F.array(*[F.lit(x) for x in lut])
    idx = F.zip_with(
        col_of(code_col),
        F.sequence(F.lit(0), F.lit(len(lut) // ksub - 1)),
        lambda c, j: c + j * ksub,
    )
    return F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc + F.element_at(lut_col, i + 1),
    )


def knn_pq(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    query_id,
    k: int = 10,
    codebooks: np.ndarray | None = None,
    m: int = 8,
    ksub: int = 256,
    refine: int = 4,
    code_col: str | None = None,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """PQ approximate top-k with exact rescoring: ADC-score every stored
    code (reading only the code column), keep the best ``refine * k``
    (TakeOrderedAndProject — per-partition top-R), then join the float
    vectors back for the shortlist ONLY and return exact cosines. The
    approximation restricts WHICH rows are rescored, never the returned
    scores — the same contract as ``knn_lsh`` / ``knn_ivf``."""
    if codebooks is None:
        if code_col is not None:
            # scoring stored codes against a LUT from freshly trained
            # (different) codebooks makes the ADC values meaningless
            # while the output still LOOKS valid (exact cosines of a
            # near-random candidate set) — refuse loudly (review r10)
            raise ValueError(
                "knn_pq: code_col was given without the codebooks that "
                "produced it — pass the pinned codebooks (a LUT from "
                "retrained books scores stale codes as noise)"
            )
        codebooks = train_pq_codebooks(df, vec_col, m=m, ksub=ksub)
    books = np.asarray(codebooks, dtype=np.float64)
    k_eff = books.shape[1]
    # the query vector comes off the ORIGINAL frame — fetching it through
    # the encoded frame would run the Arrow encode pass just to read one
    # row, and the rescore below reuses the original frame for the same
    # reason (the codes exist only to pick the shortlist)
    qrow = (
        df.filter(F.col(id_col) == query_id).select(vec_col).limit(1).collect()
    )
    if not qrow:
        raise ValueError(f"query_id {query_id!r} not found")
    lut = pq_lut(qrow[0][0], books)
    if code_col is None:
        coded = pq_encode(
            df.select(id_col, vec_col), vec_col, books, out_col="_pq"
        )
        code_col = "_pq"
    else:
        coded = df
    shortlist = (
        coded.filter(F.col(id_col) != query_id)
        .withColumn("_adc", pq_adc_score(code_col, lut, k_eff))
        .orderBy("_adc", id_col)
        .limit(refine * k)
        .select(id_col)
    )
    # the query vector was already collected for the LUT — ride it into
    # the plan as a literal instead of re-scanning the corpus for the
    # same row (an id data-filter is the full-scan economics the vector
    # store's stored_vector docstring warns about; review r10)
    qv_lit = F.lit([float(x) for x in qrow[0][0]])
    rescored = (
        df.join(F.broadcast(shortlist), id_col)
        .withColumn("_cos", cosine(vec_col, qv_lit))
    )
    return (
        rescored.orderBy(F.desc("_cos"), F.col(id_col))
        .select(
            id_col, *(extra_cols or []), F.round("_cos", 6).alias("cosine")
        )
        .limit(k)
    )


# ---------------------------------------------------------------------
# Oracle-reproducible twin (same role as knn_ivf_md5 for IVF)
# ---------------------------------------------------------------------


def md5_pq_codebooks(
    df: DataFrame, id_col: str, vec_col: str, *, m: int, ksub: int
) -> list[list[list[float]]]:
    """Deterministic pseudo-random PQ codebooks: subspace ``j``'s codebook
    is the j-th subvector of the ``ksub`` rows with the smallest
    ``(md5(id), id)``; code = rank in that order. Engine-portable — any
    SQL engine reproduces the identical codebooks — the oracle twin of
    :func:`train_pq_codebooks` exactly as ``md5_centroids`` twins
    ``train_ivf_centroids``. Returns ``[m][ksub][d/m]`` plain floats."""
    rows = (
        df.select(F.col(id_col), as_double(vec_col).alias("_v"))
        .withColumn("_m", F.md5(F.col(id_col).cast("string")))
        .orderBy("_m", id_col)
        .limit(ksub)
        .select("_v")
        .collect()
    )
    if not rows:
        raise ValueError("cannot build PQ codebooks: table is empty")
    dim = len(rows[0]["_v"])
    slices = _split_dims(dim, m)
    return [
        [[float(x) for x in r["_v"][s - 1 : s - 1 + d]] for r in rows]
        for (s, d) in slices
    ]


def _pq_codes_exact(
    df: DataFrame, id_col: str, vec_col: str, codebooks, out_col: str
) -> DataFrame:
    """The narrow ``(id, codes)`` relation behind :func:`pq_encode_exact` —
    :func:`knn_pq_md5` consumes it directly so the shortlist scan never
    drags the full input row width through the encode aggregation."""
    return df.select(
        F.col(id_col), _pq_codes_expr(vec_col, codebooks).alias(out_col)
    )


def _pq_codes_expr(vec_col: str, codebooks):
    """The PQ code array as ONE row-local column expression: per
    subspace j, argmin over a literal codeword array via ``array_min``
    on ``struct(_d, _code)`` — the same interpreted ordering as the
    former ``min(struct(_d, _code))`` aggregate, over the same
    per-(row, codeword) left-fold distance expression, so codes are
    bit-identical. Replaces the m*ksub-way crossJoin, TWO aggregate
    exchanges (the first a SortAggregate: min-of-struct has a
    non-mutable buffer), the collect_list re-sort AND the join-back
    with a projection; the j-ascending output array equals the former
    ``array_sort(collect_list(struct(_j, _code)))`` extraction."""
    books = [[list(map(float, c)) for c in book] for book in codebooks]
    m = len(books)
    dim = m * len(books[0][0])
    slices = _split_dims(dim, m)
    sub = dim // m
    v = as_double(vec_col)
    def _scored(sv):
        # one-arg lambda (a 2-arg transform lambda would receive the
        # element INDEX as its second argument); sv captured by closure
        return lambda cc: F.struct(
            (
                dot(sv, sv)
                - 2 * dot(sv, cc["_cv"])
                + dot(cc["_cv"], cc["_cv"])
            ).alias("_d"),
            cc["_code"].alias("_code"),
        )

    per_j = []
    for j in range(m):
        sv = F.slice(v, slices[j][0], sub)
        codewords = F.array(
            *[
                F.struct(
                    F.lit(books[j][c]).cast("array<double>").alias("_cv"),
                    F.lit(int(c)).cast("int").alias("_code"),
                )
                for c in range(len(books[j]))
            ]
        )
        best = F.array_min(F.transform(codewords, _scored(sv)))
        per_j.append(best["_code"])
    return F.array(*per_j)


def pq_encode_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks,
    *,
    out_col: str = "pq_code",
) -> DataFrame:
    """Engine-portable PQ encoding: per subspace, argmin squared L2 via the
    dot-product expansion ``<v,v> - 2<v,c> + <c,c>`` with code tie-break —
    bit-identical across engines where :func:`pq_encode`'s numpy path is
    only mathematically equal (the ``ivf_assign_exact`` stance, per
    subspace). Costs a broadcast join with an ``m * ksub``-row codebook
    relation; use it when cross-engine exactness matters (oracle specs),
    numpy otherwise. Row-local since r13 (see :func:`_pq_codes_expr`):
    no keying, no join-back — every row keeps its codes in place.
    ``id_col`` stays in the signature for call-site compatibility."""
    del id_col  # row-local now; kept in the signature for callers
    return df.withColumn(out_col, _pq_codes_expr(vec_col, codebooks))


def knn_pq_md5(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    query_id,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    refine: int = 4,
) -> DataFrame:
    """Oracle-reproducible PQ top-k: md5 codebooks + exact-SQL encode +
    ADC shortlist + exact cosine rescore, every stage deterministic and
    engine-portable so DuckDB replays the WHOLE pipeline (codebooks ->
    codes -> LUT fold -> shortlist by ``(adc, id)`` -> top-k by
    ``(cosine DESC, id)``) hash-exact. Production keeps the Lloyd
    codebooks + Arrow-batched encode (:func:`knn_pq`); this twin trades
    quantizer quality for cross-engine byte-exactness. The only driver
    materializations are the ``ksub`` codebook rows and the query."""
    books = md5_pq_codebooks(df, id_col, vec_col, m=m, ksub=ksub)
    k_eff = len(books[0])
    enc = _pq_codes_exact(df, id_col, vec_col, books, "_pq")
    qrow = (
        df.filter(F.col(id_col) == query_id).select(vec_col).limit(1).collect()
    )
    if not qrow:
        raise ValueError(f"query_id {query_id!r} not found")
    lut = pq_lut([float(x) for x in qrow[0][0]], np.asarray(books))
    shortlist = (
        enc.filter(F.col(id_col) != query_id)
        .withColumn("_adc", F.round(pq_adc_score("_pq", lut, k_eff), 9))
        .orderBy("_adc", id_col)
        .limit(refine * k)
        .select(id_col)
    )
    # same one-collect stance as knn_pq: the already-collected query row
    # rides the plan as a literal; no second corpus scan for one row
    qv_lit = F.lit([float(x) for x in qrow[0][0]])
    rescored = (
        df.join(F.broadcast(shortlist), id_col)
        .withColumn("_cos", cosine(vec_col, qv_lit))
    )
    return (
        rescored.orderBy(F.desc("_cos"), F.col(id_col))
        .select(id_col, F.round("_cos", 6).alias("cosine"))
        .limit(k)
    )


def pq_adc_score_joined(
    code_col: str | Column,
    qvec_col: str | Column,
    books_col: str | Column,
    *,
    m: int,
    ksub: int,
    dsub: int,
) -> Column:
    """ADC for the BATCH path, where the query vector is a joined column
    (not a driver-side constant): approximate squared L2 computed
    directly from the row's codes, the query subvectors, and a flattened
    codebook column (``books[(j*ksub + code)*dsub + t]``) carried by a
    broadcast 1-row relation — a plan-literal LUT per query cannot exist
    when the queries are a DataFrame.

    Every per-subspace entry is the dot-product expansion
    ``<q,q> - 2<q,c> + <c,c>`` with sequential left-fold dots, and the
    outer sum folds j ascending — the IDENTICAL operation sequence as
    :func:`pq_lut` + :func:`pq_adc_score`, so batch and single-query
    ADC values are bit-identical and the two paths shortlist the same
    rows. Per candidate this is ~3x dim multiply-adds — the same cost
    class as a cosine — but the SCAN reads m ints instead of dim floats
    per row, which is the PQ economics at 100 TB."""
    qv = col_of(qvec_col)
    bf = col_of(books_col)
    idx = F.zip_with(
        col_of(code_col),
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda c, j: F.struct(j.alias("j"), (c + j * ksub).alias("row")),
    )

    def _fold(term):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(dsub - 1)), F.lit(0.0), term
        )

    def _sub_dist(acc, s):
        def q_at(t):
            return F.element_at(qv, s.j * dsub + t + 1)

        def c_at(t):
            return F.element_at(bf, s.row * dsub + t + 1)

        qq = _fold(lambda a, t: a + q_at(t) * q_at(t))
        qc = _fold(lambda a, t: a + q_at(t) * c_at(t))
        cc = _fold(lambda a, t: a + c_at(t) * c_at(t))
        return acc + (qq - 2 * qc + cc)

    return F.aggregate(idx, F.lit(0.0), _sub_dist)
