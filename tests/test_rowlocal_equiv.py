"""The r13 row-local rewrites must be bit-identical to the aggregate
formulations they replaced.

- ``ivf_assign_exact`` / ``_pq_codes_expr``: ``array_min`` over literal
  struct arrays vs the former crossJoin + ``min(struct(...))`` groupBy —
  same interpreted ordering (NULLS-FIRST struct fields, NaN greatest),
  same left-fold distance arithmetic.
- ``word_shingles`` / ``quantize_int8``: the single-element-transform
  "let" binding vs the naive inlined-expression form (which re-evaluates
  the split / max-abs fold per element — the r13 O(n²) finding).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bambooai_spark.functions.vectors import as_double, dot


@pytest.fixture(scope="module")
def spark():
    from bambooai_spark.session import get_session

    return get_session("test-rowlocal", cpus=4)


NAN = float("nan")
# 4-dim vectors incl. NULL id, NULL vector, NaN component, zero vector,
# and an exact tie between two centroids (centroid tie-break matters)
VECS = [
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.5, 0.5, 0.0, 0.0]),  # equidistant from centroids 0 and 1
    (4, [0.0, 0.0, 0.0, 0.0]),
    (5, [NAN, 0.0, 0.0, 0.0]),
    (6, None),
    (None, [0.0, 0.0, 1.0, 0.0]),
]
CENTS = [
    [1.0, 0.0, 0.0, 0.0],
    [0.0, 1.0, 0.0, 0.0],
    [0.0, 0.0, 1.0, 1.0],
]


def _vec_df(spark):
    return spark.createDataFrame(
        VECS, "vec_id bigint, embedding array<double>"
    )


def _old_ivf_assign_exact(df, id_col, vec_col, centroids, *, out_col):
    """The pre-r13 formulation, verbatim: crossJoin + min(struct) +
    null-safe join-back."""
    spark = df.sparkSession
    cdf = F.broadcast(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "_cell INT, _cv ARRAY<DOUBLE>",
        )
    )
    v = as_double("_v")
    d = dot(v, v) - 2 * dot(v, "_cv") + dot("_cv", "_cv")
    assigned = (
        df.select(F.col(id_col), as_double(vec_col).alias("_v"))
        .crossJoin(cdf)
        .withColumn("_d", d)
        .groupBy(id_col)
        .agg(F.min(F.struct("_d", "_cell")).alias("_mc"))
        .select(F.col(id_col).alias("_aid"), F.col("_mc._cell").alias(out_col))
    )
    return df.join(
        assigned, df[id_col].eqNullSafe(assigned["_aid"])
    ).drop("_aid")


def test_ivf_assign_exact_matches_aggregate_form(spark):
    from bambooai_spark.operators.similarity import ivf_assign_exact

    df = _vec_df(spark)
    old = {
        r["vec_id"]: r["c"]
        for r in _old_ivf_assign_exact(
            df, "vec_id", "embedding", CENTS, out_col="c"
        ).collect()
    }
    new = {
        r["vec_id"]: r["c"]
        for r in ivf_assign_exact(
            df, "vec_id", "embedding", CENTS, out_col="c"
        ).collect()
    }
    assert new == old
    # the exact tie must break toward the LOWER cell id (struct ordering)
    assert new[3] == 0


def _old_pq_codes(df, id_col, vec_col, codebooks, out_col):
    """The pre-r13 formulation, verbatim: m*ksub crossJoin + min(struct)
    per subspace + collect_list re-sort."""
    from bambooai_spark.operators.pq import _split_dims

    spark = df.sparkSession
    books = [[list(map(float, c)) for c in book] for book in codebooks]
    m = len(books)
    dim = m * len(books[0][0])
    slices = _split_dims(dim, m)
    flat = [
        (j, c, slices[j][0], books[j][c])
        for j in range(m)
        for c in range(len(books[j]))
    ]
    cdf = F.broadcast(
        spark.createDataFrame(
            flat, "_j INT, _code INT, _s INT, _cv ARRAY<DOUBLE>"
        )
    )
    staged = (
        df.select(F.col(id_col), as_double(vec_col).alias("_v"))
        .crossJoin(cdf)
        .withColumn("_sv", F.slice(F.col("_v"), F.col("_s"), F.lit(dim // m)))
    )
    d2 = dot("_sv", "_sv") - 2 * dot("_sv", "_cv") + dot("_cv", "_cv")
    return (
        staged.withColumn("_d", d2)
        .groupBy(id_col, "_j")
        .agg(F.min(F.struct("_d", "_code")).alias("_mc"))
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_j", F.col("_mc._code")))
                ),
                lambda s: s["_code"],
            ).alias(out_col)
        )
    )


def test_pq_codes_match_aggregate_form(spark):
    from bambooai_spark.operators.pq import _pq_codes_exact

    df = _vec_df(spark)
    # two subspaces of 2 dims, 2 codewords each
    books = [
        [[1.0, 0.0], [0.0, 1.0]],
        [[0.0, 0.0], [1.0, 1.0]],
    ]
    old = {
        r["vec_id"]: (tuple(r["c"]) if r["c"] is not None else None)
        for r in _old_pq_codes(df, "vec_id", "embedding", books, "c").collect()
    }
    new = {
        r["vec_id"]: (tuple(r["c"]) if r["c"] is not None else None)
        for r in _pq_codes_exact(
            df, "vec_id", "embedding", books, "c"
        ).collect()
    }
    assert new == old


def test_word_shingles_let_matches_naive(spark):
    from bambooai_spark.functions.text import tokens, word_shingles

    rows = [
        ("a b c d",),
        ("a",),
        ("",),
        (None,),
        ("x y x y x y",),
        ("  leading and   multi   spaces",),
    ]
    df = spark.createDataFrame(rows, "text string")

    # naive (pre-r13) form: split expression inlined into the lambda
    w = tokens("text")
    n = 2
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + j) for j in range(n)]
        ),
    )
    naive = F.array_distinct(
        F.when(F.size(w) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )
    )
    got = df.select(
        naive.alias("a"), word_shingles("text", n).alias("b")
    ).collect()
    for r in got:
        assert r["a"] == r["b"]


def test_quantize_let_matches_naive(spark):
    from bambooai_spark.functions.vectors import quantize_int8

    # NaN components make BOTH forms raise (NaN > 0 is true under
    # Spark's NaN-greatest semantics, and ANSI round(NaN)->int
    # overflows) — pre-existing behavior, excluded here
    df = _vec_df(spark).filter(
        F.col("vec_id").isNull() | (F.col("vec_id") != 5)
    )
    d = as_double("embedding")
    maxabs = F.aggregate(
        d, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = maxabs / F.lit(127.0)
    naive_codes = F.when(
        maxabs > 0,
        F.transform(d, lambda x: F.round(x / scale).cast("int")),
    ).otherwise(F.transform(d, lambda x: F.lit(0)))
    q = quantize_int8("embedding")
    got = df.select(
        naive_codes.alias("a"),
        q["codes"].alias("b"),
        scale.alias("sa"),
        q["scale"].alias("sb"),
    ).collect()
    for r in got:
        assert r["a"] == r["b"]
        assert (
            r["sa"] == r["sb"]
            or (r["sa"] != r["sa"] and r["sb"] != r["sb"])  # both NaN
        )
