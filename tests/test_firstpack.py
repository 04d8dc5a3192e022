"""The r13 packed first-occurrence optimization (gram_store.packed_occurrence):
min over an order-isomorphic DECIMAL packing of (id, p) must select exactly
the occurrence min(struct(id, p)) would — including extreme and negative ids
— while planning as a HashAggregate instead of a SortAggregate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bambooai_spark.operators.gram_store import (
    gram_counts,
    id_packable,
    packed_occurrence,
    unpack_occurrence,
)


LONG_MIN = -(2**63)
LONG_MAX = 2**63 - 1


@pytest.fixture(scope="module")
def spark():
    from bambooai_spark.session import get_session

    return get_session("test-firstpack", cpus=4)


def test_pack_order_isomorphic_extreme_ids(spark):
    # (id, p) pairs covering sign boundaries and Long extremes; p spans
    # 1..2^31-1 (the substring-position range)
    pairs = [
        (LONG_MIN, 1),
        (LONG_MIN, 2**31 - 1),
        (-1, 5),
        (0, 1),
        (0, 7),
        (1, 3),
        (LONG_MAX, 1),
        (LONG_MAX, 2**31 - 1),
    ]
    df = spark.createDataFrame(pairs, "i long, p long")
    got = (
        df.select(packed_occurrence("i", "p").alias("pk"), "i", "p")
        .orderBy("pk")
        .collect()
    )
    assert [(r["i"], r["p"]) for r in got] == sorted(pairs)
    # roundtrip through unpack restores every (i, p) exactly
    from pyspark.sql.types import LongType

    back = df.select(
        unpack_occurrence(packed_occurrence("i", "p"), LongType()).alias("f"),
        "i",
        "p",
    ).collect()
    for r in back:
        assert (r["f"]["i"], r["f"]["p"]) == (r["i"], r["p"])


def test_gram_counts_first_matches_struct_min(spark):
    # duplicated grams across docs with adversarial id order: the packed
    # min must pick the same earliest (id, pos) as min(struct(id, pos))
    rows = [
        (9, "abcabcabc"),
        (-3, "abcxyzabc"),
        (0, "zzzabczzz"),
        (7, "xyzxyz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert id_packable(df, "doc_id")
    got = gram_counts(df, "text", k=3, id_col="doc_id")
    from bambooai_spark.operators.gram_store import _postings

    pos = _postings(df, "text", 3, "doc_id")
    want = pos.groupBy("gram").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(
            F.struct(F.col("i").alias("i"), F.col("p").alias("p"))
        ).alias("first"),
    )
    g = {r["gram"]: (r["cnt"], r["first"]["i"], r["first"]["p"])
         for r in got.collect()}
    w = {r["gram"]: (r["cnt"], r["first"]["i"], r["first"]["p"])
         for r in want.collect()}
    assert g == w
    # and the packed form actually plans hash-aggregated: no SortAggregate
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "simple"
    )
    assert "SortAggregate" not in plan, plan


def test_gram_counts_first_dtype_preserved(spark):
    # int ids keep their dtype in the first struct (store schema parity)
    df = spark.createDataFrame(
        [(3, "aaaa"), (1, "aaaa")], "doc_id int, text string"
    )
    got = gram_counts(df, "text", k=3, id_col="doc_id")
    field = dict(got.schema["first"].dataType.fields[0].__dict__)
    assert field["name"] == "i"
    assert field["dataType"].simpleString() == "int"
    row = {r["gram"]: r["first"] for r in got.collect()}
    assert row["aaa"]["i"] == 1 and row["aaa"]["p"] == 1


def test_string_ids_fall_back_to_struct_min(spark):
    df = spark.createDataFrame(
        [("b", "aaaa"), ("a", "aaaa")], "doc_id string, text string"
    )
    assert not id_packable(df, "doc_id")
    got = {r["gram"]: r["first"]
           for r in gram_counts(df, "text", k=3, id_col="doc_id").collect()}
    assert got["aaa"]["i"] == "a" and got["aaa"]["p"] == 1
