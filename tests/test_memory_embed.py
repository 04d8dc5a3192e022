"""Memory upsert + embedding operator tests (reference A16/A18)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bambooai_spark.io import load_table
from bambooai_spark.operators.embed import embed_texts, hash_embedder
from bambooai_spark.operators.memory import upsert_with_dedup
from tests.conftest import SF_DIR


def _mem(spark, rows):
    return spark.createDataFrame(
        rows, "id: long, vec: array<double>, rank: long, blk: string"
    )


def test_upsert_reference_semantics(spark):
    # existing: one record per block
    existing = _mem(spark, [(1, [1.0, 0.0], 7, "a"), (2, [0.0, 1.0], 9, "b")])
    new = _mem(
        spark,
        [
            (10, [1.0, 0.001], 8, "a"),   # strong match id=1, higher rank → replaces
            (11, [0.001, 1.0], 5, "b"),   # below min_rank → dropped
            (12, [0.0, 1.0], 9, "b"),     # strong match id=2, equal rank → dropped
            (13, [0.7, 0.7], 8, "c"),     # no existing in block → inserted
        ],
    )
    out = upsert_with_dedup(
        existing, new, id_col="id", vec_col="vec", rank_col="rank",
        threshold=0.94, min_rank=6, block_col="blk",
    )
    ids = sorted(r.id for r in out.collect())
    assert ids == [2, 10, 13]  # 1 replaced by 10; 11,12 dropped; 13 inserted


def test_upsert_no_block_requires_cross(spark):
    existing = _mem(spark, [(1, [1.0, 0.0], 7, "a")])
    new = _mem(spark, [(10, [1.0, 0.0], 9, "zzz")])  # different block value
    # unblocked: match found (cross join) → replace
    out = upsert_with_dedup(
        existing, new, id_col="id", vec_col="vec", rank_col="rank",
        threshold=0.94, min_rank=6, block_col=None,
    )
    assert sorted(r.id for r in out.collect()) == [10]


def test_embed_texts_contract(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(40)
    out = embed_texts(docs, "text", dim=32, id_cols=["doc_id"])
    assert [f.name for f in out.schema.fields] == ["doc_id", "embedding"]
    rows = {r.doc_id: r.embedding for r in out.collect()}
    assert len(rows) == 40
    for v in rows.values():
        assert len(v) == 32
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-5)
    # deterministic across partitionings (Arrow batch boundaries don't leak)
    again = {
        r.doc_id: r.embedding
        for r in embed_texts(
            docs.repartition(7), "text", dim=32, id_cols=["doc_id"]
        ).collect()
    }
    assert rows == again


def test_hash_embedder_stable_and_batch_invariant():
    e = hash_embedder(16)
    a = e(["hello world", "spark engine"])
    b = e(["hello world"]) + e(["spark engine"])
    assert a == b  # batching never changes values
    assert e([""]) == [[0.0] * 16]  # empty text → zero vector (norm guard)
