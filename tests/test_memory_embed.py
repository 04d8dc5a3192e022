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


class _FakeBackend:
    """In-memory RetrievalBackend computing true cosine — stands in for a
    user's existing Pinecone/Qdrant index behind the seam."""

    def __init__(self):
        self.store = {}  # id -> (vector, metadata)
        self.calls = []

    def query(self, vector, top_k=1):
        import numpy as np

        from bambooai_spark.agent.retrieval_backends import BackendMatch

        self.calls.append("query")
        q = np.asarray(vector, dtype=float)
        scored = []
        for rid, (v, meta) in self.store.items():
            v = np.asarray(v, dtype=float)
            denom = float(np.linalg.norm(q) * np.linalg.norm(v))
            scored.append(
                BackendMatch(rid, float(q @ v / denom) if denom else 0.0, meta)
            )
        scored.sort(key=lambda m: (-m.score, m.record_id))
        return scored[:top_k]

    def upsert(self, record_id, vector, metadata):
        self.calls.append("upsert")
        self.store[record_id] = (list(vector), dict(metadata))

    def delete(self, record_id):
        self.calls.append("delete")
        self.store.pop(record_id, None)


def test_episodic_memory_external_backend_seam(spark):
    """EpisodicMemory drives an injected RetrievalBackend with the exact
    reference semantics: retrieve gated at >= 0.80, writes rank-gated at
    >= 6, and a >= 0.94 strong match replaced only by a HIGHER rank
    (upsert new + delete old, qa_retrieval.py:191-202)."""
    from bambooai_spark.agent.memory import EpisodicMemory
    from bambooai_spark.agent.retrieval_backends import RetrievalBackend

    be = _FakeBackend()
    assert isinstance(be, RetrievalBackend)  # runtime-checkable protocol
    mem = EpisodicMemory(spark, backend=be)

    # rank gate: below 6 never reaches the backend
    assert not mem.add("r0", "count orders per month", rank=3)
    assert be.store == {}

    assert mem.add("r1", "count orders per month", plan="p1", code="c1", rank=7)
    assert set(be.store) == {"r1"}

    # retrieve: identical intent → cosine 1.0 >= 0.80, full metadata back
    hit = mem.retrieve("count orders per month")
    assert hit is not None and hit.record_id == "r1"
    assert hit.score >= 0.80 and hit.plan == "p1" and hit.code == "c1"
    assert hit.rank == 7

    # an unrelated intent falls below the 0.80 gate
    assert mem.retrieve("boxplot of supplier balances by region") is None

    # strong match (same intent → 1.0 >= 0.94) with LOWER rank: dropped
    assert mem.add("r2", "count orders per month", rank=6)
    assert set(be.store) == {"r1"}

    # strong match with HIGHER rank: new upserted, old deleted
    assert mem.add("r3", "count orders per month", plan="p3", rank=9)
    assert set(be.store) == {"r3"}
    hit2 = mem.retrieve("count orders per month")
    assert hit2.record_id == "r3" and hit2.rank == 9 and hit2.plan == "p3"

    # a genuinely different intent is inserted alongside
    assert mem.add("r4", "boxplot of supplier balances by region", rank=6)
    assert set(be.store) == {"r3", "r4"}


def test_episodic_memory_backend_same_id_reupsert_survives(spark):
    """A repeat question re-derives the SAME deterministic record id; the
    strong-match replace must not delete the record it just upserted."""
    from bambooai_spark.agent.memory import EpisodicMemory

    be = _FakeBackend()
    mem = EpisodicMemory(spark, backend=be)
    assert mem.add("mem-x", "count orders per month", plan="v1", rank=7)
    assert mem.add("mem-x", "count orders per month", plan="v2", rank=9)
    assert set(be.store) == {"mem-x"}  # not erased by self-delete
    hit = mem.retrieve("count orders per month")
    assert hit is not None and hit.plan == "v2" and hit.rank == 9


def test_pinecone_wrapper_request_shapes_recorded():
    """PineconeBackend must emit exactly the request shapes the reference
    sends (qa_retrieval.py:277-299: query with include_metadata=True,
    tuple-form upsert, delete by ids list) — recorded against a fake
    index standing in for the pinecone client."""
    from bambooai_spark.agent.retrieval_backends import PineconeBackend

    calls = []

    class FakeIndex:
        def query(self, **kw):
            calls.append(("query", kw))
            return {
                "matches": [
                    {"id": "rec-1", "score": 0.97, "metadata": {"q": "t"}},
                    {"id": "rec-2", "score": 0.81, "metadata": None},
                ]
            }

        def upsert(self, **kw):
            calls.append(("upsert", kw))

        def delete(self, **kw):
            calls.append(("delete", kw))

    b = PineconeBackend(FakeIndex())
    got = b.query([0.1, 0.2], top_k=2)
    assert [(m.record_id, m.score, m.metadata) for m in got] == [
        ("rec-1", 0.97, {"q": "t"}),
        ("rec-2", 0.81, {}),
    ]
    b.upsert("rec-9", [0.5, 0.5], {"q": "question"})
    b.delete("rec-9")

    assert calls[0] == (
        "query",
        {"vector": [0.1, 0.2], "top_k": 2, "include_metadata": True},
    )
    # reference upsert_record: index.upsert(vectors=[(id, vector, meta)])
    assert calls[1] == (
        "upsert",
        {"vectors": [("rec-9", [0.5, 0.5], {"q": "question"})]},
    )
    # reference delete_record: index.delete(ids=[str(record_id)])
    assert calls[2] == ("delete", {"ids": ["rec-9"]})


def test_qdrant_wrapper_request_shapes_recorded():
    """QdrantBackend must follow the reference's Qdrant contract
    (qa_retrieval.py:387-465): arbitrary record ids map through
    uuid5(NAMESPACE_DNS, id) because Qdrant only accepts UUID/int point
    ids, the original id round-trips via the payload's original_id,
    queries use the modern query_points API, deletes use a point-ids
    selector."""
    import uuid
    from types import SimpleNamespace

    from bambooai_spark.agent.retrieval_backends import QdrantBackend

    uid = str(uuid.uuid5(uuid.NAMESPACE_DNS, "rec-9"))
    calls = []

    class FakeClient:
        def query_points(self, **kw):
            calls.append(("query_points", kw))
            return SimpleNamespace(
                points=[
                    SimpleNamespace(
                        id=uid,
                        score=0.95,
                        payload={"q": "t", "original_id": "rec-9"},
                    ),
                    # a point upserted by some other client, no original_id
                    SimpleNamespace(id="123", score=0.5, payload=None),
                    # a foreign point whose metadata happens to contain a
                    # column named 'id' — it must NOT hijack record identity
                    SimpleNamespace(id="456", score=0.4, payload={"id": "x"}),
                ]
            )

        def upsert(self, **kw):
            calls.append(("upsert", kw))

        def delete(self, **kw):
            calls.append(("delete", kw))

    b = QdrantBackend(FakeClient(), "bambooai-qa-retrieval-hf")
    got = b.query([0.1, 0.2], top_k=2)
    # original id restored for reference-written points; raw id otherwise
    assert [(m.record_id, m.score) for m in got] == [
        ("rec-9", 0.95), ("123", 0.5), ("456", 0.4)
    ]

    b.upsert("rec-9", [0.5, 0.5], {"q": "question"})
    b.delete("rec-9")

    assert calls[0] == (
        "query_points",
        {
            "collection_name": "bambooai-qa-retrieval-hf",
            "query": [0.1, 0.2],
            "limit": 2,
            "with_payload": True,
        },
    )
    kind, kw = calls[1]
    assert kind == "upsert" and kw["collection_name"] == "bambooai-qa-retrieval-hf"
    [point] = kw["points"]
    # qdrant-client not installed in this container → the dict wire shape
    assert point == {
        "id": uid,
        "vector": [0.5, 0.5],
        "payload": {"q": "question", "original_id": "rec-9"},
    }
    assert calls[2] == (
        "delete",
        {
            "collection_name": "bambooai-qa-retrieval-hf",
            "points_selector": {"points": [uid]},
        },
    )
