"""Pluggable vector-retrieval backends for :class:`EpisodicMemory`
(reference qa_retrieval.py:237-501 — the Pinecone and Qdrant client
wrappers behind ``add_record``/``retrieve_matching_record``).

The engine's default store is the parquet-native Spark table (the
SURVEY-sanctioned substitution — similarity served by Spark itself), but
a user arriving from the reference may hold an existing Pinecone/Qdrant
index. This seam lets that index plug straight into the same retrieve
(>= 0.80) and strong-match upsert (>= 0.94) semantics: ``EpisodicMemory``
routes through a :class:`RetrievalBackend` when one is injected and
behaves identically either way.

The protocol is the minimal surface the reference actually uses: top-k
query by vector, upsert with metadata, delete by id
(qa_retrieval.py ``query``/``upsert_record``/``delete_record``).
Concrete Pinecone/Qdrant wrappers are import-gated — their client
libraries are not in this container; the seam itself is exercised by a
fake backend in tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Protocol, runtime_checkable


@dataclass
class BackendMatch:
    """One query hit (the reference reads match id/score/metadata —
    qa_retrieval.py:85-113)."""

    record_id: str
    score: float
    metadata: dict = field(default_factory=dict)


@runtime_checkable
class RetrievalBackend(Protocol):
    """What an external vector store must offer EpisodicMemory."""

    def query(self, vector: list[float], top_k: int = 1) -> list[BackendMatch]:
        """Most-similar records, best first, with cosine-like scores."""
        ...

    def upsert(self, record_id: str, vector: list[float], metadata: dict) -> None:
        ...

    def delete(self, record_id: str) -> None:
        ...


class PineconeBackend:
    """Thin wrapper over a Pinecone index (reference
    qa_retrieval.py:237-330: ``index.query(vector=..., top_k=...,
    include_metadata=True)`` / ``index.upsert(vectors=[(id, vec, meta)])``
    / ``index.delete(ids=[...])``). Import-gated: requires the public
    ``pinecone`` client package."""

    def __init__(self, index):
        self.index = index

    @classmethod
    def connect(cls, api_key: str, index_name: str):
        try:
            from pinecone import Pinecone  # noqa: PLC0415
        except ImportError as exc:  # pragma: no cover - lib not in container
            raise RuntimeError(
                "PineconeBackend needs the 'pinecone' client package"
            ) from exc
        return cls(Pinecone(api_key=api_key).Index(index_name))

    def query(self, vector, top_k: int = 1):
        res = self.index.query(
            vector=list(vector), top_k=top_k, include_metadata=True
        )
        return [
            BackendMatch(
                record_id=m["id"],
                score=float(m["score"]),
                metadata=dict(m.get("metadata") or {}),
            )
            for m in res["matches"]
        ]

    def upsert(self, record_id, vector, metadata):
        self.index.upsert(vectors=[(record_id, list(vector), metadata)])

    def delete(self, record_id):
        self.index.delete(ids=[record_id])


class QdrantBackend:
    """Thin wrapper over a Qdrant collection, matching the REFERENCE's
    actual request shapes (qa_retrieval.py:387-465): Qdrant only accepts
    UUID/integer point ids, so arbitrary record ids map through
    ``uuid5(NAMESPACE_DNS, id)`` with the original id round-tripped in
    the payload's ``original_id`` (qa_retrieval.py:387-396); queries go
    through the modern ``query_points`` API (qa_retrieval.py:399-404);
    deletes use a points-id selector (qa_retrieval.py:455-461).
    Import-gated: the typed ``PointStruct``/``PointIdsList`` models are
    used when the public ``qdrant-client`` package is importable, with
    the equivalent REST-shape dicts (which the client also accepts) as
    the fallback — that keeps the wire contract testable with a recorded
    fake transport in this container."""

    def __init__(self, client, collection: str):
        self.client = client
        self.collection = collection

    @staticmethod
    def _point_id(record_id) -> str:
        import uuid  # noqa: PLC0415

        return str(uuid.uuid5(uuid.NAMESPACE_DNS, str(record_id)))

    def query(self, vector, top_k: int = 1):
        res = self.client.query_points(
            collection_name=self.collection,
            query=list(vector),
            limit=top_k,
            with_payload=True,
        )
        out = []
        for h in res.points:
            payload = dict(h.payload or {})
            # identity comes ONLY from original_id (None-checked, not
            # truthiness — '' / 0 are valid ids). The reference also falls
            # back to a payload key literally named 'id'
            # (qa_retrieval.py:391-392, its legacy records); here a
            # generic metadata column named 'id' must not hijack record
            # identity, so foreign points keep their point id.
            original = payload.get("original_id")
            out.append(
                BackendMatch(
                    record_id=(
                        str(original) if original is not None else str(h.id)
                    ),
                    score=float(h.score),
                    metadata=payload,
                )
            )
        return out

    def upsert(self, record_id, vector, metadata):
        payload = dict(metadata)
        payload.setdefault("original_id", str(record_id))
        point = {
            "id": self._point_id(record_id),
            "vector": list(vector),
            "payload": payload,
        }
        try:
            from qdrant_client.models import PointStruct  # noqa: PLC0415

            point = PointStruct(**point)
        except ImportError:
            pass  # dict form carries the same wire shape
        self.client.upsert(collection_name=self.collection, points=[point])

    def delete(self, record_id):
        selector = {"points": [self._point_id(record_id)]}
        try:
            from qdrant_client.models import PointIdsList  # noqa: PLC0415

            selector = PointIdsList(**selector)
        except ImportError:
            pass
        self.client.delete(
            collection_name=self.collection, points_selector=selector
        )
