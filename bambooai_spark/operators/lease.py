"""Advisory single-writer lease for a corpus root.

The corpus protocol (``operators/writer.py``) is single-writer by
contract: two jobs appending/compacting/deleting the same corpus
concurrently can interleave manifest folds and staged-file moves into a
state neither intended (the same contract Delta Lake holds via its log
store; on S3 even Delta needs an external lock service). The common ops
mistake is not malice but a scheduler double-firing the same pipeline —
this module turns that from silent corruption into a loud
:class:`CorpusLeaseHeld` at job start.

Mechanism: a ``_lease.json`` marker at the corpus root, acquired by
CREATE-EXCLUSIVE on the Hadoop FileSystem API (``create(path,
overwrite=false)`` — truly atomic on HDFS; on local/file:// Hadoop's
LocalFileSystem implements the no-overwrite check as exists-then-create
(no O_EXCL) and on S3A as HEAD-then-PUT, so on those a sub-millisecond
creation race can slip through — which is exactly why this lease is
ADVISORY, not a correctness dependency of the commit protocol). The
holder refreshes a heartbeat; a lease whose heartbeat is older than its
TTL is stale and may be taken over (claimed ASIDE by atomic rename
first, so two racing takeovers cannot delete each other's fresh lease).
``ensure()`` re-reads the marker and raises :class:`CorpusLeaseLost` if
another writer took over — the writer entry points call it at start and
again immediately before their commit step, so a zombie holder that
lost its lease mid-job fails BEFORE publishing, not after.

What this protects: two healthy writers racing the same corpus. What it
cannot protect: a holder that dies between its last ``ensure()`` and
its commit write (a window of milliseconds), or S3A's non-atomic
create. The crash-recovery protocol (staging + idempotent folds) is the
correctness backstop either way.

Heartbeat staleness compares the marker's embedded wall-clock instant
against the READER's clock — tolerate ordinary NTP skew by keeping
``ttl_s`` well above seconds (default 300 s).

Reference parity: the reference is a single-process pandas app with no
concurrent-writer surface; this guards the corpus analog its scale
requires (SURVEY §7 writer/manifest family).
"""

from __future__ import annotations

import json
import os
import socket
import time
import uuid

from pyspark.sql import SparkSession

from bambooai_spark.operators.writer import (
    _fs,
    _fs_delete,
    _fs_exists,
    _fs_read_text,
    _join,
)

LEASE_NAME = "_lease.json"
DEFAULT_TTL_S = 300.0


class CorpusLeaseHeld(RuntimeError):
    """Another writer holds a live lease on this corpus."""


class CorpusLeaseLost(RuntimeError):
    """This writer's lease was taken over (stale heartbeat) — abort
    before publishing anything."""


def _fs_create_exclusive(spark: SparkSession, path: str, text: str) -> bool:
    """Create ``path`` with ``text`` iff it does not exist. Returns False
    when it already exists (raced or held). Atomic existence on HDFS;
    on local/file:// and S3A the no-overwrite check is exists-then-create
    (no O_EXCL), hence the ADVISORY framing. CONTENT is never atomic —
    readers must tolerate a torn doc.

    Only an already-exists outcome maps to False: any other create
    failure (permissions, read-only mount, dead namenode) re-raises so
    a real I/O problem is not misdiagnosed as lease contention."""
    fs, jpath = _fs(spark, path)
    try:
        out = fs.create(jpath, False)
    except Exception:
        if _fs_exists(spark, path):
            return False  # FileAlreadyExists and its checksum variants
        raise
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    return True


class CorpusLease:
    """Advisory writer lease on one corpus root. Use as a context
    manager::

        with corpus_lease(spark, path) as lease:
            append_corpus_txn(df, path, ..., lease=lease)

    Not thread-safe: one CorpusLease per writing job."""

    def __init__(
        self,
        spark: SparkSession,
        corpus_path: str,
        *,
        owner: str | None = None,
        ttl_s: float = DEFAULT_TTL_S,
    ) -> None:
        if ttl_s <= 0:
            raise ValueError(f"ttl_s must be positive, got {ttl_s}")
        self.spark = spark
        self.corpus_path = corpus_path
        self.lease_path = _join(corpus_path, LEASE_NAME)
        self.owner = owner or (
            f"{socket.gethostname()}-{os.getpid()}-{uuid.uuid4().hex[:12]}"
        )
        self.ttl_s = float(ttl_s)
        self.held = False

    # -- document helpers -------------------------------------------------

    def _doc(self) -> str:
        return json.dumps(
            {
                "owner": self.owner,
                "heartbeat": time.time(),
                "ttl_s": self.ttl_s,
            }
        )

    def _read(self) -> dict | None:
        """The current lease doc, or None if absent. A torn/unparseable
        doc (create-exclusive publishes existence before content) reads
        as a foreign lease with heartbeat NOW — it only becomes
        take-over-able once it has sat unparseable for a full TTL."""
        if not _fs_exists(self.spark, self.lease_path):
            return None
        try:
            raw = _fs_read_text(self.spark, self.lease_path)
            doc = json.loads(raw)
            if not isinstance(doc, dict) or "owner" not in doc:
                raise ValueError("not a lease doc")
            return doc
        except Exception:
            fs, jpath = _fs(self.spark, self.lease_path)
            try:
                mtime = fs.getFileStatus(jpath).getModificationTime() / 1000.0
            except Exception:
                mtime = time.time()  # vanished/unreadable — assume fresh
            return {"owner": "<unreadable>", "heartbeat": mtime,
                    "ttl_s": self.ttl_s}

    def _stale(self, doc: dict) -> bool:
        try:
            hb = float(doc.get("heartbeat", 0.0))
            ttl = float(doc.get("ttl_s", self.ttl_s))
        except (TypeError, ValueError):
            hb, ttl = 0.0, self.ttl_s
        return (time.time() - hb) > ttl

    # -- lifecycle --------------------------------------------------------

    def _take_over_stale(self) -> None:
        """Remove a stale lease WITHOUT racing a concurrent takeover into
        deleting the winner's fresh lease: rename the marker ASIDE first
        (atomic claim — of two racers exactly one rename succeeds, the
        other's source is gone), re-judge staleness on the claimed copy,
        and restore it if it turns out live (a blind delete here was the
        two-holders bug: both racers judge the SAME old doc stale, the
        slower one deletes the faster one's just-created lease)."""
        aside = f"{self.lease_path}.takeover-{uuid.uuid4().hex[:8]}"
        fs, src = _fs(self.spark, self.lease_path)
        try:
            claimed = bool(fs.rename(src, _fs(self.spark, aside)[1]))
        except Exception:
            claimed = False  # vanished / already claimed — re-race
        if not claimed:
            return
        try:
            raw = _fs_read_text(self.spark, aside)
            doc = json.loads(raw)
            live = isinstance(doc, dict) and not self._stale(doc)
        except Exception:
            live = False  # torn doc only reaches here past its ttl
        if live:
            # claimed a FRESH lease (the old holder heartbeat, or a
            # takeover won, between our read and the rename) — put it
            # back; if the holder already re-created the marker, their
            # copy is newer and ours is redundant
            try:
                if not fs.rename(
                    _fs(self.spark, aside)[1], _fs(self.spark, self.lease_path)[1]
                ):
                    _fs_delete(self.spark, aside)
            except Exception:
                _fs_delete(self.spark, aside)
        else:
            _fs_delete(self.spark, aside)

    def acquire(self) -> "CorpusLease":
        """Take the lease, or raise :class:`CorpusLeaseHeld` if a live
        one exists. A stale lease (heartbeat older than ITS ttl) is
        claimed aside and removed, then re-raced — create-exclusive
        decides the winner."""
        for _ in range(3):  # absent → create → (raced) re-read → retry
            if _fs_create_exclusive(self.spark, self.lease_path, self._doc()):
                self.held = True
                return self
            doc = self._read()
            if doc is None:
                continue  # holder released between exists and read
            if doc.get("owner") == self.owner:
                # our own marker (crash-restart with a pinned owner id)
                self.held = True
                self.heartbeat()
                return self
            if self._stale(doc):
                self._take_over_stale()
                continue  # re-race; loser sees Held on the next pass
            raise CorpusLeaseHeld(
                f"corpus {self.corpus_path} is write-leased by "
                f"{doc.get('owner')!r} (heartbeat "
                f"{time.time() - float(doc.get('heartbeat', 0.0)):.0f}s "
                f"ago, ttl {doc.get('ttl_s')}s)"
            )
        raise CorpusLeaseHeld(
            f"corpus {self.corpus_path}: lease contended (3 acquire races "
            "lost)"
        )

    def heartbeat(self) -> None:
        """Refresh the holder's heartbeat. Raises
        :class:`CorpusLeaseLost` if the marker now names another owner
        (a TTL takeover happened)."""
        self.ensure()
        # plain overwrite: we just verified ownership, and a concurrent
        # takeover after that read is the documented advisory window
        from bambooai_spark.operators.writer import _fs_write_text

        _fs_write_text(self.spark, self.lease_path, self._doc())

    def ensure(self) -> None:
        """Assert this writer still holds the lease (call before any
        publish step). Raises :class:`CorpusLeaseLost` otherwise."""
        if not self.held:
            raise CorpusLeaseLost(
                f"corpus {self.corpus_path}: lease not held (never "
                "acquired or already released)"
            )
        doc = self._read()
        if doc is None or doc.get("owner") != self.owner:
            self.held = False
            raise CorpusLeaseLost(
                f"corpus {self.corpus_path}: lease lost to "
                f"{(doc or {}).get('owner')!r} — aborting before publish"
            )

    def release(self) -> None:
        """Drop the lease if still ours; never raises on a lost lease
        (the takeover already owns the marker)."""
        if not self.held:
            return
        self.held = False
        doc = self._read()
        if doc is not None and doc.get("owner") == self.owner:
            _fs_delete(self.spark, self.lease_path)

    def __enter__(self) -> "CorpusLease":
        return self.acquire()

    def __exit__(self, exc_type, exc, tb) -> None:
        self.release()


def corpus_lease(
    spark: SparkSession,
    corpus_path: str,
    *,
    owner: str | None = None,
    ttl_s: float = DEFAULT_TTL_S,
) -> CorpusLease:
    """Advisory single-writer lease on ``corpus_path`` (context
    manager; see :class:`CorpusLease`)."""
    return CorpusLease(spark, corpus_path, owner=owner, ttl_s=ttl_s)
