"""Streaming ingest pipeline for the documents table (SURVEY M5 extension).

The 100 TB ingest-time shape: documents arrive as files; each micro-batch
is quality-gated, PII-scrubbed, and fingerprinted ON ARRIVAL, so the
curated store never holds raw text and downstream dedup works off
precomputed fingerprints. All three stages are STATELESS column
expressions — the streaming plan is literally the batch plan applied per
micro-batch, so the batch-twin equality is exact (same rule as
streaming/events.py).

Exact dedup across batches belongs to the stateful layer:
``dropDuplicatesWithinWatermark`` on the fingerprint (see
``stream_dedup_events`` for the event-stream version) or the
foreachBatch MERGE in streaming/memory.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bambooai_spark.functions.text import (
    fingerprint,
    quality_filter,
    scrub_pii,
)


def read_documents_stream(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream source over the documents table (schema pinned from one
    batch footer read, as the events source does)."""
    path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.option("pathGlobFilter", "documents.parquet").parquet(sf_dir)


def ingest_documents(docs: DataFrame) -> DataFrame:
    """The per-batch ingest projection — works identically on a batch or a
    streaming DataFrame: quality gate (keep + reason), PII scrub, and the
    dedup fingerprint of the SCRUBBED text (the stored corpus is the
    scrubbed one, so fingerprints must match what is stored).

    Columns beyond the contract set pass through untouched (a source that
    grows a metadata column mid-stream reaches the corpus sink with it —
    the ``evolve_schema`` path); the computed names win a collision, as
    before."""
    computed = {"n_words", "keep", "reason", "n_pii", "text", "fp"}
    extras = [
        c
        for c in docs.columns
        if c not in computed and c not in ("doc_id", "lang", "source")
    ]
    qf = quality_filter("text")
    pii = scrub_pii("text")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        *extras,
        qf["n_words"].alias("n_words"),
        qf["keep"].alias("keep"),
        qf["reason"].alias("reason"),
        (pii["n_emails"] + pii["n_ips"] + pii["n_phones"]).alias("n_pii"),
        pii["scrubbed"].alias("text"),
    ).withColumn("fp", fingerprint("text", normalize=True))


def stream_ingest_documents(docs_stream: DataFrame) -> DataFrame:
    """Streaming twin — the same expression; named separately so call
    sites document intent."""
    return ingest_documents(docs_stream)


def _txn_namespace(spark: SparkSession, checkpoint_location: str) -> str:
    """Transaction-id namespace for one checkpointed query lineage.

    Micro-batch ids are only unique within a checkpoint, so txn ids embed
    a namespace derived from it — and the path is NORMALIZED
    (Hadoop-qualified) first: a restart that spells the same checkpoint
    differently ('/ckpt' vs '/ckpt/' vs a relative form) must land in the
    same namespace, or the replay of a crashed batch would miss its own
    staging/commit markers and re-append (duplicates).

    The checkpoint's QUERY ID (``<checkpoint>/metadata``, written by
    Structured Streaming at query start and reused verbatim on restart)
    is mixed in when present (ADVICE r7): a path alone would survive the
    ops mistake of deleting a checkpoint and restarting at the same spot
    — the new lineage restarts batch ids at 0 in the old namespace, and
    the surviving ``_commits`` markers would silently swallow its early
    batches (data loss for any NEW documents in them). A fresh checkpoint
    gets a fresh uuid, so that restart lands in a fresh namespace; a
    crash-restart reuses the metadata file, so replays still find their
    markers. Callers must therefore resolve the namespace AFTER the query
    starts (the metadata file does not exist before the first start).

    Upgrade caveat: builds predating the query-id mix used the path-only
    form for every batch. A batch that CRASHED under such a build and
    replays under this one lands in the id-mixed namespace and restages
    from scratch (the ledger anti-join still prevents document
    duplicates; the at-risk window is the corpus-moved/ledger-not-moved
    crash point). Drain or ``recover_staging`` in-flight batches before
    upgrading a live pipeline."""
    import hashlib  # noqa: PLC0415

    from bambooai_spark.operators.writer import (  # noqa: PLC0415
        _fs,
        _fs_exists,
        _fs_read_text,
        _join,
    )

    qualified = checkpoint_location
    resolved = True
    try:
        fs, jp = _fs(spark, checkpoint_location)
        qualified = fs.makeQualified(jp).toString()
    except Exception:
        resolved = False  # unresolvable scheme — raw-string namespace
    # absence of the metadata file is the only legitimate reason to fall
    # back to the path-only namespace (pre-start probes, unit tests): a
    # TRANSIENT read/parse failure must propagate instead — silently
    # dropping the query id would shift the replay into a namespace whose
    # markers it cannot see and re-append the crashed batch (review r8).
    # The failed micro-batch is retried by Structured Streaming. An
    # UNRESOLVABLE scheme skips the read entirely (the exists-check would
    # re-raise the suppressed resolution error, review r8 pass 2).
    qid = ""
    if resolved:
        mpath = _join(checkpoint_location, "metadata")
        if _fs_exists(spark, mpath):
            qid = str(json.loads(_fs_read_text(spark, mpath)).get("id") or "")
    if not qid:
        # path-only form — byte-identical to the pre-query-id scheme, so
        # namespaces computed before a metadata file exists (or by older
        # builds) stay stable
        return hashlib.md5(qualified.encode("utf-8")).hexdigest()[:8]
    return hashlib.md5(f"{qualified}\n{qid}".encode("utf-8")).hexdigest()[:8]


def _gate_grams(
    session: SparkSession,
    benchmark: DataFrame | None,
    bench_text_col: str,
    decontaminate_k: int,
    boilerplate_store: str | None,
    *,
    persist: bool = True,
) -> tuple[DataFrame | None, bool]:
    """Assemble the span-cut gram relation the ingest gates screen
    against: benchmark decontamination grams and/or the persisted
    boilerplate store, unioned so the batch text is spliced ONCE.
    Returns (grams, broadcast_ok) — broadcast is dropped whenever the
    corpus-scale store side is in play (AQE decides instead).
    ``persist=True`` caches the relation for repeated screening (a
    streaming query screens every micro-batch; the caller owns
    unpersist); a single batch ingest passes False."""
    parts = []
    grams_broadcast = True
    if benchmark is not None:
        from bambooai_spark.operators.dedup import (  # noqa: PLC0415
            benchmark_grams,
        )

        parts.append(
            benchmark_grams(benchmark, bench_text_col, k=decontaminate_k)
        )
    if boilerplate_store is not None:
        from bambooai_spark.operators.gram_store import (  # noqa: PLC0415
            read_gate_grams,
        )

        # read_gate_grams: the delta-refresh GATE OVERLAY when present
        # (fresher than the exact full-build base the batch surgery
        # composes against), else the base relation
        g, _meta = read_gate_grams(
            session, boilerplate_store, k=decontaminate_k
        )
        # the store relation is count-bearing (cnt [, first]); the gate
        # needs only the gram set, and the union with benchmark grams
        # requires matching schemas
        parts.append(g.select("gram"))
        grams_broadcast = False  # corpus-scale side: let AQE decide
    if not parts:
        return None, True
    grams = parts[0]
    for extra in parts[1:]:
        # duplicates across the two relations are harmless — the
        # screen is a semi-join (set semantics)
        grams = grams.unionByName(extra)
    if persist:
        grams = grams.persist()
    return grams, grams_broadcast


def _apply_span_gates(
    batch_df: DataFrame,
    grams: DataFrame | None,
    grams_broadcast: bool,
    decontaminate_k: int,
) -> DataFrame:
    """Cut gated spans from the batch text BEFORE the ingest projection:
    the quality gate, scrub, fingerprint, and token count must all
    describe the text that is actually stored, not the pre-cut
    original."""
    if grams is None:
        return batch_df
    from bambooai_spark.operators.dedup import (  # noqa: PLC0415
        contamination_cut,
    )
    from bambooai_spark.operators.similarity import (  # noqa: PLC0415
        spread_if_narrow,
    )

    # a micro-batch (or a single-file batch ingest) scans as ONE task,
    # so the gate's postings explode — the heavy per-row stage — would
    # run single-core; spread it across the session first (no-op on
    # multi-split batches at scale, guide §2.5 input skew)
    batch_df = spread_if_narrow(batch_df, "doc_id")
    return (
        contamination_cut(
            batch_df, "doc_id", "text",
            k=decontaminate_k, bench_grams=grams,
            broadcast=grams_broadcast,
        )
        .withColumn("text", F.col("clean_text"))
        .drop("clean_text")
    )


def ingest_to_corpus(
    docs: DataFrame,
    path: str,
    *,
    txn_id=None,
    partition_by: tuple[str, ...] = ("lang",),
    token_col: str | None = "n_words",
    max_records_per_file: int | None = 100_000,
    evolve_schema: bool = False,
    lease=None,
    near_dup_threshold: float | None = None,
    near_dup_opts: dict | None = None,
    benchmark: DataFrame | None = None,
    bench_text_col: str = "text",
    decontaminate_k: int = 25,
    boilerplate_store: str | None = None,
):
    """BATCH twin of :func:`stream_ingest_to_corpus` — one batch through
    the identical hygiene pipeline: [benchmark decontamination +
    boilerplate-store span cut, one splice] → quality gate → PII scrub →
    fingerprint → exact dedup against the ledger → curated corpus. The
    gate expressions are shared code with the streaming path
    (:func:`_gate_grams` / :func:`_apply_span_gates` /
    :func:`ingest_documents`), so a corpus fed by both enforces ONE
    hygiene contract (VERDICT r11 #6: batch and stream ingest must not
    drift).

    ``txn_id`` routes through the transactional
    :func:`~bambooai_spark.operators.writer.append_corpus_txn` (pass a
    unique id per batch — resumable exactly-once); ``None`` uses the
    plain ledger-dedup :func:`~bambooai_spark.operators.writer
    .append_corpus` (at-least-once, the ad-hoc contract). Returns the
    manifest DataFrame, or None when every row was gated/deduped away.
    """
    from bambooai_spark.operators.writer import (  # noqa: PLC0415
        append_corpus,
        append_corpus_txn,
    )

    grams, grams_broadcast = _gate_grams(
        docs.sparkSession, benchmark, bench_text_col,
        decontaminate_k, boilerplate_store, persist=False,
    )
    batch = _apply_span_gates(docs, grams, grams_broadcast, decontaminate_k)
    # persist across the isEmpty probe and the append: the gated plan
    # (postings explode + store semi-join + quality/scrub projections)
    # would otherwise evaluate twice per batch
    ingested = (
        ingest_documents(batch)
        .filter(F.col("keep"))
        .drop("keep", "reason")
        .persist()
    )
    try:
        if ingested.isEmpty():
            return None
        kw = dict(
            partition_by=partition_by,
            id_col="doc_id",
            text_col="text",
            max_records_per_file=max_records_per_file,
            token_col=token_col,
            evolve_schema=evolve_schema,
            lease=lease,
            near_dup_threshold=near_dup_threshold,
            near_dup_opts=near_dup_opts,
        )
        if txn_id is None:
            return append_corpus(ingested, path, **kw)
        return append_corpus_txn(ingested, path, txn_id, **kw)
    finally:
        ingested.unpersist()


def stream_ingest_to_corpus(
    docs_stream: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...] = ("lang",),
    token_col: str | None = "n_words",
    max_records_per_file: int | None = 100_000,
    available_now: bool = True,
    checkpoint_location: str | None = None,
    evolve_schema: bool = False,
    lease=None,
    near_dup_threshold: float | None = None,
    near_dup_opts: dict | None = None,
    benchmark: DataFrame | None = None,
    bench_text_col: str = "text",
    decontaminate_k: int = 25,
    boilerplate_store: str | None = None,
):
    """The COMPLETE streaming pipeline in one sink:
    ingest → [benchmark decontamination] → quality gate → PII scrub →
    exact dedup → curated corpus.

    ``benchmark`` — a (small, static) benchmark table: each micro-batch
    is screened through :func:`~bambooai_spark.operators.dedup
    .contamination_cut` BEFORE the quality gate, so benchmark-verbatim
    spans never enter the corpus and the stored fingerprint/token
    columns describe the text that was actually kept. The benchmark's
    distinct ``decontaminate_k``-gram relation is derived ONCE and
    persisted for the life of the query (screening is then one
    broadcast semi-join per batch — no per-batch benchmark re-scan);
    with ``available_now=True`` it is unpersisted on return (also when
    start() itself raises), and a continuous query exposes it as
    ``bench_grams`` on the returned ``StreamingQuery`` handle — call
    ``query.bench_grams.unpersist()`` when tearing the query down.

    ``boilerplate_store`` — a :mod:`~bambooai_spark.operators.gram_store`
    path: each micro-batch ALSO has spans of KNOWN corpus boilerplate
    cut (ExactSubstr against the existing corpus, at the store's
    freshness). Its ``k`` must equal ``decontaminate_k`` (the store read
    enforces it). With a store in play the gram side may be
    corpus-scale, so the per-batch semi-join drops the broadcast hint
    and lets AQE pick the strategy; both gram relations ride ONE cut
    pass (their union), so the batch text is still spliced exactly once.

    ``foreachBatch`` hands each micro-batch over as a normal DataFrame;
    the batch runs the stateless ingest projection, drops gated-out
    documents, and flows through the TRANSACTIONAL
    :func:`operators.writer.append_corpus_txn`, keyed by the micro-batch
    id — whose fingerprint-ledger anti-join dedups the batch against
    EVERYTHING already stored (earlier batches included) and delta-merges
    the manifest in O(batch). The guarantee is EXACTLY-ONCE under
    crash-replay when ``checkpoint_location`` is set (see below for the
    no-checkpoint contract): each batch stages its corpus parquet and ledger rows
    under ``_staging/batch_id=N`` and commits via resumable deterministic
    renames + a ``_commits`` marker, so a batch replayed by Structured
    Streaming after a crash at ANY point (including between the corpus
    and ledger writes — the former at-least-once window) resumes the
    commit instead of re-appending. See ``append_corpus_txn``'s docstring
    for the protocol and its rename-atomicity assumptions.

    ``checkpoint_location`` — pass a durable path in production: it is
    what makes Structured Streaming re-deliver a crashed batch with the
    SAME batch_id on restart, which is what the transactional protocol
    keys on. WITHOUT a checkpoint (ad-hoc/test runs) there is no replay
    identity at all — a restarted call is a NEW query from batch 0 — so
    batches flow through the plain :func:`operators.writer.append_corpus`
    instead: fully-committed work dedups on the fingerprint ledger
    (at-least-once, the pre-transactional contract, with the documented
    crash window between the corpus and ledger writes). Exactly-once
    requires the checkpoint.

    With ``available_now=True`` (default) the call drains the source,
    awaits termination, and returns the final manifest DataFrame (None if
    every batch was empty or fully gated/deduped away). With
    ``available_now=False`` the query runs continuously — the call
    returns the live ``StreamingQuery`` handle immediately (awaiting a
    continuous query would block forever); read the manifest from disk.

    ``lease`` — an acquired
    :class:`~bambooai_spark.operators.lease.CorpusLease` to advisorily
    enforce the corpus's single-writer contract; every micro-batch
    verifies and refreshes it (so the append aborts before publishing if
    another writer took over). The caller owns acquisition and release.
    For a continuous query, size the lease's ``ttl_s`` ABOVE the longest
    expected gap between micro-batches — the heartbeat only beats when a
    batch fires, and an idle stream must not look dead to other writers.
    """
    from bambooai_spark.operators.writer import (  # noqa: PLC0415
        append_corpus,
        append_corpus_txn,
    )

    # an empty string must mean "no checkpoint" everywhere: the txn path
    # keyed on `is None` while the writeStream option keyed on truthiness
    # would otherwise run namespaced txn appends with NO replay identity —
    # a second run restarts at batch 0 and its batches silently no-op on
    # the first run's markers (review r8)
    checkpoint_location = checkpoint_location or None
    session = docs_stream.sparkSession
    holder: dict = {"manifest": None}
    # gate assembly shared with the batch twin (ingest_to_corpus), so
    # batch and stream ingest enforce one hygiene contract; persisted
    # for the life of the query — screening is then one semi-join per
    # micro-batch, no per-batch re-derivation
    grams, grams_broadcast = _gate_grams(
        session, benchmark, bench_text_col, decontaminate_k,
        boilerplate_store, persist=True,
    )

    def _ns() -> str:
        # resolved lazily, on the first batch: the checkpoint's metadata
        # file (whose query id the namespace mixes in) is written at
        # query START, so it exists here but not before writer.start()
        if "ns" not in holder:
            holder["ns"] = _txn_namespace(session, checkpoint_location)
        return holder["ns"]

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = _apply_span_gates(
            batch_df, grams, grams_broadcast, decontaminate_k
        )
        # persist across the isEmpty probe and the append (same
        # double-evaluation economics as the batch twin)
        ingested = (
            ingest_documents(batch_df)
            .filter(F.col("keep"))
            .drop("keep", "reason")
            .persist()
        )
        try:
            if ingested.isEmpty():
                return
            kw = dict(
                partition_by=partition_by,
                id_col="doc_id",
                text_col="text",
                max_records_per_file=max_records_per_file,
                token_col=token_col,
                # additive-only corpus schema evolution (long-lived
                # streams are where sources grow columns); see
                # append_corpus
                evolve_schema=evolve_schema,
                lease=lease,
                near_dup_threshold=near_dup_threshold,
                near_dup_opts=near_dup_opts,
            )
            if checkpoint_location is None:
                # no checkpoint → no replay identity → the plain
                # ledger-dedup append (at-least-once); a txn id would
                # never be revisited and its staging could orphan on
                # crash
                holder["manifest"] = append_corpus(ingested, path, **kw)
            else:
                holder["manifest"] = append_corpus_txn(
                    ingested, path, f"{_ns()}.{batch_id}", **kw
                )
        finally:
            ingested.unpersist()

    writer = docs_stream.writeStream.foreachBatch(_append)
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if not available_now:
        # continuous query: the gram cache must outlive this call, but a
        # start() that raises (bad option/source/checkpoint) must not
        # leak it with no handle returned (ADVICE r10). On success the
        # cached relation rides on the returned query as
        # ``bench_grams`` so the caller can q.bench_grams.unpersist()
        # when tearing the query down.
        try:
            q = writer.start()
        except Exception:
            if grams is not None:
                grams.unpersist()
            raise
        if grams is not None:
            q.bench_grams = grams
        return q
    try:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    finally:
        if grams is not None:
            grams.unpersist()
    return holder["manifest"]
