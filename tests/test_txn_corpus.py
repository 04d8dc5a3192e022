"""Crash-injection tests for the transactional corpus append
(operators.writer.append_corpus_txn) and its streaming sink
(streaming.documents.stream_ingest_to_corpus): a micro-batch replayed
after a crash at ANY protocol point must produce zero duplicate
documents, a complete ledger, and a manifest equal to the stored
partitions — the exactly-once contract that closes the at-least-once
window VERDICT r6 documented."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bambooai_spark.io import load_table
from bambooai_spark.operators import writer
from bambooai_spark.operators.writer import (
    COMMITS_DIR,
    LEDGER_DIR,
    MANIFEST_NAME,
    STAGING_DIR,
    append_corpus_txn,
    build_manifest,
)

from tests.conftest import SF_DIR


def _docs(spark, lo, hi, langs=("en", "de")):
    rows = [
        (i, langs[i % len(langs)], "web", f"document text number {i} " * 5)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")


def _corpus_state(spark, out):
    stored = spark.read.parquet(out)
    ledger = spark.read.parquet(out + "/" + LEDGER_DIR)
    with open(os.path.join(out, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    return stored, ledger, manifest


def _assert_consistent(spark, out, expect_docs):
    """No duplicates, ledger complete, manifest == stored partitions."""
    stored, ledger, manifest = _corpus_state(spark, out)
    assert stored.count() == expect_docs
    assert stored.select("text").distinct().count() == expect_docs
    assert ledger.count() == expect_docs
    got_parts = {
        r["lang"]: r["n"]
        for r in stored.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {p["lang"]: p["n_rows"] for p in manifest["partitions"]} == got_parts
    # the from-files manifest agrees on row counts too
    full = {
        r["lang"]: r["n_rows"]
        for r in build_manifest(spark, out, partition_by=("lang",)).collect()
    }
    assert full == got_parts


def test_txn_append_commit_and_full_replay_noop(spark, tmp_path):
    out = str(tmp_path / "corpus")
    m1 = append_corpus_txn(_docs(spark, 0, 20), out, 0)
    assert {r["lang"]: r["n_rows"] for r in m1.collect()} == {"en": 10, "de": 10}
    _assert_consistent(spark, out, 20)
    # staging cleaned, commit marker present
    assert not os.path.exists(os.path.join(out, STAGING_DIR, "batch_id=0"))
    assert os.path.exists(os.path.join(out, COMMITS_DIR, "batch-0.json"))

    # a FULL replay of the same batch id is a recorded no-op
    m1b = append_corpus_txn(_docs(spark, 0, 20), out, 0)
    _assert_consistent(spark, out, 20)
    assert {r["lang"]: r["n_rows"] for r in m1b.collect()} == {"en": 10, "de": 10}

    # the next batch (overlapping texts) dedups against the ledger
    append_corpus_txn(_docs(spark, 10, 30), out, 1)
    _assert_consistent(spark, out, 30)


def test_crash_between_corpus_and_ledger_moves_then_replay(
    spark, tmp_path, monkeypatch
):
    """THE r6 window: corpus files are live, ledger rows are not. The
    replay must resume the frozen commit — not re-dedup (which would drop
    nothing, duplicating) nor skip (which would lose the ledger rows)."""
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)

    orig = writer._move_staged_files

    def crash_before_ledger(sp, src_root, dest_root, batch_id):
        if src_root.endswith("/ledger"):
            raise RuntimeError("injected crash: corpus moved, ledger not")
        return orig(sp, src_root, dest_root, batch_id)

    monkeypatch.setattr(writer, "_move_staged_files", crash_before_ledger)
    with pytest.raises(RuntimeError, match="injected"):
        append_corpus_txn(_docs(spark, 20, 40), out, 1)
    monkeypatch.setattr(writer, "_move_staged_files", orig)

    # mid-crash state: batch-1 docs visible in corpus, absent from ledger
    stored = spark.read.parquet(out)
    ledger = spark.read.parquet(out + "/" + LEDGER_DIR)
    assert stored.count() == 40 and ledger.count() == 20
    assert not os.path.exists(os.path.join(out, COMMITS_DIR, "batch-1.json"))

    # replay resumes: zero duplicates, ledger completed, manifest folded
    append_corpus_txn(_docs(spark, 20, 40), out, 1)
    _assert_consistent(spark, out, 40)
    # and a SECOND replay stays a no-op
    append_corpus_txn(_docs(spark, 20, 40), out, 1)
    _assert_consistent(spark, out, 40)


def test_crash_mid_corpus_move_then_replay(spark, tmp_path, monkeypatch):
    """Partial corpus move (one of two partition files live) — replay
    skips the already-moved file and finishes the rest."""
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)

    orig_list = writer._fs_list_data_files
    state = {"armed": True}

    def partial_then_crash(sp, p):
        files = orig_list(sp, p)
        if state["armed"] and "/corpus" in p and len(files) > 1:
            state["armed"] = False
            # move only the first file, then die
            return files[:1]
        return files

    monkeypatch.setattr(writer, "_fs_list_data_files", partial_then_crash)
    orig_move = writer._move_staged_files

    def crash_after_corpus(sp, src_root, dest_root, batch_id):
        orig_move(sp, src_root, dest_root, batch_id)
        if src_root.endswith("/corpus") and not state["armed"]:
            raise RuntimeError("injected crash mid corpus move")

    monkeypatch.setattr(writer, "_move_staged_files", crash_after_corpus)
    with pytest.raises(RuntimeError, match="injected"):
        append_corpus_txn(_docs(spark, 20, 40), out, 1)
    monkeypatch.setattr(writer, "_move_staged_files", orig_move)
    monkeypatch.setattr(writer, "_fs_list_data_files", orig_list)

    stored = spark.read.parquet(out)
    assert 20 < stored.count() < 40  # genuinely partial

    append_corpus_txn(_docs(spark, 20, 40), out, 1)
    _assert_consistent(spark, out, 40)


def test_crash_before_commit_marker_then_replay(spark, tmp_path, monkeypatch):
    """All files moved, marker + manifest fold missing — replay writes
    the marker and folds the manifest exactly once."""
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)

    orig = writer._fs_write_text_atomic

    def crash_on_marker(sp, path, text):
        if f"/{COMMITS_DIR}/" in path:
            raise RuntimeError("injected crash before commit marker")
        return orig(sp, path, text)

    monkeypatch.setattr(writer, "_fs_write_text_atomic", crash_on_marker)
    with pytest.raises(RuntimeError, match="injected"):
        append_corpus_txn(_docs(spark, 20, 40), out, 1)
    monkeypatch.setattr(writer, "_fs_write_text_atomic", orig)

    append_corpus_txn(_docs(spark, 20, 40), out, 1)
    _assert_consistent(spark, out, 40)


def test_crash_before_staged_marker_recomputes(spark, tmp_path, monkeypatch):
    """Crash before _STAGED: nothing is live, so the replay restages from
    scratch — the staging dir left behind must not confuse it."""
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)

    orig = writer._fs_write_text_atomic

    def crash_on_staged(sp, path, text):
        if path.endswith(writer.STAGED_MARKER):
            raise RuntimeError("injected crash before _STAGED")
        return orig(sp, path, text)

    monkeypatch.setattr(writer, "_fs_write_text_atomic", crash_on_staged)
    with pytest.raises(RuntimeError, match="injected"):
        append_corpus_txn(_docs(spark, 20, 40), out, 1)
    monkeypatch.setattr(writer, "_fs_write_text_atomic", orig)

    # nothing became visible
    assert spark.read.parquet(out).count() == 20

    append_corpus_txn(_docs(spark, 20, 40), out, 1)
    _assert_consistent(spark, out, 40)


def test_txn_rejects_unsafe_batch_id(spark, tmp_path):
    with pytest.raises(ValueError, match="filename-safe"):
        append_corpus_txn(_docs(spark, 0, 2), str(tmp_path / "c"), "a/b")


def test_stream_crash_replay_exactly_once_with_checkpoint(
    spark, tmp_path, monkeypatch
):
    """End-to-end Structured Streaming crash-replay: the query dies
    between the corpus and ledger moves of batch 1; the restarted query
    (same checkpoint → same namespaced batch id) resumes the commit.
    Zero duplicates, manifest == stored partitions."""
    from bambooai_spark.streaming.documents import (
        ingest_documents,
        stream_ingest_to_corpus,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    src = str(tmp_path / "doc_parts")
    docs.filter("doc_id < 40").coalesce(1).write.parquet(src)
    docs.filter("doc_id >= 40 AND doc_id < 80").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    orig = writer._move_staged_files
    state = {"batches": 0}

    def crash_on_second_batch_ledger(sp, src_root, dest_root, batch_id):
        if src_root.endswith("/ledger"):
            state["batches"] += 1
            if state["batches"] == 2:
                raise RuntimeError("injected stream crash before ledger move")
        return orig(sp, src_root, dest_root, batch_id)

    monkeypatch.setattr(writer, "_move_staged_files", crash_on_second_batch_ledger)
    with pytest.raises(Exception, match="injected"):
        stream_ingest_to_corpus(stream(), out, checkpoint_location=ckpt)
    monkeypatch.setattr(writer, "_move_staged_files", orig)

    # restart with the SAME checkpoint — deliberately RESPELLED with a
    # trailing slash: the txn namespace must normalize the path, or the
    # replayed batch would miss its own staging and re-append
    manifest = stream_ingest_to_corpus(
        stream(), out, checkpoint_location=ckpt + "/"
    )
    assert manifest is not None

    stored = spark.read.parquet(out)
    want = (
        ingest_documents(docs.filter("doc_id < 80"))
        .filter("keep")
        .select("text")
        .distinct()
        .count()
    )
    assert stored.count() == want
    assert stored.select("text").distinct().count() == want
    ledger = spark.read.parquet(out + "/" + LEDGER_DIR)
    assert ledger.count() == want
    with open(os.path.join(out, MANIFEST_NAME)) as fh:
        parts = {p["lang"]: p["n_rows"] for p in json.load(fh)["partitions"]}
    got = {
        r["lang"]: r["n"]
        for r in stored.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert parts == got


def test_txn_namespace_normalizes_checkpoint_spellings(spark, tmp_path):
    from bambooai_spark.streaming.documents import _txn_namespace

    base = str(tmp_path / "ckpt")
    assert _txn_namespace(spark, base) == _txn_namespace(spark, base + "/")
    assert _txn_namespace(spark, base) == _txn_namespace(
        spark, "file://" + base
    )
    assert _txn_namespace(spark, base) != _txn_namespace(
        spark, str(tmp_path / "other")
    )
    # the checkpoint's query id (metadata file) distinguishes LINEAGES at
    # the same path: a deleted-then-recreated checkpoint gets a fresh
    # uuid and must land in a fresh namespace (ADVICE r7), while the same
    # metadata read through a respelled path stays in the same one
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, "metadata"), "w") as fh:
        json.dump({"id": "11111111-aaaa-bbbb-cccc-222222222222"}, fh)
    with_id = _txn_namespace(spark, base)
    assert with_id != _txn_namespace(spark, str(tmp_path / "other"))
    assert with_id == _txn_namespace(spark, base + "/")
    with open(os.path.join(base, "metadata"), "w") as fh:
        json.dump({"id": "33333333-aaaa-bbbb-cccc-444444444444"}, fh)
    assert _txn_namespace(spark, base) != with_id


def test_checkpoint_deletion_does_not_swallow_new_batches(spark, tmp_path):
    """Deleting a checkpoint and restarting a query at the same path used
    to restart batch ids at 0 in the SAME namespace — the surviving
    _commits markers then silently skipped the new lineage's early
    batches (ADVICE r7: data loss for any new documents in them). The
    query-id component of the namespace makes the recreated lineage
    fresh: old documents dedup on the ledger, new ones land."""
    import shutil

    from bambooai_spark.streaming.documents import (
        ingest_documents,
        stream_ingest_to_corpus,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    src = str(tmp_path / "doc_parts")
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    docs.filter("doc_id < 40").coalesce(1).write.parquet(src)

    def stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    assert stream_ingest_to_corpus(stream(), out, checkpoint_location=ckpt) is not None
    shutil.rmtree(ckpt)  # the ops mistake
    docs.filter("doc_id >= 40 AND doc_id < 80").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    # the recreated lineage re-reads ALL files as its early batches; the
    # old lineage's markers must not swallow them
    stream_ingest_to_corpus(stream(), out, checkpoint_location=ckpt)

    stored = spark.read.parquet(out)
    want = (
        ingest_documents(docs.filter("doc_id < 80"))
        .filter("keep")
        .select("text")
        .distinct()
        .count()
    )
    assert stored.count() == want
    assert stored.select("text").distinct().count() == want


def test_compact_prunes_aged_out_commit_markers(spark, tmp_path, monkeypatch):
    """compact_corpus deletes _commits markers whose batch ids have aged
    out of the manifest's bounded committed_batches window (ADVICE r7: a
    long-lived streaming corpus otherwise accumulates one marker per
    micro-batch forever). Markers inside the window survive, and a replay
    of a PRUNED batch still cannot duplicate documents — the ledger
    anti-join drops them all."""
    from bambooai_spark.operators.writer import compact_corpus

    monkeypatch.setattr(writer, "MAX_REMEMBERED_COMMITS", 3)
    out = str(tmp_path / "corpus")
    def _markers():
        return sorted(
            c
            for c in os.listdir(os.path.join(out, COMMITS_DIR))
            if c.startswith("batch-") and c.endswith(".json")
        )

    for b in range(6):
        append_corpus_txn(_docs(spark, b * 10, b * 10 + 10), out, b)
    assert len(_markers()) == 6
    compact_corpus(spark, out)
    assert _markers() == ["batch-3.json", "batch-4.json", "batch-5.json"]
    # a replay of a pruned batch re-executes instead of short-circuiting;
    # the ledger dedups every document, so nothing changes
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    _assert_consistent(spark, out, 60)
    # a marker for an unfolded batch (staging still present) is KEPT
    stage = os.path.join(out, STAGING_DIR, "batch_id=9")
    os.makedirs(stage)
    with open(os.path.join(out, COMMITS_DIR, "batch-9.json"), "w") as fh:
        json.dump({"batch_id": 9, "partition_by": ["lang"], "delta": []}, fh)
    from bambooai_spark.operators.writer import _prune_commit_markers

    pruned = _prune_commit_markers(spark, out)
    assert "batch-9.json" not in pruned
    assert os.path.exists(os.path.join(out, COMMITS_DIR, "batch-9.json"))


def test_delete_from_corpus_reappend_and_manifest(spark, tmp_path):
    """Takedown path end-to-end: delete_from_corpus removes exactly the
    matching rows, rewrites ONLY affected files, drops the deleted
    fingerprints from the ledger (a re-append of a deleted document is
    admitted — the point of a takedown), folds an exact negative manifest
    delta (zero-row partitions leave the manifest), and the manifest JSON
    equals the from-files rebuild afterwards."""
    from bambooai_spark.operators.writer import delete_from_corpus

    out = str(tmp_path / "corpus")
    for b in range(3):
        append_corpus_txn(
            _docs(spark, b * 20, b * 20 + 20), out, b,
            max_records_per_file=5,
        )
    before_files = set(
        r[0]
        for r in spark.read.parquet(out)
        .select("_metadata.file_path").distinct().collect()
    )
    # three documents spread over two batches and both languages — the
    # empty-partition case is its own test below
    m = delete_from_corpus(
        spark, out, F.col("doc_id").isin(7, 8, 31), partition_by=("lang",)
    )
    stored = spark.read.parquet(out)
    assert stored.filter(F.col("doc_id").isin(7, 8, 31)).count() == 0
    assert stored.count() == 57
    # only affected files were rewritten: every kept ORIGINAL basename
    # still present (the swap names start d<id>-, originals b<batch>-)
    after_files = set(
        r[0]
        for r in stored.select("_metadata.file_path").distinct().collect()
    )
    assert before_files - after_files, "no file was removed"
    assert after_files & before_files, "unaffected files were rewritten"
    # manifest folded exactly and matches the rebuild
    got = {r["lang"]: r["n_rows"] for r in m.collect()}
    want = {
        r["lang"]: r["cnt"]
        for r in stored.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got == want
    rebuilt = {
        r["lang"]: r["n_rows"]
        for r in build_manifest(spark, out, partition_by=("lang",)).collect()
    }
    assert rebuilt == want
    # ledger: deleted fingerprints gone -> the SAME documents re-append
    assert spark.read.parquet(out + "/" + LEDGER_DIR).count() == 57
    append_corpus_txn(_docs(spark, 0, 60), out, "readd")
    _assert_consistent(spark, out, 60)
    # idempotence: deleting with a never-matching predicate is a no-op
    m2 = delete_from_corpus(spark, out, F.col("doc_id") > 10_000)
    assert {r["lang"]: r["n_rows"] for r in m2.collect()} == {
        r["lang"]: r["cnt"]
        for r in spark.read.parquet(out)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }


def test_delete_from_corpus_drops_empty_partition(spark, tmp_path):
    """Deleting every row of one partition value removes its manifest
    entry entirely (a zero-row entry would diverge from build_manifest)."""
    from bambooai_spark.operators.writer import delete_from_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 30), out, 0)
    m = delete_from_corpus(spark, out, F.col("lang") == "de")
    langs = {r["lang"] for r in m.collect()}
    assert langs == {"en"}
    with open(os.path.join(out, MANIFEST_NAME)) as fh:
        jlangs = {p["lang"] for p in json.load(fh)["partitions"]}
    assert jlangs == {"en"}
    assert spark.read.parquet(out).filter("lang = 'de'").count() == 0


def test_delete_from_corpus_crash_resume(spark, tmp_path, monkeypatch):
    """Crash injection at both delete-swap protocol points: (a) during
    the hidden staging moves, (b) after the swap but before the manifest
    fold. Each re-run resumes from the frozen info — no row loss, no
    duplicate, manifest folded exactly once."""
    from bambooai_spark.operators.writer import delete_from_corpus

    out = str(tmp_path / "corpus")
    for b in range(2):
        append_corpus_txn(
            _docs(spark, b * 20, b * 20 + 20), out, b,
            max_records_per_file=5,
        )
    pred = F.col("doc_id") % 4 == 1  # 10 of 40 docs, spread over files

    orig_move = writer._move_staged_files

    def crash_move(sp, src_root, dest_root, batch_id, **kw):
        raise RuntimeError("injected delete crash in swap")

    monkeypatch.setattr(writer, "_move_staged_files", crash_move)
    with pytest.raises(RuntimeError, match="injected"):
        delete_from_corpus(spark, out, pred)
    monkeypatch.setattr(writer, "_move_staged_files", orig_move)

    orig_fold = writer._merge_manifest_delta

    def crash_fold(*a, **kw):
        raise RuntimeError("injected delete crash before fold")

    monkeypatch.setattr(writer, "_merge_manifest_delta", crash_fold)
    with pytest.raises(RuntimeError, match="injected"):
        delete_from_corpus(spark, out, pred)
    monkeypatch.setattr(writer, "_merge_manifest_delta", orig_fold)

    m = delete_from_corpus(spark, out, pred)
    stored = spark.read.parquet(out)
    assert stored.filter(pred).count() == 0
    assert stored.count() == 30
    assert stored.select("text").distinct().count() == 30
    got = {r["lang"]: r["n_rows"] for r in m.collect()}
    rebuilt = {
        r["lang"]: r["n_rows"]
        for r in build_manifest(spark, out, partition_by=("lang",)).collect()
    }
    assert got == rebuilt
    assert spark.read.parquet(out + "/" + LEDGER_DIR).count() == 30
    # staging fully cleaned; nothing hidden left behind
    assert not os.path.exists(os.path.join(out, "_delete_tmp"))
    leftover = [
        f
        for _, _, fs_ in os.walk(out)
        for f in fs_
        if f.startswith("_swap-")
    ]
    assert leftover == []


def test_maintenance_ops_interlock_with_frozen_delete(spark, tmp_path, monkeypatch):
    """A crashed delete that is never re-run leaves the corpus MID-SWAP
    (originals gone, replacements hidden). compact_corpus and
    recover_staging must finish it first — compacting that state blind
    would permanently lose the hidden kept rows — and a fresh delete must
    refuse while a COMPACTION is frozen (its reads would see missing
    rows)."""
    from bambooai_spark.operators.writer import (
        compact_corpus,
        delete_from_corpus,
        recover_staging,
    )

    pred = F.col("doc_id") % 4 == 1

    def crashed_delete(out):
        for b in range(2):
            append_corpus_txn(
                _docs(spark, b * 20, b * 20 + 20), out, b,
                max_records_per_file=5,
            )
        orig = writer._walk_files

        def crash_unhide(sp, root, **kw):
            if kw.get("want_hidden_prefix"):  # swap moved, unhide not yet
                raise RuntimeError("injected crash before unhide")
            return orig(sp, root, **kw)

        monkeypatch.setattr(writer, "_walk_files", crash_unhide)
        with pytest.raises(RuntimeError, match="injected"):
            delete_from_corpus(spark, out, pred)
        monkeypatch.setattr(writer, "_walk_files", orig)
        # the mid-swap state is visible: rows are missing right now
        assert spark.read.parquet(out).count() < 30

    # (a) compact_corpus finishes the frozen delete, then compacts
    out_a = str(tmp_path / "a")
    crashed_delete(out_a)
    m = compact_corpus(spark, out_a)
    stored = spark.read.parquet(out_a)
    assert stored.count() == 30 and stored.filter(pred).count() == 0
    assert {r["lang"]: r["n_rows"] for r in m.collect()} == {
        r["lang"]: r["cnt"]
        for r in stored.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert not os.path.exists(os.path.join(out_a, "_delete_tmp"))

    # (b) recover_staging finishes it too
    out_b = str(tmp_path / "b")
    crashed_delete(out_b)
    rec = recover_staging(spark, out_b)
    assert "_delete_tmp" in rec["committed"]
    stored = spark.read.parquet(out_b)
    assert stored.count() == 30 and stored.filter(pred).count() == 0

    # (c) a fresh delete refuses while a compaction is frozen
    out_c = str(tmp_path / "c")
    append_corpus_txn(_docs(spark, 0, 20), out_c, 0)
    os.makedirs(os.path.join(out_c, "_compact_tmp"))
    with open(os.path.join(out_c, "_compact_tmp", "_STAGED"), "w") as fh:
        json.dump({"compact_id": "deadbeef", "ledger": False}, fh)
    with pytest.raises(RuntimeError, match="compact_corpus"):
        delete_from_corpus(spark, out_c, pred)


def test_delete_resume_still_runs_the_callers_predicate(spark, tmp_path, monkeypatch):
    """delete_from_corpus called with predicate B while predicate A's
    delete sits frozen must finish A AND run B (review r8: returning
    after the resume alone reported success for a deletion that never
    ran). It must also refuse while an UNCOMMITTED txn batch is frozen —
    that batch's replay re-renames missing destinations, resurrecting
    rows the delete removed."""
    from bambooai_spark.operators.writer import delete_from_corpus

    out = str(tmp_path / "corpus")
    for b in range(2):
        append_corpus_txn(
            _docs(spark, b * 20, b * 20 + 20), out, b,
            max_records_per_file=5,
        )
    pred_a = F.col("doc_id") < 5
    pred_b = (F.col("doc_id") >= 5) & (F.col("doc_id") < 10)

    orig = writer._walk_files

    def crash_unhide(sp, root, **kw):
        if kw.get("want_hidden_prefix"):
            raise RuntimeError("injected crash before unhide")
        return orig(sp, root, **kw)

    monkeypatch.setattr(writer, "_walk_files", crash_unhide)
    with pytest.raises(RuntimeError, match="injected"):
        delete_from_corpus(spark, out, pred_a)
    monkeypatch.setattr(writer, "_walk_files", orig)

    delete_from_corpus(spark, out, pred_b)  # finishes A, then runs B
    stored = spark.read.parquet(out)
    assert stored.filter("doc_id < 10").count() == 0
    assert stored.count() == 30

    # frozen uncommitted append batch → BOTH maintenance ops refuse
    # (its replay re-renames missing destinations; compacting first
    # would double-count the half-moved rows on replay — review r8 p2)
    from bambooai_spark.operators.writer import compact_corpus

    stage = os.path.join(out, STAGING_DIR, "batch_id=frozen9")
    os.makedirs(stage)
    with open(os.path.join(stage, "_STAGED"), "w") as fh:
        json.dump({"batch_id": "frozen9", "partition_by": ["lang"],
                   "delta": []}, fh)
    with pytest.raises(RuntimeError, match="recover_staging"):
        delete_from_corpus(spark, out, F.col("doc_id") >= 10)
    with pytest.raises(RuntimeError, match="recover_staging"):
        compact_corpus(spark, out)


def test_delete_bad_text_col_raises_not_silent(spark, tmp_path):
    """An unresolvable text_col must fail the delete loudly AND fast
    (review r8: the empty-ledger guard used to swallow it, deleting the
    rows but stranding their fingerprints — every re-append then
    silently dropped; pass 2: the late failure discarded the whole
    kept-rows rewrite, so it now raises before Phase A writes)."""
    from bambooai_spark.operators.writer import delete_from_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    with pytest.raises(ValueError, match="text_col"):
        delete_from_corpus(spark, out, F.col("doc_id") < 5, text_col="body")
    assert not os.path.exists(os.path.join(out, "_delete_tmp"))
    # nothing was deleted and the op is retryable with the right column
    assert spark.read.parquet(out).count() == 10
    delete_from_corpus(spark, out, F.col("doc_id") < 5)
    assert spark.read.parquet(out).count() == 5
    append_corpus_txn(_docs(spark, 0, 10), out, "readd")
    _assert_consistent(spark, out, 10)


def test_empty_string_checkpoint_means_no_checkpoint(spark, tmp_path):
    """checkpoint_location='' must behave exactly like None — the plain
    ledger-dedup append, NO txn markers (review r8: the txn path keyed on
    `is None` while the writeStream option keyed on truthiness, so ''
    ran namespaced txn appends with no replay identity and a second run
    silently no-opped on the first run's markers)."""
    from bambooai_spark.streaming.documents import (
        ingest_documents,
        stream_ingest_to_corpus,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    src = str(tmp_path / "doc_parts")
    out = str(tmp_path / "corpus")
    docs.filter("doc_id < 40").coalesce(1).write.parquet(src)

    def stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    stream_ingest_to_corpus(stream(), out, checkpoint_location="")
    assert not os.path.exists(os.path.join(out, COMMITS_DIR))
    # a second full run (new query, batch ids restart) dedups on the
    # ledger and appends the genuinely new files
    docs.filter("doc_id >= 40 AND doc_id < 80").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream_ingest_to_corpus(stream(), out, checkpoint_location="")
    stored = spark.read.parquet(out)
    want = (
        ingest_documents(docs.filter("doc_id < 80"))
        .filter("keep")
        .select("text")
        .distinct()
        .count()
    )
    assert stored.count() == want


def test_manifest_fold_file_counts(spark, tmp_path):
    """TXN deltas carry exact n_files/n_bytes (the staged files ARE the
    batch's contribution) and fold additively — the delta-mode manifest
    stays full-fidelity on the streaming path. PLAIN appends can't (their
    files land mixed into history): their folds drop the counts, and once
    every partition has lost them the all-None column is dropped entirely
    instead of breaking createDataFrame on a committed replay."""
    from bambooai_spark.operators.writer import append_corpus, write_corpus

    out = str(tmp_path / "corpus")
    write_corpus(_docs(spark, 0, 20), out)  # manifest with n_files/n_bytes

    m1 = append_corpus_txn(_docs(spark, 100, 110, langs=("en",)), out, 1)
    m2 = append_corpus_txn(_docs(spark, 200, 210, langs=("de",)), out, 2)
    got = {r["lang"]: r for r in m2.collect()}
    assert {k: v["n_rows"] for k, v in got.items()} == {"en": 20, "de": 20}
    # delta-mode file/byte counts equal the exact from-files rebuild
    full = {r["lang"]: r for r in build_manifest(spark, out).collect()}
    for lang in ("en", "de"):
        assert got[lang]["n_files"] == full[lang]["n_files"]
        assert got[lang]["n_bytes"] == full[lang]["n_bytes"]
    # a replay of the committed batch reloads the same manifest fine
    m2b = append_corpus_txn(_docs(spark, 200, 210, langs=("de",)), out, 2)
    assert {r["lang"]: r["n_rows"] for r in m2b.collect()} == {
        "en": 20, "de": 20
    }
    assert m1.count() == 2

    # PLAIN appends drop the counts; once all partitions lost them the
    # column disappears rather than surviving as all-None
    out2 = str(tmp_path / "corpus2")
    write_corpus(_docs(spark, 0, 20), out2)
    append_corpus(_docs(spark, 100, 110, langs=("en",)), out2)
    m = append_corpus(_docs(spark, 200, 210, langs=("de",)), out2)
    assert "n_files" not in m.columns and "n_bytes" not in m.columns
    assert {r["lang"]: r["n_rows"] for r in m.collect()} == {
        "en": 20, "de": 20
    }


def test_full_manifest_with_batch_id_raises(spark, tmp_path):
    from bambooai_spark.operators.writer import append_corpus

    with pytest.raises(ValueError, match="full_manifest"):
        append_corpus(
            _docs(spark, 0, 2), str(tmp_path / "c"),
            full_manifest=True, batch_id=1,
        )


def test_delta_merge_matches_json_stringified_partition_keys(spark, tmp_path):
    """Partition keys round-trip through JSON as strings (default=str);
    a non-string partition column (DATE) must merge into its stringified
    prior entry, not duplicate it or break the manifest sort."""
    from bambooai_spark.operators.writer import append_corpus

    out = str(tmp_path / "corpus")
    rows1 = [(1, "2024-01-01", "alpha text one"), (2, "2024-01-02", "beta two")]
    # batch 2 touches an existing key AND adds a NEW one: the new entry
    # must store the same stringified value as the loaded ones, or the
    # returned manifest DataFrame fails on a String/Date column merge
    # (ADVICE r7) — and an idempotent txn replay would refail forever
    rows2 = [(3, "2024-01-01", "gamma three"), (4, "2024-01-03", "delta four")]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, day string, text string"
    ).select("doc_id", F.to_date("day").alias("day"), "text")
    append_corpus(mk(rows1), out, partition_by=("day",))
    m = append_corpus(mk(rows2), out, partition_by=("day",))
    got = {str(r["day"]): r["n_rows"] for r in m.collect()}
    assert got == {"2024-01-01": 2, "2024-01-02": 1, "2024-01-03": 1}
    # same shape through the txn path, where the fold replays on crash
    from bambooai_spark.operators.writer import append_corpus_txn

    out2 = str(tmp_path / "corpus2")
    append_corpus_txn(mk(rows1), out2, 0, partition_by=("day",))
    m2 = append_corpus_txn(mk(rows2), out2, 1, partition_by=("day",))
    got2 = {str(r["day"]): r["n_rows"] for r in m2.collect()}
    assert got2 == {"2024-01-01": 2, "2024-01-02": 1, "2024-01-03": 1}


def test_txn_append_over_file_uri(spark, tmp_path, monkeypatch):
    """The txn protocol's staged writes, qualified-prefix renames, and
    marker bookkeeping must work identically through a scheme URI (the
    Hadoop FS path the 100 TB corpus would use) — including a crash-replay
    in the middle."""
    out = "file://" + str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)

    orig = writer._move_staged_files

    def crash_before_ledger(sp, src_root, dest_root, batch_id):
        if src_root.endswith("/ledger"):
            raise RuntimeError("injected uri crash")
        return orig(sp, src_root, dest_root, batch_id)

    monkeypatch.setattr(writer, "_move_staged_files", crash_before_ledger)
    with pytest.raises(RuntimeError, match="injected"):
        append_corpus_txn(_docs(spark, 20, 40), out, 1)
    monkeypatch.setattr(writer, "_move_staged_files", orig)

    append_corpus_txn(_docs(spark, 20, 40), out, 1)
    local = str(tmp_path / "corpus")
    _assert_consistent(spark, local, 40)
    # and a later batch still dedups against the ledger through the URI
    append_corpus_txn(_docs(spark, 30, 50), out, 2)
    _assert_consistent(spark, local, 50)


def test_delete_from_corpus_over_file_uri(spark, tmp_path, monkeypatch):
    """The delete swap protocol must work identically through a scheme
    URI (the Hadoop FS path a 100 TB corpus uses): qualified file lists
    in the frozen marker, per-file deletes and unhides, crash-resume
    mid-swap — mirroring the txn append's URI test."""
    from bambooai_spark.operators.writer import delete_from_corpus

    out = "file://" + str(tmp_path / "corpus")
    local = str(tmp_path / "corpus")
    for b in range(2):
        append_corpus_txn(
            _docs(spark, b * 20, b * 20 + 20), out, b,
            max_records_per_file=5,
        )
    pred = F.col("doc_id") % 4 == 1

    orig = writer._walk_files

    def crash_unhide(sp, root, **kw):
        if kw.get("want_hidden_prefix"):
            raise RuntimeError("injected uri delete crash")
        return orig(sp, root, **kw)

    monkeypatch.setattr(writer, "_walk_files", crash_unhide)
    with pytest.raises(RuntimeError, match="injected"):
        delete_from_corpus(spark, out, pred)
    monkeypatch.setattr(writer, "_walk_files", orig)

    m = delete_from_corpus(spark, out, pred)
    stored = spark.read.parquet(local)
    assert stored.count() == 30 and stored.filter(pred).count() == 0
    assert spark.read.parquet(local + "/" + LEDGER_DIR).count() == 30
    got = {r["lang"]: r["n_rows"] for r in m.collect()}
    rebuilt = {
        r["lang"]: r["n_rows"]
        for r in build_manifest(spark, local, partition_by=("lang",)).collect()
    }
    assert got == rebuilt
    # taken-down docs re-append through the URI
    append_corpus_txn(_docs(spark, 0, 40), out, "readd")
    _assert_consistent(spark, local, 40)


def test_compact_corpus_merges_small_files(spark, tmp_path):
    """Many tiny per-batch files (max_records_per_file=3) compact into
    few; rows, texts, ledger, and the committed_batches replay guard all
    survive; the rebuilt manifest matches the stored partitions."""
    from bambooai_spark.operators.writer import compact_corpus

    out = str(tmp_path / "corpus")
    for b in range(4):
        append_corpus_txn(
            _docs(spark, b * 10, b * 10 + 10), out, b,
            max_records_per_file=3,
        )
    before = spark.read.parquet(out)
    n_files_before = before.select("_metadata.file_path").distinct().count()
    assert n_files_before >= 8  # genuinely fragmented
    texts_before = {r["text"] for r in before.select("text").collect()}

    m = compact_corpus(spark, out)
    after = spark.read.parquet(out)
    n_files_after = after.select("_metadata.file_path").distinct().count()
    assert n_files_after < n_files_before
    assert {r["text"] for r in after.select("text").collect()} == texts_before
    _assert_consistent(spark, out, 40)
    assert {r["lang"]: r["n_files"] for r in m.collect()} == {
        "en": 1, "de": 1
    }

    import json as _json
    with open(os.path.join(out, "_corpus_manifest.json")) as fh:
        doc = _json.load(fh)
    assert set(doc["committed_batches"]) == {"0", "1", "2", "3"}

    # the ledger's per-batch fragments compacted too, content preserved
    ledger_files = {
        r[0]
        for r in spark.read.parquet(out + "/" + LEDGER_DIR)
        .select("_metadata.file_path")
        .distinct()
        .collect()
    }
    assert len(ledger_files) <= 8  # was 4 batches x multiple files
    assert all("/b0-" not in f and "/b1-" not in f for f in ledger_files)

    # a replayed batch after compaction still no-ops on its marker
    append_corpus_txn(_docs(spark, 0, 10), out, 0, max_records_per_file=3)
    assert spark.read.parquet(out).count() == 40
    # and a genuinely new batch still dedups against the (kept) ledger
    append_corpus_txn(_docs(spark, 35, 45), out, 9)
    _assert_consistent(spark, out, 45)


def test_compact_corpus_resumes_after_crash_mid_swap(
    spark, tmp_path, monkeypatch
):
    """Crash right after the compacted copy is frozen (_STAGED written,
    swap not begun) and again before the tmp cleanup: each re-run resumes
    from the frozen copy with zero loss."""
    from bambooai_spark.operators import writer as W

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 30), out, 0, max_records_per_file=4)

    orig_atomic = W._fs_write_text_atomic

    def crash_after_freeze(sp, p, text):
        orig_atomic(sp, p, text)
        if p.endswith("/_compact_tmp/" + W.STAGED_MARKER):
            raise RuntimeError("injected compact crash after freeze")

    monkeypatch.setattr(W, "_fs_write_text_atomic", crash_after_freeze)
    with pytest.raises(RuntimeError, match="injected"):
        W.compact_corpus(spark, out)
    monkeypatch.setattr(W, "_fs_write_text_atomic", orig_atomic)
    # originals untouched by the crash; frozen copy present
    assert spark.read.parquet(out).count() == 30
    assert os.path.exists(os.path.join(out, "_compact_tmp", "_STAGED"))

    calls = {"n": 0}
    real_delete = W._fs_delete

    def crash_on_tmp_cleanup(sp, p):
        if p.endswith("/_compact_tmp") and calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("injected compact crash before cleanup")
        return real_delete(sp, p)

    monkeypatch.setattr(W, "_fs_delete", crash_on_tmp_cleanup)
    with pytest.raises(RuntimeError, match="injected"):
        W.compact_corpus(spark, out)
    monkeypatch.setattr(W, "_fs_delete", real_delete)

    W.compact_corpus(spark, out)
    _assert_consistent(spark, out, 30)
    assert not os.path.exists(os.path.join(out, "_compact_tmp"))


def test_recover_staging_commits_frozen_and_cleans_stale(
    spark, tmp_path, monkeypatch
):
    """A crashed-and-abandoned query's frozen batch is COMMITTED (never
    deleted — its files may be partially live), a committed leftover and
    an old bare stage are cleaned, a fresh bare stage is kept."""
    from bambooai_spark.operators.writer import (
        STAGED_MARKER as SM,
        recover_staging,
    )

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)

    # frozen-but-uncommitted batch 1 with PARTIALLY moved corpus files
    orig = writer._move_staged_files

    def crash_before_ledger(sp, src_root, dest_root, batch_id):
        if src_root.endswith("/ledger"):
            raise RuntimeError("injected")
        return orig(sp, src_root, dest_root, batch_id)

    monkeypatch.setattr(writer, "_move_staged_files", crash_before_ledger)
    with pytest.raises(RuntimeError, match="injected"):
        append_corpus_txn(_docs(spark, 20, 40), out, 1)
    monkeypatch.setattr(writer, "_move_staged_files", orig)

    # a fresh bare (incomplete) stage for batch 7
    bare = os.path.join(out, STAGING_DIR, "batch_id=7")
    os.makedirs(bare)

    res = recover_staging(spark, out, min_age_seconds=3600)
    assert res["committed"] == ["batch_id=1"]
    assert res["kept"] == ["batch_id=7"]
    _assert_consistent(spark, out, 40)  # batch 1 finished, no dupes

    # with TTL 0 the bare stage is cleaned
    res2 = recover_staging(spark, out, min_age_seconds=0)
    assert res2["cleaned"] == ["batch_id=7"]
    assert not os.path.exists(bare)

    # replay of the recovered batch no-ops on its marker
    append_corpus_txn(_docs(spark, 20, 40), out, 1)
    _assert_consistent(spark, out, 40)


def test_append_refuses_schema_drift(spark, tmp_path):
    """An appended batch whose column set drifted from the corpus fails
    loudly (mixed per-file schemas silently corrupt later reads) — on
    both the plain and the transactional path; identical schemas in a
    different column order still append fine."""
    from bambooai_spark.operators.writer import append_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)

    drifted = _docs(spark, 10, 20).withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="extra"):
        append_corpus(drifted, out)
    with pytest.raises(ValueError, match="extra"):
        append_corpus_txn(drifted, out, 1)
    assert spark.read.parquet(out).count() == 10  # nothing leaked

    reordered = _docs(spark, 10, 20).select(
        "text", "source", "lang", "doc_id"
    )
    append_corpus_txn(reordered, out, 2)
    _assert_consistent(spark, out, 20)


def test_compaction_preserves_numeric_looking_partition_strings(
    spark, tmp_path
):
    """A string partition value that LOOKS numeric ('0123') must survive
    compaction verbatim — partition-value inference would re-type it to
    int 123, physically renaming the directory and splitting the
    partition from future appends and manifest folds."""
    import json as _json

    from bambooai_spark.operators.writer import (
        MANIFEST_NAME as MN,
        compact_corpus,
    )

    out = str(tmp_path / "corpus")
    mk = lambda lo, hi, src: spark.createDataFrame(  # noqa: E731
        [(i, src, f"text num {i} " * 3) for i in range(lo, hi)],
        "doc_id long, source string, text string",
    )
    append_corpus_txn(mk(0, 6, "0123"), out, 0, partition_by=("source",))
    append_corpus_txn(mk(10, 16, "0456"), out, 1, partition_by=("source",))
    compact_corpus(spark, out, partition_by=("source",))
    dirs = sorted(d for d in os.listdir(out) if d.startswith("source="))
    assert dirs == ["source=0123", "source=0456"]

    # the post-compaction fold merges into the SAME keys
    append_corpus_txn(mk(20, 24, "0123"), out, 2, partition_by=("source",))
    with open(os.path.join(out, MN)) as fh:
        man = _json.load(fh)
    got = {p["source"]: p["n_rows"] for p in man["partitions"]}
    assert got == {"0123": 10, "0456": 6}


def test_jsonl_source_to_corpus_pipeline(spark, tmp_path):
    """JSONL is how raw document corpora usually arrive: load_jsonl
    (datetime coercion included) → ingest_documents → transactional
    corpus append, end to end — the batch twin of the streaming ingest,
    fed from the new source."""
    import json as _json

    from bambooai_spark.sources import load_jsonl
    from bambooai_spark.streaming.documents import ingest_documents

    src = tmp_path / "docs.jsonl"
    with open(src, "w") as fh:
        for i in range(30):
            fh.write(
                _json.dumps(
                    {
                        "doc_id": i,
                        "lang": "en" if i % 2 else "de",
                        "source": "web",
                        "fetched_at": f"2024-01-{(i % 28) + 1:02d} 10:00:00",
                        "text": (
                            f"a perfectly ordinary document number {i} "
                            "with enough words to pass the quality gate "
                            "and some more filler text on top of that"
                        ),
                    }
                )
                + "\n"
            )

    docs = load_jsonl(spark, str(src))
    # the timestamp string coerced like the CSV loader's
    assert dict(docs.dtypes)["fetched_at"] == "timestamp"
    assert docs.count() == 30

    ingested = (
        ingest_documents(docs.select("doc_id", "lang", "source", "text"))
        .filter(F.col("keep"))
        .drop("keep", "reason")
    )
    out = str(tmp_path / "corpus")
    m = append_corpus_txn(ingested, out, 0)
    stored = spark.read.parquet(out)
    assert stored.count() == 30
    assert {r["lang"] for r in m.collect()} == {"en", "de"}
    # replay no-ops
    append_corpus_txn(ingested, out, 0)
    assert spark.read.parquet(out).count() == 30


# ---------------------------------------------------------------------
# read_corpus: committed-snapshot + as-of reads


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_read_corpus_snapshot_and_as_of(spark, tmp_path):
    """Committed batches read back whole; as_of_batch pins the view; a
    later batch drops out of an earlier snapshot; unknown-high targets
    just include everything committed."""
    from bambooai_spark.operators.writer import read_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    append_corpus_txn(_docs(spark, 10, 20), out, 1)
    append_corpus_txn(_docs(spark, 20, 30), out, 2)

    assert _ids(read_corpus(spark, out)) == set(range(30))
    assert _ids(read_corpus(spark, out, as_of_batch=1)) == set(range(20))
    assert _ids(read_corpus(spark, out, as_of_batch=0)) == set(range(10))
    assert _ids(read_corpus(spark, out, as_of_batch=99)) == set(range(30))


def test_read_corpus_excludes_mid_commit_batch(spark, tmp_path, monkeypatch):
    """A batch frozen mid-move (some files live, no commit marker) is
    INVISIBLE to read_corpus — the dirty-read window the plain
    spark.read.parquet(path) has — and appears whole once its replay
    commits."""
    from bambooai_spark.operators.writer import read_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)

    orig_list = writer._fs_list_data_files
    state = {"armed": True}

    def partial_then_crash(sp, p):
        files = orig_list(sp, p)
        if state["armed"] and "/corpus" in p and len(files) > 1:
            state["armed"] = False
            return files[:1]
        return files

    monkeypatch.setattr(writer, "_fs_list_data_files", partial_then_crash)
    orig_move = writer._move_staged_files

    def crash_after_corpus(sp, src_root, dest_root, batch_id):
        orig_move(sp, src_root, dest_root, batch_id)
        if src_root.endswith("/corpus") and not state["armed"]:
            raise RuntimeError("injected crash mid corpus move")

    monkeypatch.setattr(writer, "_move_staged_files", crash_after_corpus)
    with pytest.raises(RuntimeError, match="injected"):
        append_corpus_txn(_docs(spark, 20, 40), out, 1)
    monkeypatch.setattr(writer, "_move_staged_files", orig_move)
    monkeypatch.setattr(writer, "_fs_list_data_files", orig_list)

    # the raw read sees the torn state; the snapshot read does not
    assert 20 < spark.read.parquet(out).count() < 40
    assert _ids(read_corpus(spark, out)) == set(range(20))

    append_corpus_txn(_docs(spark, 20, 40), out, 1)
    assert _ids(read_corpus(spark, out)) == set(range(40))


def test_read_corpus_includes_marker_pruned_old_batch(spark, tmp_path):
    """A batch whose commit marker aged out of the pruning window (no
    marker, no staging entry) is complete by construction and stays
    visible."""
    from bambooai_spark.operators.writer import read_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    append_corpus_txn(_docs(spark, 10, 20), out, 1)
    os.remove(os.path.join(out, COMMITS_DIR, "batch-0.json"))
    assert _ids(read_corpus(spark, out)) == set(range(20))
    assert _ids(read_corpus(spark, out, as_of_batch=0)) == set(range(10))


def test_read_corpus_floor_after_compaction(spark, tmp_path):
    """Compaction folds every live batch into c<id>- files and records
    the as_of_floor: earlier targets raise, the floor itself and later
    batches stay answerable (base files always included)."""
    from bambooai_spark.operators.writer import compact_corpus, read_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    append_corpus_txn(_docs(spark, 10, 20), out, 1)
    compact_corpus(spark, out)
    with open(os.path.join(out, MANIFEST_NAME)) as fh:
        assert json.load(fh)["as_of_floor"] == 1

    with pytest.raises(ValueError, match="floor"):
        read_corpus(spark, out, as_of_batch=0)
    assert _ids(read_corpus(spark, out, as_of_batch=1)) == set(range(20))

    append_corpus_txn(_docs(spark, 20, 30), out, 2)
    assert _ids(read_corpus(spark, out, as_of_batch=1)) == set(range(20))
    assert _ids(read_corpus(spark, out, as_of_batch=2)) == set(range(30))
    assert _ids(read_corpus(spark, out)) == set(range(30))


def test_read_corpus_floor_after_delete_and_no_resurrection(spark, tmp_path):
    """A delete raises the floor to the highest batch it rewrote, the
    deleted rows never appear in ANY snapshot (takedown semantics), and
    untouched earlier batches stay addressable below their own ids."""
    from bambooai_spark.operators.writer import (
        delete_from_corpus,
        read_corpus,
    )

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    append_corpus_txn(_docs(spark, 10, 20), out, 1)
    delete_from_corpus(spark, out, F.col("doc_id") == 15)
    with open(os.path.join(out, MANIFEST_NAME)) as fh:
        assert json.load(fh)["as_of_floor"] == 1

    # batch-1 attribution is gone; batch-0 targets now under the floor
    with pytest.raises(ValueError, match="floor"):
        read_corpus(spark, out, as_of_batch=0)
    got = _ids(read_corpus(spark, out, as_of_batch=1))
    assert got == set(range(20)) - {15}
    assert _ids(read_corpus(spark, out)) == set(range(20)) - {15}


def test_read_corpus_empty_and_frozen_guards(spark, tmp_path, monkeypatch):
    """Empty corpus: schema gives a typed empty frame, no schema raises.
    A frozen mid-swap delete makes any read refuse (originals gone,
    replacements hidden — no consistent view exists)."""
    from bambooai_spark.operators.writer import (
        DELETE_TMP,
        STAGED_MARKER,
        delete_from_corpus,
        read_corpus,
    )

    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    df = read_corpus(spark, empty, schema="doc_id long, lang string")
    assert df.count() == 0 and df.columns == ["doc_id", "lang"]
    with pytest.raises(ValueError, match="no committed data files"):
        read_corpus(spark, empty)

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    orig = writer._unhide_swapped

    def crash_unhide(sp, dest_root, hidden_prefix):
        raise RuntimeError("injected crash mid delete swap")

    monkeypatch.setattr(writer, "_unhide_swapped", crash_unhide)
    with pytest.raises(RuntimeError, match="injected"):
        delete_from_corpus(spark, out, F.col("doc_id") == 3)
    monkeypatch.setattr(writer, "_unhide_swapped", orig)
    assert os.path.exists(os.path.join(out, DELETE_TMP, STAGED_MARKER))
    with pytest.raises(RuntimeError, match="mid-swap"):
        read_corpus(spark, out)
    # finishing the frozen delete restores readability
    delete_from_corpus(spark, out, F.col("doc_id") == 3)
    assert _ids(read_corpus(spark, out)) == set(range(10)) - {3}


def test_full_manifest_rebuild_preserves_floor(spark, tmp_path):
    """append_corpus(full_manifest=True) after a compaction must carry
    the as_of_floor through the manifest rebuild — dropping it would let
    read_corpus silently answer pre-compaction as_of targets with the
    whole corpus (review r8 pass 3)."""
    from bambooai_spark.operators.writer import (
        append_corpus,
        compact_corpus,
        read_corpus,
    )

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    append_corpus_txn(_docs(spark, 10, 20), out, 1)
    compact_corpus(spark, out)
    append_corpus(_docs(spark, 20, 30), out, full_manifest=True)
    with open(os.path.join(out, MANIFEST_NAME)) as fh:
        assert json.load(fh)["as_of_floor"] == 1
    with pytest.raises(ValueError, match="floor"):
        read_corpus(spark, out, as_of_batch=0)
    assert _ids(read_corpus(spark, out)) == set(range(30))


def test_compact_crash_before_manifest_keeps_floor(spark, tmp_path, monkeypatch):
    """A crash between the staged-flag delete and the final manifest
    rebuild must not lose the as_of_floor: the flag was its only other
    durable copy and the swapped c-files carry no batch attribution
    (review r8 pass 3)."""
    from bambooai_spark.operators.writer import compact_corpus, read_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    append_corpus_txn(_docs(spark, 10, 20), out, 1)

    orig = writer.build_manifest

    def crash_rebuild(*a, **kw):
        raise RuntimeError("injected crash before manifest rebuild")

    monkeypatch.setattr(writer, "build_manifest", crash_rebuild)
    with pytest.raises(RuntimeError, match="injected"):
        compact_corpus(spark, out)
    monkeypatch.setattr(writer, "build_manifest", orig)

    # the swap completed and the flag is gone, but the floor survived
    assert not os.path.exists(
        os.path.join(out, writer.COMPACT_TMP, writer.STAGED_MARKER)
    )
    with open(os.path.join(out, MANIFEST_NAME)) as fh:
        assert json.load(fh)["as_of_floor"] == 1
    with pytest.raises(ValueError, match="floor"):
        read_corpus(spark, out, as_of_batch=0)
    # re-running compaction converges to the exact manifest, floor kept
    compact_corpus(spark, out)
    with open(os.path.join(out, MANIFEST_NAME)) as fh:
        doc = json.load(fh)
    assert doc["as_of_floor"] == 1 and doc["partitions"]
    assert _ids(read_corpus(spark, out)) == set(range(20))


def test_dashed_batch_id_rejected_and_composite_ids_parse(spark, tmp_path):
    """'-' is reserved as the committed-file separator: a dashed batch id
    would make b7-retry-part files parse as batch '7', leaking torn
    batches into snapshots — so append_corpus_txn refuses it, and the
    streaming sink's composite ids use '.' which round-trips whole."""
    out = str(tmp_path / "corpus")
    with pytest.raises(ValueError, match="reserved"):
        append_corpus_txn(_docs(spark, 0, 5), out, "7-retry")
    assert writer._txn_batch_of("babc123.7-part-000-x.parquet") == "abc123.7"
    assert writer._txn_batch_of("b7-part-000-x.parquet") == "7"
    assert writer._txn_batch_of("part-000-x.parquet") is None
    assert writer._txn_batch_of("c1a2b3-part-000.parquet") is None


def test_corpus_history(spark, tmp_path):
    """corpus_history: marker-backed rows carry full detail, window-only
    ids (pruned markers / delete folds) surface as id-only rows, and the
    floor rides along after maintenance."""
    from bambooai_spark.operators.writer import (
        compact_corpus,
        corpus_history,
        delete_from_corpus,
    )

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)
    append_corpus_txn(_docs(spark, 20, 30), out, 1)
    append_corpus_txn(_docs(spark, 0, 5), out, 2)  # all dups → empty batch

    h = {r["batch_id"]: r.asDict() for r in corpus_history(spark, out).collect()}
    assert h["0"]["kind"] == "append" and h["0"]["n_rows"] == 20
    assert h["1"]["n_rows"] == 10
    assert h["0"]["n_files"] is not None and h["0"]["n_bytes"] > 0
    assert h["0"]["n_partitions"] == 2  # en/de
    assert h["0"]["committed_at"] is not None
    # an EMPTY committed batch reports known zeros, not unknown NULLs
    assert h["2"]["n_rows"] == 0 and h["2"]["n_files"] == 0
    assert h["2"]["n_bytes"] == 0 and h["2"]["n_partitions"] == 0

    delete_from_corpus(spark, out, F.col("doc_id") == 5)
    h2 = {r["batch_id"]: r.asDict() for r in corpus_history(spark, out).collect()}
    dels = [k for k in h2 if k.startswith("delete-")]
    assert len(dels) == 1 and h2[dels[0]]["kind"] == "delete"
    assert h2[dels[0]]["n_rows"] is None  # window-only row, no marker

    # compaction prunes markers and sets the floor: batches drop to
    # id-only rows but stay listed via the committed window
    compact_corpus(spark, out)
    h3 = {r["batch_id"]: r.asDict() for r in corpus_history(spark, out).collect()}
    assert {"0", "1"} <= set(h3)
    assert all(r["as_of_floor"] == 1 for r in h3.values())
    # newest-first ordering puts detail-less rows last
    ordered = corpus_history(spark, out).collect()
    assert ordered == sorted(
        ordered,
        key=lambda r: (
            r["committed_at"] is None,
            -(r["committed_at"].timestamp() if r["committed_at"] else 0),
            r["batch_id"],
        ),
    )


def test_validate_corpus(spark, tmp_path, monkeypatch):
    """The fsck: all-green on a healthy corpus (deep included), red rows
    for a frozen append and a broken ledger, informational orphans."""
    from bambooai_spark.operators.writer import validate_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)
    append_corpus_txn(_docs(spark, 20, 30), out, 1)

    v = {r["check"]: r.asDict() for r in validate_corpus(spark, out, deep=True).collect()}
    assert all(r["ok"] for r in v.values()), v
    assert "exact" in v["ledger"]["detail"]
    assert "manifest_rows" in v and v["manifest_rows"]["ok"]

    # freeze a batch mid-commit → frozen_appends goes red
    orig = writer._move_staged_files

    def crash(sp, src_root, dest_root, batch_id, **kw):
        if src_root.endswith("/ledger"):
            raise RuntimeError("injected")
        return orig(sp, src_root, dest_root, batch_id, **kw)

    monkeypatch.setattr(writer, "_move_staged_files", crash)
    with pytest.raises(RuntimeError, match="injected"):
        append_corpus_txn(_docs(spark, 30, 40), out, 2)
    monkeypatch.setattr(writer, "_move_staged_files", orig)

    v2 = {r["check"]: r.asDict() for r in validate_corpus(spark, out).collect()}
    assert not v2["frozen_appends"]["ok"]
    assert "batch_id=2" in v2["frozen_appends"]["detail"]
    assert "swap_leftovers" not in v2  # tree-walk check is deep-only

    # the manifest's own partition_by is authoritative: the wrong caller
    # default must not crash or mis-key the deep recount
    v2b = {
        r["check"]: r.asDict()
        for r in validate_corpus(
            spark, out, partition_by=("nonexistent",), deep=True
        ).collect()
    }
    assert v2b["manifest_rows"]["ok"], v2b

    # pre-ledger corpus (write_corpus only, lazy seeding) is healthy
    out_pre = str(tmp_path / "pre")
    from bambooai_spark.operators.writer import write_corpus

    write_corpus(_docs(spark, 0, 10), out_pre)
    vpre = {
        r["check"]: r.asDict()
        for r in validate_corpus(spark, out_pre, deep=True).collect()
    }
    assert vpre["ledger"]["ok"] and "not yet seeded" in vpre["ledger"]["detail"]

    # recover, then break the ledger (drop a file) → deep check goes red
    from bambooai_spark.operators.writer import recover_staging

    recover_staging(spark, out)
    v3 = {r["check"]: r.asDict() for r in validate_corpus(spark, out, deep=True).collect()}
    assert all(r["ok"] for r in v3.values()), v3

    import glob as _glob

    ledger_files = _glob.glob(os.path.join(out, "_fingerprints", "*.parquet"))
    os.remove(ledger_files[0])
    crc = os.path.join(
        os.path.dirname(ledger_files[0]),
        f".{os.path.basename(ledger_files[0])}.crc",
    )
    if os.path.exists(crc):
        os.remove(crc)
    v4 = {r["check"]: r.asDict() for r in validate_corpus(spark, out, deep=True).collect()}
    assert not v4["ledger"]["ok"]
    assert "missing=" in v4["ledger"]["detail"]


def test_validate_detects_dual_writer_divergence(spark, tmp_path):
    """The lease is advisory on local/S3A: two writers that both miss it
    can interleave swaps. validate_corpus(deep=True)'s dual_writer check
    flags each state only an interleaved second writer can produce
    (VERDICT r8 #6)."""
    import shutil

    from bambooai_spark.operators.filestats import enable_file_stats
    from bambooai_spark.operators.lease import corpus_lease
    from bambooai_spark.operators.writer import (
        compact_corpus,
        validate_corpus,
    )

    def deep(out):
        return {
            r["check"]: r.asDict()
            for r in validate_corpus(spark, out, deep=True).collect()
        }

    # healthy corpus (stats-configured, leased commits) → green
    out = str(tmp_path / "corpus")
    enable_file_stats(spark, out, ["doc_id"])
    lease = corpus_lease(spark, out, owner="writer-A").acquire()
    append_corpus_txn(_docs(spark, 0, 20), out, 0, lease=lease)
    append_corpus_txn(_docs(spark, 20, 40), out, 1, lease=lease)
    lease.release()
    v = deep(out)
    assert v["dual_writer"]["ok"], v["dual_writer"]

    # (c) a second writer's file lands inside committed batch 1 — the
    # marker's staged set does not know it
    victim_dir = None
    foreign = None
    for root, _dirs, files in os.walk(out):
        if "/_" in root or root.rsplit("/", 1)[-1].startswith("_"):
            continue
        for f in files:
            if f.startswith("b1-") and f.endswith(".parquet"):
                victim_dir, src = root, os.path.join(root, f)
                foreign = os.path.join(root, "b1-writerB-" + f[3:])
                shutil.copyfile(src, foreign)
                break
        if foreign:
            break
    assert foreign is not None
    v = deep(out)
    assert not v["dual_writer"]["ok"]
    assert "never staged" in v["dual_writer"]["detail"]
    assert "writer-A" in v["dual_writer"]["detail"]  # forensics
    os.remove(foreign)
    crc = os.path.join(victim_dir, "." + os.path.basename(foreign) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    assert deep(out)["dual_writer"]["ok"]

    # (a) two live compaction generations: fake a survivor of an older
    # compaction a completed newer one should have deleted
    compact_corpus(spark, out, partition_by=("lang",))
    cfile = None
    for root, _dirs, files in os.walk(out):
        if "/_" in root or root.rsplit("/", 1)[-1].startswith("_"):
            continue
        for f in files:
            if f.startswith("c") and f.endswith(".parquet"):
                cfile = os.path.join(root, f)
                break
        if cfile:
            break
    assert cfile is not None
    stale = os.path.join(
        os.path.dirname(cfile),
        "cdeadbee7-" + os.path.basename(cfile).partition("-")[2],
    )
    shutil.copyfile(cfile, stale)
    v = deep(out)
    assert not v["dual_writer"]["ok"]
    assert "compaction generations" in v["dual_writer"]["detail"]
    os.remove(stale)
    crc = os.path.join(
        os.path.dirname(stale), "." + os.path.basename(stale) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)

    assert deep(out)["dual_writer"]["ok"]

    # regression (review r9): a SELECTIVE delete raises the floor while
    # legitimately leaving unaffected b-files of lower batches live —
    # a single-writer state that must NOT read as divergence
    out2 = str(tmp_path / "c2")
    enable_file_stats(spark, out2, ["doc_id"])
    append_corpus_txn(_docs(spark, 0, 20), out2, 0)
    append_corpus_txn(_docs(spark, 20, 40), out2, 1)
    from bambooai_spark.operators.writer import delete_from_corpus

    delete_from_corpus(
        spark, out2, F.col("doc_id") >= 30, partition_by=("lang",)
    )
    import json as _json

    with open(os.path.join(out2, writer.MANIFEST_NAME)) as fh:
        assert _json.load(fh).get("as_of_floor") is not None
    v2 = deep(out2)
    assert v2["dual_writer"]["ok"], v2["dual_writer"]


# ------------------------------------------------------------- UPDATE


def test_update_corpus_end_to_end(spark, tmp_path):
    """In-place UPDATE: matched rows get the new values, unmatched rows
    and unaffected files are untouched, the ledger swaps old fingerprints
    for new ones (old content re-appendable, new content deduped), row
    counts and the manifest stay exact."""
    from bambooai_spark.operators.writer import update_corpus

    out = str(tmp_path / "corpus")
    for b in range(3):
        append_corpus_txn(
            _docs(spark, b * 20, b * 20 + 20), out, b,
            max_records_per_file=5,
        )
    before_files = set(
        r[0]
        for r in spark.read.parquet(out)
        .select("_metadata.file_path").distinct().collect()
    )
    before_rows = {
        r["doc_id"]: (r["lang"], r["source"], r["text"])
        for r in spark.read.parquet(out).collect()
    }
    m = update_corpus(
        spark, out, F.col("doc_id").isin(7, 8, 31),
        {"text": F.concat(F.lit("REDACTED "), F.col("text")),
         "source": F.lit("takedown")},
    )
    stored = spark.read.parquet(out)
    assert stored.count() == 60
    got = {
        r["doc_id"]: (r["lang"], r["source"], r["text"])
        for r in stored.collect()
    }
    for i in (7, 8, 31):
        lang, _src, old_text = before_rows[i]
        assert got[i] == (lang, "takedown", "REDACTED " + old_text)
    for i in set(before_rows) - {7, 8, 31}:
        assert got[i] == before_rows[i]
    # schema byte-stable: same columns, same dtypes
    assert stored.schema == spark.createDataFrame(
        [], stored.schema
    ).schema
    # only affected files rewritten
    after_files = set(
        r[0]
        for r in stored.select("_metadata.file_path").distinct().collect()
    )
    assert before_files - after_files, "no file was rewritten"
    assert after_files & before_files, "unaffected files were rewritten"
    # manifest row counts unchanged and equal to the rebuild
    got_m = {r["lang"]: r["n_rows"] for r in m.collect()}
    rebuilt = {
        r["lang"]: r["n_rows"]
        for r in build_manifest(spark, out, partition_by=("lang",)).collect()
    }
    assert got_m == rebuilt
    # ledger: still one fp per live document...
    assert spark.read.parquet(out + "/" + LEDGER_DIR).count() == 60
    # ...the OLD texts' fps are gone (their re-append is admitted)...
    append_corpus_txn(
        _docs(spark, 0, 60).filter(F.col("doc_id").isin(7, 8, 31))
        .withColumn("doc_id", F.col("doc_id") + 1000),
        out, "readd_old",
    )
    assert spark.read.parquet(out).count() == 63
    # ...and the NEW texts' fps are present (duplicate append dropped)
    dup_new = spark.read.parquet(out).filter(
        F.col("doc_id").isin(7, 8, 31)
    ).select("doc_id", "lang", "source", "text").withColumn(
        "doc_id", F.col("doc_id") + 2000
    )
    append_corpus_txn(dup_new, out, "readd_new")
    assert spark.read.parquet(out).count() == 63


def test_update_corpus_simultaneous_assignments(spark, tmp_path):
    """Assignments evaluate against the OLD row in one projection — a
    two-column swap must actually swap (sequential withColumn would
    duplicate one side)."""
    from bambooai_spark.operators.writer import update_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    update_corpus(
        spark, out, F.col("doc_id") == 3,
        {"source": F.col("text"), "text": F.col("source")},
    )
    row = spark.read.parquet(out).filter("doc_id = 3").collect()[0]
    assert row["text"] == "web"
    assert row["source"].startswith("document text number 3")


def test_update_corpus_token_delta_and_types(spark, tmp_path):
    """When the token column itself is assigned, the manifest folds the
    exact per-partition token delta; assigned values are cast to the
    stored column types so the rewritten files keep the corpus schema."""
    from bambooai_spark.operators.writer import update_corpus

    out = str(tmp_path / "corpus")
    docs = _docs(spark, 0, 30).withColumn(
        "n_tokens", F.size(F.split("text", r"\s+")).cast("long")
    )
    append_corpus_txn(docs, out, 0, token_col="n_tokens")
    with open(os.path.join(out, MANIFEST_NAME)) as fh:
        before = {
            p["lang"]: p["n_tokens"]
            for p in json.load(fh)["partitions"]
        }
    m = update_corpus(
        spark, out, F.col("doc_id") < 10,
        # int literal against a long column: must cast, not drift
        {"n_tokens": F.lit(0)},
        token_col="n_tokens",
    )
    stored = spark.read.parquet(out)
    assert dict(stored.dtypes)["n_tokens"] == "bigint"
    got = {
        r["lang"]: r["t"]
        for r in stored.groupBy("lang")
        .agg(F.sum("n_tokens").alias("t")).collect()
    }
    folded = {r["lang"]: r["n_tokens"] for r in m.collect()}
    assert folded == got
    assert any(folded[lang] < before[lang] for lang in folded)


def test_update_corpus_guards(spark, tmp_path):
    from bambooai_spark.operators.writer import update_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    with pytest.raises(ValueError, match="assignments is empty"):
        update_corpus(spark, out, F.lit(True), {})
    with pytest.raises(ValueError, match="partition columns"):
        update_corpus(spark, out, F.lit(True), {"lang": F.lit("fr")})
    with pytest.raises(ValueError, match="not corpus columns"):
        update_corpus(spark, out, F.lit(True), {"nope": F.lit(1)})
    # no match -> corpus untouched, current manifest returned
    before = spark.read.parquet(out).collect()
    m = update_corpus(
        spark, out, F.col("doc_id") > 10_000, {"source": F.lit("x")}
    )
    assert {r["lang"]: r["n_rows"] for r in m.collect()} == {"en": 5, "de": 5}
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == sorted(
        map(tuple, before)
    )
    # NULL predicate rows are untouched (same rule as delete's kept side)
    update_corpus(
        spark, out,
        F.when(F.col("doc_id") == 2, F.lit(True)),  # NULL elsewhere
        {"source": F.lit("hit")},
    )
    rows = {r["doc_id"]: r["source"] for r in spark.read.parquet(out).collect()}
    assert rows[2] == "hit"
    assert all(v == "web" for k, v in rows.items() if k != 2)


def test_update_corpus_crash_resume(spark, tmp_path, monkeypatch):
    """Crash injection at the update-swap protocol points: the frozen
    info resumes through the shared delete-resume path — no row loss, no
    duplicates, values updated exactly once."""
    from bambooai_spark.operators.writer import update_corpus

    out = str(tmp_path / "corpus")
    for b in range(2):
        append_corpus_txn(
            _docs(spark, b * 20, b * 20 + 20), out, b,
            max_records_per_file=5,
        )
    pred = F.col("doc_id") % 4 == 1

    orig_move = writer._move_staged_files

    def crash_move(sp, src_root, dest_root, batch_id, **kw):
        raise RuntimeError("injected update crash in swap")

    monkeypatch.setattr(writer, "_move_staged_files", crash_move)
    with pytest.raises(RuntimeError, match="injected"):
        update_corpus(spark, out, pred, {"source": F.lit("upd")})
    monkeypatch.setattr(writer, "_move_staged_files", orig_move)

    # recover_staging finishes the frozen update (shared resume path)
    from bambooai_spark.operators.writer import recover_staging

    rec = recover_staging(spark, out)
    assert "_delete_tmp" in rec["committed"]
    stored = spark.read.parquet(out)
    assert stored.count() == 40
    assert stored.select("text").distinct().count() == 40
    got = {r["doc_id"]: r["source"] for r in stored.collect()}
    for i in range(40):
        assert got[i] == ("upd" if i % 4 == 1 else "web"), i
    assert spark.read.parquet(out + "/" + LEDGER_DIR).count() == 40
    assert not os.path.exists(os.path.join(out, "_delete_tmp"))


def test_update_corpus_from_join_form(spark, tmp_path):
    """UPDATE ... FROM: new values come from the joined updates frame;
    keys absent from the corpus are ignored; duplicate update keys and
    missing columns are refused before anything is staged."""
    from bambooai_spark.operators.writer import update_corpus_from

    out = str(tmp_path / "corpus")
    for b in range(2):
        append_corpus_txn(
            _docs(spark, b * 20, b * 20 + 20), out, b,
            max_records_per_file=5,
        )
    updates = spark.createDataFrame(
        [(3, "replacement three"), (17, "replacement seventeen"),
         (9999, "no such row")],
        "doc_id long, text string",
    )
    m = update_corpus_from(spark, out, updates)
    stored = spark.read.parquet(out)
    assert stored.count() == 40
    got = {r["doc_id"]: r["text"] for r in stored.collect()}
    assert got[3] == "replacement three"
    assert got[17] == "replacement seventeen"
    assert got[0].startswith("document text number 0")
    assert 9999 not in got
    # manifest still exact
    rebuilt = {
        r["lang"]: r["n_rows"]
        for r in build_manifest(spark, out, partition_by=("lang",)).collect()
    }
    assert {r["lang"]: r["n_rows"] for r in m.collect()} == rebuilt
    # ledger swapped: old text re-appendable, new text deduped
    assert spark.read.parquet(out + "/" + LEDGER_DIR).count() == 40
    append_corpus_txn(
        spark.createDataFrame(
            [(500, "en", "web", "replacement three")],
            "doc_id long, lang string, source string, text string",
        ),
        out, "dupnew",
    )
    assert spark.read.parquet(out).count() == 40  # duplicate dropped
    # guards
    with pytest.raises(ValueError, match="duplicate"):
        update_corpus_from(
            spark, out,
            spark.createDataFrame(
                [(1, "a"), (1, "b")], "doc_id long, text string"
            ),
        )
    with pytest.raises(ValueError, match="lacks columns"):
        update_corpus_from(
            spark, out,
            spark.createDataFrame([(1,)], "doc_id long"),
        )
    with pytest.raises(ValueError, match="cannot also be"):
        update_corpus_from(
            spark, out, updates, set_cols=("doc_id", "text"),
        )
    # empty updates frame: no-op, current manifest returned
    m2 = update_corpus_from(
        spark, out,
        spark.createDataFrame([], "doc_id long, text string"),
    )
    assert {r["lang"]: r["n_rows"] for r in m2.collect()} == rebuilt


def test_exact_substring_surgery_as_corpus_maintenance(spark, tmp_path):
    """The end-to-end span-surgery flow the README sells: ingest docs
    with a shared boilerplate block, compute ExactSubstr keep-first cut
    over the live corpus, route the changed docs through
    update_corpus_from, and the corpus comes back clean — earliest copy
    intact, later copies cut, ledger/manifest/fsck consistent."""
    from bambooai_spark.operators.dedup import exact_substring_cut
    from bambooai_spark.operators.writer import (
        read_corpus,
        update_corpus_from,
        validate_corpus,
    )

    import hashlib

    def body(i):
        # hash gibberish, unique from the FIRST character: no 20-char
        # substring repeats within or across docs, so the duplicated
        # region is exactly the shared boilerplate (a span may eat at
        # most the first body token's shared-prefix chars, which an
        # md5 prefix makes vanishingly unlikely)
        return " ".join(
            hashlib.md5(f"{i}-{t}".encode()).hexdigest()[:8]
            for t in range(12)
        )

    boiler = "SHARED BOILERPLATE LICENSE HEADER BLOCK "
    rows = [(i, "en", "web", boiler + body(i)) for i in range(12)]
    out = str(tmp_path / "corpus")
    append_corpus_txn(
        spark.createDataFrame(
            rows, "doc_id long, lang string, source string, text string"
        ),
        out, 0, max_records_per_file=4,
    )
    live = read_corpus(spark, out)
    cut = exact_substring_cut(
        live, "doc_id", "text", k=20, keep_first=True
    )
    changed = cut.filter(F.col("clean_text") != F.col("text")).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    n_changed = changed.count()
    assert n_changed == 11  # every copy but the earliest loses the block
    update_corpus_from(spark, out, changed)
    after = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(out).collect()
    }
    assert len(after) == 12
    keepers = sorted(i for i, t in after.items() if boiler in t)
    assert keepers == [0]  # the earliest copy survives verbatim
    assert after[0] == boiler + body(0)  # byte-identical keeper
    for i, t in after.items():
        # bodies intact past the first token (the span cannot reach
        # beyond the point where the texts diverge)
        assert body(i)[9:] in t, (i, t)
    v = {r["check"]: r for r in validate_corpus(spark, out, deep=True).collect()}
    bad = {k: r.asDict() for k, r in v.items() if not r["ok"]}
    assert not bad, bad


def test_update_corpus_many_files_join_path(spark, tmp_path, monkeypatch):
    """Above the matched-file bound the staged rewrite filters via a
    left-semi join against the matched-file relation, not an isin
    literal (VERDICT r10 #4) — plan shape checked directly on the
    helper, and a whole-corpus update through the forced join path is
    byte-identical to the isin path on a twin corpus."""
    from bambooai_spark.operators.writer import (
        _filter_to_files,
        update_corpus,
    )

    # plan shape: join path has a Join node and no path literal; isin
    # path embeds the literal and no extra join
    tagged = (
        _docs(spark, 0, 10)
        .withColumn("_file", F.concat(F.lit("f"), F.col("doc_id") % 3))
    )
    files_rel = tagged.select("_file").distinct()
    files = ["f0", "f1", "f2"]
    monkeypatch.setenv("SPARK_GRAFT_FILE_ISIN_BOUND", "0")
    joined = _filter_to_files(tagged, files_rel, files)
    jplan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "Join LeftSemi" in jplan
    assert joined.columns == tagged.columns
    monkeypatch.setenv("SPARK_GRAFT_FILE_ISIN_BOUND", "1000")
    lit = _filter_to_files(tagged, files_rel, files)
    lplan = lit._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in lplan and "f1" in lplan
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, lit.collect())
    )

    # end-to-end: twin corpora, one updated through each path
    outs = {}
    for mode, bound in (("isin", "1000000"), ("join", "0")):
        out = str(tmp_path / f"corpus_{mode}")
        for b in range(2):
            append_corpus_txn(
                _docs(spark, b * 20, b * 20 + 20), out, b,
                max_records_per_file=4,
            )
        monkeypatch.setenv("SPARK_GRAFT_FILE_ISIN_BOUND", bound)
        update_corpus(
            spark, out, F.col("doc_id") % 2 == 0,
            {"text": F.concat(F.lit("U "), F.col("text")),
             "source": F.lit("upd")},
        )
        outs[mode] = sorted(
            map(tuple, spark.read.parquet(out)
                .select("doc_id", "lang", "source", "text").collect())
        )
    assert outs["isin"] == outs["join"]
    # fsck stays green after the join-path rewrite
    from bambooai_spark.operators.writer import validate_corpus

    rep = validate_corpus(
        spark, str(tmp_path / "corpus_join"), deep=True
    ).collect()
    assert all(r["ok"] for r in rep), rep


def _merge_src(spark):
    rows = [
        (3, "en", "crawl2", "refreshed text three"),
        (4, "de", "crawl2", "refreshed text four"),
        (100, "en", "crawl2", "brand new doc 100"),
        (101, "de", "crawl2", "brand new doc 101"),
        # duplicate of live doc 5's text — admission must drop it
        (102, "en", "crawl2", "document text number 5 " * 5),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )


def test_merge_corpus_end_to_end(spark, tmp_path):
    """MERGE: matched keys update in place, unmatched keys insert, an
    insert duplicating a LIVE text fingerprint is dropped (admission
    mirrors append), ledger stays one-fp-per-live-row, manifest fold
    equals the rebuild, fsck deep-green, and a re-run of the same merge
    is a no-op on the row set."""
    from bambooai_spark.operators.writer import merge_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0, max_records_per_file=5)
    m = merge_corpus(
        spark, out, _merge_src(spark),
        key_col="doc_id", set_cols=("text", "source"),
    )
    stored = spark.read.parquet(out)
    assert stored.count() == 22
    got = {r["doc_id"]: (r["source"], r["text"]) for r in stored.collect()}
    assert got[3] == ("crawl2", "refreshed text three")
    assert got[4] == ("crawl2", "refreshed text four")
    assert got[100] == ("crawl2", "brand new doc 100")
    assert got[101] == ("crawl2", "brand new doc 101")
    assert 102 not in got  # duplicate-text insert dropped
    assert got[0][0] == "web"  # untouched row
    # ledger exact: one fp per live row; old texts re-appendable
    assert spark.read.parquet(out + "/" + LEDGER_DIR).count() == 22
    append_corpus_txn(
        spark.createDataFrame(
            [(900, "en", "web", "document text number 3 " * 5)],
            "doc_id long, lang string, source string, text string",
        ),
        out, "readd_old",
    )
    assert spark.read.parquet(out).count() == 23  # old text admitted
    # new texts deduped on append
    append_corpus_txn(
        spark.createDataFrame(
            [(901, "en", "web", "brand new doc 100")],
            "doc_id long, lang string, source string, text string",
        ),
        out, "readd_new",
    )
    assert spark.read.parquet(out).count() == 23
    # manifest: folded == rebuilt
    got_m = {r["lang"]: r["n_rows"] for r in m.collect()}
    rebuilt = {
        r["lang"]: r["n_rows"]
        for r in build_manifest(spark, out, partition_by=("lang",)).collect()
    }
    assert got_m == {"en": 11, "de": 11}
    from bambooai_spark.operators.writer import validate_corpus

    rep = validate_corpus(spark, out, deep=True).collect()
    assert all(r["ok"] for r in rep), [r for r in rep if not r["ok"]]
    # idempotent re-run: prior inserts now match by key, same values
    merge_corpus(
        spark, out, _merge_src(spark),
        key_col="doc_id", set_cols=("text", "source"),
    )
    stored2 = spark.read.parquet(out)
    assert stored2.count() == 23
    assert {
        r["doc_id"]: (r["source"], r["text"]) for r in stored2.collect()
    }[100] == ("crawl2", "brand new doc 100")


def test_merge_corpus_insert_only_and_update_only(spark, tmp_path):
    """Degenerate halves: a source with no matching keys is a pure
    insert (no corpus file rewritten); a source with only matching keys
    is exactly update_corpus_from."""
    from bambooai_spark.operators.writer import merge_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0, max_records_per_file=5)
    before_files = set(
        r[0]
        for r in spark.read.parquet(out)
        .select("_metadata.file_path").distinct().collect()
    )
    # insert-only
    merge_corpus(
        spark, out,
        spark.createDataFrame(
            [(200, "en", "c2", "fresh two hundred")],
            "doc_id long, lang string, source string, text string",
        ),
        key_col="doc_id", set_cols=("text",),
    )
    after_files = set(
        r[0]
        for r in spark.read.parquet(out)
        .select("_metadata.file_path").distinct().collect()
    )
    assert before_files <= after_files  # originals untouched
    assert spark.read.parquet(out).count() == 11
    assert spark.read.parquet(out + "/" + LEDGER_DIR).count() == 11
    # update-only
    merge_corpus(
        spark, out,
        spark.createDataFrame(
            [(2, "en", "c3", "second rewrite")],
            "doc_id long, lang string, source string, text string",
        ),
        key_col="doc_id", set_cols=("text",),
    )
    stored = spark.read.parquet(out)
    assert stored.count() == 11
    assert {r["doc_id"]: r["text"] for r in stored.collect()}[
        2
    ] == "second rewrite"
    # empty source: corpus untouched
    merge_corpus(
        spark, out,
        spark.createDataFrame(
            [], "doc_id long, lang string, source string, text string"
        ),
        key_col="doc_id", set_cols=("text",),
    )
    assert spark.read.parquet(out).count() == 11


def test_merge_corpus_crash_resume(spark, tmp_path, monkeypatch):
    """Crash injection at the merge swap point: the ONE frozen marker
    covers both halves — after resume the updates landed exactly once
    AND the inserts landed exactly once (the torn update/append gap the
    verb exists to close)."""
    from bambooai_spark.operators.writer import merge_corpus, recover_staging

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0, max_records_per_file=5)

    orig_move = writer._move_staged_files

    def crash_move(sp, src_root, dest_root, batch_id, **kw):
        raise RuntimeError("injected merge crash in swap")

    monkeypatch.setattr(writer, "_move_staged_files", crash_move)
    with pytest.raises(RuntimeError, match="injected"):
        merge_corpus(
            spark, out, _merge_src(spark),
            key_col="doc_id", set_cols=("text", "source"),
        )
    monkeypatch.setattr(writer, "_move_staged_files", orig_move)
    rec = recover_staging(spark, out)
    assert "_delete_tmp" in rec["committed"]
    stored = spark.read.parquet(out)
    assert stored.count() == 22
    got = {r["doc_id"]: (r["source"], r["text"]) for r in stored.collect()}
    assert got[3] == ("crawl2", "refreshed text three")
    assert got[100] == ("crawl2", "brand new doc 100")
    assert 102 not in got
    assert stored.select("text").distinct().count() == 22  # no dup rows
    assert spark.read.parquet(out + "/" + LEDGER_DIR).count() == 22
    rebuilt = {
        r["lang"]: r["n_rows"]
        for r in build_manifest(spark, out, partition_by=("lang",)).collect()
    }
    assert rebuilt == {"en": 11, "de": 11}
    assert not os.path.exists(os.path.join(out, "_delete_tmp"))


def test_merge_corpus_guards(spark, tmp_path):
    from bambooai_spark.operators.writer import merge_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    full = "doc_id long, lang string, source string, text string"
    with pytest.raises(ValueError, match="set_cols is empty"):
        merge_corpus(spark, out, spark.createDataFrame([], full),
                     set_cols=())
    with pytest.raises(ValueError, match="partition columns"):
        merge_corpus(spark, out, spark.createDataFrame([], full),
                     set_cols=("lang",))
    with pytest.raises(ValueError, match="key_col"):
        merge_corpus(spark, out, spark.createDataFrame([], full),
                     key_col="text", set_cols=("text",))
    with pytest.raises(ValueError, match="lacks columns"):
        merge_corpus(
            spark, out,
            spark.createDataFrame([], "doc_id long, lang string"),
            set_cols=("text",),
        )
    # full-schema requirement: inserts need every corpus column
    with pytest.raises(ValueError, match="lacks corpus columns"):
        merge_corpus(
            spark, out,
            spark.createDataFrame(
                [(1, "x")], "doc_id long, text string"
            ),
            set_cols=("text",),
        )
    with pytest.raises(ValueError, match="duplicate"):
        merge_corpus(
            spark, out,
            spark.createDataFrame(
                [(1, "en", "w", "a"), (1, "en", "w", "b")], full
            ),
            set_cols=("text",),
        )


def test_update_corpus_warns_on_duplicate_live_text(spark, tmp_path):
    """The one-live-row-per-fingerprint invariant is the caller's
    contract under UPDATE (ADVICE r10) — but the ledger stage warns when
    an assigned text is already live elsewhere in the corpus."""
    import warnings

    from bambooai_spark.operators.writer import update_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0, max_records_per_file=3)
    dup_text = "document text number 7 " * 5  # live doc 7's text
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        update_corpus(
            spark, out, F.col("doc_id") == 2, {"text": F.lit(dup_text)}
        )
    msgs = [str(w.message) for w in caught]
    assert any("already live elsewhere" in m for m in msgs), msgs
    # corpus now really does carry the duplicate (documented hazard)
    stored = spark.read.parquet(out)
    assert stored.filter(F.col("text") == dup_text).count() == 2
    # a collision-free update stays silent
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        update_corpus(
            spark, out, F.col("doc_id") == 3,
            {"text": F.lit("a wholly unique replacement text")},
        )
    assert not [
        w for w in caught2 if "already live" in str(w.message)
    ], [str(w.message) for w in caught2]


def test_merge_corpus_delete_unmatched_snapshot_sync(spark, tmp_path):
    """Full MERGE (snapshot sync): after ONE transaction the corpus
    equals the source — survivors updated, newcomers inserted, departed
    rows deleted with their fingerprints freed; manifest fold equals the
    rebuild and deep fsck stays green. An empty source is refused."""
    from bambooai_spark.operators.writer import merge_corpus, validate_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0, max_records_per_file=5)
    # the new snapshot: keeps even keys (text refreshed for doc 2 only),
    # adds key 500, drops every odd key
    keep = [
        (i, ["en", "de"][i % 2], "snap",
         ("RESNAP two" if i == 2 else f"document text number {i} " * 5))
        for i in range(0, 20, 2)
    ] + [(500, "en", "snap", "the five hundred doc")]
    src = spark.createDataFrame(
        keep, "doc_id long, lang string, source string, text string"
    )
    m = merge_corpus(
        spark, out, src, key_col="doc_id",
        set_cols=("text", "source"), delete_unmatched=True,
    )
    stored = spark.read.parquet(out)
    got = {r["doc_id"]: (r["source"], r["text"]) for r in stored.collect()}
    assert set(got) == {i for i in range(0, 20, 2)} | {500}
    assert got[2] == ("snap", "RESNAP two")
    assert got[4] == ("snap", "document text number 4 " * 5)
    assert got[500] == ("snap", "the five hundred doc")
    # manifest: folded == rebuilt (update delta + insert - deletes);
    # every even doc is 'en', so the de partition folds to zero rows
    # and leaves the manifest entirely
    got_m = {r["lang"]: r["n_rows"] for r in m.collect()}
    rebuilt = {
        r["lang"]: r["n_rows"]
        for r in build_manifest(spark, out, partition_by=("lang",)).collect()
    }
    assert got_m == rebuilt == {"en": 11}
    rep = validate_corpus(spark, out, deep=True).collect()
    assert all(r["ok"] for r in rep), [r for r in rep if not r["ok"]]
    # ledger: one fp per live row; deleted texts re-appendable
    assert spark.read.parquet(out + "/" + LEDGER_DIR).count() == 11
    append_corpus_txn(
        spark.createDataFrame(
            [(901, "en", "web", "document text number 7 " * 5)],
            "doc_id long, lang string, source string, text string",
        ),
        out, "readd_deleted",
    )
    assert spark.read.parquet(out).count() == 12
    # empty source refused — the corpus is untouched
    with pytest.raises(ValueError, match="EMPTY source"):
        merge_corpus(
            spark, out,
            spark.createDataFrame(
                [], "doc_id long, lang string, source string, text string"
            ),
            key_col="doc_id", set_cols=("text",), delete_unmatched=True,
        )
    assert spark.read.parquet(out).count() == 12


def test_merge_delete_freed_fp_never_unprotects_updated_text(
    spark, tmp_path
):
    """ADVICE r11: with delete_unmatched, a deleted row whose fingerprint
    equals an updated row's NEW text must not free that fp for inserts —
    the freed-fp subtraction applies to the ledger-derived set only,
    never to the update's new-text protection. Otherwise the insert
    would create a second live row with the updated row's text."""
    from bambooai_spark.operators.writer import merge_corpus, validate_corpus

    out = str(tmp_path / "corpus")
    append_corpus_txn(
        spark.createDataFrame(
            [
                (1, "en", "web", "the first unique document text"),
                (2, "en", "web", "the second unique document text"),
            ],
            "doc_id long, lang string, source string, text string",
        ),
        out,
        0,
    )
    # doc 1 updates TO doc 2's text; doc 2 departs (freeing its fp);
    # doc 3 tries to insert the very same text
    src = spark.createDataFrame(
        [
            (1, "en", "snap", "the second unique document text"),
            (3, "en", "snap", "the second unique document text"),
        ],
        "doc_id long, lang string, source string, text string",
    )
    merge_corpus(
        spark, out, src, key_col="doc_id",
        set_cols=("text", "source"), delete_unmatched=True,
    )
    stored = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    # one live row per fingerprint: the insert was dropped
    assert stored == {1: "the second unique document text"}
    assert spark.read.parquet(out + "/" + LEDGER_DIR).count() == 1
    rep = validate_corpus(spark, out, deep=True).collect()
    assert all(r["ok"] for r in rep), [r for r in rep if not r["ok"]]
    # and a deleted fp NOT colliding with an updated text stays freed:
    # doc 1 departs, doc 9 re-inserts doc 1's old text successfully
    src2 = spark.createDataFrame(
        [
            (9, "en", "snap2", "the first unique document text"),
        ],
        "doc_id long, lang string, source string, text string",
    )
    merge_corpus(
        spark, out, src2, key_col="doc_id",
        set_cols=("text", "source"), delete_unmatched=True,
    )
    stored = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert stored == {9: "the first unique document text"}
    rep = validate_corpus(spark, out, deep=True).collect()
    assert all(r["ok"] for r in rep), [r for r in rep if not r["ok"]]


def test_sync_crash_resume(spark, tmp_path, monkeypatch):
    """Crash injection at the snapshot-sync swap point: ONE frozen
    marker covers update+insert+delete — after resume the corpus equals
    the source exactly once (no resurrected deletes, no doubled
    inserts)."""
    from bambooai_spark.operators.writer import merge_corpus, recover_staging

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 12), out, 0, max_records_per_file=4)
    src = spark.createDataFrame(
        [(i, ["en", "de"][i % 2], "snap", f"document text number {i} " * 5)
         for i in range(0, 12, 3)]
        + [(700, "en", "snap", "the seven hundred doc")],
        "doc_id long, lang string, source string, text string",
    )

    orig_move = writer._move_staged_files

    def crash_move(sp, src_root, dest_root, batch_id, **kw):
        raise RuntimeError("injected sync crash in swap")

    monkeypatch.setattr(writer, "_move_staged_files", crash_move)
    with pytest.raises(RuntimeError, match="injected"):
        merge_corpus(
            spark, out, src, key_col="doc_id",
            set_cols=("text", "source"), delete_unmatched=True,
        )
    monkeypatch.setattr(writer, "_move_staged_files", orig_move)
    rec = recover_staging(spark, out)
    assert "_delete_tmp" in rec["committed"]
    stored = spark.read.parquet(out)
    got = {r["doc_id"]: r["source"] for r in stored.collect()}
    assert set(got) == {0, 3, 6, 9, 700}
    assert all(v == "snap" for v in got.values())
    assert spark.read.parquet(out + "/" + LEDGER_DIR).count() == 5
    rebuilt = {
        r["lang"]: r["n_rows"]
        for r in build_manifest(spark, out, partition_by=("lang",)).collect()
    }
    assert {r["lang"]: r["n_rows"] for r in spark.read.parquet(out)
            .groupBy("lang").count()
            .withColumnRenamed("count", "n_rows").collect()} == rebuilt
    assert not os.path.exists(os.path.join(out, "_delete_tmp"))
