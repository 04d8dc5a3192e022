"""Near-dup admission gate: end-to-end blocking, within-batch pair
rule, takedown disarm via ledger liveness, orphan-signature inertness,
self-heal rebuild, parameter pinning, and the txn/streaming paths."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bambooai_spark.io import load_table
from bambooai_spark.operators.neardup_gate import (
    SIGS_DIR,
    near_dup_gate,
    rebuild_signatures,
    record_signatures,
)
from bambooai_spark.operators.writer import (
    append_corpus,
    delete_from_corpus,
)
from tests.conftest import SF_DIR

OPTS = {"num_hashes": 64, "bands": 16}
THR = 0.8


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def _corpus(spark, tmp_path, df=None):
    path = str(tmp_path / "corpus")
    base = df if df is not None else _docs(spark)
    append_corpus(base, path, near_dup_threshold=THR, near_dup_opts=OPTS)
    return path


def _perturb(df, id_offset=100000, suffix=" tail"):
    return df.withColumn(
        "doc_id", (F.col("doc_id") + id_offset).cast("long")
    ).withColumn("text", F.concat(F.col("text"), F.lit(suffix)))


def test_gate_blocks_near_dups_admits_new(spark, tmp_path):
    d = _docs(spark)
    path = _corpus(spark, tmp_path, d.filter("doc_id % 2 = 0"))
    novel = spark.createDataFrame(
        [
            (
                200000 + i,
                f"entirely novel corpus text number {i} with "
                f"unrepeated vocabulary item{i} token{i * 7}",
                "en",
                "srcnew",
                60,
            )
            for i in range(10)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    batch = _perturb(d.filter("doc_id % 2 = 0 AND doc_id < 20")).unionByName(
        novel
    )
    append_corpus(batch, path, near_dup_threshold=THR, near_dup_opts=OPTS)
    got = spark.read.parquet(path)
    assert got.filter(
        "doc_id >= 100000 AND doc_id < 200000"
    ).count() == 0  # near-dups blocked
    assert (
        got.filter("doc_id >= 200000").count() == 10
    )  # genuinely new docs admitted


def test_within_batch_smaller_id_kept(spark, tmp_path):
    d = _docs(spark).filter("doc_id < 10")
    path = str(tmp_path / "corpus")
    batch = d.unionByName(_perturb(d))
    append_corpus(batch, path, near_dup_threshold=THR, near_dup_opts=OPTS)
    got = spark.read.parquet(path)
    assert got.filter("doc_id < 10").count() == d.count()  # originals kept
    assert got.filter("doc_id >= 100000").count() == 0  # twins dropped


def test_takedown_disarms_signatures(spark, tmp_path):
    """delete_from_corpus removes the fps from the ledger, so the dead
    documents' signatures no longer block — near-identical content is
    admissible again, matching the exact ledger's takedown semantics."""
    d = _docs(spark).filter("doc_id < 10")
    path = _corpus(spark, tmp_path, d)
    twin = _perturb(d.filter("doc_id = 0"))
    append_corpus(twin, path, near_dup_threshold=THR, near_dup_opts=OPTS)
    assert spark.read.parquet(path).filter("doc_id = 100000").count() == 0
    delete_from_corpus(spark, path, F.col("doc_id") == 0)
    append_corpus(twin, path, near_dup_threshold=THR, near_dup_opts=OPTS)
    assert spark.read.parquet(path).filter("doc_id = 100000").count() == 1


def test_orphan_signatures_inert(spark, tmp_path):
    """A signature row whose fp never reached the ledger (crashed
    pre-commit append) must not block anything."""
    d = _docs(spark).filter("doc_id < 10")
    path = _corpus(spark, tmp_path, d)
    # forge an orphan: signature of doc 90's text under a fp that is NOT
    # in the ledger
    orphan = (
        _docs(spark)
        .filter("doc_id = 90")
        .select(F.lit("deadbeef" * 4).alias("_fp"), "text")
    )
    record_signatures(orphan, path, near_dup_opts=OPTS)
    twin = _perturb(_docs(spark).filter("doc_id = 90"))
    survivors = near_dup_gate(
        twin, path, threshold=THR, near_dup_opts=OPTS
    )
    assert survivors.count() == 1  # orphan sig did not block


def test_rebuild_signatures_self_heal(spark, tmp_path):
    """Losing the store only loses recall; rebuild restores blocking."""
    d = _docs(spark).filter("doc_id < 10")
    path = _corpus(spark, tmp_path, d)
    shutil.rmtree(os.path.join(path, SIGS_DIR))
    twin = _perturb(d.filter("doc_id = 0"))
    assert (
        near_dup_gate(twin, path, threshold=THR, near_dup_opts=OPTS).count()
        == 1
    )  # store gone: admitted (recall loss, not an error)
    n = rebuild_signatures(spark, path, near_dup_opts=OPTS)
    assert n == d.count()
    assert (
        near_dup_gate(twin, path, threshold=THR, near_dup_opts=OPTS).count()
        == 0
    )  # blocking restored


def test_params_pinned_per_corpus(spark, tmp_path):
    d = _docs(spark).filter("doc_id < 10")
    path = _corpus(spark, tmp_path, d)
    with pytest.raises(ValueError, match="pinned signature-store params"):
        append_corpus(
            _docs(spark).filter("doc_id = 11"), path,
            near_dup_threshold=THR,
            near_dup_opts={"num_hashes": 32, "bands": 8},
        )


def test_gate_validation(spark, tmp_path):
    d = _docs(spark).filter("doc_id < 5")
    with pytest.raises(ValueError, match="threshold"):
        near_dup_gate(d, str(tmp_path), threshold=0.0)
    with pytest.raises(ValueError, match="unknown near_dup_opts"):
        near_dup_gate(d, str(tmp_path), threshold=0.5,
                      near_dup_opts={"nope": 1})
    with pytest.raises(ValueError, match="must divide"):
        near_dup_gate(d, str(tmp_path), threshold=0.5,
                      near_dup_opts={"num_hashes": 10, "bands": 4})
    with pytest.raises(ValueError, match="hash family"):
        near_dup_gate(d, str(tmp_path), threshold=0.5,
                      near_dup_opts={"hash": "sha"})


def test_empty_text_passes(spark, tmp_path):
    d = _docs(spark).filter("doc_id < 10")
    path = _corpus(spark, tmp_path, d)
    blank = spark.createDataFrame(
        [(7777, "   ", "en", "srcx", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    append_corpus(blank, path, near_dup_threshold=THR, near_dup_opts=OPTS)
    assert spark.read.parquet(path).filter("doc_id = 7777").count() == 1


def test_txn_append_gated(spark, tmp_path):
    """The exactly-once path gates and records too."""
    d = _docs(spark).filter("doc_id % 2 = 0 AND doc_id < 40")
    path = str(tmp_path / "corpus")
    append_corpus(
        d, path, batch_id=1, near_dup_threshold=THR, near_dup_opts=OPTS
    )
    assert os.path.isdir(os.path.join(path, SIGS_DIR))
    batch = _perturb(d.filter("doc_id < 10")).unionByName(
        _docs(spark).filter("doc_id % 2 = 1 AND doc_id < 10")
    )
    append_corpus(
        batch, path, batch_id=2, near_dup_threshold=THR, near_dup_opts=OPTS
    )
    got = spark.read.parquet(path)
    assert got.filter("doc_id >= 100000").count() == 0
    assert got.filter("doc_id % 2 = 1").count() == 5


def test_streaming_sink_gated(spark, tmp_path):
    """The streaming corpus sink threads the gate: a second stream of
    lightly perturbed copies of the stored documents is fully blocked
    (exact dedup cannot catch these — every text differs)."""
    from bambooai_spark.streaming.documents import (
        read_documents_stream,
        stream_ingest_to_corpus,
    )

    path = str(tmp_path / "corpus")
    sdf = read_documents_stream(spark, SF_DIR)
    stream_ingest_to_corpus(
        sdf, path, checkpoint_location=str(tmp_path / "ckpt1"),
        near_dup_threshold=THR, near_dup_opts=OPTS,
    )
    stored = spark.read.parquet(path)
    n_seed = stored.count()
    # perturbed twins OF THE STORED DOCS as a second stream source
    src2 = str(tmp_path / "src2")
    os.makedirs(src2, exist_ok=True)
    _perturb(
        stored.select("doc_id", "text", "lang", "source", "n_chars")
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "src2_stage")
    )
    # the file-stream source globs documents.parquet specifically
    part = [
        f
        for f in os.listdir(str(tmp_path / "src2_stage"))
        if f.endswith(".parquet")
    ][0]
    shutil.copy(
        os.path.join(str(tmp_path / "src2_stage"), part),
        os.path.join(src2, "documents.parquet"),
    )
    sdf2 = read_documents_stream(spark, src2)
    stream_ingest_to_corpus(
        sdf2, path, checkpoint_location=str(tmp_path / "ckpt2"),
        near_dup_threshold=THR, near_dup_opts=OPTS,
    )
    assert spark.read.parquet(path).count() == n_seed  # all twins blocked


def test_gate_releases_caches(spark, tmp_path):
    """The gate runs inside streaming micro-batches — it must release
    every cache it takes (the original deferred session-lifetime cache
    leaked one entry per batch forever). localCheckpoint blocks linger
    until their DataFrame is GC'd, so the assertion is BOUNDED growth
    over repeated calls, not an exact before/after count."""
    import gc
    import time

    d = _docs(spark).filter("doc_id < 20")
    path = _corpus(spark, tmp_path, d)

    def settled_count():
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.5)  # ContextCleaner drains asynchronously
        return len(spark.sparkContext._jsc.getPersistentRDDs())

    near_dup_gate(_perturb(d), path, threshold=THR,
                  near_dup_opts=OPTS).count()
    base = settled_count()
    for _ in range(5):
        near_dup_gate(_perturb(d), path, threshold=THR,
                      near_dup_opts=OPTS).count()
    after = settled_count()
    # even a ONE-persist-per-call leak (a dropped unpersist) grows the
    # tracked set by 5 here; <= 2 tolerates checkpoint-GC slack only
    assert after - base <= 2, (base, after)


def test_newest_signature_wins_for_shared_fp(spark, tmp_path):
    """Takedown + re-append of a normalization VARIANT (same fp, raw
    text differs, so shingles differ) leaves two sig rows for one live
    fp — reads must deterministically use the NEWEST (the live text's),
    or near-dups of the live text can evade the gate."""
    v1 = "The Quick   Brown Fox Jumps Over The Lazy Dog Again And Again"
    v2 = v1.lower().replace("   ", " ")  # same fp, different shingles
    schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "corpus")
    append_corpus(
        spark.createDataFrame([(1, v1, "en", "s", 60)], schema), path,
        near_dup_threshold=THR, near_dup_opts=OPTS,
    )
    delete_from_corpus(spark, path, F.col("doc_id") == 1)
    append_corpus(
        spark.createDataFrame([(2, v2, "en", "s", 60)], schema), path,
        near_dup_threshold=THR, near_dup_opts=OPTS,
    )
    # near-dup of the LIVE text (v2 casing) must be blocked
    twin = spark.createDataFrame(
        [(3, v2 + " tail", "en", "s", 65)], schema
    )
    got = near_dup_gate(twin, path, threshold=THR, near_dup_opts=OPTS)
    assert got.count() == 0


def test_opts_positivity(spark, tmp_path):
    for bad in ({"bands": 0}, {"bands": -4}, {"num_hashes": 0}):
        with pytest.raises(ValueError, match=">= 1"):
            near_dup_gate(
                _docs(spark).filter("doc_id < 3"), str(tmp_path),
                threshold=0.5, near_dup_opts=bad,
            )


def test_sig_record_failure_after_manifest(spark, tmp_path, monkeypatch):
    """A signature-store write failure must strike AFTER the manifest
    fold: the batch's durable commit (data + ledger + manifest) survives
    and only recall is lost (rebuildable)."""
    import bambooai_spark.operators.writer as writer_mod
    from bambooai_spark.operators.writer import _load_manifest_doc

    d = _docs(spark).filter("doc_id < 10")
    path = _corpus(spark, tmp_path, d)
    rows_before = sum(
        e["n_rows"]
        for e in _load_manifest_doc(spark, path)["partitions"]
    )

    def boom(fp_sigs, path_, opts_):
        raise OSError("sig store down")

    monkeypatch.setattr(
        "bambooai_spark.operators.neardup_gate._record_prepared", boom
    )
    novel = spark.createDataFrame(
        [(300000 + i,
          f"fresh unmatched text {i} alpha{i} beta{i * 3} gamma{i * 7}",
          "en", "s", 40) for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(OSError, match="sig store down"):
        append_corpus(
            novel, path, near_dup_threshold=THR, near_dup_opts=OPTS
        )
    doc = _load_manifest_doc(spark, path)
    rows_after = sum(e["n_rows"] for e in doc["partitions"])
    assert rows_after == rows_before + 5  # manifest delta survived
    assert spark.read.parquet(path).filter("doc_id >= 300000").count() == 5
