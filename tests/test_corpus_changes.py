"""CDC-style incremental reads (read_corpus_changes /
latest_committed_batch) and the incremental vector-store refresh built
on them: exact batch-range semantics, committed-snapshot visibility,
attribution-floor guards, and crash-replay idempotence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bambooai_spark.operators import writer
from bambooai_spark.operators.vector_store import (
    CELL_COL,
    prune_vector_store,
    query_vector_corpus,
    refresh_vector_store,
    set_corpus_watermark,
    write_vector_corpus,
)
from bambooai_spark.operators.writer import (
    append_corpus,
    append_corpus_txn,
    compact_corpus,
    delete_from_corpus,
    latest_committed_batch,
    read_corpus,
    read_corpus_changes,
)


def _docs(spark, lo, hi, langs=("en", "de")):
    rows = [
        (i, langs[i % len(langs)], "web", f"document text number {i} " * 5)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


# --------------------------------------------------------------------------
# read_corpus_changes


def test_changes_exact_batch_ranges(spark, tmp_path):
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)
    append_corpus_txn(_docs(spark, 20, 40), out, 1)
    append_corpus_txn(_docs(spark, 40, 60), out, 2)
    assert latest_committed_batch(spark, out) == 2
    assert _ids(read_corpus_changes(spark, out, after_batch=0)) == list(
        range(20, 60)
    )
    assert _ids(
        read_corpus_changes(spark, out, after_batch=0, until_batch=1)
    ) == list(range(20, 40))
    got = read_corpus_changes(spark, out, after_batch=2)
    assert got.count() == 0 and "doc_id" in got.columns
    # dedup is reflected: an overlapping batch contributes only its
    # genuinely new documents
    append_corpus_txn(_docs(spark, 50, 70), out, 3)
    assert _ids(read_corpus_changes(spark, out, after_batch=2)) == list(
        range(60, 70)
    )
    with pytest.raises(ValueError, match="precedes"):
        read_corpus_changes(spark, out, after_batch=2, until_batch=1)


def test_changes_floor_guard_after_maintenance(spark, tmp_path):
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)
    append_corpus_txn(_docs(spark, 20, 40), out, 1)
    compact_corpus(spark, out, partition_by=("lang",))
    with pytest.raises(ValueError, match="re-baseline"):
        read_corpus_changes(spark, out, after_batch=0)
    # batches landing after the compaction are answerable from floor up
    append_corpus_txn(_docs(spark, 40, 60), out, 2)
    assert _ids(read_corpus_changes(spark, out, after_batch=1)) == list(
        range(40, 60)
    )
    # a delete rewrites a batch-2 file: part of batch 2's rows moved to
    # unattributed d-files, so a watermark of 1 can no longer be
    # answered exactly — the floor forces the re-baseline
    delete_from_corpus(
        spark, out, F.col("doc_id") == 45, partition_by=("lang",)
    )
    with pytest.raises(ValueError, match="re-baseline"):
        read_corpus_changes(spark, out, after_batch=1)
    assert read_corpus_changes(spark, out, after_batch=2).count() == 0
    assert 45 not in _ids(read_corpus(spark, out))


def test_changes_exclude_frozen_mid_commit_batch(
    spark, tmp_path, monkeypatch
):
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)

    orig = writer._fs_write_text_atomic

    def crash_on_marker(spark_, path, text):
        if writer.COMMITS_DIR in path:
            raise RuntimeError("crash before marker")
        return orig(spark_, path, text)

    monkeypatch.setattr(writer, "_fs_write_text_atomic", crash_on_marker)
    with pytest.raises(RuntimeError, match="crash before marker"):
        append_corpus_txn(_docs(spark, 20, 40), out, 1)
    monkeypatch.setattr(writer, "_fs_write_text_atomic", orig)
    # frozen batch: invisible to CDC, invisible to the watermark
    assert latest_committed_batch(spark, out) == 0
    assert read_corpus_changes(spark, out, after_batch=0).count() == 0
    append_corpus_txn(_docs(spark, 20, 40), out, 1)  # resume
    assert latest_committed_batch(spark, out) == 1
    assert _ids(read_corpus_changes(spark, out, after_batch=0)) == list(
        range(20, 40)
    )


def test_changes_composite_streaming_ids(spark, tmp_path):
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, "abc12.0")
    append_corpus_txn(_docs(spark, 20, 40), out, "abc12.1")
    append_corpus_txn(_docs(spark, 40, 50), out, "zzz99.7")  # other lineage
    assert latest_committed_batch(spark, out, namespace="abc12") == "abc12.1"
    got = read_corpus_changes(spark, out, after_batch="abc12.0")
    assert _ids(got) == list(range(20, 40))  # other lineage excluded
    # maintenance rewrites force composite consumers to re-baseline
    compact_corpus(spark, out, partition_by=("lang",))
    with pytest.raises(ValueError, match="re-baseline"):
        read_corpus_changes(spark, out, after_batch="abc12.1")


def test_changes_ignore_plain_append_rows(spark, tmp_path):
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)
    append_corpus(_docs(spark, 20, 40), out, partition_by=("lang",))
    assert read_corpus_changes(spark, out, after_batch=0).count() == 0
    assert read_corpus(spark, out).count() == 40  # rows ARE live


def test_changes_rejects_unorderable_ids(spark, tmp_path):
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    with pytest.raises(ValueError, match="orderable"):
        read_corpus_changes(spark, out, after_batch="weird")
    with pytest.raises(ValueError, match="comparable"):
        read_corpus_changes(
            spark, out, after_batch="ns.1", until_batch="other.2"
        )


# --------------------------------------------------------------------------
# incremental vector-store refresh


def _embed(df):
    base = (F.col("doc_id") % 2).cast("double") * 10.0
    return df.select(
        "doc_id", F.array(base + 0.1, base - 0.1).alias("embedding")
    )


_CENTS = [[0.0, 0.0], [10.0, 10.0]]


def _build_store(spark, corpus, store):
    wm = latest_committed_batch(spark, corpus)
    write_vector_corpus(
        _embed(read_corpus(spark, corpus)), store,
        id_col="doc_id", vec_col="embedding", centroids=_CENTS,
    )
    set_corpus_watermark(spark, store, wm)


def test_refresh_appends_only_new_batches(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    append_corpus_txn(_docs(spark, 0, 30), corpus, 0)
    _build_store(spark, corpus, store)
    assert spark.read.parquet(store).count() == 30

    append_corpus_txn(_docs(spark, 30, 50), corpus, 1)
    append_corpus_txn(_docs(spark, 50, 60), corpus, 2)
    res = refresh_vector_store(spark, corpus, store, _embed)
    assert res["n_new"] == 30 and res["watermark"] == 2
    assert spark.read.parquet(store).count() == 60
    # the refreshed vectors are queryable through the pinned cells
    hits = query_vector_corpus(
        spark, store, [10.1, 9.9], k=3, nprobe=1
    ).collect()
    assert all(r["doc_id"] % 2 == 1 for r in hits)
    # no new work → no-op
    res = refresh_vector_store(spark, corpus, store, _embed)
    assert res["n_new"] == 0 and res["watermark"] == 2


def test_refresh_replay_is_idempotent(spark, tmp_path):
    """A crash between the vector append and the watermark write means
    the next refresh re-reads the same window — the dedup anti-join
    must keep the store exact."""
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    append_corpus_txn(_docs(spark, 0, 20), corpus, 0)
    _build_store(spark, corpus, store)
    append_corpus_txn(_docs(spark, 20, 40), corpus, 1)
    refresh_vector_store(spark, corpus, store, _embed)
    # simulate the lost watermark: re-run the SAME window explicitly
    res = refresh_vector_store(
        spark, corpus, store, _embed, after_batch=0, until_batch=1
    )
    assert res["n_new"] == 0
    got = spark.read.parquet(store)
    assert got.count() == 40
    assert got.select("doc_id").distinct().count() == 40


def test_refresh_requires_watermark_and_pinned_columns(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    append_corpus_txn(_docs(spark, 0, 10), corpus, 0)
    write_vector_corpus(
        _embed(read_corpus(spark, corpus)), store,
        id_col="doc_id", vec_col="embedding", centroids=_CENTS,
    )
    with pytest.raises(ValueError, match="watermark"):
        refresh_vector_store(spark, corpus, store, _embed)
    set_corpus_watermark(spark, store, 0)
    append_corpus_txn(_docs(spark, 10, 20), corpus, 1)
    with pytest.raises(ValueError, match="pinned columns"):
        refresh_vector_store(
            spark, corpus, store,
            lambda df: _embed(df).withColumn("extra", F.lit(1)),
        )


def test_prune_vector_store_reconciles_takedowns(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    append_corpus_txn(_docs(spark, 0, 40), corpus, 0)
    _build_store(spark, corpus, store)

    # cell 0 holds the even ids, cell 1 the odd ids (by construction)
    delete_from_corpus(
        spark, corpus, F.col("doc_id") % 2 == 1, partition_by=("lang",)
    )
    # untouched cell's files must not be rewritten
    cell0 = os.path.join(store, f"{CELL_COL}=0")
    before = sorted(os.listdir(cell0))
    res = prune_vector_store(spark, corpus, store)
    assert res["removed"] == 20 and res["cells_rewritten"] == [1]
    assert sorted(os.listdir(cell0)) == before
    # the dead cell folded to zero rows → its directory is gone
    assert not os.path.exists(os.path.join(store, f"{CELL_COL}=1"))
    got = spark.read.parquet(store)
    assert _ids(got) == [i for i in range(40) if i % 2 == 0]


def test_prune_vector_store_partial_cell(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    append_corpus_txn(_docs(spark, 0, 40), corpus, 0)
    _build_store(spark, corpus, store)
    delete_from_corpus(
        spark, corpus, F.col("doc_id").isin([1, 3, 5]), partition_by=("lang",)
    )
    res = prune_vector_store(spark, corpus, store)
    assert res["removed"] == 3 and res["cells_rewritten"] == [1]
    got = spark.read.parquet(store)
    assert _ids(got) == [i for i in range(40) if i not in (1, 3, 5)]
    # second sweep is a no-op
    res = prune_vector_store(spark, corpus, store)
    assert res["removed"] == 0 and res["cells_rewritten"] == []


def test_vector_meta_replace_crash_self_heals(spark, tmp_path):
    from bambooai_spark.operators.vector_store import META_NAME, _load_meta

    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    append_corpus_txn(_docs(spark, 0, 10), corpus, 0)
    _build_store(spark, corpus, store)
    # simulate the crash window between delete and rename of a replace
    os.rename(
        os.path.join(store, META_NAME),
        os.path.join(store, META_NAME + ".new"),
    )
    crc = os.path.join(store, "." + META_NAME + ".crc")
    if os.path.exists(crc):
        os.rename(crc, os.path.join(store, "." + META_NAME + ".new.crc"))
    meta = _load_meta(spark, store)  # healed, not bricked
    assert meta["corpus_watermark"] == 0
    assert os.path.exists(os.path.join(store, META_NAME))


# --------------------------------------------------------------------------
# streaming corpus source


def _drain_stream(spark, path, checkpoint, rows_sink):
    """Run the corpus insert stream to exhaustion (availableNow),
    appending collected rows to rows_sink."""
    from bambooai_spark.streaming.corpus import stream_corpus_inserts

    sdf = stream_corpus_inserts(spark, path, max_files_per_trigger=2)

    def collect(batch_df, _bid):
        rows_sink.extend(
            (r["doc_id"], r["lang"]) for r in
            batch_df.select("doc_id", "lang").collect()
        )

    q = (
        sdf.writeStream.foreachBatch(collect)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_corpus_inserts_follows_txn_appends(spark, tmp_path):
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    append_corpus_txn(_docs(spark, 0, 20), out, 0, max_records_per_file=5)
    rows: list = []
    _drain_stream(spark, out, ckpt, rows)
    assert sorted(r[0] for r in rows) == list(range(20))
    # new batch → only its rows are delivered on resume
    append_corpus_txn(_docs(spark, 20, 30), out, 1, max_records_per_file=5)
    _drain_stream(spark, out, ckpt, rows)
    assert sorted(r[0] for r in rows) == list(range(30))


def test_stream_corpus_inserts_ignores_maintenance_rewrites(
    spark, tmp_path
):
    """Compaction rewrites every live row into c-files and a takedown
    rewrites kept rows into d-files — neither may re-enter the stream."""
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    append_corpus_txn(_docs(spark, 0, 30), out, 0, max_records_per_file=5)
    rows: list = []
    _drain_stream(spark, out, ckpt, rows)
    assert len(rows) == 30
    compact_corpus(spark, out, partition_by=("lang",))
    _drain_stream(spark, out, ckpt, rows)
    assert len(rows) == 30  # no replay from c-files
    delete_from_corpus(
        spark, out, F.col("doc_id") % 3 == 0, partition_by=("lang",)
    )
    _drain_stream(spark, out, ckpt, rows)
    assert len(rows) == 30  # no replay from d-files
    # and the stream keeps following NEW batches afterwards
    append_corpus_txn(_docs(spark, 30, 40), out, 1, max_records_per_file=5)
    _drain_stream(spark, out, ckpt, rows)
    assert sorted(r[0] for r in rows) == list(range(40))


def test_stream_corpus_inserts_requires_schema_on_legacy(spark, tmp_path):
    out = str(tmp_path / "legacy")
    _docs(spark, 0, 5).write.partitionBy("lang").parquet(out)
    from bambooai_spark.streaming.corpus import stream_corpus_inserts

    with pytest.raises(ValueError, match="no recorded schema"):
        stream_corpus_inserts(spark, out)


def test_changes_where_prunes_and_filters(spark, tmp_path):
    """where= on the CDC read: an incremental consumer following one
    slice reads only its files of each batch and gets exactly the
    filtered rows."""
    from bambooai_spark.operators.filestats import enable_file_stats
    from bambooai_spark.operators.filestats import load_file_stats

    out = str(tmp_path / "corpus")
    enable_file_stats(spark, out, ["doc_id"])
    append_corpus_txn(_docs(spark, 0, 40), out, 0, max_records_per_file=5)
    append_corpus_txn(_docs(spark, 40, 80), out, 1, max_records_per_file=5)
    got = read_corpus_changes(
        spark, out, after_batch=0, where=[("doc_id", "<", 50)]
    )
    assert _ids(got) == list(range(40, 50))
    # the pruning is real: fewer files enter the scan than batch 1 has
    from bambooai_spark.operators.filestats import (
        prune_files,
        qualified_root,
    )
    from bambooai_spark.operators.writer import _stored_schema, _walk_files

    b1_files = [
        f for f in _walk_files(spark, out)
        if f.rsplit("/", 1)[-1].startswith("b1-")
    ]
    kept = prune_files(
        b1_files, load_file_stats(spark, out),
        [("doc_id", "<", 50)], _stored_schema(spark, out),
        root=qualified_root(spark, out),
    )
    assert 0 < len(kept) < len(b1_files)
    # Column form: filter-only, same rows
    got = read_corpus_changes(
        spark, out, after_batch=0, where=F.col("doc_id") < 50
    )
    assert _ids(got) == list(range(40, 50))
    # empty after pruning: typed empty with residual applied
    got = read_corpus_changes(
        spark, out, after_batch=0, where=[("doc_id", ">", 10_000)]
    )
    assert got.count() == 0 and "doc_id" in got.columns


# --------------------------------------------------------------------------
# filtered ANN


def test_filtered_ann_single_and_batch(spark, tmp_path):
    """where= on the vector-store queries is the TRUE top-k among
    matching rows (filter before rank, not a post-filtered top-k), in
    both the single and batch paths, and pushes to the scan."""
    from bambooai_spark.operators.vector_store import (
        query_vector_corpus_many,
        write_vector_corpus,
    )
    from bambooai_spark.plans import plan_flags

    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    append_corpus_txn(_docs(spark, 0, 200), corpus, 0)

    def emb(df):
        b = (F.col("doc_id") % 2).cast("double") * 10.0
        return df.select(
            "doc_id", "lang",
            F.array(b + (F.col("doc_id") % 7).cast("double") / 100.0,
                    b - 0.1).alias("embedding"),
        )

    write_vector_corpus(
        emb(read_corpus(spark, corpus)), store,
        id_col="doc_id", centroids=[[0.0, 0.0], [10.0, 10.0]],
    )
    q = [10.05, 9.9]
    unfiltered = query_vector_corpus(spark, store, q, k=5, nprobe=2)
    filtered = query_vector_corpus(
        spark, store, q, k=5, nprobe=2, where=[("lang", "==", "de")],
        extra_cols=["lang"],
    )
    rows = filtered.collect()
    assert len(rows) == 5 and all(r["lang"] == "de" for r in rows)
    # true top-k among matches: every filtered hit's cosine <= the
    # unfiltered best, and the ids differ from a post-filter of the
    # unfiltered top-5 whenever that under-fills
    store_df = spark.read.parquet(store)
    want = (
        query_vector_corpus(
            spark, store, q, k=store_df.count(), nprobe=2,
            extra_cols=["lang"],
        )
        .filter("lang = 'de'").limit(5).collect()
    )
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in want]
    # pushed to the scan
    flags = plan_flags(
        query_vector_corpus(spark, store, q, k=5, nprobe=2,
                            where=[("lang", "==", "de")])
    )
    assert any("lang" in p for p in flags["pushed_filters"])

    # batch path agrees with the single path per query
    queries = spark.createDataFrame(
        [(901, q), (902, [0.05, -0.1])], "qid long, qvec array<double>"
    )
    got = query_vector_corpus_many(
        spark, store, queries, k=5, nprobe=2,
        where=[("lang", "==", "de")], checkpoint=False,
    )
    by_q = {
        r["qid"]: r["doc_id"]
        for r in got.withColumn(
            "_rn", F.expr("row_number() over (partition by qid order by cosine desc, doc_id)")
        ).filter("_rn = 1").collect()
    }
    single_901 = query_vector_corpus(
        spark, store, q, k=1, nprobe=2, where=[("lang", "==", "de")]
    ).collect()[0]["doc_id"]
    assert by_q[901] == single_901


def test_read_corpus_where_pushes_residual_to_scan(spark, tmp_path):
    """The residual predicate must ALSO reach the parquet scan as a
    pushed filter — row-group min/max skipping below the file-level
    pruning, the two-tier skipping story."""
    from bambooai_spark.plans import plan_flags

    out = str(tmp_path / "corpus")
    from bambooai_spark.operators.writer import write_corpus

    d = _docs(spark, 0, 200).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    write_corpus(d, out, partition_by=("lang",), cluster_by=("n_chars",),
                 max_records_per_file=20)
    got = read_corpus(spark, out, where=[("n_chars", ">=", 100)])
    flags = plan_flags(got)
    assert any("n_chars" in p for p in flags["pushed_filters"])


def test_stream_resume_check_guards_lagging_consumer(spark, tmp_path):
    """A consumer that recorded watermark W and went down must be told
    to re-baseline when maintenance rewrote batches it had not drained
    — resuming the stream would silently never deliver those rows."""
    from bambooai_spark.streaming.corpus import stream_resume_check

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)
    wm = latest_committed_batch(spark, out)  # consumer drained batch 0
    append_corpus_txn(_docs(spark, 20, 40), out, 1)  # NOT yet drained
    stream_resume_check(spark, out, wm)  # nothing rewritten — fine
    compact_corpus(spark, out, partition_by=("lang",))
    with pytest.raises(ValueError, match="re-baseline"):
        stream_resume_check(spark, out, wm)
    # a consumer that HAD drained everything may resume
    stream_resume_check(spark, out, 1)


def test_filtered_ann_validates_triples(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    append_corpus_txn(_docs(spark, 0, 10), corpus, 0)
    _build_store(spark, corpus, store)
    with pytest.raises(ValueError, match="unsupported op"):
        query_vector_corpus(
            spark, store, [10.1, 9.9], k=1, where=[("lang", "=", "de")]
        )


def test_stream_resume_check_healthy_legacy_manifest(spark, tmp_path):
    """A healthy corpus whose manifest predates schema recording must
    pass the resume check — the zero-width probe's "no committed batch
    files ... pass schema=" ValueError is NOT the re-baseline signal,
    and a caller following the documented contract would misread it as
    one (ADVICE r8)."""
    import json

    from bambooai_spark.operators.writer import MANIFEST_NAME
    from bambooai_spark.streaming.corpus import stream_resume_check

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)
    wm = latest_committed_batch(spark, out)
    # simulate a legacy manifest: strip schema + columns (and the local
    # FS's crc sidecar, which would fail the modified read)
    mpath = os.path.join(out, MANIFEST_NAME)
    with open(mpath) as fh:
        doc = json.load(fh)
    doc.pop("schema", None)
    doc.pop("columns", None)
    with open(mpath, "w") as fh:
        json.dump(doc, fh)
    crc = os.path.join(out, f".{MANIFEST_NAME}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    stream_resume_check(spark, out, wm)  # healthy — no raise

    # the genuine re-baseline condition still surfaces on the same corpus
    append_corpus_txn(_docs(spark, 20, 40), out, 1)
    compact_corpus(spark, out, partition_by=("lang",))
    with pytest.raises(ValueError, match="re-baseline"):
        stream_resume_check(spark, out, wm)
