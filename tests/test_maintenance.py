"""suggest_maintenance: the read-only ops advisor — fragmentation,
crashed-op leftovers, signature-store drift, empty/legacy corpora."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from bambooai_spark.io import load_table
from bambooai_spark.operators.maintenance import suggest_maintenance
from bambooai_spark.operators.writer import append_corpus
from tests.conftest import SF_DIR


def _docs(spark, n=60):
    return load_table(spark, SF_DIR, "documents").limit(n)


def _by_check(df):
    return {r["check"]: r for r in df.collect()}


def test_healthy_corpus_no_actions(spark, tmp_path):
    path = str(tmp_path / "corpus")
    append_corpus(_docs(spark), path)
    got = _by_check(suggest_maintenance(spark, path, small_file_rows=1))
    assert got["manifest"]["severity"] == "ok"
    assert not [
        r for r in got.values() if r["severity"] in ("warn", "action")
    ], got


def test_fragmented_corpus_recommends_compaction(spark, tmp_path):
    path = str(tmp_path / "corpus")
    append_corpus(_docs(spark), path, max_records_per_file=5)
    got = _by_check(suggest_maintenance(spark, path))
    assert got["small_files"]["severity"] == "action"
    assert "compact_corpus" in got["small_files"]["recommendation"]


def test_frozen_append_flagged(spark, tmp_path):
    path = str(tmp_path / "corpus")
    append_corpus(_docs(spark), path)
    stage = os.path.join(path, "_staging", "batch_id=9")
    os.makedirs(stage)
    open(os.path.join(stage, "_STAGED"), "w").write("{}")
    got = _by_check(suggest_maintenance(spark, path, small_file_rows=1))
    assert got["frozen_appends"]["severity"] == "action"
    assert "recover_staging" in got["frozen_appends"]["recommendation"]


def test_empty_corpus_single_info_row(spark, tmp_path):
    got = suggest_maintenance(spark, str(tmp_path / "nothing")).collect()
    assert len(got) == 1 and got[0]["severity"] == "info"


def test_manifestless_corpus_recommends_build(spark, tmp_path):
    path = str(tmp_path / "plain")
    _docs(spark).write.partitionBy("lang").parquet(path)
    got = _by_check(suggest_maintenance(spark, path, small_file_rows=1))
    assert got["manifest"]["severity"] == "action"
    assert "build_manifest" in got["manifest"]["recommendation"]


def test_signature_gaps_flagged(spark, tmp_path):
    path = str(tmp_path / "corpus")
    append_corpus(
        _docs(spark), path,
        near_dup_threshold=0.8,
        near_dup_opts={"num_hashes": 16, "bands": 4},
    )
    healthy = _by_check(suggest_maintenance(spark, path, small_file_rows=1))
    assert healthy["signatures"]["severity"] == "ok"
    for f in glob.glob(os.path.join(path, "_minhash_sigs", "*.parquet")):
        os.remove(f)
    got = _by_check(suggest_maintenance(spark, path, small_file_rows=1))
    assert got["signature_gaps"]["severity"] == "warn"
    assert "rebuild_signatures" in got["signature_gaps"]["recommendation"]


def test_compaction_prunes_dead_signatures(spark, tmp_path):
    """compact_corpus rewrites the signature store down to LIVE ledger
    fps (takedown leftovers are inert but cost every gate scan), keeps
    the pinned params, and the gate still works afterwards."""
    from bambooai_spark.operators.neardup_gate import near_dup_gate
    from bambooai_spark.operators.writer import (
        compact_corpus,
        delete_from_corpus,
    )

    opts = {"num_hashes": 16, "bands": 4}
    path = str(tmp_path / "corpus")
    d = _docs(spark, 40)
    append_corpus(d, path, near_dup_threshold=0.8, near_dup_opts=opts)
    n_sigs_before = spark.read.parquet(
        os.path.join(path, "_minhash_sigs")
    ).count()
    delete_from_corpus(spark, path, F.col("doc_id") % 2 == 0)
    # dead fps still in the store until compaction
    assert spark.read.parquet(
        os.path.join(path, "_minhash_sigs")
    ).count() == n_sigs_before
    compact_corpus(spark, path)
    live_fps = spark.read.parquet(
        os.path.join(path, "_fingerprints")
    ).count()
    sigs_after = spark.read.parquet(os.path.join(path, "_minhash_sigs"))
    assert sigs_after.count() == live_fps
    assert os.path.exists(
        os.path.join(path, "_minhash_sigs", "_PARAMS.json")
    )
    # gate still blocks near-dups of the LIVE half
    twin = (
        d.filter("doc_id % 2 = 1")
        .limit(1)
        .withColumn("doc_id", (F.col("doc_id") + 100000).cast("long"))
        .withColumn("text", F.concat("text", F.lit(" tail")))
    )
    assert near_dup_gate(
        twin, path, threshold=0.8, near_dup_opts=opts
    ).count() == 0


def test_auto_maintain_executes_the_advice(spark, tmp_path, monkeypatch):
    """The one-call maintenance window: recover frozen ops first, one
    compaction clears fragmentation/markers/stats backlog, rebuild only
    when compaction did not already heal coverage — and the advisor is
    clean afterwards."""
    import pytest
    from pyspark.sql import functions as F

    from bambooai_spark.operators import writer
    from bambooai_spark.operators.filestats import enable_file_stats
    from bambooai_spark.operators.maintenance import auto_maintain
    from bambooai_spark.operators.writer import append_corpus_txn

    def _docs(lo, hi):
        rows = [
            (i, ("en", "de")[i % 2], f"auto maintain doc {i} " + "pad " * 4)
            for i in range(lo, hi)
        ]
        return spark.createDataFrame(rows, "doc_id long, lang string, text string")

    out = str(tmp_path / "corpus")
    enable_file_stats(spark, out, ["doc_id"])
    for b in range(4):  # fragmented: tiny files per batch
        append_corpus_txn(_docs(b * 25, (b + 1) * 25), out, b,
                          max_records_per_file=5, text_col="text")
    # strand a frozen append (crash before any move)
    orig_move = writer._move_staged_files
    monkeypatch.setattr(
        writer, "_move_staged_files",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    with pytest.raises(RuntimeError, match="boom"):
        append_corpus_txn(_docs(100, 125), out, 4,
                          max_records_per_file=5, text_col="text")
    monkeypatch.setattr(writer, "_move_staged_files", orig_move)

    # dry run: plan only, nothing executed
    plan = {r["action"]: r for r in
            auto_maintain(spark, out, dry_run=True).collect()}
    assert not any(r["executed"] for r in plan.values())
    assert os.path.exists(
        os.path.join(out, writer.STAGING_DIR, "batch_id=4")
    )

    res = {r["action"]: r for r in auto_maintain(spark, out).collect()}
    assert res["recover_staging"]["executed"]
    assert res["compact_corpus"]["executed"]
    assert not res["rebuild_file_stats"]["executed"]  # compact healed it
    # the frozen batch was committed by the recovery, nothing lost
    stored = spark.read.parquet(out)
    assert stored.count() == 125
    from bambooai_spark.operators.maintenance import suggest_maintenance

    after = suggest_maintenance(spark, out).collect()
    assert not any(r["severity"] in ("warn", "action") for r in after)
    # a healthy corpus plans nothing
    res = {r["action"]: r for r in auto_maintain(spark, out).collect()}
    assert not any(r["executed"] for r in res.values())


def test_auto_maintain_never_compacts_on_guessed_partitioning(
    spark, tmp_path
):
    """Review 16: a torn manifest plus compaction triggers must REPORT,
    not rewrite the corpus with a guessed partition_by."""
    import json

    from bambooai_spark.operators.maintenance import auto_maintain
    from bambooai_spark.operators.writer import (
        MANIFEST_NAME,
        append_corpus_txn,
    )

    rows = [(i, f"s{i % 3}", f"guessed partitioning doc {i} " + "p " * 4)
            for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = str(tmp_path / "corpus")
    for b in range(3):
        append_corpus_txn(
            d.filter(F.col("doc_id") % 3 == b), out, b,
            partition_by=("source",), max_records_per_file=3,
            text_col="text",
        )
    before = sorted(glob.glob(os.path.join(out, "source=*", "*")))
    with open(os.path.join(out, MANIFEST_NAME), "w") as fh:
        fh.write("{ torn")
    crc = os.path.join(out, "." + MANIFEST_NAME + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    # marker_backlog=1 gives a manifest-independent compaction trigger
    # (3 markers) — the exact state where the old code guessed ("lang",)
    res = {r["action"]: r for r in
           auto_maintain(spark, out, marker_backlog=1).collect()}
    assert not res["compact_corpus"]["executed"]
    assert "guessed partitioning" in res["compact_corpus"]["detail"]
    assert "build_manifest" in res and not res["build_manifest"]["executed"]
    assert sorted(glob.glob(os.path.join(out, "source=*", "*"))) == before


def test_advisor_stable_after_auto_maintain_with_num_tasks(
    spark, tmp_path
):
    """Review 16: a corpus compacted with num_tasks (a few files per
    partition) must not re-flag small_files — the cron must converge."""
    from bambooai_spark.operators.maintenance import (
        auto_maintain,
        suggest_maintenance,
    )
    from bambooai_spark.operators.writer import append_corpus_txn

    rows = [(i, ("en", "de")[i % 2], f"converge doc {i} " + "pad " * 4)
            for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = str(tmp_path / "corpus")
    for b in range(5):
        append_corpus_txn(
            d.filter(F.col("doc_id") % 5 == b), out, b,
            max_records_per_file=4, text_col="text",
        )
    res = {r["action"]: r for r in
           auto_maintain(spark, out, num_tasks=4).collect()}
    assert res["compact_corpus"]["executed"]
    after = {r["check"]: r for r in suggest_maintenance(spark, out).collect()}
    assert after["small_files"]["severity"] == "ok"
    res = {r["action"]: r for r in
           auto_maintain(spark, out, num_tasks=4).collect()}
    assert not any(r["executed"] for r in res.values())  # converged


def test_stats_backlog_drives_consolidation_not_compaction(spark, tmp_path):
    """A stats-delta backlog (or an unconsolidated above-threshold doc)
    is bookkeeping debt: auto_maintain folds it with
    consolidate_file_stats instead of rewriting the data, and one fold
    converges (no perpetual cron work)."""
    from bambooai_spark.operators.filestats import (
        _stats_snapshot,
        enable_file_stats,
        write_stats_delta,
    )
    from bambooai_spark.operators.maintenance import auto_maintain

    out = str(tmp_path / "corpus")
    append_corpus(_docs(spark), out)
    enable_file_stats(spark, out, ["doc_id"])
    # fabricate a 70-delta backlog of inert (orphan-key) stats docs —
    # the advisor counts deltas, not content
    for i in range(70):
        write_stats_delta(spark, out, f"b{i}", {
            "columns": ["doc_id"],
            "files": {f"b{i}-x": {"n": 1, "cols": {
                "doc_id": {"min": i, "max": i, "nn": 1}}}},
        })
    adv = _by_check(suggest_maintenance(spark, out))
    assert adv["stats_delta_backlog"]["severity"] == "warn"
    assert "consolidate_file_stats" in (
        adv["stats_delta_backlog"]["recommendation"]
    )

    res = {r["action"]: r for r in auto_maintain(spark, out).collect()}
    assert res["consolidate_file_stats"]["executed"]
    # the backlog alone must NOT have forced a data rewrite
    assert not res["compact_corpus"]["executed"]
    _deltas, best, _tok = _stats_snapshot(spark, out)
    assert best is not None and not _deltas

    # converged: a second pass finds nothing to fold
    adv2 = _by_check(suggest_maintenance(spark, out))
    assert "stats_delta_backlog" not in adv2
    res2 = {r["action"]: r for r in auto_maintain(spark, out).collect()}
    assert not res2["consolidate_file_stats"]["executed"]


def test_unconsolidated_above_threshold_flagged(spark, tmp_path):
    from bambooai_spark.operators.filestats import (
        enable_file_stats,
        write_stats_delta,
    )

    out = str(tmp_path / "corpus")
    append_corpus(_docs(spark), out)
    enable_file_stats(spark, out, ["doc_id"])
    write_stats_delta(spark, out, "b1", {
        "columns": ["doc_id"],
        "files": {f"b1-f{i}": {"n": 1, "cols": {
            "doc_id": {"min": i, "max": i, "nn": 1}}} for i in range(30)},
    })
    key = "spark.bambooai.stats.distributedPruneThreshold"
    spark.conf.set(key, "10")
    try:
        adv = _by_check(suggest_maintenance(spark, out))
        assert adv["stats_unconsolidated"]["severity"] == "warn"
        from bambooai_spark.operators.maintenance import auto_maintain

        res = {r["action"]: r for r in auto_maintain(spark, out).collect()}
        assert res["consolidate_file_stats"]["executed"]
        adv2 = _by_check(suggest_maintenance(spark, out))
        assert "stats_unconsolidated" not in adv2
    finally:
        spark.conf.unset(key)


def test_query_log_drives_clustering_advice(spark, tmp_path):
    """read_corpus(where=) records its predicate + scanned-file count in
    a bounded ring; the advisor reports measured read fractions and
    warns (report-only) when a frequent predicate scans most of the
    corpus — the data-driven cluster_by signal (VERDICT r8 #7)."""
    from bambooai_spark.operators.filestats import read_query_log
    from bambooai_spark.operators.maintenance import auto_maintain
    from bambooai_spark.operators.writer import read_corpus, write_corpus

    out = str(tmp_path / "corpus")
    d = _docs(spark).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    # clustered+stat'd on n_chars, but the WORKLOAD filters on doc_id —
    # every read scans ~everything
    write_corpus(d, out, partition_by=("lang",), cluster_by=("n_chars",),
                 max_records_per_file=5)
    for _ in range(3):
        read_corpus(spark, out, where=[("doc_id", ">=", 0)]).count()
    log = read_query_log(spark, out)
    assert log and log[0]["n_reads"] == 3
    assert log[0]["preds"] == [["doc_id", ">=", 0]]
    assert log[0]["last_kept"] > 0

    adv = _by_check(suggest_maintenance(spark, out))
    assert adv["query_mix"]["severity"] == "warn"
    assert "doc_id" in adv["query_mix"]["recommendation"]
    assert "%" in adv["query_mix"]["detail"]

    # report-only in auto_maintain: surfaced, never executed
    res = {r["action"]: r for r in auto_maintain(spark, out).collect()}
    assert "recluster" in res and not res["recluster"]["executed"]

    # a selective predicate on the CLUSTERED column reads a small
    # fraction and stays ok
    out2 = str(tmp_path / "c2")
    write_corpus(d, out2, partition_by=("lang",), cluster_by=("n_chars",),
                 max_records_per_file=5)
    lo = d.agg(F.min("n_chars")).first()[0]
    for _ in range(3):
        read_corpus(spark, out2, where=[("n_chars", "==", lo)]).count()
    adv2 = _by_check(suggest_maintenance(spark, out2))
    assert adv2["query_mix"]["severity"] == "ok"


def test_query_log_ring_is_bounded_and_never_blocks(spark, tmp_path):
    from bambooai_spark.operators.filestats import (
        _QUERYLOG_MAX,
        read_query_log,
        record_read_sample,
    )
    from bambooai_spark.operators.writer import read_corpus, write_corpus

    from bambooai_spark.operators.filestats import enable_file_stats

    out = str(tmp_path / "corpus")
    d = _docs(spark)
    write_corpus(d, out, partition_by=("lang",))
    # the log records only on stats-configured corpora (cost bound)
    assert record_read_sample(spark, out, [("doc_id", "==", -1)], 1) is None
    assert read_query_log(spark, out) == []
    enable_file_stats(spark, out, ["doc_id"])
    for i in range(_QUERYLOG_MAX + 8):
        record_read_sample(spark, out, [("doc_id", "==", i)], 1)
    log = read_query_log(spark, out)
    assert len(log) == _QUERYLOG_MAX
    # the oldest signatures were evicted (LRU ring)
    assert all(e["preds"][0][2] >= 8 for e in log)

    # a reader that cannot write bookkeeping still reads fine
    import os as _os
    sdir = os.path.join(out, "_filestats")
    _os.makedirs(sdir, exist_ok=True)
    _os.chmod(sdir, 0o555)
    try:
        got = read_corpus(spark, out, where=[("doc_id", ">=", 0)])
        assert got.count() == d.count()
    finally:
        _os.chmod(sdir, 0o755)
