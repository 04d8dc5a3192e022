"""File-level data skipping (operators.filestats + read_corpus where=):
pruning must NEVER change results — only shrink the scanned file list —
across every writer path (write/append/txn/compact/delete), every
prunable type, schema evolution, and crash replays."""

from __future__ import annotations

import json
import os
from datetime import date, datetime
from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bambooai_spark.operators import filestats
from bambooai_spark.operators import writer
from bambooai_spark.operators.filestats import (
    STATS_DIR,
    collect_file_stats,
    enable_file_stats,
    load_file_stats,
    prune_files,
    rebuild_file_stats,
    stats_config,
)
from bambooai_spark.operators.writer import (
    append_corpus,
    append_corpus_txn,
    compact_corpus,
    delete_from_corpus,
    read_corpus,
    read_corpus_changes,
    write_corpus,
)


def _docs(spark, lo, hi, langs=("en", "de")):
    rows = [
        (i, langs[i % len(langs)], "web", f"document text number {i} " * 5)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )


def _stats_names(out):
    d = os.path.join(out, STATS_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(
        n for n in os.listdir(d)
        if n != "_CONFIG.json" and not n.startswith(".")
    )


def _live_keys(out):
    """Live data-file paths relative to the corpus root (partition dirs
    included — the stats-key form)."""
    keys = []
    for root, dirs, files in os.walk(out):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        rel = os.path.relpath(root, out)
        for f in files:
            if not f.startswith(("_", ".")):
                keys.append(f if rel == "." else f"{rel}/{f}")
    return keys


# --------------------------------------------------------------------------
# pure pruning logic


def _entry(mn, mx, nn, n=None):
    return {"n": n if n is not None else max(nn, 1),
            "cols": {"x": {"min": mn, "max": mx, "nn": nn}}}


def _schema_of(spark, ddl):
    return spark.createDataFrame([], ddl).schema


def test_prune_matrix_int(spark):
    schema = _schema_of(spark, "x long")
    stats = {"f1": _entry(10, 20, 5), "f2": _entry(30, 40, 5)}
    files = ["/c/f1", "/c/f2", "/c/f3"]  # f3 has no stats — always kept

    def kept(preds):
        return [f.rsplit("/", 1)[-1] for f in
                prune_files(files, stats, preds, schema)]

    assert kept([("x", "==", 15)]) == ["f1", "f3"]
    assert kept([("x", "==", 25)]) == ["f3"]
    assert kept([("x", "<", 10)]) == ["f3"]
    assert kept([("x", "<", 11)]) == ["f1", "f3"]
    assert kept([("x", "<=", 10)]) == ["f1", "f3"]
    assert kept([("x", ">", 40)]) == ["f3"]
    assert kept([("x", ">", 39)]) == ["f2", "f3"]
    assert kept([("x", ">=", 40)]) == ["f2", "f3"]
    # AND of two predicates: each may prune
    assert kept([("x", ">=", 15), ("x", "<=", 35)]) == ["f1", "f2", "f3"]
    assert kept([("x", ">=", 21), ("x", "<=", 29)]) == ["f3"]


def test_prune_all_null_and_boundary(spark):
    schema = _schema_of(spark, "x long")
    stats = {
        "f1": _entry(None, None, 0, n=7),  # all-NULL file: nothing matches
        "f2": _entry(5, 5, 1),
    }
    files = ["/c/f1", "/c/f2"]
    got = prune_files(files, stats, [("x", "==", 5)], schema)
    assert got == ["/c/f2"]
    # no predicate on a column the file has stats for → kept
    got = prune_files(files, stats, [("y", "==", 5)], None)
    assert got == files


def test_prune_conservative_on_mismatch(spark):
    schema = _schema_of(spark, "x long")
    stats = {"f1": _entry(10, 20, 5)}
    files = ["/c/f1"]
    # un-canonicalizable predicate value → no pruning, file read anyway
    assert prune_files(files, stats, [("x", "==", "oops")], schema) == files
    # float predicate on an int column IS prunable via float compare
    assert prune_files(files, stats, [("x", "<", 9.5)], schema) == []
    assert prune_files(files, stats, [("x", "<", 10.5)], schema) == files
    # huge bounds: float conversion could round — conservative keep
    big = {"f1": _entry(2**60, 2**60 + 1, 5)}
    assert prune_files(files, big, [("x", "<", 1.0)], schema) == files


def test_prune_types_decimal_date_ts_str_bool(spark):
    schema = _schema_of(
        spark, "d decimal(10,2), dt date, ts timestamp, s string, b boolean"
    )

    def one(col, mn, mx, nn=3):
        return {"f": {"n": 3, "cols": {col: {"min": mn, "max": mx, "nn": nn}}}}

    files = ["/c/f"]
    # decimal: stored as str(Decimal), compared numerically — "9" < "10"
    assert prune_files(files, one("d", "9.00", "10.00"),
                       [("d", ">=", Decimal("9.50"))], schema) == files
    assert prune_files(files, one("d", "9.00", "10.00"),
                       [("d", ">", 10)], schema) == []
    # date: iso strings, predicate as date or iso str
    assert prune_files(files, one("dt", "2024-01-01", "2024-06-01"),
                       [("dt", "<", date(2024, 1, 1))], schema) == []
    assert prune_files(files, one("dt", "2024-01-01", "2024-06-01"),
                       [("dt", "<=", "2024-01-01")], schema) == files
    # timestamp: fixed-width micros; a second-precision == predicate must
    # NOT prune a file whose bound is the same instant
    bounds = one("ts", "2024-01-01 10:00:00.000000",
                 "2024-01-01 10:00:00.000000")
    assert prune_files(files, bounds,
                       [("ts", "==", datetime(2024, 1, 1, 10, 0, 0))],
                       schema) == files
    assert prune_files(files, bounds,
                       [("ts", ">", "2024-01-01 10:00:00")], schema) == []
    # string
    assert prune_files(files, one("s", "apple", "mango"),
                       [("s", ">", "zebra")], schema) == []
    assert prune_files(files, one("s", "apple", "mango"),
                       [("s", "==", "kiwi")], schema) == files
    # boolean
    assert prune_files(files, one("b", False, False),
                       [("b", "==", True)], schema) == []


def test_prune_nan_bounds_never_prune(spark):
    schema = _schema_of(spark, "x double")
    stats = {"f": _entry(float("nan"), float("nan"), 3)}
    for op, v in [("==", 1.0), ("<", 1.0), (">", 1.0)]:
        assert prune_files(["/c/f"], stats, [(("x"), op, v)], schema) == ["/c/f"]


@settings(max_examples=200, deadline=None)
@given(
    data=st.lists(
        st.lists(st.one_of(st.integers(-50, 50), st.none()),
                 min_size=1, max_size=8),
        min_size=1, max_size=6,
    ),
    op=st.sampled_from(["==", "<", "<=", ">", ">="]),
    v=st.integers(-55, 55),
)
def test_prune_never_drops_matching_rows_property(data, op, v):
    """Soundness: any 'file' holding a row that satisfies the predicate
    survives pruning. (Uses a cached schema-free StructType.)"""
    import operator as _op
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("x", LongType())])
    fns = {"==": _op.eq, "<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge}
    stats, files, matching = {}, [], set()
    for i, rows in enumerate(data):
        name = f"f{i}"
        files.append(f"/c/{name}")
        vals = [r for r in rows if r is not None]
        stats[name] = {
            "n": len(rows),
            "cols": {"x": {
                "min": min(vals) if vals else None,
                "max": max(vals) if vals else None,
                "nn": len(vals),
            }},
        }
        if any(fns[op](r, v) for r in vals):
            matching.add(f"/c/{name}")
    kept = set(prune_files(files, stats, [("x", op, v)], schema))
    assert matching <= kept


# --------------------------------------------------------------------------
# write_corpus + read_corpus(where=)


def test_write_corpus_stats_and_pruned_read(spark, tmp_path):
    out = str(tmp_path / "corpus")
    d = _docs(spark, 0, 200).withColumn(
        "n_chars", F.length("text").cast("long") + F.col("doc_id")
    )
    write_corpus(
        d, out, partition_by=("lang",), cluster_by=("n_chars",),
        max_records_per_file=20,
    )
    # stats_by defaulted to cluster_by → config + one rebuild doc
    assert stats_config(spark, out) == ["n_chars"]
    names = _stats_names(out)
    assert len(names) == 1 and names[0].startswith("rebuild-")

    lo, hi = d.agg(F.min("n_chars"), F.max("n_chars")).first()
    mid = (lo + hi) // 2
    preds = [("n_chars", ">=", lo), ("n_chars", "<=", mid)]
    got = read_corpus(spark, out, where=preds)
    want = d.filter((F.col("n_chars") >= lo) & (F.col("n_chars") <= mid))
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )
    # and the pruning actually dropped files (clustered → narrow ranges)
    from pyspark.sql.types import StructType

    with open(os.path.join(out, writer.MANIFEST_NAME)) as fh:
        schema = StructType.fromJson(json.load(fh)["schema"])
    live = [os.path.join(out, k) for k in _live_keys(out)]
    kept = prune_files(
        live, load_file_stats(spark, out), preds, schema, root=out
    )
    assert len(kept) < len(live)
    # a point lookup prunes harder than a half-range
    point = prune_files(
        live, load_file_stats(spark, out), [("n_chars", "==", lo)], schema,
        root=out,
    )
    assert len(point) <= max(2, len(live) // 4)


def test_where_filter_without_stats_still_exact(spark, tmp_path):
    out = str(tmp_path / "corpus")
    d = _docs(spark, 0, 60)
    write_corpus(d, out, partition_by=("lang",))  # no cluster_by → no stats
    assert stats_config(spark, out) is None
    got = read_corpus(spark, out, where=[("doc_id", "<", 10)])
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(10))
    # Column / SQL-string forms: filter-only
    got = read_corpus(spark, out, where=F.col("doc_id") < 5)
    assert got.count() == 5
    got = read_corpus(spark, out, where="doc_id < 3")
    assert got.count() == 3


def test_where_rejects_bad_predicates(spark, tmp_path):
    out = str(tmp_path / "corpus")
    write_corpus(_docs(spark, 0, 10), out, partition_by=("lang",))
    with pytest.raises(ValueError, match="not a corpus column"):
        read_corpus(spark, out, where=[("nope", "==", 1)])
    with pytest.raises(ValueError, match="unsupported op"):
        read_corpus(spark, out, where=[("doc_id", "!=", 1)])
    with pytest.raises(ValueError, match="triple"):
        read_corpus(spark, out, where=[("doc_id", 1)])


def test_enable_rejects_non_prunable_types(spark, tmp_path):
    d = spark.createDataFrame(
        [(1, [0.1, 0.2])], "doc_id long, vec array<double>"
    )
    with pytest.raises(ValueError, match="non-prunable"):
        enable_file_stats(spark, str(tmp_path / "c"), ["vec"], schema=d.schema)


# --------------------------------------------------------------------------
# txn appends


def test_txn_append_stats_per_batch_and_pruning(spark, tmp_path):
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 50), out, 0, max_records_per_file=10)
    # enable mid-life, then backfill history
    enable_file_stats(spark, out, ["doc_id"])
    rebuild_file_stats(spark, out)
    append_corpus_txn(_docs(spark, 50, 100), out, 1, max_records_per_file=10)
    names = _stats_names(out)
    assert any(n == "b1.json" for n in names)
    # batch-0 files (covered by the rebuild) prune for doc_id >= 50
    from pyspark.sql.types import StructType

    with open(os.path.join(out, writer.MANIFEST_NAME)) as fh:
        schema = StructType.fromJson(json.load(fh)["schema"])
    stats = load_file_stats(spark, out)
    live = [os.path.join(out, k) for k in _live_keys(out)]
    kept = prune_files(live, stats, [("doc_id", ">=", 50)], schema, root=out)
    assert all(k.rsplit("/", 1)[-1].startswith("b1-") for k in kept)
    got = read_corpus(spark, out, where=[("doc_id", ">=", 50)])
    assert got.count() == 50
    # full replay of batch 1 is a no-op and leaves stats intact
    append_corpus_txn(_docs(spark, 50, 100), out, 1, max_records_per_file=10)
    assert load_file_stats(spark, out).keys() == stats.keys()


def test_txn_crash_between_marker_and_stats_heals_on_replay(
    spark, tmp_path, monkeypatch
):
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)
    enable_file_stats(spark, out, ["doc_id"])
    rebuild_file_stats(spark, out)

    orig = filestats.write_stats_delta

    def crash_on_batch_delta(spark_, path, name, doc):
        if name.startswith("b"):
            raise RuntimeError("crash before stats write")
        return orig(spark_, path, name, doc)

    monkeypatch.setattr(filestats, "write_stats_delta", crash_on_batch_delta)
    with pytest.raises(RuntimeError, match="crash before stats"):
        append_corpus_txn(_docs(spark, 20, 40), out, 1)
    monkeypatch.setattr(filestats, "write_stats_delta", orig)
    assert "b1.json" not in _stats_names(out)
    # conservative meanwhile: files exist, stats missing → still read
    assert read_corpus(spark, out, where=[("doc_id", ">=", 20)]).count() == 20
    # replay (same batch id) heals the stats from the commit marker
    append_corpus_txn(_docs(spark, 20, 40), out, 1)
    assert "b1.json" in _stats_names(out)
    assert read_corpus(spark, out, where=[("doc_id", ">=", 20)]).count() == 20


def test_txn_staged_resume_carries_stats(spark, tmp_path, monkeypatch):
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)
    enable_file_stats(spark, out, ["doc_id"])
    rebuild_file_stats(spark, out)

    orig_move = writer._move_staged_files

    def crash_move(*a, **k):
        raise RuntimeError("crash before any move")

    monkeypatch.setattr(writer, "_move_staged_files", crash_move)
    with pytest.raises(RuntimeError, match="crash before any move"):
        append_corpus_txn(_docs(spark, 20, 40), out, 1)
    monkeypatch.setattr(writer, "_move_staged_files", orig_move)
    # frozen _STAGED info carries the stats doc keyed by committed names
    flag = os.path.join(
        out, writer.STAGING_DIR, "batch_id=1", writer.STAGED_MARKER
    )
    with open(flag) as fh:
        info = json.load(fh)
    assert info["file_stats"]["files"]
    assert all(
        k.rsplit("/", 1)[-1].startswith("b1-")
        for k in info["file_stats"]["files"]
    )
    append_corpus_txn(_docs(spark, 20, 40), out, 1)  # resume
    assert "b1.json" in _stats_names(out)
    stats = load_file_stats(spark, out)
    live = set(_live_keys(out))
    assert {
        k for k in stats if k.rsplit("/", 1)[-1].startswith("b1-")
    } <= live


# --------------------------------------------------------------------------
# compaction / delete / plain append


def test_compact_consolidates_stats(spark, tmp_path):
    out = str(tmp_path / "corpus")
    for b in range(3):
        append_corpus_txn(
            _docs(spark, b * 30, (b + 1) * 30), out, b,
            max_records_per_file=7,
        )
    rebuild_file_stats(spark, out, ["doc_id"])
    append_corpus_txn(_docs(spark, 90, 120), out, 3, max_records_per_file=7)
    assert len(_stats_names(out)) == 2  # rebuild + b3
    compact_corpus(spark, out, partition_by=("lang",),
                   cluster_by=("doc_id",), max_records_per_file=25)
    names = _stats_names(out)
    assert len(names) == 1 and names[0].startswith("c")
    stats = load_file_stats(spark, out)
    live = set(_live_keys(out))
    assert set(stats) == live  # exactly the live files, no orphans
    got = read_corpus(spark, out, where=[("doc_id", "<", 30)])
    assert got.count() == 30
    # clustered rewrite → the <30 range is a strict subset of files
    from pyspark.sql.types import StructType

    with open(os.path.join(out, writer.MANIFEST_NAME)) as fh:
        schema = StructType.fromJson(json.load(fh)["schema"])
    kept = prune_files(
        [os.path.join(out, k) for k in live], stats,
        [("doc_id", "<", 30)], schema, root=out,
    )
    assert 0 < len(kept) < len(live)


def test_delete_records_rewrite_stats(spark, tmp_path):
    out = str(tmp_path / "corpus")
    append_corpus(_docs(spark, 0, 80), out, partition_by=("lang",),
                  max_records_per_file=10)
    rebuild_file_stats(spark, out, ["doc_id"])
    delete_from_corpus(spark, out, F.col("doc_id") % 4 == 1,
                       partition_by=("lang",))
    names = _stats_names(out)
    assert any(n.startswith("d") for n in names)
    # the rewritten files' stats are live; orphans are inert
    got = read_corpus(spark, out, where=[("doc_id", "<", 40)])
    assert sorted(r["doc_id"] for r in got.collect()) == [
        i for i in range(40) if i % 4 != 1
    ]
    # consolidation clears the orphans
    rebuild_file_stats(spark, out)
    assert set(load_file_stats(spark, out)) == set(_live_keys(out))


def test_plain_append_stats_via_listing_diff(spark, tmp_path):
    out = str(tmp_path / "corpus")
    d = _docs(spark, 0, 40).withColumn("n_chars", F.length("text").cast("long"))
    write_corpus(d, out, partition_by=("lang",), stats_by=("doc_id",),
                 max_records_per_file=10)
    n0 = len(load_file_stats(spark, out))
    d2 = _docs(spark, 40, 80).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    append_corpus(d2, out, partition_by=("lang",), max_records_per_file=10)
    stats = load_file_stats(spark, out)
    assert len(stats) > n0
    assert set(stats) == set(_live_keys(out))
    assert any(n.startswith("a") for n in _stats_names(out))
    got = read_corpus(spark, out, where=[("doc_id", ">=", 40)])
    assert got.count() == 40


# --------------------------------------------------------------------------
# evolution + snapshot composition


def test_evolved_column_prunes_old_generation(spark, tmp_path):
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 30), out, 0, max_records_per_file=10)
    enable_file_stats(spark, out, ["quality"])
    d2 = _docs(spark, 30, 60).withColumn(
        "quality", (F.col("doc_id") % 10).cast("double") / 10
    )
    append_corpus_txn(d2, out, 1, evolve_schema=True,
                      max_records_per_file=10)
    stats = load_file_stats(spark, out)
    # generation-1 files have no entry (stats enabled after); batch-1
    # files carry real quality bounds
    b1 = {
        k: v for k, v in stats.items()
        if k.rsplit("/", 1)[-1].startswith("b1-")
    }
    assert b1 and all(v["cols"]["quality"]["nn"] > 0 for v in b1.values())
    got = read_corpus(spark, out, where=[("quality", ">=", 0.5)])
    want = [i for i in range(30, 60) if (i % 10) / 10 >= 0.5]
    assert sorted(r["doc_id"] for r in got.collect()) == want
    # after a rebuild the gen-1 files get nn=0 markers → fully prunable
    rebuild_file_stats(spark, out)
    from pyspark.sql.types import StructType

    with open(os.path.join(out, writer.MANIFEST_NAME)) as fh:
        schema = StructType.fromJson(json.load(fh)["schema"])
    stats = load_file_stats(spark, out)
    live = [os.path.join(out, k) for k in _live_keys(out)]
    kept = prune_files(live, stats, [("quality", ">=", 0.0)], schema,
                       root=out)
    assert all(k.rsplit("/", 1)[-1].startswith("b1-") for k in kept)


def test_where_composes_with_as_of_batch(spark, tmp_path):
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 30), out, 0)
    enable_file_stats(spark, out, ["doc_id"])
    rebuild_file_stats(spark, out)
    append_corpus_txn(_docs(spark, 30, 60), out, 1)
    got = read_corpus(
        spark, out, as_of_batch=0, where=[("doc_id", ">=", 20)]
    )
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(20, 30))


def test_all_files_pruned_returns_typed_empty(spark, tmp_path):
    out = str(tmp_path / "corpus")
    d = _docs(spark, 0, 20)
    write_corpus(d, out, partition_by=("lang",), stats_by=("doc_id",))
    got = read_corpus(spark, out, where=[("doc_id", ">", 10_000)])
    assert got.count() == 0
    assert "doc_id" in got.columns and "text" in got.columns


def test_rebuild_requires_columns_on_legacy(spark, tmp_path):
    out = str(tmp_path / "corpus")
    write_corpus(_docs(spark, 0, 10), out, partition_by=("lang",))
    with pytest.raises(ValueError, match="no stats config"):
        rebuild_file_stats(spark, out)
    doc = rebuild_file_stats(spark, out, ["doc_id"])
    assert doc["files"]
    assert stats_config(spark, out) == ["doc_id"]


# --------------------------------------------------------------------------
# observability integration


def test_validate_and_advisor_report_stats_coverage(spark, tmp_path):
    from bambooai_spark.operators.maintenance import suggest_maintenance
    from bambooai_spark.operators.writer import validate_corpus

    out = str(tmp_path / "corpus")
    write_corpus(_docs(spark, 0, 40), out, partition_by=("lang",),
                 stats_by=("doc_id",), max_records_per_file=10)
    rows = {r["check"]: r for r in
            validate_corpus(spark, out, deep=True).collect()}
    assert rows["file_stats"]["ok"]
    adv = {r["check"]: r for r in suggest_maintenance(spark, out).collect()}
    assert "file_stats" in adv and adv["file_stats"]["severity"] == "ok"

    # knock a hole in the coverage: drop every stats delta, keep config
    import shutil

    for n in _stats_names(out):
        os.remove(os.path.join(out, STATS_DIR, n))
    rows = {r["check"]: r for r in
            validate_corpus(spark, out, deep=True).collect()}
    assert not rows["file_stats"]["ok"]
    assert "rebuild_file_stats" in rows["file_stats"]["detail"]
    adv = {r["check"]: r for r in suggest_maintenance(spark, out).collect()}
    assert adv["file_stats_gaps"]["severity"] == "warn"
    # heal and re-check
    rebuild_file_stats(spark, out)
    rows = {r["check"]: r for r in
            validate_corpus(spark, out, deep=True).collect()}
    assert rows["file_stats"]["ok"]
    # a corpus without a stats config reports nothing (no noise)
    out2 = str(tmp_path / "plain")
    write_corpus(_docs(spark, 0, 10), out2, partition_by=("lang",))
    checks = {r["check"] for r in
              validate_corpus(spark, out2, deep=True).collect()}
    assert "file_stats" not in checks


# --------------------------------------------------------------------------
# review-pass regressions


def test_enable_file_stats_replaces_config(spark, tmp_path):
    """A second enable must REPLACE the column set (a plain marker write
    keeps the existing file), and later writers must collect the new
    columns."""
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0)
    enable_file_stats(spark, out, ["doc_id"])
    assert stats_config(spark, out) == ["doc_id"]
    enable_file_stats(spark, out, ["doc_id", "source"])
    assert stats_config(spark, out) == ["doc_id", "source"]
    rebuild_file_stats(spark, out)
    append_corpus_txn(_docs(spark, 20, 40), out, 1)
    stats = load_file_stats(spark, out)
    b1 = [v for k, v in stats.items()
          if k.rsplit("/", 1)[-1].startswith("b1-")]
    assert b1 and all("source" in v["cols"] for v in b1)


def test_stats_config_self_heals_interrupted_replace(spark, tmp_path):
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    enable_file_stats(spark, out, ["doc_id"])
    # simulate a crash between the delete and the rename of a replace
    cdir = os.path.join(out, STATS_DIR)
    os.rename(
        os.path.join(cdir, "_CONFIG.json"),
        os.path.join(cdir, "_CONFIG.json.new"),
    )
    crc = os.path.join(cdir, "._CONFIG.json.crc")
    if os.path.exists(crc):
        os.rename(crc, os.path.join(cdir, "._CONFIG.json.new.crc"))
    assert stats_config(spark, out) == ["doc_id"]  # healed
    assert os.path.exists(os.path.join(cdir, "_CONFIG.json"))


def test_ts_pruning_guarded_by_session_timezone(spark):
    from pyspark.sql.types import (
        StructField,
        StructType,
        TimestampType,
        TimestampNTZType,
    )

    schema = StructType([
        StructField("ts", TimestampType()),
        StructField("tsn", TimestampNTZType()),
    ])
    entry = {
        "f": {
            "n": 3, "_tz": "UTC",
            "cols": {
                "ts": {"min": "2024-01-01 16:00:00.000000",
                       "max": "2024-01-01 18:00:00.000000", "nn": 3},
                "tsn": {"min": "2024-01-01 16:00:00.000000",
                        "max": "2024-01-01 18:00:00.000000", "nn": 3},
            },
        }
    }
    pred = [("ts", "==", datetime(2024, 1, 1, 9, 0))]
    # same zone: the disjoint range prunes
    assert prune_files(["/c/f"], entry, pred, schema,
                       session_tz="UTC") == []
    # different read-session zone: bounds are another zone's wall clock
    # — conservative keep (the 09:00 local row may be 17:00 UTC)
    assert prune_files(["/c/f"], entry, pred, schema,
                       session_tz="America/Los_Angeles") == ["/c/f"]
    # timestamp_ntz is wall clock by definition: prunes regardless
    predn = [("tsn", "==", datetime(2024, 1, 1, 9, 0))]
    assert prune_files(["/c/f"], entry, predn, schema,
                       session_tz="America/Los_Angeles") == []


def test_collect_records_tz_frame_and_load_injects_it(spark, tmp_path):
    from bambooai_spark.operators.filestats import tz_frame

    out = str(tmp_path / "corpus")
    write_corpus(_docs(spark, 0, 10), out, partition_by=("lang",),
                 stats_by=("doc_id",))
    stats = load_file_stats(spark, out)
    # the recorded frame is session tz + driver OS zone (ADVICE r8: two
    # drivers sharing session.timeZone but not the OS zone render bounds
    # in different wall-clock frames)
    frame = tz_frame(spark)
    assert spark.conf.get("spark.sql.session.timeZone") in frame
    assert "|" in frame and "@" in frame
    assert stats and all(v.get("_tz") == frame for v in stats.values())


# --------------------------------------------------------------------------
# streaming-sink + z-order integration


def test_streaming_sink_collects_stats_per_micro_batch(spark, tmp_path):
    """The streaming sink rides append_corpus_txn, so a stats-enabled
    corpus gets per-micro-batch stats with no extra wiring — and a
    pruned read over the streamed corpus stays exact."""
    from bambooai_spark.io import load_table
    from bambooai_spark.streaming.documents import stream_ingest_to_corpus

    from tests.conftest import SF_DIR

    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    d.filter("doc_id < 60").coalesce(1).write.parquet(src)
    d.filter("doc_id >= 60 AND doc_id < 120").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    # enable stats BEFORE the stream exists: the first micro-batch must
    # find the config on an otherwise empty corpus
    enable_file_stats(spark, out, ["doc_id"])
    sdf = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_ingest_to_corpus(
        sdf, out, token_col=None, checkpoint_location=ckpt,
        max_records_per_file=10,
    )
    stats = load_file_stats(spark, out)
    live = set(_live_keys(out))
    assert live and set(stats) == live  # every streamed file covered
    stored = spark.read.parquet(out)
    want = stored.filter("doc_id >= 60").count()
    got = read_corpus(spark, out, where=[("doc_id", ">=", 60)])
    assert want > 0 and got.count() == want


def test_zorder_two_column_pruning(spark, tmp_path):
    """The z-order + stats payoff: predicates on EITHER clustered
    column prune files (a linear sort only serves its leading column)."""
    out = str(tmp_path / "corpus")
    rows = [(i, "en", (i * 37) % 1000, (i * 91) % 1000)
            for i in range(4000)]
    d = spark.createDataFrame(rows, "doc_id long, lang string, x long, y long")
    write_corpus(
        d, out, partition_by=("lang",), cluster_by=("x", "y"),
        cluster_strategy="zorder", max_records_per_file=250,
        num_tasks=16,
    )
    from pyspark.sql.types import StructType

    with open(os.path.join(out, writer.MANIFEST_NAME)) as fh:
        schema = StructType.fromJson(json.load(fh)["schema"])
    stats = load_file_stats(spark, out)
    live = [os.path.join(out, k) for k in _live_keys(out)]
    assert len(live) >= 8
    kept_x = prune_files(live, stats, [("x", "<", 120)], schema, root=out)
    kept_y = prune_files(live, stats, [("y", "<", 120)], schema, root=out)
    assert len(kept_x) < len(live) and len(kept_y) < len(live)
    # results stay exact through the real read path
    got = read_corpus(spark, out, where=[("x", "<", 120), ("y", "<", 120)])
    want = d.filter("x < 120 AND y < 120").count()
    assert got.count() == want


# --------------------------------------------------------------------------
# parquet bloom filters


def _data_bytes(out):
    total = 0
    for root, dirs, files in os.walk(out):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def test_bloom_filters_written_and_preserved(spark, tmp_path):
    """Bloom-enabled writes are strictly larger than byte-identical
    plain writes (the size delta is the filter — and pins the option
    spelling, whose typo would be a silent no-op), results are
    unchanged, and the recorded config survives appends, compaction,
    and delete rewrites."""
    from bambooai_spark.operators.filestats import bloom_config

    d = _docs(spark, 0, 2000)
    plain = str(tmp_path / "plain")
    bloomed = str(tmp_path / "bloomed")
    write_corpus(d, plain, partition_by=("lang",))
    write_corpus(d, bloomed, partition_by=("lang",),
                 bloom_filter_by=("doc_id",))
    assert bloom_config(spark, bloomed) == ["doc_id"]
    assert _data_bytes(bloomed) > _data_bytes(plain)
    got = read_corpus(spark, bloomed, where=[("doc_id", "==", 77)])
    assert _ids_of(got) == [77]

    # appends inherit the config
    p2, b2 = str(tmp_path / "p2"), str(tmp_path / "b2")
    append_corpus_txn(_docs(spark, 0, 2000), p2, 0)
    from bambooai_spark.operators.filestats import set_bloom_filters

    set_bloom_filters(spark, b2, ["doc_id"])
    append_corpus_txn(_docs(spark, 0, 2000), b2, 0)
    assert _data_bytes(b2) > _data_bytes(p2)

    # compaction keeps them
    compact_corpus(spark, b2, partition_by=("lang",))
    compact_corpus(spark, p2, partition_by=("lang",))
    assert _data_bytes(b2) > _data_bytes(p2)
    # delete rewrites keep them
    delete_from_corpus(spark, b2, F.col("doc_id") % 2 == 0,
                       partition_by=("lang",))
    delete_from_corpus(spark, p2, F.col("doc_id") % 2 == 0,
                       partition_by=("lang",))
    assert _data_bytes(b2) > _data_bytes(p2)
    assert spark.read.parquet(b2).count() == spark.read.parquet(p2).count()


def _ids_of(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_vector_store_bloom_ids(spark, tmp_path):
    from bambooai_spark.operators.vector_store import (
        append_vector_corpus,
        stored_vector,
        write_vector_corpus,
    )

    def emb(df):
        b = (F.col("doc_id") % 2).cast("double") * 10.0
        return df.select(
            "doc_id", F.array(b + 0.1, b - 0.1).alias("embedding")
        )

    cents = [[0.0, 0.0], [10.0, 10.0]]
    d = emb(_docs(spark, 0, 3000))
    plain, bloomed = str(tmp_path / "p"), str(tmp_path / "b")
    write_vector_corpus(d, plain, id_col="doc_id", centroids=cents)
    meta = write_vector_corpus(
        d, bloomed, id_col="doc_id", centroids=cents, bloom_filter_ids=True
    )
    assert meta["bloom_ids"] is True
    assert _data_bytes(bloomed) > _data_bytes(plain)
    # appends inherit from the metadata
    more = emb(_docs(spark, 3000, 6000))
    append_vector_corpus(more, plain)
    append_vector_corpus(more, bloomed)
    assert _data_bytes(bloomed) > _data_bytes(plain)
    assert stored_vector(spark, bloomed, 4321) == [10.1, 9.9]


def test_bloom_config_survives_stats_consolidation(spark, tmp_path):
    """Review pass 13's confirmed self-destruct: _BLOOM.json must
    survive the stats consolidation passes (rebuild + compaction) and
    every maintenance rewrite must still write bloomed files."""
    from bambooai_spark.operators.filestats import bloom_config

    out = str(tmp_path / "corpus")
    d = _docs(spark, 0, 500)
    write_corpus(d, out, partition_by=("lang",), cluster_by=("doc_id",),
                 bloom_filter_by=("doc_id",), max_records_per_file=100)
    # write_corpus's own rebuild ran prune_stats_files already
    assert bloom_config(spark, out) == ["doc_id"]
    rebuild_file_stats(spark, out)
    assert bloom_config(spark, out) == ["doc_id"]
    compact_corpus(spark, out, partition_by=("lang",))
    assert bloom_config(spark, out) == ["doc_id"]
    assert stats_config(spark, out) == ["doc_id"]
    # the bloomed compaction output is fatter than a plain twin
    twin = str(tmp_path / "twin")
    write_corpus(d, twin, partition_by=("lang",), cluster_by=("doc_id",),
                 max_records_per_file=100)
    compact_corpus(spark, twin, partition_by=("lang",))
    assert _data_bytes(out) > _data_bytes(twin)


def test_write_corpus_append_mode_keeps_bloom_promise(spark, tmp_path):
    from bambooai_spark.operators.filestats import bloom_config

    out = str(tmp_path / "corpus")
    plain = str(tmp_path / "plain")
    d = _docs(spark, 0, 1500)
    write_corpus(d, out, partition_by=("lang",),
                 bloom_filter_by=("doc_id",))
    write_corpus(d, plain, partition_by=("lang",))
    grown, grown_plain = _docs(spark, 1500, 3000), _docs(spark, 1500, 3000)
    write_corpus(grown, out, partition_by=("lang",), mode="append")
    write_corpus(grown_plain, plain, partition_by=("lang",), mode="append")
    assert bloom_config(spark, out) == ["doc_id"]
    assert _data_bytes(out) > _data_bytes(plain)


def test_bloom_config_replace_self_heals(spark, tmp_path):
    from bambooai_spark.operators.filestats import (
        BLOOM_NAME,
        bloom_config,
        set_bloom_filters,
    )

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    set_bloom_filters(spark, out, ["doc_id"])
    cdir = os.path.join(out, STATS_DIR)
    # simulate the crash window between delete and rename
    os.rename(os.path.join(cdir, BLOOM_NAME),
              os.path.join(cdir, BLOOM_NAME + ".new"))
    crc = os.path.join(cdir, "." + BLOOM_NAME + ".crc")
    if os.path.exists(crc):
        os.rename(crc, os.path.join(cdir, "." + BLOOM_NAME + ".new.crc"))
    assert bloom_config(spark, out) == ["doc_id"]  # healed
    assert os.path.exists(os.path.join(cdir, BLOOM_NAME))


def test_string_bounds_truncated_and_sound(spark, tmp_path):
    """String stats must not copy huge strings into the docs: min is a
    prefix (valid lower bound), max is the bumped prefix (valid upper
    bound), and pruning with the truncated bounds stays exact."""
    from bambooai_spark.operators.filestats import (
        _STR_BOUND_MAX,
        _trunc_max,
        _trunc_min,
        qualified_root,
    )

    rows = [
        (i, "en", "k" * 500 + f"{i:05d}", f"{chr(97 + i % 20)}" * 300)
        for i in range(200)
    ]
    d = spark.createDataFrame(rows, "doc_id long, lang string, big string, s string")
    out = str(tmp_path / "corpus")
    write_corpus(d, out, partition_by=("lang",), cluster_by=("s",),
                 stats_by=("s", "big"), max_records_per_file=25)
    stats = load_file_stats(spark, out)
    for entry in stats.values():
        for cs in entry["cols"].values():
            for b in (cs["min"], cs["max"]):
                assert b is None or len(b) <= _STR_BOUND_MAX + 1
    # pruning on the truncated bounds is still exact end-to-end
    got = read_corpus(spark, out, where=[("s", "==", "c" * 300)])
    want = d.filter(F.col("s") == "c" * 300).count()
    assert want > 0 and got.count() == want
    # and actually prunes: the 20 distinct s-values cluster into files
    from pyspark.sql.types import StructType

    with open(os.path.join(out, writer.MANIFEST_NAME)) as fh:
        schema = StructType.fromJson(json.load(fh)["schema"])
    live = [os.path.join(out, k) for k in _live_keys(out)]
    kept = prune_files(live, stats, [("s", "==", "c" * 300)], schema,
                       root=out)
    assert 0 < len(kept) < len(live)
    # bound helpers: pure properties
    long = "x" * 100 + "tail"
    assert _trunc_min(long) <= long and len(_trunc_min(long)) <= _STR_BOUND_MAX
    assert _trunc_max(long) >= long
    assert _trunc_max(chr(0x10FFFF) * 100) is None


def test_advisor_flags_stats_delta_backlog(spark, tmp_path):
    from bambooai_spark.operators.filestats import write_stats_delta
    from bambooai_spark.operators.maintenance import suggest_maintenance

    out = str(tmp_path / "corpus")
    write_corpus(_docs(spark, 0, 20), out, partition_by=("lang",),
                 stats_by=("doc_id",))
    for i in range(70):  # simulate a long-lived stream's accumulation
        write_stats_delta(spark, out, f"b{i}", {"columns": [], "files": {}})
    adv = {r["check"]: r for r in suggest_maintenance(spark, out).collect()}
    assert adv["stats_delta_backlog"]["severity"] == "warn"


# --------------------------------------------------------------------------
# partition-directory pruning


def test_partition_predicate_skips_directories(spark, tmp_path):
    """A where= on a partition column prunes whole partition dirs at
    LISTING time: the built reader's input files never mention the
    excluded partitions, and results equal the plain filter."""
    out = str(tmp_path / "corpus")
    d = _docs(spark, 0, 120, langs=("en", "de", "fr", "zh"))
    write_corpus(d, out, partition_by=("lang",), max_records_per_file=10)
    got = read_corpus(spark, out, where=[("lang", "==", "de")])
    assert all("lang=de" in f for f in got.inputFiles())
    assert got.count() == 30
    # range ops work too (string partition)
    got = read_corpus(spark, out, where=[("lang", "<", "en")])
    assert {f.split("lang=")[1].split("/")[0] for f in got.inputFiles()} == {"de"}
    # composes with data-column predicates and stats pruning
    enable_file_stats(spark, out, ["doc_id"])
    rebuild_file_stats(spark, out)
    got = read_corpus(
        spark, out, where=[("lang", "==", "de"), ("doc_id", "<", 40)]
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [
        i for i in range(40) if i % 4 == 1
    ]


def test_partition_pruner_typed_and_null_dirs(spark, tmp_path):
    from bambooai_spark.operators.filestats import partition_dir_pruner

    out = str(tmp_path / "corpus")
    rows = [(i, i % 5, None if i % 10 == 0 else f"s{i % 3}") for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id long, shard int, grp string")
    write_corpus(d, out, partition_by=("shard", "grp"),
                 max_records_per_file=10)
    # int-typed partition range predicate
    got = read_corpus(spark, out, where=[("shard", ">=", 3)])
    assert all(("shard=3" in f or "shard=4" in f) for f in got.inputFiles())
    assert got.count() == d.filter("shard >= 3").count()
    # NULL partition dirs are skipped by any comparison predicate
    got = read_corpus(spark, out, where=[("grp", "==", "s1")])
    assert not any("HIVE_DEFAULT" in f for f in got.inputFiles())
    assert got.count() == d.filter("grp = 's1'").count()
    # pure function behavior: unknown col / unparseable value descend
    ok = partition_dir_pruner([("shard", "==", 3)], d.schema)
    assert ok("shard=3") and not ok("shard=4")
    assert ok("other=9") and ok("not_a_partition_dir")
    assert ok("shard=abc")  # unparseable — Spark decides
    assert not ok("shard=__HIVE_DEFAULT_PARTITION__")


def test_changes_partition_pruning_numeric_only(spark, tmp_path):
    """CDC: partition pruning applies on the numeric-id path; the
    composite path keeps the full listing (its maintenance guard needs
    global c/d evidence) but still filters correctly."""
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 40), out, 0)
    append_corpus_txn(_docs(spark, 40, 80), out, 1)
    got = read_corpus_changes(
        spark, out, after_batch=0, where=[("lang", "==", "de")]
    )
    assert all("lang=de" in f for f in got.inputFiles())
    assert sorted(r["doc_id"] for r in got.collect()) == [
        i for i in range(40, 80) if i % 2 == 1
    ]
    out2 = str(tmp_path / "stream")
    append_corpus_txn(_docs(spark, 0, 40), out2, "ns1.0")
    append_corpus_txn(_docs(spark, 40, 80), out2, "ns1.1")
    got = read_corpus_changes(
        spark, out2, after_batch="ns1.0", where=[("lang", "==", "de")]
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [
        i for i in range(40, 80) if i % 2 == 1
    ]


def test_explain_pruning_reports_both_tiers(spark, tmp_path):
    from bambooai_spark.operators.filestats import explain_pruning

    out = str(tmp_path / "corpus")
    d = _docs(spark, 0, 200, langs=("en", "de", "fr", "zh"))
    write_corpus(d, out, partition_by=("lang",), cluster_by=("doc_id",),
                 max_records_per_file=10)
    rep = explain_pruning(
        spark, out, [("lang", "==", "de"), ("doc_id", "<", 40)]
    )
    assert rep["after_partition_pruning"] < rep["files_total"]
    assert rep["after_stats"] < rep["after_partition_pruning"]
    assert 0 < rep["read_fraction"] < 0.25
    # the report's kept-count equals what the real read scans
    got = read_corpus(spark, out,
                      where=[("lang", "==", "de"), ("doc_id", "<", 40)])
    assert len(got.inputFiles()) == rep["after_stats"]


def test_explain_pruning_snapshot_and_all_where_forms(
    spark, tmp_path, monkeypatch
):
    """Review 14: the report must count the COMMITTED snapshot (a
    frozen mid-commit batch's files appear nowhere) and accept every
    where= form the readers do."""
    from bambooai_spark.operators.filestats import explain_pruning

    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20), out, 0, max_records_per_file=5)
    base = explain_pruning(spark, out, None)
    assert base["files_total"] == base["after_stats"]
    assert base["predicates"] is None
    # Column / SQL forms: filter-only, unpruned snapshot
    assert explain_pruning(spark, out, "lang = 'de'")["after_stats"] == (
        base["files_total"]
    )
    assert explain_pruning(
        spark, out, F.col("lang") == "de"
    )["after_stats"] == base["files_total"]

    orig = writer._fs_write_text_atomic

    def crash_on_marker(spark_, path, text):
        if writer.COMMITS_DIR in path:
            raise RuntimeError("crash before marker")
        return orig(spark_, path, text)

    monkeypatch.setattr(writer, "_fs_write_text_atomic", crash_on_marker)
    with pytest.raises(RuntimeError, match="crash before marker"):
        append_corpus_txn(
            _docs(spark, 20, 40), out, 1, max_records_per_file=5
        )
    monkeypatch.setattr(writer, "_fs_write_text_atomic", orig)
    # the frozen batch's (possibly half-moved) files count for nothing
    rep = explain_pruning(spark, out, [("doc_id", "<", 100)])
    assert rep["files_total"] == base["files_total"]
    got = read_corpus(spark, out, where=[("doc_id", "<", 100)])
    assert rep["after_stats"] == len(got.inputFiles())
    append_corpus_txn(_docs(spark, 20, 40), out, 1, max_records_per_file=5)


def test_as_of_guard_is_global_under_where(spark, tmp_path):
    """Review 14: as_of_batch's non-numeric-id guard must not depend on
    the where= clause (no partition pruning under as_of)."""
    out = str(tmp_path / "corpus")
    append_corpus_txn(_docs(spark, 0, 20, langs=("en",)), out, 0)
    append_corpus_txn(_docs(spark, 20, 40, langs=("fr",)), out, "ns1.3")
    with pytest.raises(ValueError, match="ordering is undefined"):
        read_corpus(spark, out, as_of_batch=0)
    with pytest.raises(ValueError, match="ordering is undefined"):
        # the composite batch lives only under lang=fr; the predicate
        # must NOT hide it from the guard
        read_corpus(
            spark, out, as_of_batch=0, where=[("lang", "==", "en")]
        )


def test_in_predicate_prunes_and_filters(spark, tmp_path):
    """The 'in' op: files prune when NO member can be present, partition
    dirs skip non-member values, and the residual is an isin."""
    from bambooai_spark.operators.filestats import partition_dir_pruner

    schema = _schema_of(spark, "x long")
    stats = {"f1": _entry(10, 20, 5), "f2": _entry(30, 40, 5)}
    files = ["/c/f1", "/c/f2"]
    assert prune_files(files, stats, [("x", "in", [15, 35])], schema) == files
    assert prune_files(files, stats, [("x", "in", [15, 16])], schema) == ["/c/f1"]
    assert prune_files(files, stats, [("x", "in", [25, 26])], schema) == []
    # validation: empty / non-list values rejected at the reader contract
    from bambooai_spark.operators.filestats import normalize_predicates

    with pytest.raises(ValueError, match="non-empty"):
        normalize_predicates([("x", "in", [])], schema)
    with pytest.raises(ValueError, match="non-empty"):
        normalize_predicates([("x", "in", "de")], schema)

    out = str(tmp_path / "corpus")
    d = _docs(spark, 0, 120, langs=("en", "de", "fr", "zh"))
    write_corpus(d, out, partition_by=("lang",), cluster_by=("doc_id",),
                 max_records_per_file=10)
    got = read_corpus(spark, out, where=[("lang", "in", ["de", "fr"])])
    dirs = {f.split("lang=")[1].split("/")[0] for f in got.inputFiles()}
    assert dirs == {"de", "fr"}
    assert got.count() == d.filter(F.col("lang").isin("de", "fr")).count()
    # composes with a data-column in-list through the stats tier
    got = read_corpus(
        spark, out,
        where=[("lang", "in", ["de"]), ("doc_id", "in", [1, 5, 9])],
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 5, 9]
    # pure pruner behavior
    ok = partition_dir_pruner([("lang", "in", ["de", "fr"])], d.schema)
    assert ok("lang=de") and ok("lang=fr") and not ok("lang=en")


def test_null_ops_prune_and_filter(spark, tmp_path):
    """isnull/notnull: pruning from the counts alone (no bounds), NULL
    partition dirs handled, residuals exact."""
    from bambooai_spark.operators.filestats import (
        normalize_predicates,
        partition_dir_pruner,
    )

    schema = _schema_of(spark, "x long")
    stats = {
        "all_null": {"n": 5, "cols": {"x": {"min": None, "max": None, "nn": 0}}},
        "no_null": {"n": 5, "cols": {"x": {"min": 1, "max": 9, "nn": 5}}},
        "mixed": {"n": 5, "cols": {"x": {"min": 1, "max": 9, "nn": 3}}},
    }
    files = ["/c/all_null", "/c/no_null", "/c/mixed"]
    assert prune_files(files, stats, [("x", "notnull", None)], schema) == [
        "/c/no_null", "/c/mixed"
    ]
    assert prune_files(files, stats, [("x", "isnull", None)], schema) == [
        "/c/all_null", "/c/mixed"
    ]
    with pytest.raises(ValueError, match="takes no value"):
        normalize_predicates([("x", "isnull", 1)], schema)

    # end-to-end with a nullable partition column
    rows = [(i, None if i % 5 == 0 else f"g{i % 2}") for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id long, grp string")
    out = str(tmp_path / "corpus")
    write_corpus(d, out, partition_by=("grp",), max_records_per_file=10)
    got = read_corpus(spark, out, where=[("grp", "isnull", None)])
    assert all("HIVE_DEFAULT" in f for f in got.inputFiles())
    assert got.count() == 20
    got = read_corpus(spark, out, where=[("grp", "notnull", None)])
    assert not any("HIVE_DEFAULT" in f for f in got.inputFiles())
    assert got.count() == 80
    ok = partition_dir_pruner([("grp", "isnull", None)], d.schema)
    assert ok("grp=__HIVE_DEFAULT_PARTITION__") and not ok("grp=g1")


def test_missing_count_fields_read_conservatively(spark):
    """Review 15: a hand-made/torn stats entry without nn/n must READ
    the file for every op, never prune it."""
    schema = _schema_of(spark, "x long")
    torn = {"f": {"cols": {"x": {"min": 1, "max": 9}}}}
    files = ["/c/f"]
    for pred in [("x", "notnull", None), ("x", "isnull", None),
                 ("x", "==", 5), ("x", "==", 99)]:
        got = prune_files(files, torn, [pred], schema)
        if pred == ("x", "==", 99):
            # bounds are present and disjoint — THAT pruning still works
            assert got == []
        else:
            assert got == files, pred


@settings(max_examples=200, deadline=None)
@given(
    data=st.lists(
        st.lists(st.one_of(st.integers(-50, 50), st.none()),
                 min_size=1, max_size=8),
        min_size=1, max_size=6,
    ),
    pred=st.one_of(
        st.tuples(st.just("in"),
                  st.lists(st.integers(-55, 55), min_size=1, max_size=4)),
        st.tuples(st.just("isnull"), st.none()),
        st.tuples(st.just("notnull"), st.none()),
    ),
)
def test_prune_soundness_in_and_null_ops_property(data, pred):
    """Soundness for the extended ops: any 'file' holding a matching
    row survives pruning."""
    from pyspark.sql.types import LongType, StructField, StructType

    op, v = pred
    schema = StructType([StructField("x", LongType())])

    def matches(row):
        if op == "in":
            return row is not None and row in v
        if op == "isnull":
            return row is None
        return row is not None

    stats, files, matching = {}, [], set()
    for i, rows in enumerate(data):
        name = f"f{i}"
        files.append(f"/c/{name}")
        vals = [r for r in rows if r is not None]
        stats[name] = {
            "n": len(rows),
            "cols": {"x": {
                "min": min(vals) if vals else None,
                "max": max(vals) if vals else None,
                "nn": len(vals),
            }},
        }
        if any(matches(r) for r in rows):
            matching.add(f"/c/{name}")
    kept = set(prune_files(files, stats, [("x", op, v)], schema))
    assert matching <= kept


# --------------------------------------------------------------------------
# consolidated parquet stats + distributed prune (VERDICT r8 #2)


def _chars_docs(spark, lo, hi):
    return _docs(spark, lo, hi).withColumn(
        "n_chars", F.length("text").cast("long") + F.col("doc_id")
    )


def _corpus_manifest_schema(out):
    from pyspark.sql.types import StructType

    with open(os.path.join(out, writer.MANIFEST_NAME)) as fh:
        return StructType.fromJson(json.load(fh)["schema"])


@pytest.fixture
def _threshold_zero(spark):
    """Force the distributed tier regardless of entry count."""
    key = "spark.bambooai.stats.distributedPruneThreshold"
    spark.conf.set(key, "0")
    yield
    spark.conf.unset(key)


def test_consolidate_folds_deltas_and_preserves_decisions(spark, tmp_path):
    from bambooai_spark.operators.filestats import (
        _stats_snapshot,
        consolidate_file_stats,
    )

    out = str(tmp_path / "corpus")
    write_corpus(
        _chars_docs(spark, 0, 100), out, partition_by=("lang",),
        cluster_by=("n_chars",), max_records_per_file=10,
    )
    append_corpus(_chars_docs(spark, 100, 150), out)
    append_corpus(_chars_docs(spark, 150, 200), out)
    before = load_file_stats(spark, out)
    n_json = len([n for n in _stats_names(out) if n.endswith(".json")
                  and n != "_BLOOM.json"])
    assert n_json >= 3  # rebuild doc + two append deltas

    meta = consolidate_file_stats(spark, out)
    assert meta["version"] == 1
    assert meta["folded_deltas"] == n_json
    assert meta["n_entries"] == len(before)
    # every JSON delta folded away; one consolidated dir remains
    assert [n for n in _stats_names(out) if n.endswith(".json")
            and n != "_BLOOM.json"] == []
    _deltas, best, _tok = _stats_snapshot(spark, out)
    assert best is not None and best[1]["version"] == 1

    # merged view and pruning decisions are unchanged by the fold
    assert load_file_stats(spark, out) == before
    schema = _corpus_manifest_schema(out)
    live = [os.path.join(out, k) for k in _live_keys(out)]
    preds = [("n_chars", ">=", 120), ("n_chars", "<=", 200)]
    kept = prune_files(live, before, preds, schema, root=out)
    kept2 = prune_files(
        live, load_file_stats(spark, out), preds, schema, root=out
    )
    assert kept == kept2 and len(kept) < len(live)

    # re-consolidating with nothing to fold is a no-op
    again = consolidate_file_stats(spark, out)
    assert again["version"] == 1 and again["folded_deltas"] == 0

    # the read itself stays exact through the fold
    got = read_corpus(spark, out, where=preds)
    want = _chars_docs(spark, 0, 200).filter(
        (F.col("n_chars") >= 120) & (F.col("n_chars") <= 200)
    )
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )


def test_distributed_tier_matches_memory_tier(spark, tmp_path, _threshold_zero):
    from bambooai_spark.operators.filestats import (
        consolidate_file_stats,
        explain_pruning,
        prune_with_stored_stats,
        qualified_root,
    )

    out = str(tmp_path / "corpus")
    write_corpus(
        _chars_docs(spark, 0, 200), out, partition_by=("lang",),
        cluster_by=("n_chars",), max_records_per_file=20,
    )
    consolidate_file_stats(spark, out)
    # a later append leaves an UNFOLDED delta the distributed tier must
    # still see
    append_corpus(_chars_docs(spark, 200, 260), out)

    schema = _corpus_manifest_schema(out)
    qroot = qualified_root(spark, out)
    live = [os.path.join(out, k) for k in _live_keys(out)]
    merged = load_file_stats(spark, out)
    for preds in (
        [("n_chars", ">=", 150), ("n_chars", "<=", 250)],
        [("n_chars", "==", 130)],
        [("n_chars", "<", 0)],          # provably empty → prunes all
        [("n_chars", "notnull", None)],
        [("doc_id", ">", 10**9)],       # no stats column → no pruning
    ):
        kept_mem = set(prune_files(
            live, merged, preds, schema, root=qroot,
            session_tz=filestats.tz_frame(spark),
        ))
        kept_dist, strategy = prune_with_stored_stats(
            spark, out, live, preds, schema
        )
        assert strategy == "distributed"
        assert set(kept_dist) == kept_mem, preds

    rep = explain_pruning(spark, out, [("n_chars", "==", 130)])
    assert rep["stats_strategy"] == "distributed"
    assert rep["after_stats"] <= max(2, rep["files_total"] // 4)

    # the real read through the distributed tier stays exact
    got = read_corpus(spark, out, where=[("n_chars", ">=", 150),
                                         ("n_chars", "<=", 250)])
    want = _chars_docs(spark, 0, 260).filter(
        (F.col("n_chars") >= 150) & (F.col("n_chars") <= 250)
    )
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )


def test_consolidated_crash_windows(spark, tmp_path):
    import shutil

    from bambooai_spark.operators.filestats import (
        CONSOLIDATED_META,
        CONSOLIDATED_PREFIX,
        _stats_snapshot,
        consolidate_file_stats,
    )

    out = str(tmp_path / "corpus")
    write_corpus(
        _chars_docs(spark, 0, 100), out, partition_by=("lang",),
        cluster_by=("n_chars",), max_records_per_file=10,
    )
    before = load_file_stats(spark, out)
    sdir = os.path.join(out, STATS_DIR)

    # (a) a meta-less consolidated dir (crash before _META.json) is
    # invisible to readers
    ghost = os.path.join(sdir, f"{CONSOLIDATED_PREFIX}0000000000000009-dead")
    os.makedirs(ghost)
    with open(os.path.join(ghost, "garbage.parquet"), "w") as fh:
        fh.write("not parquet")
    _deltas, best, _tok = _stats_snapshot(spark, out)
    assert best is None
    assert load_file_stats(spark, out) == before
    shutil.rmtree(ghost)

    # (b) folded deltas that survived a crash-before-delete are harmless
    # duplicates (identical content) and the next fold removes them
    delta_names = [n for n in _stats_names(out) if n.endswith(".json")
                   and n != "_BLOOM.json"]
    saved = {
        n: open(os.path.join(sdir, n)).read() for n in delta_names
    }
    meta = consolidate_file_stats(spark, out)
    for n, text in saved.items():  # resurrect the folded deltas
        crc = os.path.join(sdir, f".{n}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        with open(os.path.join(sdir, n), "w") as fh:
            fh.write(text)
    assert load_file_stats(spark, out) == before
    meta2 = consolidate_file_stats(spark, out)
    assert meta2["version"] == meta["version"] + 1
    assert meta2["n_entries"] == meta["n_entries"]
    assert load_file_stats(spark, out) == before
    # old version dir was superseded and removed
    cons = [n for n in os.listdir(sdir) if n.startswith(CONSOLIDATED_PREFIX)]
    assert len(cons) == 1 and f"{meta2['version']:016d}" in cons[0]


def test_compaction_prunes_consolidated_doc(spark, tmp_path):
    from bambooai_spark.operators.filestats import (
        _stats_snapshot,
        consolidate_file_stats,
    )

    out = str(tmp_path / "corpus")
    enable_file_stats(spark, out, ["n_chars"])
    append_corpus_txn(_chars_docs(spark, 0, 60), out, 0)
    append_corpus_txn(_chars_docs(spark, 60, 120), out, 1)
    consolidate_file_stats(spark, out)
    compact_corpus(spark, out, partition_by=("lang",))
    # the consolidated doc described only pre-compaction files: gone,
    # and the fresh c-doc covers exactly the live files
    _deltas, best, _tok = _stats_snapshot(spark, out)
    assert best is None
    from bambooai_spark.operators.filestats import stats_coverage

    cov = stats_coverage(spark, out)
    assert cov["live"] and cov["covered"] == cov["live"]
    # reads stay exact after the swap
    got = read_corpus(spark, out, where=[("n_chars", ">=", 100)])
    want = _chars_docs(spark, 0, 120).filter(F.col("n_chars") >= 100)
    assert got.count() == want.count()


def test_merged_stats_cache_hits_and_invalidates(spark, tmp_path):
    from bambooai_spark.operators.filestats import _merged_cache

    out = str(tmp_path / "corpus")
    write_corpus(
        _chars_docs(spark, 0, 50), out, partition_by=("lang",),
        cluster_by=("n_chars",),
    )
    a = load_file_stats(spark, out)
    b = load_file_stats(spark, out)
    assert a is b  # snapshot unchanged → the cached dict is returned
    append_corpus(_chars_docs(spark, 50, 80), out)
    c = load_file_stats(spark, out)
    assert c is not a and len(c) > len(a)  # new delta → new token
    assert len(_merged_cache()) <= 8


def test_distributed_prune_bounded_driver_100k_entries(spark, tmp_path):
    """The synthetic 100k-file check from VERDICT r8 #2: with a
    consolidated doc above the threshold the prune is ONE Spark job and
    the driver only materializes the pruned-key set — and the decisions
    are identical to the pure in-memory walk."""
    from pyspark.sql.types import LongType, StructField, StructType

    from bambooai_spark.operators.filestats import (
        consolidate_file_stats,
        prune_with_stored_stats,
        qualified_root,
        write_stats_delta,
    )

    out = str(tmp_path / "corpus")
    enable_file_stats(spark, out, ["x"])
    n = 100_000
    files_doc = {
        f"b1-part-{i:06d}": {
            "n": 10,
            "cols": {"x": {"min": i * 10, "max": i * 10 + 9, "nn": 10}},
        }
        for i in range(n)
    }
    write_stats_delta(spark, out, "b1", {"columns": ["x"], "files": files_doc})
    meta = consolidate_file_stats(spark, out)
    assert meta["n_entries"] == n

    schema = StructType([StructField("x", LongType())])
    qroot = qualified_root(spark, out)
    live = [f"{out}/b1-part-{i:06d}" for i in range(n)]
    merged = load_file_stats(spark, out)
    # (preds, expected transfer mode): a prune-MAJORITY predicate must
    # invert to the keep-list join so the driver collects min(pruned,
    # kept) keys (VERDICT r9 #4); a prune-minority one keeps the
    # dead-key collect; an unprunable one transfers nothing
    for preds, mode in (
        ([("x", ">=", 500_000), ("x", "<", 500_200)], "kept"),  # selective
        ([("x", "==", 123_456)], "kept"),
        ([("x", "<", 0)], "kept"),            # provably empty → prunes all
        ([("x", ">=", 100_000)], "dead"),     # prunes ~10% → minority
        ([("x", "notnull", None)], "none"),   # keeps everything
    ):
        kept_mem = prune_files(live, merged, preds, schema, root=qroot)
        kept_dist, strategy = prune_with_stored_stats(
            spark, out, live, preds, schema
        )
        assert strategy == "distributed"
        assert kept_dist == kept_mem, preds
        tmode, tn = filestats._LAST_PRUNE_TRANSFER
        assert tmode == mode, (preds, tmode)
        # driver transfer bounded by the SMALLER side either way
        assert tn <= min(len(kept_mem), n - len(kept_mem)) + 1, (preds, tn)
    # the selective range keeps ~20 of 100k files
    assert len(prune_files(
        live, merged, [("x", ">=", 500_000), ("x", "<", 500_200)],
        schema, root=qroot,
    )) <= 21


def test_consolidate_spares_concurrent_higher_doc(spark, tmp_path):
    """ADVICE r9: the post-fold sweep deletes ONLY strictly-lower
    versions, so a concurrent consolidator's same-or-higher-version doc
    (meta not yet landed -> not picked as best) survives instead of
    both racers destroying each other's fold."""
    from bambooai_spark.operators.filestats import (
        CONSOLIDATED_PREFIX,
        consolidate_file_stats,
        write_stats_delta,
    )

    out = str(tmp_path / "corpus")
    enable_file_stats(spark, out, ["x"])
    write_stats_delta(spark, out, "b1", {
        "columns": ["x"],
        "files": {"b1-p0": {"n": 1, "cols": {"x": {"min": 0, "max": 9,
                                                   "nn": 1}}}},
    })
    meta = consolidate_file_stats(spark, out)
    assert meta["version"] == 1

    # a concurrent consolidator's IN-FLIGHT v2 doc: parquet dir exists,
    # _META.json not yet written (so _stats_snapshot ignores it)
    sdir = os.path.join(out, STATS_DIR)
    inflight = os.path.join(
        sdir, f"{CONSOLIDATED_PREFIX}{2:016d}-deadbeef"
    )
    os.makedirs(inflight)
    v1_dirs = [n for n in os.listdir(sdir)
               if n.startswith(CONSOLIDATED_PREFIX) and "-deadbeef" not in n]

    write_stats_delta(spark, out, "b2", {
        "columns": ["x"],
        "files": {"b2-p0": {"n": 1, "cols": {"x": {"min": 10, "max": 19,
                                                   "nn": 1}}}},
    })
    meta2 = consolidate_file_stats(spark, out)
    assert meta2["version"] == 2  # best was still v1
    names = os.listdir(sdir)
    # the in-flight v2 (same version as ours, NOT strictly lower) survives
    assert os.path.basename(inflight) in names
    # the superseded v1 doc was swept
    assert not any(n in names for n in v1_dirs)
    # and both entries are in the new fold
    merged = load_file_stats(spark, out)
    assert set(merged) == {"b1-p0", "b2-p0"}


def test_consolidate_restamps_legacy_tz_frame(spark, tmp_path):
    """ADVICE r9: consolidation heals pre-composite tz stamps in routine
    maintenance — a legacy session-tz-only frame whose session component
    matches is upgraded to the composite frame (re-enabling "ts"
    pruning); a foreign legacy frame stays untouched (conservative)."""
    from bambooai_spark.operators.filestats import (
        consolidate_file_stats,
        tz_frame,
        write_stats_delta,
    )

    out = str(tmp_path / "corpus")
    enable_file_stats(spark, out, ["ts"])
    frame = tz_frame(spark)
    session_only = frame.split("|", 1)[0]
    ent = {"n": 1, "cols": {"ts": {"min": "2026-01-01 00:00:00.000000",
                                   "max": "2026-01-02 00:00:00.000000",
                                   "nn": 1}}}
    write_stats_delta(spark, out, "b1", {
        "columns": ["ts"], "tz": session_only,  # legacy stamp
        "files": {"b1-p0": dict(ent)},
    })
    write_stats_delta(spark, out, "b2", {
        "columns": ["ts"], "tz": "Mars/Olympus",  # foreign legacy stamp
        "files": {"b2-p0": dict(ent)},
    })
    consolidate_file_stats(spark, out)
    merged = load_file_stats(spark, out)
    assert merged["b1-p0"]["_tz"] == frame          # healed
    assert merged["b2-p0"]["_tz"] == "Mars/Olympus"  # untouched

    # the heal also applies parquet->parquet on a later fold of the
    # consolidated doc itself (entries already healed stay stable)
    write_stats_delta(spark, out, "b3", {
        "columns": ["ts"], "tz": session_only,
        "files": {"b3-p0": dict(ent)},
    })
    consolidate_file_stats(spark, out)
    merged = load_file_stats(spark, out)
    assert merged["b1-p0"]["_tz"] == frame
    assert merged["b3-p0"]["_tz"] == frame
    assert merged["b2-p0"]["_tz"] == "Mars/Olympus"


def test_query_log_sample_every_batches_rpc(spark, tmp_path, monkeypatch):
    """ADVICE r9: sampleEvery=N defers the query-log read-modify-write —
    first sight records immediately, then one flush per N reads with the
    deferred count folded in, so n_reads stays exact at record points
    while the per-read RPC cost drops N-fold."""
    from bambooai_spark.operators.filestats import (
        read_query_log,
        record_read_sample,
    )

    out = str(tmp_path / "corpus")
    enable_file_stats(spark, out, ["doc_id"])
    monkeypatch.setattr(filestats, "_QUERYLOG_DEFER", {})
    writes = {"n": 0}
    real = filestats._replace_config

    def counting(sp, cpath, text):
        writes["n"] += 1
        return real(sp, cpath, text)

    monkeypatch.setattr(filestats, "_replace_config", counting)
    spark.conf.set("spark.bambooai.queryLog.sampleEvery", "3")
    try:
        for _ in range(7):
            record_read_sample(spark, out, [("doc_id", ">=", 0)], 5)
        log = read_query_log(spark, out)
        # reads 1, 4 and 7 record (first sight, then every 3rd):
        # 3 writes instead of 7, with the full count folded in
        assert writes["n"] == 3
        assert log and log[0]["n_reads"] == 7
    finally:
        spark.conf.unset("spark.bambooai.queryLog.sampleEvery")

    # default (sampleEvery unset) stays exact per read
    monkeypatch.setattr(filestats, "_QUERYLOG_DEFER", {})
    writes["n"] = 0
    for _ in range(2):
        record_read_sample(spark, out, [("doc_id", "<", 10)], 2)
    assert writes["n"] == 2


def test_distributed_prune_race_retries_then_unpruned(
    spark, tmp_path, _threshold_zero, monkeypatch
):
    """A consolidated doc deleted mid-read (a concurrent fold) must
    never fail the read: the prune RE-SNAPSHOTS and re-picks the tier;
    with the doc fully gone there is nothing to prune on, so the read
    proceeds unpruned — sound, the residual filter always applies
    (review r9 pass 2: the fallback must also never collect a huge
    successor doc driver-side)."""
    from bambooai_spark.operators import filestats as fsmod
    from bambooai_spark.operators.filestats import (
        consolidate_file_stats,
        prune_with_stored_stats,
    )

    out = str(tmp_path / "corpus")
    write_corpus(
        _chars_docs(spark, 0, 100), out, partition_by=("lang",),
        cluster_by=("n_chars",), max_records_per_file=10,
    )
    consolidate_file_stats(spark, out)
    schema = _corpus_manifest_schema(out)
    live = [os.path.join(out, k) for k in _live_keys(out)]

    real = fsmod._read_consolidated
    state = {"raced": False}

    def race_once(sp, dirpath):
        if not state["raced"]:
            state["raced"] = True
            # the successor's cleanup won the race (Hadoop-qualified URI)
            writer._fs_delete(sp, dirpath)
        return real(sp, dirpath)

    monkeypatch.setattr(fsmod, "_read_consolidated", race_once)
    kept, strategy = prune_with_stored_stats(
        spark, out, live, [("n_chars", ">=", 0)], schema
    )
    assert state["raced"]
    # degraded, not dead: the retry re-snapshots; with the doc gone and
    # no deltas left there is nothing to prune on — read everything
    assert strategy is None
    assert set(kept) == set(live)
    # and the real read still answers exactly
    monkeypatch.setattr(fsmod, "_read_consolidated", real)
    got = read_corpus(spark, out, where=[("n_chars", ">=", 0)])
    assert got.count() == 100


def test_write_corpus_append_writes_delta_not_rebuild(spark, tmp_path):
    """A plain write_corpus(mode='append') into a stats-configured
    corpus collects stats for ONLY its own files (one bounded delta) —
    never an O(corpus) rebuild, and never the consolidated doc's
    destruction (review r9). An explicit stats_by=() stays a disable."""
    from bambooai_spark.operators.filestats import (
        _stats_snapshot,
        consolidate_file_stats,
        stats_coverage,
    )

    out = str(tmp_path / "corpus")
    write_corpus(
        _chars_docs(spark, 0, 100), out, partition_by=("lang",),
        cluster_by=("n_chars",), max_records_per_file=10,
    )
    consolidate_file_stats(spark, out)
    _d0, best0, _t0 = _stats_snapshot(spark, out)
    assert best0 is not None

    write_corpus(_chars_docs(spark, 100, 140), out, mode="append")
    deltas, best, _tok = _stats_snapshot(spark, out)
    assert best is not None and best[0] == best0[0]  # doc SURVIVED
    assert len(deltas) == 1 and deltas[0][0].startswith("a")
    cov = stats_coverage(spark, out)
    assert cov["covered"] == cov["live"]  # new files covered too
    got = read_corpus(spark, out, where=[("n_chars", ">=", 0)])
    assert got.count() == 140

    # the documented explicit opt-out is honored on append
    write_corpus(_chars_docs(spark, 140, 150), out, mode="append",
                 stats_by=())
    deltas2, _b, _t = _stats_snapshot(spark, out)
    assert len(deltas2) == 1  # no new delta collected

    # order/duplicates in stats_by are not a "column switch" — the
    # semantically identical set must take the bounded delta path, not
    # an O(corpus) rebuild that destroys the consolidated doc (review
    # r9 pass 3)
    write_corpus(_chars_docs(spark, 150, 160), out, mode="append",
                 stats_by=("n_chars", "n_chars"))
    deltas3, best3, _t = _stats_snapshot(spark, out)
    assert best3 is not None and best3[0] == best0[0]  # doc intact
    assert len(deltas3) == 2 and all(
        n.startswith("a") for n, _m, _s in deltas3
    )


def test_advisor_flags_stale_tz_frames(spark, tmp_path):
    from bambooai_spark.operators.maintenance import suggest_maintenance

    out = str(tmp_path / "corpus")
    d = _docs(spark, 0, 60).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 12:00:00"))
        + F.make_interval(secs=F.col("doc_id"))
    )
    write_corpus(d, out, partition_by=("lang",), stats_by=("ts",),
                 max_records_per_file=10)
    adv = {r["check"]: r for r in suggest_maintenance(spark, out).collect()}
    assert "stats_tz_frames" not in adv  # same frame — quiet

    # simulate stats collected by a driver in another frame
    sdir = os.path.join(out, STATS_DIR)
    for n in os.listdir(sdir):
        if n.endswith(".json") and n not in ("_CONFIG.json", "_BLOOM.json",
                                             "_QUERYLOG.json"):
            p = os.path.join(sdir, n)
            with open(p) as fh:
                doc = json.load(fh)
            doc["tz"] = "UTC|PST/PDT@28800"
            with open(p, "w") as fh:
                json.dump(doc, fh)
            crc = os.path.join(sdir, f".{n}.crc")
            if os.path.exists(crc):
                os.remove(crc)
    adv2 = {r["check"]: r for r in suggest_maintenance(spark, out).collect()}
    assert adv2["stats_tz_frames"]["severity"] == "info"
    assert "rebuild_file_stats" in adv2["stats_tz_frames"]["recommendation"]
