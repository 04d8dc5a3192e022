"""Additive schema evolution on the corpus (append_corpus /
append_corpus_txn evolve_schema=True): new columns read back as NULL for
history, drops and re-types stay refused, the manifest records the typed
unified schema, and the maintenance rewrites (compact, delete) carry the
evolved column instead of one sampled footer dropping it."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bambooai_spark.operators.writer import (
    MANIFEST_NAME,
    append_corpus,
    append_corpus_txn,
    compact_corpus,
    delete_from_corpus,
    read_corpus,
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


def _docs_v2(spark, lo, hi, langs=("en", "de")):
    """v1 columns + a quality score — the additive evolution case."""
    return _docs(spark, lo, hi, langs).withColumn(
        "quality", (F.col("doc_id") % 7).cast("double") / 10
    )


def _manifest(out):
    with open(os.path.join(out, MANIFEST_NAME)) as fh:
        return json.load(fh)


def _schema_fields(out):
    js = _manifest(out).get("schema")
    return {f["name"]: f["type"] for f in js["fields"]} if js else None


def test_drift_refused_without_evolve(spark, tmp_path):
    out = str(tmp_path / "c")
    append_corpus(_docs(spark, 0, 10), out)
    with pytest.raises(ValueError, match="evolve_schema=True"):
        append_corpus(_docs_v2(spark, 10, 20), out)
    # corpus and manifest untouched by the refused batch
    assert read_corpus(spark, out).count() == 10
    assert "quality" not in (_schema_fields(out) or {})


def test_additive_evolution_plain_append(spark, tmp_path):
    out = str(tmp_path / "c")
    append_corpus(_docs(spark, 0, 10), out)
    m = append_corpus(_docs_v2(spark, 10, 20), out, evolve_schema=True)
    assert m.count() == 2  # en/de partitions

    got = read_corpus(spark, out)
    assert set(got.columns) == {
        "doc_id", "lang", "source", "text", "quality",
    }
    old = got.filter(F.col("doc_id") < 10)
    new = got.filter(F.col("doc_id") >= 10)
    assert old.count() == 10 and new.count() == 10
    assert old.filter(F.col("quality").isNull()).count() == 10
    assert new.filter(F.col("quality").isNull()).count() == 0

    man = _manifest(out)
    assert sorted(man["columns"]) == [
        "doc_id", "lang", "quality", "source", "text",
    ]
    fields = _schema_fields(out)
    assert fields["quality"] == "double" and fields["doc_id"] == "long"

    # a later v2-shaped batch appends WITHOUT the evolve flag
    append_corpus(_docs_v2(spark, 20, 30), out)
    assert read_corpus(spark, out).count() == 30
    # ...but a v1-shaped batch (missing the evolved column) is refused
    with pytest.raises(ValueError, match="corpus-only columns"):
        append_corpus(_docs(spark, 30, 40), out, evolve_schema=True)


def test_retype_refused(spark, tmp_path):
    out = str(tmp_path / "c")
    append_corpus(_docs(spark, 0, 10), out)
    retyped = _docs(spark, 10, 20).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    with pytest.raises(ValueError, match="re-types"):
        append_corpus(retyped, out, evolve_schema=True)
    with pytest.raises(ValueError, match="re-types"):
        append_corpus(retyped, out)


def test_txn_evolution_and_replay(spark, tmp_path):
    out = str(tmp_path / "c")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    with pytest.raises(ValueError, match="evolve_schema=True"):
        append_corpus_txn(_docs_v2(spark, 10, 20), out, 1)
    append_corpus_txn(_docs_v2(spark, 10, 20), out, 1, evolve_schema=True)

    got = read_corpus(spark, out)
    assert got.count() == 20
    assert got.filter(F.col("quality").isNull()).count() == 10

    # full replay of the evolving batch: recorded no-op, schema intact
    append_corpus_txn(_docs_v2(spark, 10, 20), out, 1, evolve_schema=True)
    assert read_corpus(spark, out).count() == 20
    assert "quality" in _schema_fields(out)

    # an all-duplicate evolving batch still evolves the recorded schema
    out2 = str(tmp_path / "c2")
    append_corpus_txn(_docs(spark, 0, 10), out2, 0)
    dup_v2 = _docs(spark, 0, 10).withColumn("extra", F.lit(1).cast("long"))
    append_corpus_txn(dup_v2, out2, 1, evolve_schema=True)
    assert "extra" in _schema_fields(out2)
    # so the next extra-shaped batch needs no evolve flag
    append_corpus_txn(
        _docs(spark, 10, 15).withColumn("extra", F.lit(2).cast("long")),
        out2,
        2,
    )
    assert read_corpus(spark, out2).count() == 15


def test_compact_preserves_evolved_column(spark, tmp_path):
    out = str(tmp_path / "c")
    append_corpus(_docs(spark, 0, 10), out)
    append_corpus(_docs_v2(spark, 10, 20), out, evolve_schema=True)
    compact_corpus(spark, out)
    got = read_corpus(spark, out)
    assert "quality" in got.columns  # the one-footer drop regression
    assert got.count() == 20
    assert got.filter(F.col("quality").isNull()).count() == 10
    assert got.filter(
        (F.col("doc_id") >= 10) & F.col("quality").isNotNull()
    ).count() == 10
    assert "quality" in _schema_fields(out)  # survives the rebuild


def test_delete_preserves_evolved_column(spark, tmp_path):
    out = str(tmp_path / "c")
    append_corpus(_docs(spark, 0, 10), out)
    append_corpus(_docs_v2(spark, 10, 20), out, evolve_schema=True)
    # predicate touches files from BOTH schema generations
    delete_from_corpus(spark, out, F.col("doc_id").isin(3, 13))
    got = read_corpus(spark, out)
    assert got.count() == 18
    assert "quality" in got.columns
    # rewritten kept-rows kept their quality values
    assert got.filter(
        (F.col("doc_id") >= 10) & F.col("quality").isNull()
    ).count() == 0
    assert got.filter(F.col("quality").isNull()).count() == 9


def test_evolution_crash_windows(spark, tmp_path, monkeypatch):
    """The review's two schema-loss windows: (a) plain append crashes
    between the data write and the manifest fold — the pre-recorded
    schema must already know the new column so compaction keeps it;
    (b) the manifest tears before a delete — the delete's frozen info
    re-records the schema through the torn-manifest rebuild."""
    from bambooai_spark.operators import writer as w

    out = str(tmp_path / "c")
    append_corpus(_docs(spark, 0, 10), out)

    # (a) crash after the corpus write, before the fold
    orig = w._merge_manifest_delta

    def crash_fold(*a, **k):
        raise RuntimeError("injected crash before manifest fold")

    monkeypatch.setattr(w, "_merge_manifest_delta", crash_fold)
    with pytest.raises(RuntimeError, match="injected"):
        append_corpus(_docs_v2(spark, 10, 20), out, evolve_schema=True)
    monkeypatch.setattr(w, "_merge_manifest_delta", orig)
    # the schema was recorded BEFORE the crash...
    assert "quality" in _schema_fields(out)
    # ...so compaction's schema-pinned read keeps the evolved column
    compact_corpus(spark, out)
    got = read_corpus(spark, out)
    assert "quality" in got.columns and got.count() == 20
    assert got.filter(F.col("quality").isNotNull()).count() == 10

    # (b) torn manifest + delete: the fold rebuilds from files and the
    # frozen info re-records the schema
    mpath = os.path.join(out, MANIFEST_NAME)
    with open(mpath, "w") as fh:
        fh.write('{"torn')
    crc = os.path.join(out, f".{MANIFEST_NAME}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    delete_from_corpus(spark, out, F.col("doc_id") == 12)
    assert "quality" in (_schema_fields(out) or {})
    got = read_corpus(spark, out)
    assert got.count() == 19 and "quality" in got.columns


def test_recover_staging_carries_schema(spark, tmp_path, monkeypatch):
    """A committed evolving batch recovered by recover_staging (crash
    between marker and fold) must record its unified schema."""
    from bambooai_spark.operators import writer as w
    from bambooai_spark.operators.writer import recover_staging

    out = str(tmp_path / "c")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)

    orig = w._merge_manifest_delta

    def crash_fold(*a, **k):
        raise RuntimeError("injected crash after commit marker")

    monkeypatch.setattr(w, "_merge_manifest_delta", crash_fold)
    with pytest.raises(RuntimeError, match="injected"):
        append_corpus_txn(
            _docs_v2(spark, 10, 20), out, 1, evolve_schema=True
        )
    monkeypatch.setattr(w, "_merge_manifest_delta", orig)
    assert "quality" not in (_schema_fields(out) or {})  # fold never ran

    res = recover_staging(spark, out)
    assert "batch_id=1" in res["cleaned"]
    assert "quality" in _schema_fields(out)
    # and the maintenance rewrite keeps the column
    compact_corpus(spark, out)
    got = read_corpus(spark, out)
    assert "quality" in got.columns and got.count() == 20


def test_write_corpus_records_schema(spark, tmp_path):
    out = str(tmp_path / "c")
    write_corpus(_docs(spark, 0, 10), out)
    fields = _schema_fields(out)
    assert fields == {
        "doc_id": "long",
        "lang": "string",
        "source": "string",
        "text": "string",
    }
    # read_corpus takes the recorded schema — typed partition column even
    # with no caller-supplied schema
    got = read_corpus(spark, out)
    assert dict(got.dtypes)["lang"] == "string"
    assert got.count() == 10


def test_streaming_sink_evolution(spark, tmp_path):
    """A second streaming run whose source grew a column reaches the
    corpus with it (ingest_documents passes extras through; the sink
    threads evolve_schema); history reads back NULL for the new column
    and the ledger still dedups the overlap."""
    from bambooai_spark.io import load_table
    from bambooai_spark.streaming.documents import ingest_documents
    from bambooai_spark.streaming.documents import stream_ingest_to_corpus
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    v1 = docs.filter("doc_id < 40")
    v2 = docs.filter("doc_id >= 20 AND doc_id < 60").withColumn(
        "quality", (F.col("doc_id") % 7).cast("double") / 10
    )  # 20-39 overlap → ledger-deduped
    # expected counts by DISTINCT fingerprint (the testdata holds exact
    # dups; the ledger collapses them regardless of which run they ride)
    n_v1 = (
        ingest_documents(v1).filter("keep").select("fp").distinct().count()
    )
    n_all = (
        ingest_documents(docs.filter("doc_id < 60"))
        .filter("keep")
        .select("fp")
        .distinct()
        .count()
    )
    src = str(tmp_path / "parts")
    out = str(tmp_path / "corpus")
    v1.coalesce(1).write.parquet(src)

    def stream(schema):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    assert (
        stream_ingest_to_corpus(
            stream(v1.schema), out,
            checkpoint_location=str(tmp_path / "ck1"),
        )
        is not None
    )

    # the source grew a column; new lineage, evolved sink
    v2.coalesce(1).write.mode("append").parquet(src)
    stream_ingest_to_corpus(
        stream(v2.schema), out,
        checkpoint_location=str(tmp_path / "ck2"),
        evolve_schema=True,
    )
    got = read_corpus(spark, out)
    assert got.count() == n_all
    assert "quality" in got.columns
    assert got.filter(F.col("quality").isNull()).count() == n_v1
    assert "quality" in _schema_fields(out)


def test_legacy_manifest_without_schema(spark, tmp_path):
    out = str(tmp_path / "c")
    append_corpus(_docs(spark, 0, 10), out)
    # simulate a legacy manifest: strip the schema + columns entries
    # (drop the Hadoop .crc sidecar too — the local FS verifies it)
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
    # evolve on a legacy corpus: columns-only check, then the manifest
    # records the unified schema going forward
    append_corpus(_docs_v2(spark, 10, 20), out, evolve_schema=True)
    assert "quality" in _schema_fields(out)
    got = read_corpus(spark, out)
    assert got.count() == 20 and "quality" in got.columns


def test_write_corpus_append_preserves_manifest_protocol(spark, tmp_path):
    """write_corpus(mode="append") on an evolved txn corpus must carry
    forward the unified schema, the txn replay window and the maintenance
    floor instead of rewriting the manifest from the batch alone — the
    batch-only rewrite made the next schema-pinned compaction drop the
    evolved column from every file (ADVICE r8)."""
    out = str(tmp_path / "c")
    append_corpus_txn(_docs(spark, 0, 10), out, 0)
    append_corpus_txn(
        _docs_v2(spark, 10, 20), out, 1, evolve_schema=True
    )
    before = _manifest(out)
    assert "quality" in _schema_fields(out)
    assert before.get("committed_batches")

    # legacy-path append with the ORIGINAL (pre-evolution) columns
    write_corpus(_docs(spark, 20, 30), out, mode="append")
    man = _manifest(out)
    assert "quality" in {f["name"] for f in man["schema"]["fields"]}
    assert "quality" in man["columns"]
    assert man.get("committed_batches") == before.get("committed_batches")

    # the next schema-pinned compaction keeps the evolved column AND data
    compact_corpus(spark, out)
    got = read_corpus(spark, out)
    assert "quality" in got.columns
    assert got.count() == 30
    assert got.filter(F.col("quality").isNotNull()).count() == 10

    # the maintenance floor survives a later legacy append too
    floor = _manifest(out).get("as_of_floor")
    assert floor is not None
    write_corpus(_docs(spark, 30, 40), out, mode="append")
    assert _manifest(out).get("as_of_floor") == floor
    assert read_corpus(spark, out).count() == 40
