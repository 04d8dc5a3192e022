"""Sharded JSONL export: round-trip fidelity, permutation determinism,
byte-determinism of shard files, one-file-per-shard invariant, gzip
variant, manifest correctness, and error paths."""

from __future__ import annotations

import glob
import gzip
import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from bambooai_spark.io import load_table
from bambooai_spark.operators.export import (
    MANIFEST_NAME,
    export_jsonl_shards,
)
from bambooai_spark.operators.shuffle import shuffle_shards
from tests.conftest import SF_DIR

N_SHARDS = 4


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def _read_lines(path: str) -> list[str]:
    if path.endswith(".gz"):
        with gzip.open(path, "rt") as fh:
            return fh.read().splitlines()
    with open(path) as fh:
        return fh.read().splitlines()


def _shard_files(out: str) -> dict[int, str]:
    files = {}
    for d in glob.glob(os.path.join(out, "shard=*")):
        shard = int(os.path.basename(d).split("=")[1])
        data = [
            f
            for f in os.listdir(d)
            if not f.startswith(("_", ".")) and not f.endswith(".crc")
        ]
        assert len(data) == 1, f"shard {shard}: {data}"
        files[shard] = os.path.join(d, data[0])
    return files


def test_roundtrip_and_permutation(spark, tmp_path):
    out = str(tmp_path / "exp")
    docs = _docs(spark)
    manifest = export_jsonl_shards(
        docs, out, "doc_id", n_shards=N_SHARDS, seed="s1"
    )
    files = _shard_files(out)
    assert set(files) == set(range(N_SHARDS))

    # line order inside each shard == the shuffle_shards permutation
    want = {
        (r["shard"], r["pos"]): r["doc_id"]
        for r in shuffle_shards(docs, "doc_id", n_shards=N_SHARDS, seed="s1")
        .select("shard", "pos", "doc_id")
        .collect()
    }
    got_rows = 0
    for shard, path in files.items():
        for i, line in enumerate(_read_lines(path), start=1):
            rec = json.loads(line)
            assert rec["doc_id"] == want[(shard, i)]
            assert set(rec) == {
                "doc_id",
                "text",
                "lang",
                "source",
                "n_chars",
            }  # no bookkeeping columns, no partition column
            got_rows += 1
    assert got_rows == docs.count() == manifest["total_rows"]

    # manifest agrees with the files on disk
    assert manifest["n_shards"] == N_SHARDS
    assert manifest["seed"] == "s1"
    on_disk = json.loads(open(os.path.join(out, MANIFEST_NAME)).read())
    assert on_disk == manifest
    for entry in manifest["shards"]:
        path = os.path.join(out, entry["file"])
        assert entry["rows"] == len(_read_lines(path))
        assert entry["bytes"] == os.path.getsize(path)


def test_byte_determinism(spark, tmp_path):
    docs = _docs(spark)
    digests = []
    for run in ("a", "b"):
        out = str(tmp_path / run)
        export_jsonl_shards(docs, out, "doc_id", n_shards=N_SHARDS, seed="s")
        digests.append(
            {
                shard: hashlib.md5(open(p, "rb").read()).hexdigest()
                for shard, p in _shard_files(out).items()
            }
        )
    assert digests[0] == digests[1]


def test_gzip_and_keep_pos(spark, tmp_path):
    out = str(tmp_path / "gz")
    docs = _docs(spark).select("doc_id", "lang")
    manifest = export_jsonl_shards(
        docs,
        out,
        "doc_id",
        n_shards=2,
        compression="gzip",
        keep_pos=True,
    )
    assert manifest["compression"] == "gzip"
    files = _shard_files(out)
    assert all(p.endswith(".gz") for p in files.values())
    for path in files.values():
        lines = [json.loads(x) for x in _read_lines(path)]
        assert [r["pos"] for r in lines] == list(range(1, len(lines) + 1))
    assert manifest["total_rows"] == docs.count()


def test_empty_shard_recorded(spark, tmp_path):
    out = str(tmp_path / "tiny")
    docs = _docs(spark).limit(1)
    manifest = export_jsonl_shards(docs, out, "doc_id", n_shards=8)
    present = [s for s in manifest["shards"] if s["file"] is not None]
    absent = [s for s in manifest["shards"] if s["file"] is None]
    assert len(present) == 1 and present[0]["rows"] == 1
    assert len(absent) == 7
    assert all(s["rows"] == 0 and s["bytes"] == 0 for s in absent)


def test_null_id_detected(spark, tmp_path):
    out = str(tmp_path / "nulls")
    docs = _docs(spark).withColumn(
        "doc_id",
        F.when(F.col("doc_id") == 3, None).otherwise(F.col("doc_id")),
    )
    with pytest.raises(ValueError, match="NULL id"):
        export_jsonl_shards(docs, out, "doc_id", n_shards=2)


def test_null_fields_emitted(spark, tmp_path):
    """Every line carries the full key set — null values included (the
    evolved-corpus case where history is NULL for later columns)."""
    out = str(tmp_path / "nullable")
    docs = _docs(spark).withColumn(
        "quality",
        F.when(F.col("doc_id") % 2 == 0, F.col("n_chars") / 100.0),
    )
    export_jsonl_shards(docs, out, "doc_id", n_shards=2)
    for path in _shard_files(out).values():
        for line in _read_lines(path):
            assert "quality" in json.loads(line)


def test_single_exchange_plan(spark):
    """The export plan carries exactly ONE shuffle: the up-front hash
    repartition on the shard value satisfies the ranking window's
    required distribution."""
    docs = _docs(spark)
    sharded = shuffle_shards(docs, "doc_id", n_shards=4, num_partitions=4)
    plan = sharded.sortWithinPartitions("shard", "pos")._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_hidden_ancestor_ignored(spark, tmp_path):
    """Committer leftovers under a hidden dir (_temporary/.../shard=N/)
    must not count toward shards — only basename-level hiding did."""
    from bambooai_spark.operators.export import _build_manifest

    out = str(tmp_path / "exp")
    export_jsonl_shards(_docs(spark), out, "doc_id", n_shards=2)
    ghost = os.path.join(out, "_temporary", "0", "shard=1")
    os.makedirs(ghost)
    with open(os.path.join(ghost, "part-ghost.json"), "w") as fh:
        fh.write('{"doc_id": -1}\n')
    m = _build_manifest(spark, out, 2, "", None)
    assert m["total_rows"] == _docs(spark).count()  # ghost not counted


def test_error_paths(spark, tmp_path):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="n_shards"):
        export_jsonl_shards(docs, str(tmp_path / "x"), "doc_id", n_shards=0)
    with pytest.raises(ValueError, match="not in"):
        export_jsonl_shards(docs, str(tmp_path / "x"), "nope")
    with pytest.raises(ValueError, match="collides"):
        export_jsonl_shards(
            docs.withColumn("pos", docs.doc_id), str(tmp_path / "x"), "doc_id"
        )
    # mode("error"): refuses to clobber an existing export
    out = str(tmp_path / "once")
    export_jsonl_shards(docs.limit(5), out, "doc_id", n_shards=1)
    with pytest.raises(Exception):
        export_jsonl_shards(docs.limit(5), out, "doc_id", n_shards=1)
    # overwrite=True replaces the whole tree — a smaller re-export leaves
    # no stale shard dirs from the larger one
    export_jsonl_shards(docs.limit(20), out, "doc_id", n_shards=8,
                        overwrite=True)
    m = export_jsonl_shards(docs.limit(5), out, "doc_id", n_shards=1,
                            overwrite=True)
    assert m["total_rows"] == 5 and m["n_shards"] == 1
    assert not glob.glob(os.path.join(out, "shard=[1-9]*"))
