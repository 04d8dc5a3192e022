"""One end-to-end pipeline across the LLM-data-pipeline modules:

    raw documents
      -> lease-held, near-dup-GATED transactional corpus ingest
      -> takedown (delete_from_corpus)
      -> maintenance advisor + deep fsck
      -> embed (Arrow-batched) -> persisted IVF vector store
      -> batch ANN query
      -> deterministic JSONL export

Each module is unit-tested in its own file; this test pins the
INTEGRATION contracts — the artifacts one stage writes are exactly what
the next stage reads, with the lease held across the writing stages.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from bambooai_spark.io import load_table
from bambooai_spark.operators.embed import embed_texts
from bambooai_spark.operators.export import export_jsonl_shards
from bambooai_spark.operators.lease import corpus_lease
from bambooai_spark.operators.maintenance import suggest_maintenance
from bambooai_spark.operators.vector_store import (
    query_vector_corpus_many,
    write_vector_corpus,
)
from bambooai_spark.operators.writer import (
    append_corpus_txn,
    delete_from_corpus,
    read_corpus,
    validate_corpus,
)
from tests.conftest import SF_DIR

GATE = {"near_dup_threshold": 0.8,
        "near_dup_opts": {"num_hashes": 64, "bands": 16}}


def test_pipeline_end_to_end(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    corpus = str(tmp_path / "corpus")

    with corpus_lease(spark, corpus) as lease:
        # two micro-batch-style gated txn appends; batch 2 carries
        # perturbed twins of batch 1 that the GATE (not exact dedup)
        # must drop
        b1 = docs.filter("doc_id % 2 = 0")
        append_corpus_txn(b1, corpus, 1, lease=lease, **GATE)
        twins = b1.filter("doc_id < 20").withColumn(
            "doc_id", (F.col("doc_id") + 100000).cast("long")
        ).withColumn("text", F.concat("text", F.lit(" tail")))
        b2 = docs.filter("doc_id % 2 = 1").unionByName(twins)
        append_corpus_txn(b2, corpus, 2, lease=lease, **GATE)

        stored = read_corpus(spark, corpus)
        assert stored.filter("doc_id >= 100000").count() == 0
        n_after_ingest = stored.count()
        assert n_after_ingest > 0

        # takedown a slice; the rows leave data, ledger, and (via
        # liveness) the signature store's effect
        delete_from_corpus(
            spark, corpus, F.col("doc_id") % 10 == 0, lease=lease
        )
    n_live = read_corpus(spark, corpus).count()
    assert n_live < n_after_ingest
    assert read_corpus(spark, corpus).filter(
        "doc_id % 10 = 0"
    ).count() == 0

    # advisor: consistent state, and the deep fsck agrees
    advice = {r["check"]: r for r in suggest_maintenance(
        spark, corpus, small_file_rows=1
    ).collect()}
    assert not [r for r in advice.values() if r["severity"] == "action"]
    fsck = validate_corpus(spark, corpus, deep=True)
    assert all(r["ok"] for r in fsck.collect()), fsck.collect()

    # embed the LIVE corpus text and persist the vector store
    live = read_corpus(spark, corpus)
    emb = embed_texts(live, "text", dim=32, id_cols=["doc_id"])
    vstore = str(tmp_path / "vstore")
    write_vector_corpus(
        emb, vstore, id_col="doc_id", vec_col="embedding", n_cells=4
    )
    n_vecs = spark.read.parquet(vstore).count()
    assert n_vecs == n_live  # one vector per live doc, none for deleted

    # batch ANN: each stored doc's embedding must retrieve ITSELF at
    # cosine 1 with a full probe
    queries = (
        spark.read.parquet(vstore)
        .limit(5)
        .select(
            F.col("doc_id").alias("qid"),
            F.col("embedding").cast("array<double>").alias("qvec"),
        )
    )
    hits = query_vector_corpus_many(
        spark, vstore, queries, k=1, nprobe=4
    ).collect()
    assert len(hits) == 5
    for r in hits:
        assert r["qid"] == r["doc_id"] and r["cosine"] == 1.0, r

    # export the live corpus; the shards must reproduce the exact row
    # set (the export manifest's row count is the contract)
    out = str(tmp_path / "export")
    manifest = export_jsonl_shards(live, out, "doc_id", n_shards=4)
    assert manifest["total_rows"] == n_live
    back = []
    for shard_dir in sorted(os.listdir(out)):
        if not shard_dir.startswith("shard="):
            continue
        for f in sorted(os.listdir(os.path.join(out, shard_dir))):
            if f.startswith(("_", ".")):
                continue
            with open(os.path.join(out, shard_dir, f)) as fh:
                back.extend(json.loads(ln) for ln in fh if ln.strip())
    assert sorted(r["doc_id"] for r in back) == sorted(
        r["doc_id"] for r in live.select("doc_id").collect()
    )
