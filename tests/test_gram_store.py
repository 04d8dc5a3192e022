"""Boilerplate gram store: build/read/refresh lifecycle and the
span-grain ingest gate (ExactSubstr against the EXISTING corpus)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

BOILER = "COMMON LICENSE HEADER abcdefghijklmnopqrstuvwxyz END OF HEADER"


def _corpus(spark):
    import hashlib

    rows = []
    for i in range(12):
        body = " ".join(
            hashlib.md5(f"c-{i}-{t}".encode()).hexdigest()[:8]
            for t in range(10)
        )
        # docs 0-5 carry the boiler block: it IS corpus boilerplate
        rows.append((i, (BOILER + " " if i < 6 else "") + body))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_build_read_and_gate(spark, tmp_path):
    from bambooai_spark.operators.gram_store import (
        boilerplate_cut,
        build_gram_store,
        duplicated_grams,
        read_gram_store,
    )

    corpus = _corpus(spark)
    store = str(tmp_path / "gstore")
    meta = build_gram_store(corpus, "text", store, k=25, min_count=2)
    assert meta["k"] == 25 and meta["n_grams"] > 0
    grams, meta2 = read_gram_store(spark, store, k=25)
    assert grams.count() == meta["n_grams"] == meta2["n_grams"]
    # store == the duplicated-gram relation
    assert grams.count() == duplicated_grams(
        corpus, "text", k=25, min_count=2
    ).count()
    with pytest.raises(ValueError, match="k=25"):
        read_gram_store(spark, store, k=13)
    with pytest.raises(FileNotFoundError):
        read_gram_store(spark, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="min_count"):
        duplicated_grams(corpus, "text", min_count=1)

    # the gate: incoming docs lose the known boiler, keep their body,
    # and a boiler-free doc passes byte-identical
    import hashlib

    body100 = " ".join(
        hashlib.md5(f"n-100-{t}".encode()).hexdigest()[:8]
        for t in range(10)
    )
    body101 = " ".join(
        hashlib.md5(f"n-101-{t}".encode()).hexdigest()[:8]
        for t in range(10)
    )
    incoming = spark.createDataFrame(
        [(100, BOILER + " " + body100), (101, body101)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in boilerplate_cut(
            incoming, "doc_id", "text", store
        ).collect()
    }
    assert BOILER not in got[100]
    assert body100[9:] in got[100]
    assert got[101] == body101  # untouched, byte-identical
    # the gate's semi-join is NOT broadcast-hinted (corpus-scale side)
    from bambooai_spark.operators.gram_store import boilerplate_spans

    plan = (
        boilerplate_spans(incoming, "doc_id", "text", store)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "ResolvedHint" not in plan


def test_refresh_picks_up_new_boilerplate(spark, tmp_path):
    from bambooai_spark.operators.gram_store import (
        boilerplate_cut,
        build_gram_store,
        read_gram_store,
        refresh_gram_store,
    )
    from bambooai_spark.operators.writer import append_corpus

    new_boiler = "FRESH NAVBAR BLOCK 0123456789 zyxwvutsrqponmlkjihgfedcba"
    corpus_path = str(tmp_path / "corpus")
    docs0 = _corpus(spark).withColumn("lang", F.lit("en"))
    append_corpus(docs0, corpus_path, partition_by=("lang",))
    store = str(tmp_path / "gstore")
    build_gram_store(
        spark.read.parquet(corpus_path), "text", store, k=25, min_count=2
    )
    probe = spark.createDataFrame(
        [(900, new_boiler + " plus unique tail content here")],
        "doc_id long, text string",
    )
    # the new boiler is not yet corpus boilerplate: passes the gate
    got = boilerplate_cut(probe, "doc_id", "text", store).first()
    assert new_boiler in got["clean_text"]
    # two copies of it land in the corpus; refresh learns it
    import hashlib

    extra = spark.createDataFrame(
        [
            (
                200 + i,
                "en",
                new_boiler
                + " "
                + hashlib.md5(f"e{i}".encode()).hexdigest(),
            )
            for i in range(2)
        ],
        "doc_id long, lang string, text string",
    )
    append_corpus(extra, corpus_path, partition_by=("lang",))
    meta = refresh_gram_store(spark, corpus_path, store)
    assert meta["version"] == 2
    _grams, meta_r = read_gram_store(spark, store)
    assert meta_r["version"] == 2
    got2 = boilerplate_cut(probe, "doc_id", "text", store).first()
    assert new_boiler not in got2["clean_text"]
    assert "unique tail content here" in got2["clean_text"]


def test_stream_ingest_with_boilerplate_store(spark, tmp_path):
    """The streaming gate with a store: known corpus boilerplate is cut
    from every micro-batch; combined with a benchmark both screens ride
    one splice pass."""
    import hashlib

    from bambooai_spark.operators.gram_store import build_gram_store
    from bambooai_spark.streaming.documents import stream_ingest_to_corpus

    corpus = _corpus(spark)
    store = str(tmp_path / "gstore")
    build_gram_store(corpus, "text", store, k=25, min_count=2)
    bench_block = (
        "THE BENCHMARK QUESTION BLOCK APPEARS VERBATIM RIGHT HERE OK "
    )
    bench = spark.createDataFrame([(bench_block,)], "text string")

    def body(i):
        return " the ".join(
            hashlib.md5(f"s-{i}-{t}".encode()).hexdigest()[:8]
            for t in range(14)
        ) + " and it is of a document"

    rows = [
        # doc 0 leaks the corpus boiler, doc 1 the benchmark, doc 2 clean
        (0, "en", "web", BOILER + " " + body(0)),
        (1, "en", "web", bench_block + body(1)),
        (2, "en", "web", body(2)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    src = str(tmp_path / "parts")
    docs.coalesce(1).write.parquet(src)
    sdf = spark.readStream.schema(docs.schema).parquet(src)
    out = str(tmp_path / "corpus_out")
    manifest = stream_ingest_to_corpus(
        sdf, out, benchmark=bench, boilerplate_store=store
    )
    assert manifest is not None
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert len(got) == 3
    assert BOILER not in got[0] and body(0)[9:] in got[0]
    assert bench_block not in got[1] and body(1)[9:] in got[1]
    assert got[2].startswith(body(2)[:40])


def test_maintenance_advises_and_refreshes_gram_store(spark, tmp_path):
    """The ops loop: the advisor keys gram-store staleness on manifest
    rows vs the store meta's n_rows; auto_maintain executes the refresh
    (policy-free) but only REPORTS a missing store (build is policy)."""
    import hashlib

    from bambooai_spark.operators.gram_store import (
        build_gram_store,
        read_gram_store,
    )
    from bambooai_spark.operators.maintenance import (
        auto_maintain,
        suggest_maintenance,
    )
    from bambooai_spark.operators.writer import append_corpus

    corpus = str(tmp_path / "corpus")
    docs = _corpus(spark).withColumn("lang", F.lit("en"))
    append_corpus(docs, corpus, partition_by=("lang",))
    store = str(tmp_path / "gstore")

    # missing store: advisor flags a build; auto_maintain reports only
    adv = {
        r["check"]: r
        for r in suggest_maintenance(
            spark, corpus, gram_store_path=store
        ).collect()
    }
    assert adv["gram_store"]["severity"] == "action"
    assert "build_gram_store" in adv["gram_store"]["recommendation"]
    plan = {
        r["action"]: r
        for r in auto_maintain(
            spark, corpus, gram_store_path=store
        ).collect()
    }
    assert plan["build_gram_store"]["executed"] is False

    # fresh store: ok
    build_gram_store(
        spark.read.parquet(corpus), "text", store, k=25, min_count=2
    )
    adv = {
        r["check"]: r
        for r in suggest_maintenance(
            spark, corpus, gram_store_path=store
        ).collect()
    }
    assert adv["gram_store"]["severity"] == "ok"

    # grow the corpus 50%: advisor flags drift, auto_maintain refreshes
    extra = spark.createDataFrame(
        [(500 + i, "en",
          "NEW BOILER BLOCK qwertyuiopasdfghjklzxcvbnm END "
          + hashlib.md5(f"x{i}".encode()).hexdigest())
         for i in range(6)],
        "doc_id long, lang string, text string",
    )
    append_corpus(extra, corpus, partition_by=("lang",))
    adv = {
        r["check"]: r
        for r in suggest_maintenance(
            spark, corpus, gram_store_path=store
        ).collect()
    }
    assert adv["gram_store"]["severity"] == "action"
    assert "refresh_gram_store" in adv["gram_store"]["recommendation"]
    plan = {
        r["action"]: r
        for r in auto_maintain(
            spark, corpus, gram_store_path=store
        ).collect()
    }
    assert plan["refresh_gram_store"]["executed"] is True
    _g, meta = read_gram_store(spark, store)
    assert meta["version"] == 2 and meta["n_rows"] == 18
    # and the loop converges: next advice is ok
    adv = {
        r["check"]: r
        for r in suggest_maintenance(
            spark, corpus, gram_store_path=store
        ).collect()
    }
    assert adv["gram_store"]["severity"] == "ok"
    # dry_run never executes
    plan = {
        r["action"]: r
        for r in auto_maintain(
            spark, corpus, gram_store_path=store, dry_run=True
        ).collect()
    }
    assert all(not r["executed"] for r in plan.values())
