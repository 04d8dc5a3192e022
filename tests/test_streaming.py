"""Streaming surface tests (SURVEY M5): each streaming operator must agree
with its batch twin when the stream is drained with availableNow — Spark's
unified semantics make this an exact equality, not an approximation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bambooai_spark.io import load_table
from bambooai_spark.streaming import (
    read_events_stream,
    stream_dedup_events,
    stream_hourly_events,
    stream_session_windows,
)
from tests.conftest import SF_DIR


def _drain(spark, sdf, name, mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_stream_source_schema_and_ns_conversion(spark):
    sdf = read_events_stream(spark, SF_DIR)
    assert sdf.isStreaming
    assert dict(sdf.dtypes)["ts"] == "timestamp"


def test_stream_hourly_matches_batch(spark):
    sdf = read_events_stream(spark, SF_DIR)
    got = _drain(spark, stream_hourly_events(sdf), "hourly_mem", "complete")
    batch = load_table(spark, SF_DIR, "events")
    want = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.unix_micros("w.start").alias("hour_start_us"), "event_type", "n_events")
    )
    g = {(r.hour_start_us, r.event_type): r.n_events for r in got.collect()}
    w = {(r.hour_start_us, r.event_type): r.n_events for r in want.collect()}
    assert g == w and len(g) > 0


def test_stream_sessions_bounded_and_sane(spark):
    sdf = read_events_stream(spark, SF_DIR)
    got = _drain(
        spark, stream_session_windows(sdf, gap="6 hours"), "sess_mem", "complete"
    )
    rows = got.collect()
    assert len(rows) > 0
    # session count per user matches the batch gap-sessionizer's count
    from bambooai_spark.functions.timeseries import sessionize

    batch = load_table(spark, SF_DIR, "events")
    b = sessionize(batch, "ts", "user_id", 21600, order_tiebreak="event_id")
    want = (
        b.groupBy("user_id")
        .agg(F.count_distinct("session_id").alias("n"))
        .collect()
    )
    want_map = {r.user_id: r.n for r in want}
    got_map = {}
    for r in rows:
        got_map[r.user_id] = got_map.get(r.user_id, 0) + 1
    assert got_map == want_map


def test_stream_dedup_drops_within_watermark(spark):
    sdf = read_events_stream(spark, SF_DIR)
    # events are unique by event_id, so dedup must preserve the row count
    got = _drain(spark, stream_dedup_events(sdf), "dedup_mem", "append")
    assert got.count() == load_table(spark, SF_DIR, "events").count()


def test_stream_running_totals_matches_batch(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: split the
    events table into 4 files, stream one file per trigger, and the FINAL
    update per user must equal the batch groupBy — exactly (integer-cents
    state, order-independent)."""
    from bambooai_spark.streaming.events import stream_running_totals

    batch = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev_parts")
    batch.repartition(4).write.parquet(src)

    sdf = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    final = {}

    def sink(bdf, bid):
        for r in bdf.collect():  # update mode: last write per user wins
            final[r.user_id] = (r.n_events, r.total_value)

    q = (
        stream_running_totals(sdf)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    want = {
        r.user_id: (r.n, round(r.v, 2))
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round("value", 2)).alias("v"),
        )
        .collect()
    }
    got = {u: (n, round(v, 2)) for u, (n, v) in final.items()}
    assert got == want and len(got) > 0


def test_stream_interval_join_matches_batch(spark):
    from bambooai_spark.streaming import read_events_stream, stream_interval_join

    p = read_events_stream(spark, SF_DIR).filter(
        F.col("event_type") == "purchase"
    )
    e = read_events_stream(spark, SF_DIR)
    joined = stream_interval_join(p, e, window_seconds=1800, watermark="1 hour")
    got = _drain(spark, joined, "ivjoin_mem", "append")
    g = (
        got.groupBy("interval_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    g = {r.interval_id: r.n for r in g}
    # batch twin: the range_count_events pairing
    batch = load_table(spark, SF_DIR, "events")
    b = batch.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("iid"), F.col("ts").alias("pts")
    )
    w = {
        r.iid: r.n
        for r in b.join(
            batch,
            (batch.ts >= F.col("pts"))
            & (batch.ts < F.col("pts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy("iid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert g == w and len(g) > 0


def test_stream_upsert_matches_batch_merge(spark, tmp_path):
    """foreachBatch streaming MERGE: a drained stream of record files folds
    into the same post-merge table as the batch upsert applied in file
    order (records crafted mutually dissimilar so fold order can't
    matter), with the rank gate enforced."""
    from bambooai_spark.operators.memory import upsert_with_dedup
    from bambooai_spark.streaming.memory import stream_upsert

    def rec(i, rank, hot):
        # near-one-hot vectors — pairwise cosine ~0 (below any threshold)
        v = [0.0] * 8
        v[hot] = 1.0
        return (i, v, rank)

    schema = "record_id LONG, embedding ARRAY<FLOAT>, rank INT"
    initial = spark.createDataFrame([rec(0, 7, 0)], schema)
    batch1 = [rec(1, 9, 1), rec(2, 3, 2)]   # rank 3 → gated out
    batch2 = [rec(3, 8, 3), rec(4, 10, 4)]
    d = tmp_path / "mem_stream"
    d.mkdir()
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(d / "b1.parquet")
    )
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        str(d / "b2.parquet")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*/")
    )
    got = stream_upsert(
        stream, initial, id_col="record_id", vec_col="embedding",
        rank_col="rank",
    )
    want = upsert_with_dedup(
        initial,
        spark.createDataFrame(batch1 + batch2, schema),
        id_col="record_id", vec_col="embedding", rank_col="rank",
    )
    assert {r["record_id"] for r in got.collect()} == {
        r["record_id"] for r in want.collect()
    } == {0, 1, 3, 4}


def test_stream_ingest_documents_matches_batch(spark):
    """The document ingest pipeline (quality gate + PII scrub +
    fingerprint) drained with availableNow equals the batch projection
    row-for-row — stateless stages under unified semantics."""
    from bambooai_spark.streaming.documents import (
        ingest_documents,
        read_documents_stream,
        stream_ingest_documents,
    )

    sdf = read_documents_stream(spark, SF_DIR)
    assert sdf.isStreaming
    got = _drain(
        spark, stream_ingest_documents(sdf), "docs_ingest", "append"
    )
    want = ingest_documents(load_table(spark, SF_DIR, "documents"))
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(w) == want.count()
    # the gate actually splits the corpus and the scrub leaves no raw PII
    kept = want.filter("keep").count()
    assert 0 < kept
    assert want.filter(F.col("text").rlike(r"[\w.+-]+@[\w-]+")).count() == 0


def test_stream_sliding_matches_batch(spark):
    """Sliding 1h/15min windows drained availableNow equal the batch
    sliding-window aggregation (4 overlapping windows per event)."""
    from bambooai_spark.streaming import stream_sliding_events

    sdf = read_events_stream(spark, SF_DIR)
    got = _drain(
        spark, stream_sliding_events(sdf), "sliding_mem", "complete"
    )
    batch = load_table(spark, SF_DIR, "events")
    want = (
        batch.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros("w.start").alias("win_start_us"),
            "event_type",
            "n_events",
        )
    )
    g = {(r.win_start_us, r.event_type): r.n_events for r in got.collect()}
    w = {(r.win_start_us, r.event_type): r.n_events for r in want.collect()}
    assert g == w and len(g) > 0
    # every event contributes to window/slide = 4 windows
    assert sum(g.values()) == 4 * batch.count()


def test_stream_ingest_to_corpus_idempotent_ledger_and_manifest(spark, tmp_path):
    """Two overlapping micro-batches through the full streaming pipeline
    (ingest → gate → scrub → ledger dedup → corpus append): cross-batch
    duplicate texts die on the fingerprint ledger, the corpus holds each
    surviving text exactly once, and the delta-merged manifest row counts
    equal the stored partition counts."""
    import json
    import os

    from bambooai_spark.streaming.documents import (
        ingest_documents,
        stream_ingest_to_corpus,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    # batch 1: docs 0-39; batch 2: docs 20-59 re-sent under NEW ids (the
    # replayed 20-39 must dedup against batch 1 via the ledger)
    src = str(tmp_path / "doc_parts")
    b1 = docs.filter("doc_id < 40")
    b2 = docs.filter("doc_id >= 20 AND doc_id < 60").withColumn(
        "doc_id", F.col("doc_id") + 100_000
    )
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    sdf = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "corpus")
    manifest = stream_ingest_to_corpus(sdf, out)
    assert manifest is not None

    stored = spark.read.parquet(out)
    # every stored text is unique (ledger dedup held across batches) and
    # no replayed duplicate survived
    assert stored.count() == stored.select("text").distinct().count()
    want = (
        ingest_documents(docs.filter("doc_id < 60"))
        .filter("keep")
        .select("text")
        .distinct()
        .count()
    )
    assert stored.count() == want
    # no replayed duplicate (original ids 20-39, re-sent as 100020-100039)
    # survived the ledger; batch-2 survivors are only the new texts 40-59
    assert stored.filter("doc_id >= 100020 AND doc_id < 100040").count() == 0

    # manifest delta rows match the actual stored partitions
    with open(os.path.join(out, "_corpus_manifest.json")) as fh:
        parts = {
            p["lang"]: p["n_rows"]
            for p in json.load(fh)["partitions"]
        }
    got_parts = {
        r["lang"]: r["n"]
        for r in stored.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert parts == got_parts


def test_continuous_trigger_returns_live_query_handles(spark, tmp_path):
    """available_now=False must hand back the live StreamingQuery for
    every sink (trigger(availableNow=False) is a pyspark ValueError, and
    awaiting a continuous query blocks forever) — the pattern fixed for
    stream_ingest_to_corpus applies to the memory-table and upsert sinks
    too."""
    from bambooai_spark.streaming.events import run_to_memory
    from bambooai_spark.streaming.memory import stream_upsert

    ev = load_table(spark, SF_DIR, "events").select("user_id", "value")
    src = str(tmp_path / "cont_src")
    ev.limit(50).coalesce(1).write.parquet(src)
    sdf = spark.readStream.schema(ev.schema).parquet(src)

    q = run_to_memory(sdf, "cont_probe", available_now=False)
    try:
        assert q.isActive
    finally:
        q.stop()

    init = spark.createDataFrame(
        [(1, [1.0, 0.0], 7)], "record_id long, v array<double>, rank long"
    )
    q2 = stream_upsert(
        spark.readStream.schema(ev.schema).parquet(src).selectExpr(
            "user_id AS record_id", "array(value, 0.0) AS v",
            "CAST(8 AS LONG) AS rank"
        ),
        init,
        id_col="record_id",
        vec_col="v",
        rank_col="rank",
        available_now=False,
    )
    try:
        assert hasattr(q2, "isActive") and q2.isActive
    finally:
        q2.stop()


def test_stream_enrich_matches_batch(spark):
    """Stream-static enrichment: the drained stream-side join equals the
    batch join exactly, including unmatched-row passthrough (left)."""
    from bambooai_spark.streaming.events import stream_enrich

    batch = load_table(spark, SF_DIR, "events")
    dim = (
        batch.select("event_type").distinct()
        .filter(F.col("event_type") != "view")  # leave some rows unmatched
        .withColumn("type_label", F.upper("event_type"))
    )
    sdf = read_events_stream(spark, SF_DIR)
    got = _drain(
        spark,
        stream_enrich(sdf, dim, "event_type").select(
            "event_id", "type_label"
        ),
        "enrich_mem",
        "append",
    )
    want = batch.join(F.broadcast(dim), "event_type", "left").select(
        "event_id", "type_label"
    )
    g = {(r.event_id, r.type_label) for r in got.collect()}
    w = {(r.event_id, r.type_label) for r in want.collect()}
    assert g == w and len(g) > 0
    assert any(lbl is None for _, lbl in g)  # unmatched rows passed through


def test_stream_ingest_decontaminates_against_benchmark(spark, tmp_path):
    """The streaming ingest gate with a benchmark: benchmark-verbatim
    spans are cut from every micro-batch BEFORE the quality gate, so the
    stored text, fingerprint, and token count all describe the kept
    text; uncontaminated documents and the batch-path twin
    (contamination_cut + ingest_documents) agree exactly."""
    import hashlib

    from bambooai_spark.operators.dedup import contamination_cut
    from bambooai_spark.streaming.documents import (
        ingest_documents,
        stream_ingest_to_corpus,
    )

    boiler = (
        "THE HELD OUT BENCHMARK QUESTION AND ITS ANSWER TEXT APPEARS "
        "HERE VERBATIM AS A CONTIGUOUS BLOCK "
    )

    def body(i):
        # hash tokens interleaved with stopwords: unique from the first
        # character (so only the boiler region is contaminated) while
        # still passing the ingest gate's common-word check
        return " the ".join(
            hashlib.md5(f"s-{i}-{t}".encode()).hexdigest()[:8]
            for t in range(14)
        ) + " and it is of a document"

    rows = [
        # docs 0-3 leak the benchmark block; 4-7 are clean
        (i, "en", "web", (boiler if i < 4 else "") + body(i))
        for i in range(8)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    bench = spark.createDataFrame([(boiler,)], "text string")

    src = str(tmp_path / "parts")
    docs.filter("doc_id < 4").coalesce(1).write.parquet(src)
    docs.filter("doc_id >= 4").coalesce(1).write.mode("append").parquet(src)
    sdf = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "corpus")
    manifest = stream_ingest_to_corpus(sdf, out, benchmark=bench)
    assert manifest is not None

    stored = spark.read.parquet(out)
    got = {r["doc_id"]: r for r in stored.collect()}
    assert len(got) == 8
    for i in range(8):
        assert boiler not in got[i]["text"] or i >= 4
        assert body(i)[9:] in got[i]["text"]  # bodies intact
    # no stored text contains the benchmark block at all
    assert stored.filter(
        F.col("text").contains("BENCHMARK QUESTION")
    ).count() == 0
    # batch-path twin: cut-then-ingest over the full input produces the
    # same stored text + fingerprint + token count per doc
    want = {
        r["doc_id"]: r
        for r in ingest_documents(
            contamination_cut(docs, "doc_id", "text", bench, k=25)
            .withColumn("text", F.col("clean_text"))
            .drop("clean_text")
        )
        .filter(F.col("keep"))
        .collect()
    }
    assert set(got) == set(want)
    for i in got:
        assert got[i]["text"] == want[i]["text"], i
        assert got[i]["fp"] == want[i]["fp"], i
        assert got[i]["n_words"] == want[i]["n_words"], i


def test_stream_ingest_gram_cache_lifecycle(spark, tmp_path, monkeypatch):
    """The benchmark gram cache must not leak (ADVICE r10): a start()
    that raises unpersists it, and a continuous query exposes it as
    bench_grams on the returned handle for caller teardown."""
    import pyspark.sql.streaming as pss

    from bambooai_spark.streaming.documents import stream_ingest_to_corpus

    docs = spark.createDataFrame(
        [(0, "en", "web", "some document text here that is long enough")],
        "doc_id long, lang string, source string, text string",
    )
    src = str(tmp_path / "parts")
    docs.write.parquet(src)
    bench = spark.createDataFrame([("BENCH BLOCK " * 5,)], "text string")

    def n_cached():
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getRDDStorageInfo()
        return len([x for x in it])

    # (1) start() raises -> no cached relation survives
    before = n_cached()
    sdf = spark.readStream.schema(docs.schema).parquet(src)

    def boom(self, *a, **kw):
        raise RuntimeError("injected start failure")

    monkeypatch.setattr(pss.DataStreamWriter, "start", boom)
    with pytest.raises(RuntimeError, match="injected start"):
        stream_ingest_to_corpus(
            sdf, str(tmp_path / "c1"), benchmark=bench,
            available_now=False,
        )
    monkeypatch.undo()
    assert n_cached() == before

    # (2) continuous query returns the handle with bench_grams attached
    sdf2 = spark.readStream.schema(docs.schema).parquet(src)
    q = stream_ingest_to_corpus(
        sdf2, str(tmp_path / "c2"), benchmark=bench, available_now=False,
    )
    try:
        assert q.bench_grams is not None
        assert q.bench_grams.is_cached
    finally:
        q.stop()
        q.bench_grams.unpersist()
    assert n_cached() == before
