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


def test_count_bearing_store_and_first_occurrence(spark, tmp_path):
    """The relation carries per-gram counts (delta-merge unit) and, with
    id_col=, each gram's earliest (id, pos) — equal to the inline
    min(struct(id, pos)) of exact_substring_spans' keep_first path."""
    from pyspark.sql import functions as F

    from bambooai_spark.operators.gram_store import (
        build_gram_store,
        gram_counts,
        read_gram_store,
    )

    corpus = _corpus(spark)
    store = str(tmp_path / "gstore")
    meta = build_gram_store(
        corpus, "text", store, k=25, min_count=2, id_col="doc_id"
    )
    assert meta["text_col"] == "text" and meta["id_col"] == "doc_id"
    grams, _ = read_gram_store(spark, store, k=25)
    assert set(grams.columns) == {"gram", "cnt", "first"}
    rows = {r["gram"]: r for r in grams.collect()}
    # boiler grams occur in docs 0-5 (count 6), first occurrence doc 0
    g0 = BOILER[:25]
    assert rows[g0]["cnt"] == 6
    assert tuple(rows[g0]["first"]) == (0, 1)
    # counts/first match the unfiltered gram_counts relation
    raw = {
        r["gram"]: r
        for r in gram_counts(
            corpus, "text", k=25, id_col="doc_id"
        ).filter(F.col("cnt") >= 2).collect()
    }
    assert set(raw) == set(rows)
    for g in rows:
        assert rows[g]["cnt"] == raw[g]["cnt"]
        assert tuple(rows[g]["first"]) == tuple(raw[g]["first"])


def test_delta_refresh_matches_full_rebuild(spark, tmp_path):
    """delta_only=True counts ONLY the appended files and merges with
    stored counts: identical to a full rebuild on an append-only corpus,
    except the documented singleton+singleton lag (a gram once in the
    old corpus + once in the delta totals 2 in truth but was never
    stored) — tested explicitly. Files vanishing (compaction) falls back
    to the full rebuild; a no-delta refresh is a metadata no-op."""
    import hashlib

    from bambooai_spark.operators.gram_store import (
        build_gram_store,
        read_gram_store,
        refresh_gram_store,
    )
    from bambooai_spark.operators.writer import append_corpus, read_corpus

    new_boiler = "FRESH NAVBAR BLOCK 0123456789 zyxwvutsrqponmlkjihgfedcba"
    lag_block = "HALF OLD HALF NEW SINGLETON GRAM BLOCK ###############"

    def body(tag):
        return " ".join(
            hashlib.md5(f"{tag}-{t}".encode()).hexdigest()[:8]
            for t in range(10)
        )

    cp = str(tmp_path / "corpus")
    rows = [
        (
            i,
            "en",
            (BOILER + " " if i < 6 else "")
            + (lag_block + " " if i == 0 else "")
            + body(f"c{i}"),
        )
        for i in range(12)
    ]
    append_corpus(
        spark.createDataFrame(rows, "doc_id long, lang string, text string"),
        cp,
        partition_by=("lang",),
    )
    store = str(tmp_path / "gstore")
    build_gram_store(
        read_corpus(spark, cp), "text", store, k=25, min_count=2,
        id_col="doc_id",
    )
    # delta: new_boiler twice (promotes), lag_block once more (the lag)
    extra = [
        (
            100 + i,
            "en",
            new_boiler
            + " "
            + (lag_block + " " if i == 0 else "")
            + body(f"e{i}"),
        )
        for i in range(2)
    ]
    append_corpus(
        spark.createDataFrame(extra, "doc_id long, lang string, text string"),
        cp,
        partition_by=("lang",),
    )
    meta = refresh_gram_store(spark, cp, store, delta_only=True)
    assert meta["version"] == 2 and meta["n_rows"] == 14
    delta_rows = {
        r["gram"]: (r["cnt"], tuple(r["first"]))
        for r in read_gram_store(spark, store)[0].collect()
    }
    full_store = str(tmp_path / "gfull")
    build_gram_store(
        read_corpus(spark, cp), "text", full_store, k=25, min_count=2,
        id_col="doc_id",
    )
    full_rows = {
        r["gram"]: (r["cnt"], tuple(r["first"]))
        for r in read_gram_store(spark, full_store)[0].collect()
    }
    # the ONLY difference is the lag class: grams of lag_block (plus its
    # shared trailing-space straddle) that reached 2 via old-singleton +
    # delta-singleton — present in the full rebuild, absent in the delta
    # both docs surround the block with spaces, so straddle grams that
    # start at the leading space or end at the trailing one are shared
    # too — the lag class is every gram of " <block> "
    lag_text = " " + lag_block + " "
    lag_grams = {lag_text[i : i + 25] for i in range(len(lag_text) - 24)}
    missing = set(full_rows) - set(delta_rows)
    assert missing and missing <= lag_grams
    assert not (set(delta_rows) - set(full_rows))
    for g in delta_rows:
        assert delta_rows[g] == full_rows[g], g
    # new boiler was promoted by the delta merge
    assert new_boiler[:25] in delta_rows
    # lineage: the delta merge marks counts inexact (sticky) — the
    # batch ExactSubstr store-plugged path must refuse such a store
    # (review finding: the n_rows freshness guard alone would pass it)
    import pytest

    from bambooai_spark.operators.dedup import exact_substring_spans
    from bambooai_spark.operators.writer import read_corpus

    assert meta["counts_exact"] is False
    with pytest.raises(ValueError, match="delta-only"):
        exact_substring_spans(
            read_corpus(spark, cp), "doc_id", "text", k=25,
            gram_store_path=store,
        )
    # no new files -> pure no-op (no count job, meta untouched)
    meta2 = refresh_gram_store(spark, cp, store, delta_only=True)
    assert meta2["version"] == 2 and meta2["n_rows"] == 14
    # vanished files (delete rewrite) -> silent fallback to full rebuild,
    # which also catches the lag grams
    from bambooai_spark.operators.writer import delete_from_corpus

    delete_from_corpus(spark, cp, "doc_id = 3")
    meta3 = refresh_gram_store(spark, cp, store, delta_only=True)
    assert meta3["version"] == 3 and meta3["n_rows"] == 13
    # the fallback is a FULL rebuild: exactness restored, lag grams
    # present, and the store is store-pluggable again
    assert meta3["counts_exact"] is True
    rebuilt = {
        r["gram"] for r in read_gram_store(spark, store)[0].collect()
    }
    assert missing <= rebuilt


def test_text_col_pinned_in_meta(spark, tmp_path):
    """The meta pins the text column the store was counted from; refresh
    uses the pinned column by default and refuses an explicit mismatch
    (ADVICE r11) — a store over a non-default column can no longer be
    silently rebuilt from the wrong one."""
    import pytest
    from pyspark.sql import functions as F

    from bambooai_spark.operators.gram_store import (
        build_gram_store,
        read_gram_store,
        refresh_gram_store,
    )
    from bambooai_spark.operators.writer import append_corpus, read_corpus

    cp = str(tmp_path / "corpus")
    docs = (
        _corpus(spark)
        .withColumn("lang", F.lit("en"))
        .withColumnRenamed("text", "body")
        # unique per row: append_corpus dedups on the default text
        # fingerprint, and a gram store over it must find nothing
        .withColumn(
            "text",
            F.concat(
                F.lit("decoy column without duplicates "),
                F.md5(F.col("doc_id").cast("string")),
            ),
        )
    )
    append_corpus(docs, cp, partition_by=("lang",))
    store = str(tmp_path / "gstore")
    meta = build_gram_store(
        read_corpus(spark, cp), "body", store, k=25, min_count=2
    )
    assert meta["text_col"] == "body"
    with pytest.raises(ValueError, match="text_col"):
        refresh_gram_store(spark, cp, store, text_col="text")
    # default refresh follows the pin: the boiler grams (in body) stay
    meta2 = refresh_gram_store(spark, cp, store)
    assert meta2["version"] == 2
    grams, _ = read_gram_store(spark, store)
    assert grams.filter(F.col("gram") == BOILER[:25]).count() == 1


def test_half_swap_repair_and_meta_fallback(spark, tmp_path):
    """Crash-safety (ADVICE r11 + review): a store caught between the
    two swap renames (grams gone, grams_next complete) makes READS fail
    LOUDLY — read_gram_store never mutates, because a read-side repair
    would race a LIVE refresh and destroy its staged relation — and
    repair_gram_store (the maintenance verb, run on refresh entry)
    rolls it FORWARD; one caught before the swap (grams_old only) rolls
    BACK; a torn meta write (meta gone, meta.tmp whole) still reads.
    With grams present, repair drops stale staging without touching the
    live relation."""
    import pytest

    from bambooai_spark.operators.gram_store import (
        GRAMS_DIR,
        META_NAME,
        build_gram_store,
        read_gram_store,
        repair_gram_store,
    )
    from bambooai_spark.operators.writer import _fs

    corpus = _corpus(spark)
    store = str(tmp_path / "gstore")
    build_gram_store(corpus, "text", store, k=25, min_count=2)
    n = read_gram_store(spark, store)[0].count()
    fs, _ = _fs(spark, store)
    jp = spark._jvm.org.apache.hadoop.fs.Path

    def mv(a, b):
        assert fs.rename(jp(f"{store}/{a}"), jp(f"{store}/{b}"))

    # mid-swap crash: dest missing, staged relation complete in _next —
    # reads raise (no mutation), repair rolls forward
    mv(GRAMS_DIR, GRAMS_DIR + "_next")
    with pytest.raises(RuntimeError, match="repair_gram_store"):
        read_gram_store(spark, store)
    assert fs.exists(jp(f"{store}/{GRAMS_DIR}_next"))  # read didn't touch
    repair_gram_store(spark, store)
    grams, _ = read_gram_store(spark, store)
    assert grams.count() == n  # rolled forward
    assert not fs.exists(jp(f"{store}/{GRAMS_DIR}_next"))
    # pre-swap crash: dest moved aside, no staged relation — roll back
    mv(GRAMS_DIR, GRAMS_DIR + "_old")
    with pytest.raises(RuntimeError, match="repair_gram_store"):
        read_gram_store(spark, store)
    repair_gram_store(spark, store)
    grams, _ = read_gram_store(spark, store)
    assert grams.count() == n  # rolled back
    # healthy store + leftover staging (a refresh mid-write elsewhere
    # would look like this too — which is why only MAINTENANCE runs
    # repair): stale dirs dropped, live relation untouched
    fs.mkdirs(jp(f"{store}/{GRAMS_DIR}_next"))
    repair_gram_store(spark, store)
    assert not fs.exists(jp(f"{store}/{GRAMS_DIR}_next"))
    assert read_gram_store(spark, store)[0].count() == n
    # torn meta: .tmp fallback keeps the pinned policy readable
    fs.rename(jp(f"{store}/{META_NAME}"), jp(f"{store}/{META_NAME}.tmp"))
    _, meta = read_gram_store(spark, store, k=25)
    assert meta["k"] == 25
    with pytest.raises(ValueError, match="k=25"):
        read_gram_store(spark, store, k=7)


def test_delta_refresh_requires_inventory(spark, tmp_path):
    """A store built from a non-file relation has no file inventory:
    delta_only refuses with guidance instead of guessing the delta."""
    import pytest
    from pyspark.sql import functions as F

    from bambooai_spark.operators.gram_store import (
        build_gram_store,
        refresh_gram_store,
    )
    from bambooai_spark.operators.writer import append_corpus

    cp = str(tmp_path / "corpus")
    append_corpus(
        _corpus(spark).withColumn("lang", F.lit("en")),
        cp,
        partition_by=("lang",),
    )
    store = str(tmp_path / "gstore")
    meta = build_gram_store(_corpus(spark), "text", store)
    assert meta["has_files"] is False
    with pytest.raises(ValueError, match="file inventory"):
        refresh_gram_store(spark, cp, store, delta_only=True)
    # a full refresh records the inventory; delta works from then on
    meta = refresh_gram_store(spark, cp, store)
    assert meta["has_files"] is True
    meta = refresh_gram_store(spark, cp, store, delta_only=True)
    assert meta["n_rows"] == 12


def test_batch_and_stream_ingest_gate_parity(spark, tmp_path):
    """VERDICT r11 #6: batch ingest (ingest_to_corpus) and streaming
    ingest enforce IDENTICAL hygiene — same benchmark + boilerplate
    gates, same quality gate/PII scrub/fingerprint — so the same input
    yields byte-identical stored rows either way."""
    import hashlib

    from bambooai_spark.operators.gram_store import build_gram_store
    from bambooai_spark.streaming.documents import (
        ingest_to_corpus,
        stream_ingest_to_corpus,
    )

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
        (0, "en", "web", BOILER + " " + body(0)),
        (1, "en", "web", bench_block + body(1)),
        (2, "en", "web", body(2)),
        (3, "en", "web", "short junk"),  # quality-gated out
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    src = str(tmp_path / "parts")
    docs.coalesce(1).write.parquet(src)
    sdf = spark.readStream.schema(docs.schema).parquet(src)
    out_s = str(tmp_path / "corpus_stream")
    assert stream_ingest_to_corpus(
        sdf, out_s, benchmark=bench, boilerplate_store=store
    ) is not None
    out_b = str(tmp_path / "corpus_batch")
    assert ingest_to_corpus(
        docs, out_b, txn_id="b0", benchmark=bench,
        boilerplate_store=store,
    ) is not None

    cols = ["doc_id", "lang", "source", "text", "fp", "n_words", "n_pii"]
    got_s = sorted(
        tuple(r[c] for c in cols)
        for r in spark.read.parquet(out_s).select(*cols).collect()
    )
    got_b = sorted(
        tuple(r[c] for c in cols)
        for r in spark.read.parquet(out_b).select(*cols).collect()
    )
    assert got_s == got_b and len(got_b) == 3
    texts = {t[0]: t[3] for t in got_b}
    assert BOILER not in texts[0] and bench_block not in texts[1]
    # fully-gated input -> None, nothing written
    assert ingest_to_corpus(
        spark.createDataFrame(
            [(9, "en", "web", "junk")],
            "doc_id long, lang string, source string, text string",
        ),
        str(tmp_path / "corpus_empty"),
    ) is None


def test_build_inventory_rejects_filtered_relation(spark, tmp_path):
    """Review finding: inputFiles() reflects the SCAN, not a filter
    above it — recording an inventory for a filtered build would arm
    delta refresh with counts that don't correspond to the files. The
    build verifies file rows == df rows and withholds the watermark
    otherwise; the unfiltered twin records it."""
    import pytest
    from pyspark.sql import functions as F

    from bambooai_spark.operators.gram_store import (
        build_gram_store,
        refresh_gram_store,
    )
    from bambooai_spark.operators.writer import append_corpus, read_corpus

    cp = str(tmp_path / "corpus")
    append_corpus(
        _corpus(spark).withColumn("lang", F.lit("en")),
        cp,
        partition_by=("lang",),
    )
    filtered = str(tmp_path / "g_filtered")
    meta = build_gram_store(
        read_corpus(spark, cp).filter(F.col("doc_id") < 6),
        "text", filtered,
    )
    assert meta["has_files"] is False and meta["n_rows"] == 6
    with pytest.raises(ValueError, match="file inventory"):
        refresh_gram_store(spark, cp, filtered, delta_only=True)
    full = str(tmp_path / "g_full")
    meta = build_gram_store(read_corpus(spark, cp), "text", full)
    assert meta["has_files"] is True


def test_store_plugged_spans_text_col_guard(spark, tmp_path):
    """Review finding: the store-plugged ExactSubstr guards must also
    pin the TEXT column — a store over 'text' probed against another
    column passes k/min_count/n_rows and silently screens the wrong
    relation otherwise."""
    import pytest
    from pyspark.sql import functions as F

    from bambooai_spark.operators.dedup import exact_substring_spans
    from bambooai_spark.operators.gram_store import build_gram_store

    df = _corpus(spark).withColumn(
        "other", F.concat(F.lit("shadow column body "), F.col("text"))
    )
    store = str(tmp_path / "gstore")
    build_gram_store(df, "text", store, k=25, min_count=2)
    with pytest.raises(ValueError, match="text_col"):
        exact_substring_spans(
            df, "doc_id", "other", k=25, gram_store_path=store
        )


def test_ops_loop_repairs_half_swapped_store(spark, tmp_path):
    """A crashed refresh leaves the store half-swapped; the advisor's
    read fails loudly and recommends repair_gram_store, auto_maintain
    executes it (policy-free), and a delta-lagged store surfaces an
    info row steering batch surgery to a full refresh."""
    from bambooai_spark.operators.gram_store import (
        GRAMS_DIR,
        build_gram_store,
        read_gram_store,
    )
    from bambooai_spark.operators.maintenance import (
        auto_maintain,
        suggest_maintenance,
    )
    from bambooai_spark.operators.writer import _fs, append_corpus

    corpus = str(tmp_path / "corpus")
    append_corpus(
        _corpus(spark).withColumn("lang", F.lit("en")),
        corpus,
        partition_by=("lang",),
    )
    store = str(tmp_path / "gstore")
    build_gram_store(spark.read.parquet(corpus), "text", store)
    n = read_gram_store(spark, store)[0].count()
    # simulate the mid-swap crash
    fs, _ = _fs(spark, store)
    jp = spark._jvm.org.apache.hadoop.fs.Path
    assert fs.rename(
        jp(f"{store}/{GRAMS_DIR}"), jp(f"{store}/{GRAMS_DIR}_next")
    )
    adv = {
        r["check"]: r
        for r in suggest_maintenance(
            spark, corpus, gram_store_path=store
        ).collect()
    }
    assert adv["gram_store"]["severity"] == "action"
    assert "repair_gram_store" in adv["gram_store"]["recommendation"]
    plan = {
        r["action"]: r
        for r in auto_maintain(
            spark, corpus, gram_store_path=store
        ).collect()
    }
    assert plan["repair_gram_store"]["executed"] is True
    assert read_gram_store(spark, store)[0].count() == n
    # delta-lag info row: append + delta refresh, then advise
    import hashlib

    extra = spark.createDataFrame(
        [(300 + i, "en",
          "ANOTHER SHARED BOILER BLOCK ################ END "
          + hashlib.md5(f"y{i}".encode()).hexdigest())
         for i in range(6)],
        "doc_id long, lang string, text string",
    )
    append_corpus(extra, corpus, partition_by=("lang",))
    from bambooai_spark.operators.gram_store import refresh_gram_store

    meta = refresh_gram_store(spark, corpus, store, delta_only=True)
    assert meta["counts_exact"] is False
    lag_rows = [
        r
        for r in suggest_maintenance(
            spark, corpus, gram_store_path=store
        ).collect()
        if r["check"] == "gram_store_lag"
    ]
    assert len(lag_rows) == 1 and lag_rows[0]["severity"] == "info"
    assert "singleton lag" in lag_rows[0]["detail"]
    # the standing lag row survives a below-threshold 'ok' drift row:
    # distinct check names, so last-wins advice dicts keep BOTH
    keyed = {
        r["check"]: r
        for r in suggest_maintenance(
            spark, corpus, gram_store_path=store
        ).collect()
    }
    assert "gram_store_lag" in keyed and "gram_store" in keyed


def test_crashed_meta_write_heals_and_lag_converges(spark, tmp_path, monkeypatch):
    """Review pass 2: a refresh crashing between the swap and its meta
    write must (a) leave the published relation marked counts-inexact
    (the pre-swap dirty flag — surgery refused, never wrongly accepted)
    and (b) be HEALED by the next refresh's no-op branch instead of
    livelocking the ops loop on phantom drift; and auto_maintain runs a
    FULL refresh on a lagged store so exactness converges."""
    import hashlib

    import bambooai_spark.operators.gram_store as gs
    from bambooai_spark.operators.maintenance import auto_maintain
    from bambooai_spark.operators.writer import append_corpus, read_corpus

    cp = str(tmp_path / "corpus")
    append_corpus(
        _corpus(spark).withColumn("lang", F.lit("en")),
        cp,
        partition_by=("lang",),
    )
    store = str(tmp_path / "gstore")
    gs.build_gram_store(read_corpus(spark, cp), "text", store)
    extra = spark.createDataFrame(
        [(400 + i, "en",
          "CRASHY SHARED BOILER BLOCK ############## END "
          + hashlib.md5(f"z{i}".encode()).hexdigest())
         for i in range(4)],
        "doc_id long, lang string, text string",
    )
    append_corpus(extra, cp, partition_by=("lang",))

    # crash on the FINAL meta write (call 2; call 1 is the dirty flag)
    real_write = gs._write_meta
    calls = {"n": 0}

    def crashy(spark_, path_, meta_):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected meta-write crash")
        real_write(spark_, path_, meta_)

    monkeypatch.setattr(gs, "_write_meta", crashy)
    with pytest.raises(RuntimeError, match="injected"):
        gs.refresh_gram_store(spark, cp, store, delta_only=True)
    monkeypatch.setattr(gs, "_write_meta", real_write)

    # torn state: NEW relation published, meta stale but dirty-flagged
    grams, meta = gs.read_gram_store(spark, store)
    assert meta["counts_exact"] is False  # the pre-swap dirty flag
    assert meta["n_rows"] == 12  # stale
    assert grams.filter(
        F.col("gram") == "CRASHY SHARED BOILER BLOC"
    ).count() == 1  # but the relation IS the merged one
    # the guard refuses the torn store (old-snapshot row counts match
    # the stale meta — counts_exact is what blocks it)
    from bambooai_spark.operators.dedup import exact_substring_spans

    with pytest.raises(ValueError, match="delta-only"):
        exact_substring_spans(
            read_corpus(spark, cp).limit(12), "doc_id", "text", k=25,
            gram_store_path=store,
        )
    # next refresh: no new files -> the no-op branch HEALS the meta
    meta = gs.refresh_gram_store(spark, cp, store, delta_only=True)
    assert meta["n_rows"] == 16 and meta["counts_exact"] is False
    # lag convergence: grow past the drift threshold; auto_maintain's
    # refresh goes FULL because the store is lagged, restoring exactness
    extra2 = spark.createDataFrame(
        [(500 + i, "en", "unique tail " + hashlib.md5(
            f"w{i}".encode()).hexdigest()) for i in range(8)],
        "doc_id long, lang string, text string",
    )
    append_corpus(extra2, cp, partition_by=("lang",))
    plan = {
        r["action"]: r
        for r in auto_maintain(spark, cp, gram_store_path=store).collect()
    }
    assert plan["refresh_gram_store"]["executed"] is True
    assert "(delta)" not in plan["refresh_gram_store"]["detail"]
    _g, meta = gs.read_gram_store(spark, store)
    assert meta["counts_exact"] is True and meta["n_rows"] == 24


def test_curate_corpus_report_and_leak_guard(spark, tmp_path, monkeypatch):
    """The packaged curation verb: the attrition report matches direct
    computation on a crafted corpus, exported rows equal the report's
    split totals, and a drifted split assignment (simulating an
    upstream stage handing back a leaking split) is REFUSED before
    anything is exported."""
    import hashlib

    import bambooai_spark.operators.curation as cur
    from bambooai_spark.functions.text import tokens
    from bambooai_spark.operators.writer import write_corpus

    # 3 langs; en/de budgeted, fr present only in the live stage; one
    # exact-duplicate pair (docs 20/21) to arm the leak guard — written
    # via write_corpus (no fingerprint ledger), because the gated
    # append paths dedup exact copies away by construction; the guard
    # exists precisely for corpora assembled outside those gates (and
    # for near-dup clusters via cluster_col=)
    rows = []
    for i in range(20):
        lang = ["en", "de", "fr"][i % 3]
        body = " ".join(
            "the word" if t == 0 else hashlib.md5(
                f"{i}-{t}".encode()).hexdigest()[:6]
            for t in range(12)
        )
        rows.append((i, lang, body))
    dup_body = "the " + " ".join(
        hashlib.md5(f"dup-{t}".encode()).hexdigest()[:6] for t in range(12)
    )
    rows += [(20, "en", dup_body), (21, "en", dup_body)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    cp = str(tmp_path / "corpus")
    write_corpus(docs, cp, partition_by=("lang",))

    from pyspark.sql import functions as F

    score = F.length("text").cast("double") / F.size(tokens("text"))
    exported, report = cur.curate_corpus(
        spark, cp, str(tmp_path / "exp"),
        budgets={"en": 60, "de": 40}, score=score,
        fractions={"val": 0.25}, n_shards=2,
    )
    rep = {(r["stage"], r["lang"]): (r["n_docs"], r["n_tokens"])
           for r in report.collect()}
    # live stage covers ALL langs, budget stages only the budgeted ones
    assert rep[("live", "fr")][0] == 6
    assert rep[("live", "en")][0] == 9  # 7 + the dup pair
    assert ("budget_kept", "fr") not in rep
    # split stage totals == budget_kept totals per lang
    for lang in ("en", "de"):
        split_docs = sum(
            v[0] for (st, lg), v in rep.items()
            if lg == lang and st.startswith("split=")
        )
        assert split_docs == rep[("budget_kept", lang)][0]
    # exported rows == the report's split totals, with shard/pos set
    got = exported.collect()
    assert len(got) == sum(
        v[0] for (st, _), v in rep.items() if st.startswith("split=")
    )
    assert all(r["shard"] in (0, 1) and r["pos"] >= 1 for r in got)

    # leak guard: an upstream stage handing back a per-ROW split (dup
    # pair straddles) must be refused before export
    import bambooai_spark.operators.packing as packing

    def bad_split(df, id_col, text_col, *, fractions=None,
                  default_label="train", salt="split", cluster_col=None,
                  out="split"):
        return df.withColumn(
            out,
            F.when(F.col(id_col) % 2 == 0, F.lit("train")).otherwise(
                F.lit("val")
            ),
        )

    monkeypatch.setattr(packing, "leakage_safe_split", bad_split)
    with pytest.raises(RuntimeError, match="straddle"):
        cur.curate_corpus(
            spark, cp, str(tmp_path / "exp2"),
            budgets={"en": 60, "de": 40}, score=score,
            fractions={"val": 0.25}, n_shards=2,
        )
    import os

    assert not os.path.exists(str(tmp_path / "exp2"))


def _write_docs(spark, path, rows, mode="overwrite"):
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(2).write.mode(mode).parquet(path)


def test_store_plugged_delta_composition(spark, tmp_path):
    """VERDICT r12 #3: exact_substring_spans over a corpus GROWN by
    appended files composes the (delta_support) store's counts with the
    delta files' counts — spans/cut hash-exact vs from-scratch,
    including the constructed singleton+singleton case (a gram once in
    the old corpus, once in the delta: total 2, stored nowhere), and
    the stats-side explode reads ONLY the delta files when no old
    singleton is implicated."""
    from bambooai_spark.operators.dedup import (
        exact_substring_cut,
        exact_substring_spans,
    )
    from bambooai_spark.operators.gram_store import (
        _read_file_inventory,
        build_gram_store,
        composed_dup_grams,
        read_gram_store,
    )

    k = 8
    boiler = "BOILERPLATE-BLOCK-000"   # duplicated WITHIN the old corpus
    solo = "SINGLETON-MARKER-999"      # once old + once delta => dup of 2
    newdup = "FRESH-DELTA-DUP-XYZ"     # duplicated only within the delta
    old_rows = [
        (1, f"aa0001bb {boiler} cc0001dd"),
        (2, f"aa0002bb {boiler} cc0002dd"),
        (3, f"aa0003bb {solo} cc0003dd"),
        (4, "aa0004bb plainoldunique cc0004dd"),
    ]
    delta_rows = [
        (11, f"ee0011ff {solo} gg0011hh"),
        (12, f"ee0012ff {newdup} gg0012hh"),
        (13, f"ee0013ff {newdup} gg0013hh"),
        (14, f"ee0014ff {boiler} gg0014hh"),  # delta copy of old boiler
    ]
    cp = str(tmp_path / "corpus")
    _write_docs(spark, cp, old_rows)
    old = spark.read.parquet(cp)
    store = str(tmp_path / "gstore")
    meta = build_gram_store(
        old, "text", store, k=k, min_count=2, id_col="doc_id",
        delta_support=True,
    )
    assert meta["delta_support"] is True and meta["has_files"] is True
    _write_docs(spark, cp, delta_rows, mode="append")
    grown = spark.read.parquet(cp)
    assert grown.count() == 8

    for keep_first in (False, True):
        inline = sorted(
            map(
                tuple,
                exact_substring_spans(
                    grown, "doc_id", "text", k=k, keep_first=keep_first
                ).collect(),
            )
        )
        composed = sorted(
            map(
                tuple,
                exact_substring_spans(
                    grown, "doc_id", "text", k=k, keep_first=keep_first,
                    gram_store_path=store, compose_delta="force",
                ).collect(),
            )
        )
        assert composed == inline
        # the auto dispatch (may choose the inline fallback on this
        # tiny unique-heavy fixture) is output-identical either way
        auto = sorted(
            map(
                tuple,
                exact_substring_spans(
                    grown, "doc_id", "text", k=k, keep_first=keep_first,
                    gram_store_path=store,
                ).collect(),
            )
        )
        assert auto == inline
        # the singleton+singleton doc (3 or 11) must carry a span
        assert any(r[0] in (3, 11) for r in inline)
    # the cut composes identically (keep_first: earliest copy survives)
    a = sorted(
        (r.doc_id, r.clean_text)
        for r in exact_substring_cut(
            grown, "doc_id", "text", k=k, keep_first=True
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.clean_text)
        for r in exact_substring_cut(
            grown, "doc_id", "text", k=k, keep_first=True,
            gram_store_path=store, compose_delta="force",
        ).collect()
    )
    assert a == b

    # plan check: with NO old singleton implicated, the composed dup
    # relation's scans touch the store + the DELTA files only — the
    # old corpus files are absent (the full-corpus explode is gone)
    cp2 = str(tmp_path / "corpus2")
    _write_docs(spark, cp2, old_rows[:2] + [old_rows[3]])
    old2 = spark.read.parquet(cp2)
    store2 = str(tmp_path / "gstore2")
    build_gram_store(
        old2, "text", store2, k=k, min_count=2, id_col="doc_id",
        delta_support=True,
    )
    old2_files = set(old2.inputFiles())
    _write_docs(spark, cp2, delta_rows[1:3], mode="append")
    grown2 = spark.read.parquet(cp2)
    _, meta2 = read_gram_store(spark, store2, k=k)
    inv2 = _read_file_inventory(spark, store2)
    rel = composed_dup_grams(
        grown2, store2, meta2, inv2, set(grown2.inputFiles()),
        min_count=2, text_col="text", id_col="doc_id",
        # force: tiny unique-heavy fixtures trip the r13 cost-model gate
        # (as designed); this test pins the composed PLAN shape
        force=True,
    )
    got = sorted(r["gram"] for r in rel.collect())
    from bambooai_spark.operators.gram_store import duplicated_grams

    want = sorted(
        r["gram"]
        for r in duplicated_grams(
            grown2, "text", k=k, min_count=2, id_col="doc_id"
        ).collect()
    )
    assert got == want
    scanned = set(rel.inputFiles())
    # the OLD corpus files are absent from every scan in the composed
    # plan — the recount never armed, so the only file scans are the
    # store relation (the delta postings sit behind the persisted
    # delta-counts cache, invisible to inputFiles)
    assert not (scanned & old2_files), scanned & old2_files
    assert any("gstore2" in f for f in scanned), scanned


def test_store_plugged_freshness_is_file_exact(spark, tmp_path):
    """ADVICE r12 (medium): an in-place rewrite preserves the row count,
    so the freshness guard must key on FILE identity when the store
    carries an inventory — plus the remaining refusal edges: no
    delta_support, compose_delta=False, filtered grown relation, and a
    delta refresh flipping delta_support until the full rebuild."""
    from bambooai_spark.operators.dedup import exact_substring_spans
    from bambooai_spark.operators.gram_store import (
        build_gram_store,
        refresh_gram_store,
    )

    k = 8
    rows = [
        (1, "aa0001bb SHARED-BLOCK-11 cc0001dd"),
        (2, "aa0002bb SHARED-BLOCK-11 cc0002dd"),
        (3, "aa0003bb uniquethree cc0003dd"),
    ]
    cp = str(tmp_path / "corpus")
    _write_docs(spark, cp, rows)
    corpus = spark.read.parquet(cp)
    store = str(tmp_path / "gstore")
    build_gram_store(
        corpus, "text", store, k=k, min_count=2, id_col="doc_id",
        delta_support=True,
    )
    # same row count, rewritten files: MUST refuse (row count is blind)
    cp2 = str(tmp_path / "rewritten")
    _write_docs(
        spark, cp2,
        [(i, t.replace("SHARED", "ROTATED")) for i, t in rows],
    )
    with pytest.raises(ValueError, match="file inventory"):
        exact_substring_spans(
            spark.read.parquet(cp2), "doc_id", "text", k=k,
            gram_store_path=store,
        )
    # grown corpus + compose_delta=False: refuse (plan pinning)
    _write_docs(
        spark, cp, [(11, "ee0011ff SHARED-BLOCK-11 gg0011hh")],
        mode="append",
    )
    grown = spark.read.parquet(cp)
    with pytest.raises(ValueError, match="file inventory"):
        exact_substring_spans(
            grown, "doc_id", "text", k=k, gram_store_path=store,
            compose_delta=False,
        )
    # a FILTERED grown relation cannot compose (file-grain counts would
    # diverge from the from-scratch computation over the filtered rows)
    with pytest.raises(ValueError, match="filtered"):
        exact_substring_spans(
            grown.filter(F.col("doc_id") != 3), "doc_id", "text", k=k,
            gram_store_path=store,
        )
    # a store WITHOUT delta_support refuses the grown corpus with the
    # rebuild pointer
    cp3 = str(tmp_path / "corpus3")
    _write_docs(spark, cp3, rows)
    store3 = str(tmp_path / "gstore3")
    build_gram_store(
        spark.read.parquet(cp3), "text", store3, k=k, min_count=2,
    )
    _write_docs(
        spark, cp3, [(11, "ee0011ff SHARED-BLOCK-11 gg0011hh")],
        mode="append",
    )
    with pytest.raises(ValueError, match="delta_support"):
        exact_substring_spans(
            spark.read.parquet(cp3), "doc_id", "text", k=k,
            gram_store_path=store3,
        )
    # delta refresh on a delta_support store publishes the GATE OVERLAY
    # and leaves the exact base untouched — counts_exact and
    # delta_support STAY True (r13: the overlay ends the alternating
    # delta/full dance between the gate and batch surgery)
    m1 = refresh_gram_store(spark, cp, store, delta_only=True)
    assert m1["delta_support"] is True and m1["counts_exact"] is True
    assert m1["gate_version"] == 1 and m1["gate_n_rows"] == 4
    # a full refresh drops the overlay and re-bases everything
    m2 = refresh_gram_store(spark, cp, store)
    assert m2["delta_support"] is True and m2["counts_exact"] is True
    assert m2["gate_version"] == 0 and m2["n_rows"] == 4
    # and the re-based store serves the exact path again (file-identical)
    out = exact_substring_spans(
        spark.read.parquet(cp), "doc_id", "text", k=k,
        gram_store_path=store,
    )
    assert out.count() >= 1


def test_gate_overlay_serves_gate_and_base_serves_surgery(spark, tmp_path):
    """The r13 overlay contract end-to-end: after a delta refresh on a
    delta_support store, (a) the ingest gate screens NEW delta
    boilerplate via the overlay, (b) batch surgery still composes
    EXACTLY against the untouched base, (c) a crashed overlay swap
    falls back to the base and repair rolls it forward, and (d) a full
    refresh drops the overlay."""
    from bambooai_spark.operators.dedup import exact_substring_spans
    from bambooai_spark.operators.gram_store import (
        boilerplate_cut,
        build_gram_store,
        read_gate_grams,
        read_gram_store,
        refresh_gram_store,
        repair_gram_store,
    )
    from bambooai_spark.operators.writer import _fs, _fs_exists

    k = 8
    old_rows = [
        (1, "aa0001bb OLDHDRCOMMONBLOCK cc0001dd"),
        (2, "aa0002bb OLDHDRCOMMONBLOCK cc0002dd"),
        (3, "aa0003bb uniquethree cc0003dd"),
    ]
    new_boiler = "FRESHNAVBAR-42X42"
    delta_rows = [
        (11, f"ee0011ff {new_boiler} gg0011hh"),
        (12, f"ee0012ff {new_boiler} gg0012hh"),
    ]
    cp = str(tmp_path / "corpus")
    _write_docs(spark, cp, old_rows)
    store = str(tmp_path / "gstore")
    build_gram_store(
        spark.read.parquet(cp), "text", store, k=k, min_count=2,
        id_col="doc_id", delta_support=True,
    )
    _write_docs(spark, cp, delta_rows, mode="append")
    meta = refresh_gram_store(spark, cp, store, delta_only=True)
    assert meta["gate_version"] == 1

    # (a) the gate sees the NEW boilerplate through the overlay...
    gate, _m = read_gate_grams(spark, store, k=k)
    gate_grams = {r["gram"] for r in gate.collect()}
    assert any(new_boiler[:k] in g or g in new_boiler for g in gate_grams)
    incoming = spark.createDataFrame(
        [(100, f"xx0100yy {new_boiler} zz0100ww")],
        "doc_id long, text string",
    )
    got = boilerplate_cut(incoming, "doc_id", "text", store, k=k).collect()
    assert new_boiler not in got[0]["clean_text"]
    # ...while the BASE relation does not carry it
    base, bmeta = read_gram_store(spark, store, k=k)
    base_grams = {r["gram"] for r in base.collect()}
    assert not any(g in new_boiler for g in base_grams)
    assert bmeta["counts_exact"] is True

    # (b) batch surgery composes exactly against the base
    grown = spark.read.parquet(cp)
    inline = sorted(
        map(
            tuple,
            exact_substring_spans(
                grown, "doc_id", "text", k=k, keep_first=True
            ).collect(),
        )
    )
    composed = sorted(
        map(
            tuple,
            exact_substring_spans(
                grown, "doc_id", "text", k=k, keep_first=True,
                gram_store_path=store,
            ).collect(),
        )
    )
    assert composed == inline and any(r[0] in (11, 12) for r in inline)

    # (c) crashed overlay swap: stage present, overlay missing
    fs, jgate = _fs(spark, store + "/grams_gate")
    jnext = _fs(spark, store + "/grams_gate_next")[1]
    assert fs.rename(jgate, jnext)
    gate2, _m2 = read_gate_grams(spark, store, k=k)
    assert {r["gram"] for r in gate2.collect()} == base_grams  # fallback
    repair_gram_store(spark, store)
    assert _fs_exists(spark, store + "/grams_gate")
    gate3, _m3 = read_gate_grams(spark, store, k=k)
    assert {r["gram"] for r in gate3.collect()} == gate_grams

    # (d) full refresh re-bases and drops the overlay
    meta = refresh_gram_store(spark, cp, store)
    assert meta["gate_version"] == 0 and meta["n_rows"] == 5
    assert not _fs_exists(spark, store + "/grams_gate")
    gate4, _m4 = read_gate_grams(spark, store, k=k)
    assert any(g in new_boiler for g in
               {r["gram"] for r in gate4.collect()})


def test_rebuild_in_place_drops_stale_gate_overlay(spark, tmp_path):
    """Review r13: build_gram_store over an EXISTING store path (the
    rebuild the module's own error messages advise) must drop a gate
    overlay left by the previous build's delta refreshes — otherwise
    read_gate_grams keeps serving the old build's overlay, missing
    every gram only the new base has (and, after a changed-k rebuild,
    screening grams of the wrong length entirely)."""
    from bambooai_spark.operators.gram_store import (
        build_gram_store,
        read_gate_grams,
        refresh_gram_store,
    )
    from bambooai_spark.operators.writer import _fs_exists

    k = 8
    cp = str(tmp_path / "corpus")
    _write_docs(spark, cp, [
        (1, "aa0001bb OLDHDRCOMMONBLOCK cc0001dd"),
        (2, "aa0002bb OLDHDRCOMMONBLOCK cc0002dd"),
    ])
    store = str(tmp_path / "gstore")
    build_gram_store(
        spark.read.parquet(cp), "text", store, k=k, min_count=2,
        id_col="doc_id", delta_support=True,
    )
    _write_docs(spark, cp, [
        (11, "ee0011ff FRESHNAVBAR-42X42 gg0011hh"),
        (12, "ee0012ff FRESHNAVBAR-42X42 gg0012hh"),
    ], mode="append")
    refresh_gram_store(spark, cp, store, delta_only=True)
    assert _fs_exists(spark, store + "/grams_gate")

    # rebuild IN PLACE over the grown corpus with a DIFFERENT k: the old
    # overlay (k=8 grams) must not survive to screen the k=6 gate
    build_gram_store(
        spark.read.parquet(cp), "text", store, k=6, min_count=2,
        id_col="doc_id", delta_support=True,
    )
    assert not _fs_exists(spark, store + "/grams_gate")
    gate, meta = read_gate_grams(spark, store, k=6)
    grams = {r["gram"] for r in gate.collect()}
    assert grams and all(len(g) == 6 for g in grams)
    # the new base sees the new boilerplate (no stale-overlay shadowing)
    assert any("FRESHN" in g or "NAVBAR" in g for g in grams)


def test_repair_refuses_torn_gate_staging(spark, tmp_path):
    """Review r13: 'overlay missing + staging present' is ambiguous
    between a crash mid-SWAP (staging complete — roll forward) and a
    crash mid-WRITE (staging torn — must NOT be published to the gate).
    repair_gram_store disambiguates on the parquet _SUCCESS marker."""
    from bambooai_spark.operators.gram_store import (
        build_gram_store,
        read_gate_grams,
        refresh_gram_store,
        repair_gram_store,
    )
    from bambooai_spark.operators.writer import (
        _fs,
        _fs_delete,
        _fs_exists,
    )

    k = 8
    cp = str(tmp_path / "corpus")
    _write_docs(spark, cp, [
        (1, "aa0001bb OLDHDRCOMMONBLOCK cc0001dd"),
        (2, "aa0002bb OLDHDRCOMMONBLOCK cc0002dd"),
    ])
    store = str(tmp_path / "gstore")
    build_gram_store(
        spark.read.parquet(cp), "text", store, k=k, min_count=2,
        id_col="doc_id", delta_support=True,
    )
    base_grams = {
        r["gram"] for r in read_gate_grams(spark, store, k=k)[0].collect()
    }
    _write_docs(spark, cp, [
        (11, "ee0011ff FRESHNAVBAR-42X42 gg0011hh"),
        (12, "ee0012ff FRESHNAVBAR-42X42 gg0012hh"),
    ], mode="append")
    refresh_gram_store(spark, cp, store, delta_only=True)

    # crash mid-WRITE shape: overlay gone, staging present WITHOUT its
    # _SUCCESS marker (torn job) — repair must drop it, not publish it
    fs, jgate = _fs(spark, store + "/grams_gate")
    jnext = _fs(spark, store + "/grams_gate_next")[1]
    assert fs.rename(jgate, jnext)
    _fs_delete(spark, store + "/grams_gate_next/_SUCCESS")
    repair_gram_store(spark, store)
    assert not _fs_exists(spark, store + "/grams_gate")
    assert not _fs_exists(spark, store + "/grams_gate_next")
    # the gate falls back to the base and still reads whole
    grams = {
        r["gram"] for r in read_gate_grams(spark, store, k=k)[0].collect()
    }
    assert grams == base_grams

    # crash mid-SWAP shape: staging present WITH _SUCCESS — roll forward
    refresh_gram_store(spark, cp, store, delta_only=True)
    fs, jgate = _fs(spark, store + "/grams_gate")
    jnext = _fs(spark, store + "/grams_gate_next")[1]
    assert fs.rename(jgate, jnext)
    repair_gram_store(spark, store)
    assert _fs_exists(spark, store + "/grams_gate")
    rolled = {
        r["gram"] for r in read_gate_grams(spark, store, k=k)[0].collect()
    }
    assert any("FRESHN" in g or "NAVBAR" in g for g in rolled)


def test_full_refresh_drops_overlay_before_swap(spark, tmp_path):
    """Review r13: the full-refresh path must delete the gate overlay
    BEFORE publishing the new base — a crash between the swap and a
    later overlay delete would leave an overlay computed against the
    PREVIOUS base serving the gate, and repair cannot tell it from a
    live one. Injected crash at the swap: the overlay must already be
    gone, the old base still readable, and the retried refresh heals."""
    import bambooai_spark.operators.gram_store as gs

    from bambooai_spark.operators.writer import _fs_exists

    k = 8
    cp = str(tmp_path / "corpus")
    _write_docs(spark, cp, [
        (1, "aa0001bb OLDHDRCOMMONBLOCK cc0001dd"),
        (2, "aa0002bb OLDHDRCOMMONBLOCK cc0002dd"),
    ])
    store = str(tmp_path / "gstore")
    gs.build_gram_store(
        spark.read.parquet(cp), "text", store, k=k, min_count=2,
        id_col="doc_id", delta_support=True,
    )
    _write_docs(spark, cp, [
        (11, "ee0011ff FRESHNAVBAR-42X42 gg0011hh"),
        (12, "ee0012ff FRESHNAVBAR-42X42 gg0012hh"),
    ], mode="append")
    gs.refresh_gram_store(spark, cp, store, delta_only=True)
    assert _fs_exists(spark, store + "/grams_gate")

    real_swap = gs._swap_in
    def crash_swap(spark_, path_, nxt_):
        raise RuntimeError("injected crash at swap")
    gs._swap_in = crash_swap
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            gs.refresh_gram_store(spark, cp, store)
    finally:
        gs._swap_in = real_swap
    # the stale overlay is ALREADY gone (deleted pre-swap) and the old
    # base is still the published relation
    assert not _fs_exists(spark, store + "/grams_gate")
    assert _fs_exists(spark, store + "/grams")
    gate, meta = gs.read_gate_grams(spark, store, k=k)
    assert gate.count() > 0 and meta["counts_exact"] is False
    # retried full refresh completes and re-exacts the store
    meta = gs.refresh_gram_store(spark, cp, store)
    assert meta["counts_exact"] is True and meta["n_rows"] == 4


def test_read_meta_survives_concurrent_swap_race(spark, tmp_path):
    """ADVICE r12 low + review r13: a concurrent _write_meta's
    delete(meta)+rename(tmp->meta) slipping between _read_meta's two
    existence checks — or the tmp read itself failing with the
    Py4JJavaError that py4j actually raises (NOT OSError) — must
    resolve to the swapped-in meta, never an error on a healthy
    store."""
    import bambooai_spark.operators.gram_store as gs
    import bambooai_spark.operators.writer as w

    cp = str(tmp_path / "corpus")
    _write_docs(spark, cp, [
        (1, "aa0001bb OLDHDRCOMMONBLOCK cc0001dd"),
        (2, "aa0002bb OLDHDRCOMMONBLOCK cc0002dd"),
    ])
    store = str(tmp_path / "gstore")
    built = gs.build_gram_store(
        spark.read.parquet(cp), "text", store, k=8, min_count=2,
    )

    # race leg 1: both existence checks MISS (meta just deleted, tmp
    # just renamed) — the re-check of the rename target must read it
    real_exists = w._fs_exists
    calls = {"n": 0}
    def racing_exists(spark_, path_):
        if path_.endswith("_gram_store_meta.json") or path_.endswith(".tmp"):
            calls["n"] += 1
            if calls["n"] <= 2:  # first mpath check, then tmp check
                return False
        return real_exists(spark_, path_)
    import unittest.mock as mock
    with mock.patch.object(w, "_fs_exists", racing_exists):
        # gram_store imports _fs_exists inside the function body, so the
        # patch on the writer module is what it sees
        meta = gs._read_meta(spark, store)
    assert meta["k"] == built["k"] and calls["n"] >= 2

    # race leg 2: tmp exists but the open races the rename — py4j
    # surfaces java.io.FileNotFoundException as Py4JJavaError, which
    # `except OSError` can never catch
    class FakePy4JError(Exception):
        pass

    real_read = w._fs_read_text
    def racing_read(spark_, path_):
        if path_.endswith(".tmp"):
            raise FakePy4JError("java.io.FileNotFoundException (wrapped)")
        return real_read(spark_, path_)
    real_exists2 = w._fs_exists
    state = {"first": True}
    def exists_tmp_once(spark_, path_):
        if path_.endswith("_gram_store_meta.json") and state["first"]:
            state["first"] = False
            return False  # "just deleted"
        if path_.endswith(".tmp"):
            return True  # "just renamed... no wait, still visible"
        return real_exists2(spark_, path_)
    with mock.patch.object(w, "_fs_exists", exists_tmp_once), \
         mock.patch.object(w, "_fs_read_text", racing_read):
        meta = gs._read_meta(spark, store)
    assert meta["k"] == built["k"]


def test_composition_bails_to_inline_on_large_suspect_set(
    spark, tmp_path, monkeypatch
):
    """r13 stress finding: when the delta shares many old-singleton
    grams with the base (near-dup twins straddling the split), the
    targeted recount approaches a full old-file re-aggregation plus the
    composition overhead — measured 1.6x a from-scratch stats pass at
    10x — and the suspect broadcast stops being broadcast-sized.
    composed_dup_grams returns None past RECOUNT_SUSPECTS_MAX and
    exact_substring_spans silently runs the inline pass: identical
    output, pinned here by forcing the cap to 0."""
    import bambooai_spark.operators.gram_store as gs
    from bambooai_spark.operators.dedup import exact_substring_spans

    k = 8
    solo = "SINGLETON-MARKER-999"
    old_rows = [
        (1, "aa0001bb BOILERPLATE-BLOCK-000 cc0001dd"),
        (2, "aa0002bb BOILERPLATE-BLOCK-000 cc0002dd"),
        (3, f"aa0003bb {solo} cc0003dd"),
    ]
    delta_rows = [(11, f"ee0011ff {solo} gg0011hh")]
    cp = str(tmp_path / "corpus")
    _write_docs(spark, cp, old_rows)
    store = str(tmp_path / "gstore")
    gs.build_gram_store(
        spark.read.parquet(cp), "text", store, k=k, min_count=2,
        id_col="doc_id", delta_support=True,
    )
    _write_docs(spark, cp, delta_rows, mode="append")
    grown = spark.read.parquet(cp)

    # cap 0 with the earlier cost gates lifted: the singleton+singleton
    # suspect itself forces the bail (the suspect-cap leg specifically)
    monkeypatch.setattr(gs, "RECOUNT_SUSPECTS_MAX", 0)
    monkeypatch.setattr(gs, "COMPOSE_COST_RATIO", 1e9)
    inv = gs._read_file_inventory(spark, store)
    meta = gs._read_meta(spark, store)
    assert gs.composed_dup_grams(
        grown, store, meta, inv, set(grown.inputFiles()),
        min_count=2, text_col="text", id_col="doc_id",
    ) is None
    bailed = sorted(
        map(
            tuple,
            exact_substring_spans(
                grown, "doc_id", "text", k=k, keep_first=True,
                gram_store_path=store,
            ).collect(),
        )
    )
    inline = sorted(
        map(
            tuple,
            exact_substring_spans(
                grown, "doc_id", "text", k=k, keep_first=True
            ).collect(),
        )
    )
    assert bailed == inline and any(r[0] in (3, 11) for r in inline)

    # default cap + cost gates lifted (tiny unique-heavy fixture): the
    # tiny suspect set stays composed (recount path)
    monkeypatch.setattr(gs, "RECOUNT_SUSPECTS_MAX", 200_000)
    rel = gs.composed_dup_grams(
        grown, store, meta, inv, set(grown.inputFiles()),
        min_count=2, text_col="text", id_col="doc_id", force=True,
    )
    assert rel is not None
    want = sorted(
        r["gram"]
        for r in gs.duplicated_grams(
            grown, "text", k=k, min_count=2, id_col="doc_id"
        ).collect()
    )
    assert sorted(r["gram"] for r in rel.collect()) == want


def test_composition_regime_gate_on_large_delta(spark, tmp_path, monkeypatch):
    """r13 stress finding 2: at 10-20% delta fractions the composition's
    probe costs rival the from-scratch pass (measured 1.45-2.10x), so
    composed_dup_grams gates on delta_rows <= max(MIN_ROWS, MAX_FRAC *
    base_rows) before running any job. Forced here by zeroing the floor;
    the store-plugged operator output stays identical via the inline
    fallback."""
    import bambooai_spark.operators.gram_store as gs
    from bambooai_spark.operators.dedup import exact_substring_cut

    k = 8
    old_rows = [
        (i, f"aa{i:04d}bb BOILERPLATE-BLOCK-000 cc{i:04d}dd")
        for i in range(1, 7)
    ]
    delta_rows = [
        (11, "ee0011ff BOILERPLATE-BLOCK-000 gg0011hh"),
    ]
    cp = str(tmp_path / "corpus")
    _write_docs(spark, cp, old_rows)
    store = str(tmp_path / "gstore")
    gs.build_gram_store(
        spark.read.parquet(cp), "text", store, k=k, min_count=2,
        id_col="doc_id", delta_support=True,
    )
    _write_docs(spark, cp, delta_rows, mode="append")
    grown = spark.read.parquet(cp)
    inv = gs._read_file_inventory(spark, store)
    meta = gs._read_meta(spark, store)

    # floor zeroed: 1 delta row over 6 base rows (17%) exceeds MAX_FRAC
    monkeypatch.setattr(gs, "DELTA_COMPOSE_MIN_ROWS", 0)
    assert gs.composed_dup_grams(
        grown, store, meta, inv, set(grown.inputFiles()),
        min_count=2, text_col="text", id_col="doc_id",
    ) is None
    gated = sorted(
        (r.doc_id, r.clean_text)
        for r in exact_substring_cut(
            grown, "doc_id", "text", k=k, keep_first=True,
            gram_store_path=store,
        ).collect()
    )
    inline = sorted(
        (r.doc_id, r.clean_text)
        for r in exact_substring_cut(
            grown, "doc_id", "text", k=k, keep_first=True
        ).collect()
    )
    assert gated == inline

    # default floor + cost-model gate lifted: the same call composes
    monkeypatch.setattr(gs, "DELTA_COMPOSE_MIN_ROWS", 100_000)
    monkeypatch.setattr(gs, "COMPOSE_COST_RATIO", 1e9)
    assert gs.composed_dup_grams(
        grown, store, meta, inv, set(grown.inputFiles()),
        min_count=2, text_col="text", id_col="doc_id",
    ) is not None


def test_compose_cost_model_default_dispatch(spark, tmp_path):
    """r13 cost model: the build records n_below_grams / n_total_occ and
    composed_dup_grams dispatches driver-side — a BOILERPLATE-heavy
    corpus (posting count dwarfs the sidecar: the store's target shape)
    composes by default; a UNIQUE-heavy corpus (sidecar ~ posting
    count, where the 10x stress measured the probes costing what they
    save) routes to the inline pass."""
    import bambooai_spark.operators.gram_store as gs

    k = 8
    boiler = "SHARED-BOILER-" * 40  # 560 chars, in every doc
    heavy_old = [
        (i, boiler + f"u{i:03d}") for i in range(1, 7)
    ]
    heavy_delta = [(11, boiler + "u011")]
    unique_old = [
        (i, " ".join(f"{i:03d}tok{t}" for t in range(12)))
        for i in range(1, 7)
    ]
    unique_delta = [(11, " ".join(f"011tok{t}x" for t in range(12)))]

    for name, old_rows, delta_rows, composes in (
        ("heavy", heavy_old, heavy_delta, True),
        ("uniq", unique_old, unique_delta, False),
    ):
        cp = str(tmp_path / f"corpus_{name}")
        _write_docs(spark, cp, old_rows)
        store = str(tmp_path / f"gstore_{name}")
        meta = gs.build_gram_store(
            spark.read.parquet(cp), "text", store, k=k, min_count=2,
            id_col="doc_id", delta_support=True,
        )
        assert meta["n_total_occ"] > 0 and "n_below_grams" in meta
        _write_docs(spark, cp, delta_rows, mode="append")
        grown = spark.read.parquet(cp)
        rel = gs.composed_dup_grams(
            grown, store, gs._read_meta(spark, store),
            gs._read_file_inventory(spark, store),
            set(grown.inputFiles()),
            min_count=2, text_col="text", id_col="doc_id",
        )
        assert (rel is not None) == composes, name
        if composes:
            want = sorted(
                r["gram"]
                for r in gs.duplicated_grams(
                    grown, "text", k=k, min_count=2, id_col="doc_id"
                ).collect()
            )
            assert sorted(r["gram"] for r in rel.collect()) == want
