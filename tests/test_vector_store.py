"""Persisted IVF vector store: full-probe exactness vs brute force,
partition-pruned scans, pinned-centroid appends, exact/numpy assignment
parity, and argument/metadata validation."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bambooai_spark.io import load_table
from bambooai_spark.operators.similarity import knn_brute_force, md5_centroids
from bambooai_spark.operators.vector_store import (
    CELL_COL,
    META_NAME,
    append_vector_corpus,
    query_vector_corpus,
    stored_vector,
    write_vector_corpus,
)
from tests.conftest import SF_DIR


def _emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _store(spark, tmp_path, **kw):
    path = str(tmp_path / "vstore")
    meta = write_vector_corpus(_emb(spark), path, n_cells=8, **kw)
    return path, meta


def test_full_probe_equals_brute_force(spark, tmp_path):
    """nprobe == n_cells reads everything — the result must be EXACTLY
    the brute-force top-k (the approximation only restricts which cells
    are read)."""
    path, _ = _store(spark, tmp_path)
    qv = stored_vector(spark, path, 0)
    got = query_vector_corpus(
        spark, path, qv, k=5, nprobe=8, exclude_id=0
    ).collect()
    want = knn_brute_force(
        _emb(spark), "vec_id", "embedding", query_id=0, k=5
    ).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in want
    ]


def test_query_scan_is_partition_pruned(spark, tmp_path):
    """The probe predicate must reach the scan as a PartitionFilter —
    unprobed cell directories are never listed or read."""
    path, _ = _store(spark, tmp_path)
    qv = stored_vector(spark, path, 0)
    q = query_vector_corpus(spark, path, qv, k=5, nprobe=2, exclude_id=0)
    plan = q._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and f"{CELL_COL}#" in pf[0] and " IN (" in pf[0], plan[:2000]
    assert q.count() == 5


def test_append_uses_pinned_centroids(spark, tmp_path):
    """Appends assign against the stored quantizer (no retrain): a
    near-identical appended vector lands queryable, and the metadata is
    byte-identical before and after."""
    path, meta = _store(spark, tmp_path)
    before = json.loads(open(os.path.join(path, META_NAME)).read())
    twin = (
        _emb(spark)
        .filter("vec_id = 0")
        .withColumn("vec_id", F.lit(777777).cast("long"))
    )
    append_vector_corpus(twin, path)
    after = json.loads(open(os.path.join(path, META_NAME)).read())
    assert before == after
    qv = stored_vector(spark, path, 0)
    top = query_vector_corpus(
        spark, path, qv, k=1, nprobe=1, exclude_id=0
    ).collect()
    # the identical twin shares cell 0's nearest cell, so even a 1-cell
    # probe finds it at cosine 1
    assert top[0]["vec_id"] == 777777 and top[0]["cosine"] == 1.0


def test_exact_and_numpy_assignments_agree(spark, tmp_path):
    """The SQL-expansion assignment and the numpy batch assignment are
    the same partitioning on real data (they differ only in float
    rounding on exact centroid-distance ties)."""
    e = _emb(spark)
    cents = md5_centroids(e, "vec_id", "embedding", 8)
    p1 = str(tmp_path / "a")
    p2 = str(tmp_path / "b")
    write_vector_corpus(e, p1, centroids=cents, assign="numpy")
    write_vector_corpus(e, p2, centroids=cents, assign="exact")
    a = {
        (r["vec_id"], r[CELL_COL])
        for r in spark.read.parquet(p1).select("vec_id", CELL_COL).collect()
    }
    b = {
        (r["vec_id"], r[CELL_COL])
        for r in spark.read.parquet(p2).select("vec_id", CELL_COL).collect()
    }
    assert a == b


def test_rebuild_is_deterministic(spark, tmp_path):
    p1 = str(tmp_path / "a")
    p2 = str(tmp_path / "b")
    write_vector_corpus(_emb(spark), p1, n_cells=8)
    write_vector_corpus(_emb(spark), p2, n_cells=8)
    cells = lambda p: sorted(  # noqa: E731
        d for d in os.listdir(p) if d.startswith(f"{CELL_COL}=")
    )
    assert cells(p1) == cells(p2)


def test_validation(spark, tmp_path):
    e = _emb(spark)
    path = str(tmp_path / "vstore")
    with pytest.raises(ValueError, match="assign must be"):
        write_vector_corpus(e, path, assign="gpu")
    with pytest.raises(ValueError, match="not both present"):
        write_vector_corpus(e, path, id_col="nope")
    with pytest.raises(FileNotFoundError, match="no vector store"):
        query_vector_corpus(spark, str(tmp_path / "absent"), [0.0], k=1)
    write_vector_corpus(e, path, n_cells=4)
    with pytest.raises(ValueError, match="query dim"):
        query_vector_corpus(spark, path, [1.0, 2.0], k=1)
    with pytest.raises(ValueError, match="vector dim"):
        append_vector_corpus(
            e.withColumn("embedding", F.slice("embedding", 1, 3)), path
        )
    with pytest.raises(ValueError, match="not in the vector store"):
        stored_vector(spark, path, -1)
    with pytest.raises(ValueError, match="ivf_cell"):
        write_vector_corpus(
            e.withColumn(CELL_COL, F.lit(1)), str(tmp_path / "v2")
        )


def test_append_schema_drift_rejected(spark, tmp_path):
    e = _emb(spark)
    path = str(tmp_path / "vstore")
    write_vector_corpus(e, path, n_cells=4)
    with pytest.raises(ValueError, match="pinned"):
        append_vector_corpus(e.drop("label"), path)  # narrower frame
    with pytest.raises(ValueError, match="pinned"):
        append_vector_corpus(  # wider frame
            e.withColumn("extra", F.lit(1)), path
        )


def test_rebuild_fewer_cells_under_dynamic_overwrite(spark, tmp_path):
    """A rebuild with fewer cells must remove the dropped cells'
    directories even when the session runs dynamic partition-overwrite
    (static is forced at the write) — stale dirs would read back as
    duplicate vectors under metadata claiming fewer cells."""
    e = _emb(spark)
    path = str(tmp_path / "vstore")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        write_vector_corpus(e, path, n_cells=8)
        write_vector_corpus(e.filter("vec_id < 20"), path, n_cells=2)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    cells = [d for d in os.listdir(path) if d.startswith(f"{CELL_COL}=")]
    assert len(cells) <= 2, cells
    assert spark.read.parquet(path).count() == 20


def test_exact_assign_keeps_null_id(spark):
    """ivf_assign_exact must not silently drop a NULL-id row (an inner
    equi-join would); parity with the numpy path."""
    from bambooai_spark.operators.similarity import ivf_assign_exact

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (None, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    got = ivf_assign_exact(
        df, "vec_id", "embedding", [[1.0, 0.0], [0.0, 1.0]]
    )
    assert got.count() == 2
    rows = {r["vec_id"]: r["ivf_cell"] for r in got.collect()}
    assert rows[None] == 1 and rows[1] == 0


def test_batch_query_matches_single(spark, tmp_path):
    """The batch path's per-query answers are IDENTICAL to the
    single-query path (same probe, same scores, same tie-break)."""
    from bambooai_spark.operators.vector_store import (
        query_vector_corpus_many,
    )

    path, _ = _store(spark, tmp_path)
    qids = [0, 7, 23]
    queries = spark.createDataFrame(
        [(i, stored_vector(spark, path, i)) for i in qids],
        "qid long, qvec array<double>",
    )
    batch = query_vector_corpus_many(
        spark, path, queries, k=5, nprobe=3, exclude_self=True
    ).collect()
    got = {
        q: [(r["vec_id"], r["cosine"]) for r in sorted(
            (x for x in batch if x["qid"] == q),
            key=lambda x: (-x["cosine"], x["vec_id"]),
        )]
        for q in qids
    }
    for q in qids:
        want = query_vector_corpus(
            spark, path, stored_vector(spark, path, q),
            k=5, nprobe=3, exclude_id=q,
        ).collect()
        assert got[q] == [(r["vec_id"], r["cosine"]) for r in want], q


def test_batch_query_scan_partition_pruned(spark, tmp_path):
    """Even with join-delivered probes, the scan keeps a LITERAL
    partition filter (the distinct probed-cell union is bounded by
    n_cells and collected to an isin)."""
    from bambooai_spark.operators.vector_store import (
        query_vector_corpus_many,
    )

    path, _ = _store(spark, tmp_path)
    queries = spark.createDataFrame(
        [(1, stored_vector(spark, path, 0))], "qid long, qvec array<double>"
    )
    q = query_vector_corpus_many(
        spark, path, queries, k=3, nprobe=2, checkpoint=False
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    pf = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and f"{CELL_COL}#" in ln and " IN (" in ln
    ]
    assert pf, plan[:3000]
    assert q.count() == 3


def test_batch_query_unbroadcast_path(spark, tmp_path):
    from bambooai_spark.operators.vector_store import (
        query_vector_corpus_many,
    )

    path, _ = _store(spark, tmp_path)
    queries = spark.createDataFrame(
        [(1, stored_vector(spark, path, 0)), (2, stored_vector(spark, path, 5))],
        "qid long, qvec array<double>",
    )
    a = query_vector_corpus_many(
        spark, path, queries, k=4, nprobe=8, broadcast_queries=True
    ).collect()
    b = query_vector_corpus_many(
        spark, path, queries, k=4, nprobe=8, broadcast_queries=False
    ).collect()
    key = lambda r: (r["qid"], r["vec_id"])  # noqa: E731
    assert sorted(
        [(r["qid"], r["vec_id"], r["cosine"]) for r in a]
    ) == sorted([(r["qid"], r["vec_id"], r["cosine"]) for r in b])


# --------------------------------------------------------------------------
# rebuild_vector_store: drift → skew → retrain (VERDICT r8 #5)


def _shifted(spark, lo, hi, offset=50.0, dim=None):
    """Embeddings far outside the training distribution — the drift."""
    e = _emb(spark)
    if dim is None:
        dim = len(e.select("embedding").first()[0])
    rows = [
        (i, [offset + (i % 7) * 0.01 + j * 0.001 for j in range(dim)])
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_drift_skews_cells_and_rebuild_rebalances(spark, tmp_path):
    from bambooai_spark.operators.maintenance import (
        suggest_vector_maintenance,
    )
    from bambooai_spark.operators.vector_store import (
        rebuild_vector_store,
        vector_store_skew,
    )

    path = str(tmp_path / "vstore")
    base = _emb(spark).select("vec_id", "embedding")
    meta = write_vector_corpus(base, path, n_cells=8)
    n0 = base.count()
    # a drifted distribution lands in ONE old cell (all far from every
    # trained centroid in the same direction)
    drift = _shifted(spark, 10_000, 10_000 + 3 * n0)
    append_vector_corpus(drift, path)
    sk = vector_store_skew(spark, path)
    assert sk["rows"] == 4 * n0
    assert sk["skew"] > 3.0  # 3n0 drifted rows concentrated
    adv = {r["check"]: r for r in
           suggest_vector_maintenance(spark, path).collect()}
    assert adv["cell_skew"]["severity"] == "warn"
    assert "rebuild_vector_store" in adv["cell_skew"]["recommendation"]

    new_meta = rebuild_vector_store(spark, path)
    assert new_meta["rebuild_gen"] == 1
    assert new_meta["n_cells"] == meta["n_cells"]
    sk2 = vector_store_skew(spark, path)
    assert sk2["rows"] == 4 * n0  # no vector lost or duplicated
    assert sk2["skew"] < sk["skew"]  # re-balanced
    adv2 = {r["check"]: r for r in
            suggest_vector_maintenance(spark, path).collect()}
    assert "cell_skew" not in adv2

    # recall restored: with a small probe budget the drifted query now
    # finds its true neighbors (they have their own cells again)
    qv = [50.0 + 3 * 0.01 + j * 0.001
          for j in range(new_meta["dim"])]
    got = [r["vec_id"] for r in query_vector_corpus(
        spark, path, qv, k=5, nprobe=2
    ).collect()]
    all_vecs = base.union(
        _shifted(spark, 10_000, 10_000 + 3 * n0).select(
            "vec_id", F.col("embedding").cast("array<float>")
        )
    )
    from bambooai_spark.functions.vectors import as_double, cosine

    scored = all_vecs.withColumn(
        "_cos", cosine(as_double("embedding"), F.lit([float(x) for x in qv]))
    )
    want = [r["vec_id"] for r in
            scored.orderBy(F.desc("_cos"), "vec_id").limit(5).collect()]
    assert set(got) == set(want)


def test_rebuild_crash_mid_swap_resumes(spark, tmp_path, monkeypatch):
    from bambooai_spark.operators import vector_store as vs
    from bambooai_spark.operators import writer as w

    path = str(tmp_path / "vstore")
    base = _emb(spark).select("vec_id", "embedding")
    meta = write_vector_corpus(base, path, n_cells=8)
    n0 = base.count()
    append_vector_corpus(_shifted(spark, 10_000, 10_000 + n0), path)

    # crash INSIDE the swap: after staging + flag, before unhide
    real_unhide = w._unhide_swapped

    def boom(*a, **k):
        raise RuntimeError("injected crash before unhide")

    monkeypatch.setattr(w, "_unhide_swapped", boom)
    with pytest.raises(RuntimeError, match="injected"):
        vs.rebuild_vector_store(spark, path)
    monkeypatch.setattr(w, "_unhide_swapped", real_unhide)

    # readers refuse loudly mid-swap
    with pytest.raises(RuntimeError, match="mid-rebuild"):
        query_vector_corpus(spark, path, [0.0] * meta["dim"], k=1)
    with pytest.raises(RuntimeError, match="mid-rebuild"):
        append_vector_corpus(_shifted(spark, 99_000, 99_001), path)

    # re-running resumes and completes the swap
    new_meta = vs.rebuild_vector_store(spark, path)
    assert new_meta["rebuild_gen"] == 1
    from bambooai_spark.operators.vector_store import vector_store_skew

    sk = vector_store_skew(spark, path)
    assert sk["rows"] == 2 * n0
    # store fully functional again
    qv = stored_vector(spark, path, 0)
    assert query_vector_corpus(
        spark, path, qv, k=3, nprobe=meta["n_cells"]
    ).count() == 3


def test_refresh_survives_rebuild(spark, tmp_path):
    """The incremental-refresh lifecycle continues across a retrain:
    the rebuild carries the corpus watermark, and the next refresh
    appends against the NEW pinned centroids."""
    from bambooai_spark.operators.vector_store import (
        rebuild_vector_store,
        refresh_vector_store,
        set_corpus_watermark,
    )
    from bambooai_spark.operators.writer import append_corpus_txn

    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "vstore")
    e = _emb(spark).withColumn(
        "lang", F.when(F.col("vec_id") % 2 == 0, "en").otherwise("de")
    ).withColumn("text", F.concat(F.lit("doc "), F.col("vec_id")))
    docs = e.select(
        F.col("vec_id").alias("doc_id"), "lang", "text", "embedding"
    )
    append_corpus_txn(docs.filter("doc_id % 2 = 0"), corpus, 0)

    def embed(changes):
        return changes.select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )

    write_vector_corpus(
        embed(__import__("bambooai_spark.operators.writer",
                         fromlist=["read_corpus"]).read_corpus(spark, corpus)),
        store, n_cells=4,
    )
    set_corpus_watermark(spark, store, 0)

    append_corpus_txn(docs.filter("doc_id % 2 = 1"), corpus, 1)
    out = refresh_vector_store(spark, corpus, store, embed)
    assert out["watermark"] == 1 and out["n_new"] > 0

    meta = rebuild_vector_store(spark, store)
    assert meta["corpus_watermark"] == 1  # carried across the retrain

    append_corpus_txn(
        docs.filter("doc_id % 2 = 1")
        .withColumn("doc_id", F.col("doc_id") + 100_000)
        .withColumn("text", F.concat(F.lit("new doc "), F.col("doc_id"))),
        corpus, 2,
    )
    out2 = refresh_vector_store(spark, corpus, store, embed)
    assert out2["watermark"] == 2 and out2["n_new"] > 0
    # every vector is assigned under the CURRENT quantizer: a full
    # probe returns exact brute-force answers over the whole store
    qv = stored_vector(spark, store, 0)
    got = query_vector_corpus(
        spark, store, qv, k=5, nprobe=meta["n_cells"], exclude_id=0
    )
    assert got.count() == 5


def test_auto_maintain_vector_store(spark, tmp_path, monkeypatch):
    """The vector-store ops loop: frozen rebuild always resumes; a skew
    retrain is report-only unless explicitly opted in (it rewrites every
    vector and moves cell boundaries)."""
    from bambooai_spark.operators import writer as w
    from bambooai_spark.operators.maintenance import (
        auto_maintain_vector_store,
    )
    from bambooai_spark.operators import vector_store as vs

    path = str(tmp_path / "vstore")
    base = _emb(spark).select("vec_id", "embedding")
    write_vector_corpus(base, path, n_cells=8)
    n0 = base.count()

    # healthy: nothing to do (every residual advice row is reported)
    res = {r["action"]: r for r in
           auto_maintain_vector_store(spark, path).collect()}
    assert set(res) == {"none[cells]"}
    assert not res["none[cells]"]["executed"]

    # skew: report-only by default, retrain on opt-in
    append_vector_corpus(_shifted(spark, 10_000, 10_000 + 3 * n0), path)
    res = {r["action"]: r for r in
           auto_maintain_vector_store(spark, path).collect()}
    assert not res["rebuild_vector_store"]["executed"]
    assert "rebuild_on_skew=True" in res["rebuild_vector_store"]["detail"]
    res = {r["action"]: r for r in auto_maintain_vector_store(
        spark, path, rebuild_on_skew=True
    ).collect()}
    assert res["rebuild_vector_store"]["executed"]
    res = {r["action"]: r for r in
           auto_maintain_vector_store(spark, path).collect()}
    assert any(a.startswith("none[") for a in res)  # converged

    # frozen swap: resumed unconditionally (dry_run only reports)
    def boom(*a, **k):
        raise RuntimeError("injected")

    real = w._unhide_swapped
    monkeypatch.setattr(w, "_unhide_swapped", boom)
    with pytest.raises(RuntimeError, match="injected"):
        vs.rebuild_vector_store(spark, path)
    monkeypatch.setattr(w, "_unhide_swapped", real)
    res = {r["action"]: r for r in auto_maintain_vector_store(
        spark, path, dry_run=True
    ).collect()}
    assert not res["resume_rebuild"]["executed"]
    res = {r["action"]: r for r in
           auto_maintain_vector_store(spark, path).collect()}
    assert res["resume_rebuild"]["executed"]
    qv = stored_vector(spark, path, 0)
    assert query_vector_corpus(spark, path, qv, k=3, nprobe=8).count() == 3


def test_vector_advisor_flags_refresh_lag(spark, tmp_path):
    from bambooai_spark.operators.maintenance import (
        suggest_vector_maintenance,
    )
    from bambooai_spark.operators.vector_store import set_corpus_watermark
    from bambooai_spark.operators.writer import append_corpus_txn

    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "vstore")
    e = _emb(spark).select("vec_id", "embedding")
    docs = e.select(
        F.col("vec_id").alias("doc_id"),
        F.when(F.col("vec_id") % 2 == 0, "en").otherwise("de").alias("lang"),
        F.concat(F.lit("doc "), F.col("vec_id")).alias("text"),
        "embedding",
    )
    append_corpus_txn(docs.filter("doc_id % 2 = 0"), corpus, 0)
    write_vector_corpus(e.filter("vec_id % 2 = 0"), store, n_cells=4)

    def adv():
        return {
            r["check"]: r.asDict()
            for r in suggest_vector_maintenance(
                spark, store, corpus_path=corpus
            ).collect()
        }

    # no watermark pinned: the follower cannot follow — info
    assert adv()["refresh_lag"]["severity"] == "info"
    set_corpus_watermark(spark, store, 0)
    assert adv()["refresh_lag"]["severity"] == "ok"

    # new corpus batch: the store silently serves stale answers — warn
    append_corpus_txn(docs.filter("doc_id % 2 = 1"), corpus, 1)
    lag = adv()["refresh_lag"]
    assert lag["severity"] == "warn"
    assert "refresh_vector_store" in lag["recommendation"]

    # without corpus_path the check is absent (store-only advisor call)
    solo = {
        r["check"]: r
        for r in suggest_vector_maintenance(spark, store).collect()
    }
    assert "refresh_lag" not in solo


def test_auto_maintain_heals_refresh_lag(spark, tmp_path):
    """VERDICT r9 #2 closed: the ops loop sees the refresh-lag check and
    executes the safe append-only refresh — corpus commits past the
    watermark -> auto_maintain_vector_store(corpus_path=) refreshes ->
    the advisor returns ok; dry_run previews without touching the
    store."""
    from bambooai_spark.operators.maintenance import (
        auto_maintain_vector_store,
        suggest_vector_maintenance,
    )
    from bambooai_spark.operators.vector_store import set_corpus_watermark
    from bambooai_spark.operators.writer import append_corpus_txn

    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "vstore")
    e = _emb(spark).select("vec_id", "embedding")
    docs = e.select(
        F.col("vec_id").alias("doc_id"),
        F.when(F.col("vec_id") % 2 == 0, "en").otherwise("de").alias("lang"),
        F.concat(F.lit("doc "), F.col("vec_id")).alias("text"),
        "embedding",
    )
    append_corpus_txn(docs.filter("doc_id % 2 = 0"), corpus, 0)
    write_vector_corpus(e.filter("vec_id % 2 = 0"), store, n_cells=4)
    set_corpus_watermark(spark, store, 0)
    n0 = spark.read.parquet(store).count()

    def embed(changes):
        return changes.select(F.col("doc_id").alias("vec_id"), "embedding")

    # corpus moves past the watermark: the store is a stale follower
    append_corpus_txn(docs.filter("doc_id % 2 = 1"), corpus, 1)

    # dry_run previews the refresh and changes nothing
    res = {r["action"]: r for r in auto_maintain_vector_store(
        spark, store, corpus_path=corpus, embed=embed, dry_run=True
    ).collect()}
    assert not res["refresh_vector_store"]["executed"]
    assert "would refresh" in res["refresh_vector_store"]["detail"]
    assert spark.read.parquet(store).count() == n0

    # real run heals: vectors appended, watermark advanced
    res = {r["action"]: r for r in auto_maintain_vector_store(
        spark, store, corpus_path=corpus, embed=embed
    ).collect()}
    assert res["refresh_vector_store"]["executed"]
    assert spark.read.parquet(store).count() > n0

    # advisor converges to ok, and the loop reports the residual rows
    adv = {r["check"]: r for r in suggest_vector_maintenance(
        spark, store, corpus_path=corpus
    ).collect()}
    assert adv["refresh_lag"]["severity"] == "ok"
    res = {r["action"]: r for r in auto_maintain_vector_store(
        spark, store, corpus_path=corpus, embed=embed
    ).collect()}
    assert set(res) == {"none[cells]", "none[refresh_lag]"}
    assert not any(r["executed"] for r in res.values())

    # without corpus_path the loop is store-only, as before
    res = {r["action"]: r for r in
           auto_maintain_vector_store(spark, store).collect()}
    assert set(res) == {"none[cells]"}


def test_validate_vector_store_fsck(spark, tmp_path):
    """The vector-store fsck (VERDICT r9 #7): healthy store green on
    every check; each injected corruption turns exactly its check red
    with forensics; healing turns it back green; the advisor surfaces
    the cheap checks as fsck_* rows."""
    import os
    import shutil

    from bambooai_spark.operators.maintenance import (
        suggest_vector_maintenance,
    )
    from bambooai_spark.operators.vector_store import (
        set_corpus_watermark,
        validate_vector_store,
    )
    from bambooai_spark.operators.writer import (
        append_corpus_txn,
        compact_corpus,
    )

    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "vstore")
    e = _emb(spark).select("vec_id", "embedding")
    docs = e.select(
        F.col("vec_id").alias("doc_id"),
        F.when(F.col("vec_id") % 2 == 0, "en").otherwise("de").alias("lang"),
        F.concat(F.lit("doc "), F.col("vec_id")).alias("text"),
        "embedding",
    )
    append_corpus_txn(docs, corpus, 0)
    write_vector_corpus(e, store, n_cells=4)
    set_corpus_watermark(spark, store, 0)

    def checks(**kw):
        return {r["check"]: r for r in
                validate_vector_store(spark, store, **kw).collect()}

    # healthy: every check green, deep and corpus-aware included
    got = checks(deep=True, corpus_path=corpus)
    assert {n for n, r in got.items() if not r["ok"]} == set()
    assert set(got) == {"meta", "frozen_rebuild", "orphan_staging",
                        "swap_leftovers", "stale_generations",
                        "cells_vs_meta", "watermark"}

    # orphan staging: abandoned pre-publish attempt
    os.makedirs(os.path.join(store, "_rebuild_tmp", "data"), exist_ok=True)
    got = checks()
    assert not got["orphan_staging"]["ok"]
    adv = {r["check"]: r for r in
           suggest_vector_maintenance(spark, store).collect()}
    assert adv["fsck_orphan_staging"]["severity"] == "warn"
    shutil.rmtree(os.path.join(store, "_rebuild_tmp"))
    assert checks()["orphan_staging"]["ok"]

    # swap leftovers: a hidden swap file with no frozen rebuild
    cell = next(d for d in os.listdir(store) if d.startswith("ivf_cell="))
    leftover = os.path.join(store, cell, "_swap-r1-zombie.parquet")
    open(leftover, "w").close()
    got = checks(deep=True)
    assert not got["swap_leftovers"]["ok"]
    assert "_swap-r1-zombie" in got["swap_leftovers"]["detail"]
    os.remove(leftover)
    assert checks(deep=True)["swap_leftovers"]["ok"]

    # stale generation: a live r<k>- file from a swap that should have
    # deleted it (current gen is 0 — never rebuilt)
    zombie = os.path.join(store, cell, "r7-zombie.parquet")
    open(zombie, "w").close()
    got = checks(deep=True)
    assert not got["stale_generations"]["ok"]
    assert "[7]" in got["stale_generations"]["detail"]
    os.remove(zombie)
    assert checks(deep=True)["stale_generations"]["ok"]

    # cells vs meta: a cell directory outside the pinned quantizer
    badcell = os.path.join(store, "ivf_cell=99")
    os.makedirs(badcell)
    open(os.path.join(badcell, "part-0.parquet"), "w").close()
    got = checks(deep=True)
    assert not got["cells_vs_meta"]["ok"]
    assert "[99]" in got["cells_vs_meta"]["detail"]
    shutil.rmtree(badcell)
    assert checks(deep=True)["cells_vs_meta"]["ok"]

    # watermark vs corpus floor: maintenance rewrote the replay window
    # past the store's watermark -> incremental refresh is unsound.
    # Injected the way the writer's own fsck tests inject states: bump
    # the manifest's as_of_floor past the pinned watermark (compaction/
    # delete folds write exactly this field via _bump_manifest_floor).
    append_corpus_txn(
        docs.withColumn("doc_id", F.col("doc_id") + 10_000), corpus, 1
    )
    compact_corpus(spark, corpus)
    from bambooai_spark.operators.writer import MANIFEST_NAME

    mpath = os.path.join(corpus, MANIFEST_NAME)
    doc = json.loads(open(mpath).read())
    doc["as_of_floor"] = 5
    open(mpath, "w").write(json.dumps(doc))
    crc = os.path.join(corpus, f".{MANIFEST_NAME}.crc")
    if os.path.exists(crc):  # hadoop's local-fs checksum sidecar
        os.remove(crc)
    got = checks(corpus_path=corpus)
    assert not got["watermark"]["ok"]
    assert "floor" in got["watermark"]["detail"]
    adv = {r["check"]: r for r in suggest_vector_maintenance(
        spark, store, corpus_path=corpus
    ).collect()}
    assert adv["fsck_watermark"]["severity"] == "warn"
    assert "re-baseline" in adv["fsck_watermark"]["recommendation"]
    # heal: re-baseline the watermark at the corpus head
    set_corpus_watermark(spark, store, 5)
    assert checks(corpus_path=corpus)["watermark"]["ok"]

    # frozen rebuild reports its age and stays the advisor's early-out
    open(os.path.join(store, "_REBUILD.json"), "w").write(
        '{"gen": 3, "meta": {}}'
    )
    got = checks()
    assert not got["frozen_rebuild"]["ok"]
    assert "gen 3" in got["frozen_rebuild"]["detail"]
    assert "s —" in got["frozen_rebuild"]["detail"]  # age reported
    os.remove(os.path.join(store, "_REBUILD.json"))


def test_auto_maintain_skips_unsound_refresh(spark, tmp_path):
    """Review r10: when the corpus's maintenance floor passed the
    store's watermark, the heal loop must REPORT the re-baseline (the
    fsck_watermark advice it already collected) instead of executing a
    refresh that raises read_corpus_changes' floor guard mid-plan."""
    from bambooai_spark.operators.maintenance import (
        auto_maintain_vector_store,
    )
    from bambooai_spark.operators.vector_store import set_corpus_watermark
    from bambooai_spark.operators.writer import (
        MANIFEST_NAME,
        append_corpus_txn,
    )

    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "vstore")
    e = _emb(spark).select("vec_id", "embedding")
    docs = e.select(
        F.col("vec_id").alias("doc_id"),
        F.when(F.col("vec_id") % 2 == 0, "en").otherwise("de").alias("lang"),
        F.concat(F.lit("doc "), F.col("vec_id")).alias("text"),
        "embedding",
    )
    append_corpus_txn(docs.filter("doc_id % 2 = 0"), corpus, 0)
    write_vector_corpus(e.filter("vec_id % 2 = 0"), store, n_cells=4)
    set_corpus_watermark(spark, store, 0)
    # corpus moves ahead AND its floor passes the watermark (injected
    # the way the fsck test injects it: the exact field maintenance
    # ops write via _bump_manifest_floor)
    append_corpus_txn(docs.filter("doc_id % 2 = 1"), corpus, 1)
    mpath = os.path.join(corpus, MANIFEST_NAME)
    doc = json.loads(open(mpath).read())
    doc["as_of_floor"] = 1
    open(mpath, "w").write(json.dumps(doc))
    crc = os.path.join(corpus, f".{MANIFEST_NAME}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    def embed(changes):
        return changes.select(F.col("doc_id").alias("vec_id"), "embedding")

    n0 = spark.read.parquet(store).count()
    res = {r["action"]: r for r in auto_maintain_vector_store(
        spark, store, corpus_path=corpus, embed=embed
    ).collect()}  # must not raise
    assert not res["refresh_vector_store"]["executed"]
    assert "floor" in res["refresh_vector_store"]["detail"]
    assert "none[fsck_watermark]" in res
    assert spark.read.parquet(store).count() == n0  # nothing touched


# ------------------------------------------------------------- IVF-PQ


def _pq_store(spark, tmp_path, **kw):
    path = str(tmp_path / "pqstore")
    meta = write_vector_corpus(
        _emb(spark), path, n_cells=8, pq_m=8, pq_ksub=32, **kw
    )
    return path, meta


def test_pq_store_writes_codes_and_meta(spark, tmp_path):
    from bambooai_spark.operators.vector_store import PQ_COL

    path, meta = _pq_store(spark, tmp_path)
    assert meta["pq"]["m"] == 8 and meta["pq"]["ksub"] == 32
    assert len(meta["pq"]["codebooks"]) == 8
    # the code column is persisted next to the vectors in every cell
    df = spark.read.parquet(path)
    assert PQ_COL in df.columns
    codes = df.select(PQ_COL).limit(5).collect()
    assert all(len(r[PQ_COL]) == 8 for r in codes)
    assert df.filter(F.col(PQ_COL).isNull()).count() == 0
    # pinned columns stay the RAW input set — appends pass raw rows
    assert PQ_COL not in meta["columns"]


def test_pq_query_full_refine_equals_exact(spark, tmp_path):
    """With the shortlist as wide as the probed rows, the PQ path must
    return EXACTLY the non-PQ answer (the ADC stage then restricts
    nothing; scores are exact cosines either way)."""
    path, _ = _pq_store(spark, tmp_path)
    qv = stored_vector(spark, path, 0)
    want = query_vector_corpus(
        spark, path, qv, k=5, nprobe=8, exclude_id=0
    ).collect()
    got = query_vector_corpus(
        spark, path, qv, k=5, nprobe=8, exclude_id=0,
        use_pq=True, refine=200,  # 200*5 = 1000 > 500 rows
    ).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in want
    ]


def test_pq_query_recall_at_narrow_refine(spark, tmp_path):
    path, _ = _pq_store(spark, tmp_path)
    recalls = []
    for qid in (0, 7, 23):
        qv = stored_vector(spark, path, qid)
        want = {
            r["vec_id"]
            for r in query_vector_corpus(
                spark, path, qv, k=10, nprobe=8, exclude_id=qid
            ).collect()
        }
        got = {
            r["vec_id"]
            for r in query_vector_corpus(
                spark, path, qv, k=10, nprobe=8, exclude_id=qid,
                use_pq=True, refine=4,
            ).collect()
        }
        recalls.append(len(want & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_pq_append_encodes_against_pinned_codebooks(spark, tmp_path):
    from bambooai_spark.operators.vector_store import PQ_COL

    path, meta = _pq_store(spark, tmp_path)
    extra = _emb(spark).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    append_vector_corpus(extra, path)
    df = spark.read.parquet(path)
    new = df.filter(F.col("vec_id") >= 100000)
    assert new.count() == 500
    assert new.filter(F.col(PQ_COL).isNull()).count() == 0
    # pinned codebooks: the appended twin of a base row gets the SAME code
    pairs = (
        df.filter(F.col("vec_id").isin([3, 100003, 7, 100007]))
        .select("vec_id", PQ_COL)
        .collect()
    )
    by_id = {r["vec_id"]: list(r[PQ_COL]) for r in pairs}
    assert by_id[3] == by_id[100003]
    assert by_id[7] == by_id[100007]


def test_pq_rebuild_retrains_codebooks_and_queries_survive(spark, tmp_path):
    from bambooai_spark.operators.vector_store import (
        PQ_COL,
        rebuild_vector_store,
    )

    path, meta = _pq_store(spark, tmp_path)
    qv = stored_vector(spark, path, 0)
    new_meta = rebuild_vector_store(spark, path)
    assert new_meta["pq"]["m"] == 8 and new_meta["pq"]["ksub"] == 32
    # the rebuilt store still answers PQ queries, exactly at full refine
    want = query_vector_corpus(
        spark, path, qv, k=5, nprobe=8, exclude_id=0
    ).collect()
    got = query_vector_corpus(
        spark, path, qv, k=5, nprobe=8, exclude_id=0,
        use_pq=True, refine=200,
    ).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in want
    ]
    assert spark.read.parquet(path).filter(
        F.col(PQ_COL).isNull()
    ).count() == 0


def test_pq_query_refused_without_codebooks(spark, tmp_path):
    path = str(tmp_path / "plain")
    write_vector_corpus(_emb(spark), path, n_cells=8)
    qv = stored_vector(spark, path, 0)
    with pytest.raises(ValueError, match="without PQ codebooks"):
        query_vector_corpus(spark, path, qv, k=5, use_pq=True)


def test_pq_meta_fsck(spark, tmp_path):
    from bambooai_spark.operators.vector_store import (
        validate_vector_store,
    )

    path, _ = _pq_store(spark, tmp_path)
    rows = {r["check"]: r for r in validate_vector_store(spark, path).collect()}
    assert rows["pq_meta"]["ok"], rows["pq_meta"]["detail"]
    # corrupt: drop one codebook -> the tiling check goes red
    mp = os.path.join(path, META_NAME)
    meta = json.loads(open(mp).read())
    meta["pq"]["codebooks"] = meta["pq"]["codebooks"][:-1]
    open(mp, "w").write(json.dumps(meta))
    crc = os.path.join(path, f".{META_NAME}.crc")  # hadoop LocalFS sidecar
    if os.path.exists(crc):
        os.remove(crc)
    rows = {r["check"]: r for r in validate_vector_store(spark, path).collect()}
    assert not rows["pq_meta"]["ok"]
    assert "do not tile" in rows["pq_meta"]["detail"]


def test_pq_exact_assign_store_is_engine_portable(spark, tmp_path):
    """assign='exact' + md5 codebooks: the persisted codes equal the
    Arrow/numpy encode on the same books — the parity the oracle spec
    builds on."""
    import numpy as np

    from bambooai_spark.operators.pq import md5_pq_codebooks, pq_encode
    from bambooai_spark.operators.vector_store import PQ_COL

    e = _emb(spark)
    books = md5_pq_codebooks(e, "vec_id", "embedding", m=8, ksub=16)
    path = str(tmp_path / "exact_pq")
    write_vector_corpus(
        e, path, centroids=md5_centroids(e, "vec_id", "embedding", 8),
        assign="exact", pq_codebooks=books,
    )
    stored = {
        r["vec_id"]: list(r[PQ_COL])
        for r in spark.read.parquet(path).select("vec_id", PQ_COL).collect()
    }
    want = {
        r["vec_id"]: list(r["c"])
        for r in pq_encode(e, "embedding", np.asarray(books), out_col="c")
        .select("vec_id", "c")
        .collect()
    }
    assert stored == want


def test_pq_rebuild_crash_mid_swap_preserves_codebooks(
    spark, tmp_path, monkeypatch
):
    """A rebuild of a PQ store that crashes after the publish point must
    resume with the RETRAINED codebooks from the flag — not lose PQ, not
    re-pin the stale books — and the resumed store answers PQ queries."""
    from bambooai_spark.operators import vector_store as vs
    from bambooai_spark.operators import writer as w
    from bambooai_spark.operators.vector_store import PQ_COL

    path = str(tmp_path / "pqstore")
    base = _emb(spark).select("vec_id", "embedding")
    meta = write_vector_corpus(base, path, n_cells=8, pq_m=8, pq_ksub=16)
    old_books = meta["pq"]["codebooks"]
    n0 = base.count()
    append_vector_corpus(_shifted(spark, 10_000, 10_000 + n0), path)

    real_unhide = w._unhide_swapped

    def boom(*a, **k):
        raise RuntimeError("injected crash before unhide")

    monkeypatch.setattr(w, "_unhide_swapped", boom)
    with pytest.raises(RuntimeError, match="injected"):
        vs.rebuild_vector_store(spark, path)
    monkeypatch.setattr(w, "_unhide_swapped", real_unhide)

    new_meta = vs.rebuild_vector_store(spark, path)
    assert new_meta["rebuild_gen"] == 1
    pq = new_meta["pq"]
    assert pq["m"] == 8 and pq["ksub"] == 16
    # the drifted corpus retrained the books — they must differ from the
    # pre-rebuild ones (half the sample now sits at offset +50)
    assert pq["codebooks"] != old_books
    df = spark.read.parquet(path)
    assert df.filter(F.col(PQ_COL).isNull()).count() == 0
    assert df.count() == 2 * n0
    qv = stored_vector(spark, path, 0)
    got = query_vector_corpus(
        spark, path, qv, k=3, nprobe=8, use_pq=True, refine=400,
        exclude_id=0,
    ).collect()
    want = query_vector_corpus(
        spark, path, qv, k=3, nprobe=8, exclude_id=0
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_pq_batch_query_matches_single(spark, tmp_path):
    """Batch ADC (joined-codebook fold) and single-query ADC (driver LUT)
    must shortlist identically — the fold orders are bit-identical by
    construction — so per query the batch answers equal the single-query
    answers exactly."""
    from bambooai_spark.operators.vector_store import (
        query_vector_corpus_many,
    )

    path, _ = _pq_store(spark, tmp_path)
    qids = [0, 7, 23]
    queries = spark.createDataFrame(
        [(qid, stored_vector(spark, path, qid)) for qid in qids],
        "qid long, qvec array<double>",
    )
    batch = query_vector_corpus_many(
        spark, path, queries, k=5, nprobe=8, exclude_self=True,
        use_pq=True, refine=4,
    ).collect()
    got = {}
    for r in batch:
        got.setdefault(r["qid"], []).append((r["vec_id"], r["cosine"]))
    for qid in qids:
        single = [
            (r["vec_id"], r["cosine"])
            for r in query_vector_corpus(
                spark, path, stored_vector(spark, path, qid),
                k=5, nprobe=8, exclude_id=qid, use_pq=True, refine=4,
            ).collect()
        ]
        assert got[qid] == single, qid


def test_pq_batch_query_refused_without_codebooks(spark, tmp_path):
    from bambooai_spark.operators.vector_store import (
        query_vector_corpus_many,
    )

    path = str(tmp_path / "plain")
    write_vector_corpus(_emb(spark), path, n_cells=4)
    queries = spark.createDataFrame(
        [(1, stored_vector(spark, path, 0))], "qid long, qvec array<double>"
    )
    with pytest.raises(ValueError, match="without PQ codebooks"):
        query_vector_corpus_many(
            spark, path, queries, k=3, use_pq=True
        )


def test_pq_rebuild_recovers_requested_ksub(spark, tmp_path):
    """A store first built on a corpus smaller than the requested ksub
    clamps the codebooks — but the REQUESTED size is pinned, so a
    rebuild after the corpus grows retrains at full resolution."""
    from bambooai_spark.operators.vector_store import rebuild_vector_store

    tiny = _emb(spark).filter("vec_id < 40").select("vec_id", "embedding")
    path = str(tmp_path / "grow")
    meta = write_vector_corpus(tiny, path, n_cells=4, pq_m=8, pq_ksub=256)
    assert meta["pq"]["ksub"] == 40  # clamped to the sample rows
    assert meta["pq"]["ksub_requested"] == 256
    rest = _emb(spark).filter("vec_id >= 40").select("vec_id", "embedding")
    append_vector_corpus(rest, path)
    new_meta = rebuild_vector_store(spark, path)
    assert new_meta["pq"]["ksub"] == 256  # full resolution regained
    assert new_meta["pq"]["ksub_requested"] == 256


def test_pq_query_respects_where_filter(spark, tmp_path):
    """Filtered ANN through the ADC stage: with use_pq the predicate
    still applies BEFORE the shortlist, so the answer is the true top-k
    among matching rows — never a post-filtered under-full list. Single
    and batch paths agree with the non-PQ filtered answer exactly at
    full refine."""
    from bambooai_spark.operators.vector_store import (
        query_vector_corpus_many,
    )

    path, _ = _pq_store(spark, tmp_path)
    qv = stored_vector(spark, path, 0)
    where = [("label", ">=", 2)]
    want = query_vector_corpus(
        spark, path, qv, k=5, nprobe=8, exclude_id=0, where=where
    ).collect()
    assert len(want) == 5
    got = query_vector_corpus(
        spark, path, qv, k=5, nprobe=8, exclude_id=0, where=where,
        use_pq=True, refine=200,
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # every returned row satisfies the predicate (the true-top-k side)
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(path).select("vec_id", "label").collect()
    }
    assert all(labels[r["vec_id"]] >= 2 for r in got)
    # batch path, same contract
    queries = spark.createDataFrame(
        [(0, qv)], "qid long, qvec array<double>"
    )
    batch = query_vector_corpus_many(
        spark, path, queries, k=5, nprobe=8, exclude_self=True,
        where=where, use_pq=True, refine=200,
    ).collect()
    assert [(r["vec_id"], r["cosine"]) for r in batch] == [
        (r["vec_id"], r["cosine"]) for r in want
    ]
