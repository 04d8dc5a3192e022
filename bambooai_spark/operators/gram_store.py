"""Persisted boilerplate gram store — ExactSubstr dedup AGAINST THE
CORPUS at ingest time.

The batch operators (:func:`~bambooai_spark.operators.dedup
.exact_substring_cut`) find duplicated spans WITHIN one relation, and the
decontamination gate screens ingest against a static BENCHMARK. The gap
between them: an incoming crawl repeating a license header / nav bar /
TOS block the corpus already carries N copies of. This module persists
the corpus's duplicated-gram inventory — exactly the per-gram stats pass
of ``exact_substring_spans`` (``groupBy(gram).count() >= min_count``,
map-side partials) — as a parquet relation plus a meta JSON, so ingest
can cut known-boilerplate spans from every new document with ONE
semi-join and no corpus access at all.

Why duplicated grams, not all grams: the distinct-gram relation of a
100 TB corpus is O(total chars) and unusable as a gate; the DUPLICATED
subset is the boilerplate inventory itself — small in proportion to how
much boilerplate exists, which is exactly what the gate screens for. The
tradeoff is explicit: a span the corpus holds only ONCE is not yet
"known boilerplate" and passes the gate until a
:func:`refresh_gram_store` after more copies land (the same
freshness-lag contract as the near-dup signature store in
``operators/neardup_gate.py``, which gates at whole-document grain while
this gates at span grain).

Same cross-engine portability as the rest of the ExactSubstr family: the
store is raw fixed-``k`` character grams (no engine-specific hashing),
so a DuckDB oracle can rebuild it from the same corpus.

Reference scope note: the reference has no ingest gate at all — its only
dedup is the episodic-memory upsert (qa_retrieval.py:146-202). This is
part of the BASELINE-mandated scale-out dedup layer.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GRAMS_DIR = "grams"
META_NAME = "_gram_store_meta.json"


def _join(a: str, b: str) -> str:
    return a.rstrip("/") + "/" + b


def duplicated_grams(
    df: DataFrame,
    text_col: str,
    *,
    k: int = 25,
    min_count: int = 2,
) -> DataFrame:
    """The corpus's duplicated character ``k``-gram relation (one
    ``gram`` column): every gram occurring >= ``min_count`` times
    corpus-wide — the boilerplate inventory. Exactly the gram stats pass
    of ``exact_substring_spans``: one hash-partitioned groupBy with
    map-side partial aggregation, so corpus-wide boilerplate grams
    collapse to one row per map partition before the exchange."""
    if k < 2:
        raise ValueError("duplicated_grams: k must be >= 2")
    if min_count < 2:
        raise ValueError("duplicated_grams: min_count must be >= 2")
    t = F.col(text_col)
    pos = df.filter(F.length(t) >= k).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(t) - (k - 1)),
                lambda i: F.substring(t, i, k),
            )
        ).alias("gram")
    )
    return (
        pos.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") >= min_count)
        .select("gram")
    )


def build_gram_store(
    df: DataFrame,
    text_col: str,
    path: str,
    *,
    k: int = 25,
    min_count: int = 2,
) -> dict:
    """Materialize :func:`duplicated_grams` of ``df`` at ``path`` (parquet
    under ``grams/`` + a meta JSON pinning ``k``/``min_count``, so a gate
    can refuse a k-mismatched read instead of silently missing spans).
    Returns the meta dict. Rebuild-in-place via :func:`refresh_gram_store`
    writes to the side and swaps, so a concurrent gate reader sees the
    old relation or fails loudly mid-swap — never a half-written one."""
    spark = df.sparkSession
    grams = duplicated_grams(df, text_col, k=k, min_count=min_count)
    grams.write.mode("overwrite").parquet(_join(path, GRAMS_DIR))
    n = spark.read.parquet(_join(path, GRAMS_DIR)).count()
    meta = {
        "k": k,
        "min_count": min_count,
        "n_grams": n,
        # source row count at build time: the staleness signal the
        # maintenance advisor compares against the corpus manifest
        "n_rows": df.count(),
        "version": 1,
    }
    _write_meta(spark, path, meta)
    return meta


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    # _fs_write_text_atomic is first-write-wins (commit-marker
    # semantics); the meta is a mutable descriptor, so clear the old one
    # first — the rename still makes the new content land whole
    from bambooai_spark.operators.writer import (  # noqa: PLC0415
        _fs_delete,
        _fs_write_text_atomic,
    )

    mpath = _join(path, META_NAME)
    _fs_delete(spark, mpath)
    _fs_write_text_atomic(spark, mpath, json.dumps(meta))


def read_gram_store(
    spark: SparkSession, path: str, *, k: int | None = None
) -> tuple[DataFrame, dict]:
    """(grams relation, meta). ``k`` asserts the caller's gram width
    matches the store's — a mismatch would silently screen nothing."""
    from bambooai_spark.operators.writer import (  # noqa: PLC0415
        _fs_exists,
        _fs_read_text,
    )

    mpath = _join(path, META_NAME)
    if not _fs_exists(spark, mpath):
        raise FileNotFoundError(f"no gram store meta at {mpath}")
    meta = json.loads(_fs_read_text(spark, mpath))
    if k is not None and meta.get("k") != k:
        raise ValueError(
            f"gram store at {path} was built with k={meta.get('k')}, "
            f"caller expects k={k} — rebuild the store or match the k"
        )
    return spark.read.parquet(_join(path, GRAMS_DIR)), meta


def refresh_gram_store(
    spark: SparkSession,
    corpus_path: str,
    store_path: str,
    *,
    text_col: str = "text",
) -> dict:
    """Rebuild the store from the corpus's CURRENT live rows — run after
    enough appends that new boilerplate exists (the freshness-lag
    contract in the module docstring; ``suggest_maintenance(
    gram_store_path=)`` keys on the manifest row count vs the store
    meta's ``n_rows`` and ``auto_maintain`` executes the refresh). The
    new relation is written to the side and swapped via two renames —
    a concurrent gate reads the OLD store until the swap and may fail
    LOUDLY (missing-path AnalysisException) during the instant between
    renames, never silently screen with half a relation; retry the read
    (same contract as rebuild_vector_store's staged swap)."""
    from bambooai_spark.operators.writer import (  # noqa: PLC0415
        _fs,
        read_corpus,
    )

    _grams_old, meta = read_gram_store(spark, store_path)
    live = read_corpus(spark, corpus_path)
    grams = duplicated_grams(
        live, text_col, k=meta["k"], min_count=meta["min_count"]
    )
    tmp = _join(store_path, GRAMS_DIR + "_next")
    grams.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    n_rows = live.count()
    fs, _root = _fs(spark, store_path)
    jp = spark._jvm.org.apache.hadoop.fs.Path
    dest = jp(_join(store_path, GRAMS_DIR))
    old = jp(_join(store_path, GRAMS_DIR + "_old"))
    if fs.exists(old):
        fs.delete(old, True)
    fs.rename(dest, old)
    fs.rename(jp(tmp), dest)
    fs.delete(old, True)
    meta = dict(
        meta, n_grams=n, n_rows=n_rows,
        version=int(meta.get("version", 1)) + 1,
    )
    _write_meta(spark, store_path, meta)
    return meta


def boilerplate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    store_path: str,
    *,
    k: int = 25,
    min_len: int | None = None,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Maximal spans of ``df`` text whose every ``k``-gram is KNOWN
    corpus boilerplate (in the store). Same islands machinery as
    ``contamination_spans``, but the gram side is corpus-scale, so the
    semi-join is NOT broadcast-hinted — AQE broadcasts it only when the
    store measures small at runtime. ``grams`` short-circuits the store
    read (pass a persisted relation when screening repeatedly)."""
    from bambooai_spark.operators.dedup import (  # noqa: PLC0415
        contamination_spans,
    )

    if grams is None:
        grams, _meta = read_gram_store(df.sparkSession, store_path, k=k)
    return contamination_spans(
        df, id_col, text_col, k=k, min_len=min_len,
        bench_grams=grams, broadcast=False,
    )


def boilerplate_cut(
    df: DataFrame,
    id_col: str,
    text_col: str,
    store_path: str,
    *,
    k: int = 25,
    out: str = "clean_text",
    grams: DataFrame | None = None,
) -> DataFrame:
    """Cut known corpus boilerplate out of ``df`` text — the span-grain
    ingest gate: :func:`boilerplate_spans` + the shared splice. Corpus
    copies stay (they are the inventory); the INCOMING copy is cut."""
    from bambooai_spark.operators.dedup import splice_spans  # noqa: PLC0415

    spans = boilerplate_spans(
        df, id_col, text_col, store_path, k=k, grams=grams
    )
    return splice_spans(df, id_col, text_col, spans, out=out)
