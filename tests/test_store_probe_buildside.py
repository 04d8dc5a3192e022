"""The store-plugged spans probe join must never build over the postings.

r13 change 16: the planner sized the probe join's build side from the
pre-explode scan estimate and broadcast the multi-million-row postings
relation over the store side. The fresh-store path now dispatches on
the meta's exact gram count — broadcast the store relation when it fits
the 64 MB rule, pin sort-merge otherwise. Both branches are pinned
here: plan shape AND output equality with the from-scratch computation
(the dispatch must never change what the operator computes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bambooai_spark.operators.dedup import (
    exact_substring_cut,
    exact_substring_spans,
)
from bambooai_spark.operators.gram_store import (
    _read_meta,
    _write_meta,
    build_gram_store,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "a completely different document body with its own words here"),
        (4, "padding text the quick brown fox jumps over the lazy dog."),
        (5, "short"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _spans_sorted(df):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in df.collect()
    )


def _store_over(spark, tmp_path, d):
    corpus = str(tmp_path / "corpus")
    d.write.parquet(corpus)
    back = spark.read.parquet(corpus)
    store = str(tmp_path / "gstore")
    build_gram_store(back, "text", store, k=20, min_count=2,
                     id_col="doc_id")
    return back, store


def test_broadcast_sized_store_builds_over_store_side(spark, tmp_path):
    back, store = _store_over(spark, tmp_path, _docs(spark))
    spans = exact_substring_spans(
        back, "doc_id", "text", k=20, keep_first=True,
        gram_store_path=store,
    )
    plan = spans._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the build side must be the store scan, not the postings Generate:
    # the only BroadcastExchange subtree must not contain the explode
    seg = plan[plan.index("BroadcastExchange"):]
    assert "Generate explode" not in seg.split("BroadcastHashJoin")[0]
    ref = exact_substring_spans(back, "doc_id", "text", k=20,
                                keep_first=True)
    assert _spans_sorted(spans) == _spans_sorted(ref)


def test_oversized_store_pins_sort_merge_and_matches(spark, tmp_path):
    back, store = _store_over(spark, tmp_path, _docs(spark))
    # push the recorded gram count past the 64 MB broadcast rule — the
    # dispatch must pin sort-merge so the postings side cannot become
    # the build side either; counts/rows stay truthful so every
    # freshness guard still passes
    meta = _read_meta(spark, store)
    meta["n_grams"] = (64 * 1024 * 1024) // (20 + 28) + 1
    _write_meta(spark, store, meta)
    spans = exact_substring_spans(
        back, "doc_id", "text", k=20, keep_first=True,
        gram_store_path=store,
    )
    plan = spans._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    ref = exact_substring_spans(back, "doc_id", "text", k=20,
                                keep_first=True)
    assert _spans_sorted(spans) == _spans_sorted(ref)


def test_cut_output_identical_across_dispatch(spark, tmp_path):
    d = _docs(spark)
    back, store = _store_over(spark, tmp_path, d)
    plugged = exact_substring_cut(
        back, "doc_id", "text", k=20, keep_first=True,
        gram_store_path=store,
    ).select("doc_id", F.md5(F.col("clean_text").cast("binary")).alias("h"))
    scratch = exact_substring_cut(
        back, "doc_id", "text", k=20, keep_first=True,
    ).select("doc_id", F.md5(F.col("clean_text").cast("binary")).alias("h"))
    assert sorted(map(tuple, plugged.collect())) == sorted(
        map(tuple, scratch.collect())
    )
