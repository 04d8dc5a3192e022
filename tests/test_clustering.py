"""Clustered corpus writes (write_corpus/compact_corpus cluster_by):
the layout contract is checked in the parquet FOOTERS — within every
partition directory the files cover pairwise-disjoint cluster-key ranges
and each file's row groups are internally ordered, which is exactly what
min/max scan pruning needs."""

from __future__ import annotations

import glob
import os

import pytest

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bambooai_spark.io import load_table
from bambooai_spark.operators.writer import (
    append_corpus,
    compact_corpus,
    read_corpus,
    write_corpus,
)
from tests.conftest import SF_DIR


def _file_ranges(out: str, col: str) -> dict[str, list[tuple[int, int]]]:
    """Per partition dir: each data file's (min, max) of ``col`` plus the
    per-row-group minima to check intra-file ordering."""
    ranges: dict[str, list[tuple[int, int]]] = {}
    for f in glob.glob(os.path.join(out, "*", "*.parquet")):
        if os.path.basename(os.path.dirname(f)).startswith("_"):
            continue  # ledger/bookkeeping dirs, not corpus data
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.names.index(col)
        mins, maxs = [], []
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        assert mins == sorted(mins), f"row groups unsorted in {f}"
        ranges.setdefault(os.path.dirname(f), []).append(
            (min(mins), max(maxs))
        )
    return ranges


def _assert_disjoint(ranges: dict[str, list[tuple[int, int]]]) -> int:
    n_files = 0
    for d, rs in ranges.items():
        rs = sorted(rs)
        n_files += len(rs)
        for (a_lo, a_hi), (b_lo, b_hi) in zip(rs, rs[1:]):
            assert a_hi < b_lo, f"overlap in {d}: {(a_lo, a_hi)} vs {(b_lo, b_hi)}"
    return n_files


def test_write_corpus_clustered_layout(spark, tmp_path):
    out = str(tmp_path / "c")
    docs = load_table(spark, SF_DIR, "documents")
    # shuffle the input so the clustering actually has work to do
    write_corpus(
        docs.orderBy(F.md5(F.col("text"))),
        out,
        cluster_by=("doc_id",),
        max_records_per_file=60,
    )
    n_files = _assert_disjoint(_file_ranges(out, "doc_id"))
    assert n_files >= 2  # the cap forced multiple files somewhere
    got = read_corpus(spark, out)
    assert got.count() == docs.count()


def test_cluster_task_cap_and_conf_fallback(spark, tmp_path):
    """num_tasks caps the clustered write's file count per call; a
    non-numeric shuffle.partitions (AQE-managed platforms set 'auto')
    falls back to defaultParallelism instead of crashing."""
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "capped")
    write_corpus(
        docs, out, cluster_by=("doc_id",), num_tasks=2,
        partition_by=("lang",),
    )
    ranges = _file_ranges(out, "doc_id")
    assert sum(len(v) for v in ranges.values()) <= 2 * len(ranges)

    # OSS Spark rejects a non-numeric shuffle.partitions at SET time, so
    # the vendor-'auto' fallback is unit-tested on the parse helper
    from bambooai_spark.operators.writer import _shuffle_partitions

    class _Conf:
        def get(self, k):
            return "auto"

    class _SC:
        defaultParallelism = 4

    class _Fake:
        conf = _Conf()
        sparkContext = _SC()

    assert _shuffle_partitions(_Fake()) == 4
    assert _shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_compact_corpus_clustered_restores_locality(spark, tmp_path):
    out = str(tmp_path / "c")
    docs = load_table(spark, SF_DIR, "documents")
    # three interleaved appends — ingest order, no key locality
    for k in range(3):
        append_corpus(
            docs.filter(F.col("doc_id") % 3 == k),
            out,
            max_records_per_file=40,
        )
    before = read_corpus(spark, out)
    before_ids = {r["doc_id"] for r in before.select("doc_id").collect()}

    m = compact_corpus(
        spark, out, cluster_by=("doc_id",), max_records_per_file=60
    )
    assert m.count() > 0
    _assert_disjoint(_file_ranges(out, "doc_id"))

    after = read_corpus(spark, out)
    assert {r["doc_id"] for r in after.select("doc_id").collect()} == before_ids
    # a later append + clustered compact still round-trips (the protocol
    # composes with the rest of the lifecycle)
    append_corpus(
        docs.select(
            (F.col("doc_id") + 100_000).alias("doc_id"),
            "lang",
            "source",
            F.concat(F.col("text"), F.lit(" suffixed")).alias("text"),
            "n_chars",
        ).limit(10),
        out,
    )
    compact_corpus(spark, out, cluster_by=("doc_id",))
    assert read_corpus(spark, out).count() == len(before_ids) + 10


# --- Z-order (multi-dimensional) clustering ----------------------------


def _mean_spread(out: str, col: str) -> tuple[float, int]:
    tot, n = 0, 0
    for f in glob.glob(os.path.join(out, "*", "*.parquet")):
        if os.path.basename(os.path.dirname(f)).startswith("_"):
            continue
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.names.index(col)
        stats = [
            pf.metadata.row_group(rg).column(idx).statistics
            for rg in range(pf.metadata.num_row_groups)
        ]
        tot += max(s.max for s in stats) - min(s.min for s in stats)
        n += 1
    return tot / n, n


def test_zorder_multi_dim_spread(spark, tmp_path):
    """The layout contract that motivates z-order: every file narrow in
    EVERY cluster column. Linear clustering leaves the SECOND column's
    per-file range near its full domain; the Morton layout shrinks it
    substantially while keeping the first column's range well under the
    domain too (the documented trade: the leading column gives up its
    near-disjoint ranges to buy the other dimensions locality)."""
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "value_i", (F.col("value") * 100).cast("long")
    )
    lin, zo = str(tmp_path / "lin"), str(tmp_path / "zo")
    kw = dict(
        partition_by=("event_type",),
        cluster_by=("user_id", "value_i"),
        max_records_per_file=20,
        num_tasks=4,
    )
    write_corpus(ev, lin, **kw)
    write_corpus(ev, zo, cluster_strategy="zorder", **kw)

    spread_lin2, n_lin = _mean_spread(lin, "value_i")
    spread_zo2, n_zo = _mean_spread(zo, "value_i")
    assert n_lin >= 10 and n_zo >= 10  # enough files for the contrast
    # 2nd column: z-order must beat linear clearly
    assert spread_zo2 < 0.75 * spread_lin2, (spread_zo2, spread_lin2)
    # 1st column: z-order still bounds each file well under the domain
    row = ev.agg(
        (F.max("user_id") - F.min("user_id")).alias("dom")
    ).collect()[0]
    spread_zo1, _ = _mean_spread(zo, "user_id")
    assert spread_zo1 < 0.8 * row["dom"], (spread_zo1, row["dom"])
    # and nothing was lost
    assert read_corpus(spark, zo).count() == ev.count()


def test_zorder_key_properties(spark):
    """Determinism + bounds: equal rows get equal keys, every key fits
    bits*len(cols), NULLs rank lowest instead of crashing."""
    from bambooai_spark.functions.zorder import zorder_key

    df = spark.createDataFrame(
        [(1, 10.0), (1, 10.0), (500, 0.5), (None, 10.0)],
        "a bigint, b double",
    )
    got = zorder_key(df, ("a", "b"), bits=4).collect()
    keys = {(r["a"], r["b"]): r["_zkey"] for r in got}
    assert len([r for r in got if r["a"] == 1]) == 2
    vals = [r["_zkey"] for r in got if r["a"] == 1]
    assert vals[0] == vals[1]  # equal rows, equal keys
    assert all(0 <= r["_zkey"] < 2 ** 8 for r in got)
    # the NULL-a row ranks below the 500-a row at the same b bucket
    assert keys[(None, 10.0)] <= keys[(1, 10.0)]


def test_zorder_timestamp_dimension(spark):
    """Timestamps participate via an order-preserving cast."""
    from bambooai_spark.functions.zorder import zorder_key

    ev = load_table(spark, SF_DIR, "events")
    z = zorder_key(ev, ("ts", "user_id"))
    assert z.select("_zkey").distinct().count() > 10
    assert z.count() == ev.count()


def test_zorder_validation(spark):
    from bambooai_spark.functions.zorder import zorder_key

    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(TypeError, match="quantile order"):
        zorder_key(docs, ("doc_id", "lang"))  # string dimension
    with pytest.raises(ValueError, match="linear clustering"):
        zorder_key(docs, ("doc_id",))
    with pytest.raises(ValueError, match="bits"):
        zorder_key(docs, ("doc_id", "n_chars"), bits=40)
    with pytest.raises(ValueError, match="no such column"):
        zorder_key(docs, ("doc_id", "nope"))
    with pytest.raises(ValueError, match="already exists"):
        zorder_key(
            docs.withColumn("_zkey", F.lit(1)), ("doc_id", "n_chars")
        )
    with pytest.raises(ValueError, match="unknown cluster strategy"):
        from bambooai_spark.operators.writer import _cluster

        _cluster(docs, ("lang",), ("doc_id",), strategy="hilbert")


def test_zorder_compaction_lifecycle(spark, tmp_path):
    """append x2 -> z-ordered compaction: rows survive, and the
    compacted files are narrow in the second cluster column."""
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "c")
    append_corpus(
        docs.filter("doc_id % 2 = 0"), out, max_records_per_file=10
    )
    append_corpus(
        docs.filter("doc_id % 2 = 1"), out, max_records_per_file=10
    )
    before = read_corpus(spark, out).count()
    compact_corpus(
        spark, out,
        cluster_by=("doc_id", "n_chars"), cluster_strategy="zorder",
        max_records_per_file=10,
    )
    assert read_corpus(spark, out).count() == before


def test_cluster_strategy_validated_without_cluster_by(spark, tmp_path):
    """A strategy with no cluster columns (or a typo'd one) fails loudly
    at the entry points instead of silently writing unclustered."""
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="needs cluster_by"):
        write_corpus(
            docs, str(tmp_path / "x"), cluster_strategy="zorder"
        )
    with pytest.raises(ValueError, match="unknown cluster strategy"):
        write_corpus(
            docs, str(tmp_path / "x"), cluster_strategy="zorderr"
        )
    out = str(tmp_path / "c")
    write_corpus(docs, out)
    with pytest.raises(ValueError, match="needs cluster_by"):
        compact_corpus(spark, out, cluster_strategy="zorder")
