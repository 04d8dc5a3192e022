"""Clustered corpus writes (write_corpus/compact_corpus cluster_by):
the layout contract is checked in the parquet FOOTERS — within every
partition directory the files cover pairwise-disjoint cluster-key ranges
and each file's row groups are internally ordered, which is exactly what
min/max scan pruning needs."""

from __future__ import annotations

import glob
import os

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
