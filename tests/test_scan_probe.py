"""The driver-side scan-narrowness probe must agree with the RDD truth.

``_scan_is_narrow`` replicates Spark's FilePartition packing math from
the file listing (r13: ``df.rdd.getNumPartitions()`` compiles the full
physical plan — 40-75 ms of driver planning per spread probe, paid once
per spread site per query build). The decision steers only WHERE a
repartition fires, never results — but a probe that diverged from the
planner's real split count would silently re-serialize the heavy
explode stages the spread exists to parallelize, so the agreement is
pinned here across the shapes the suite actually feeds it.
"""

from __future__ import annotations

import os

import pytest

from bambooai_spark.io import load_table
from bambooai_spark.operators.similarity import _conf_bytes, _scan_is_narrow

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _truth(df, need: int) -> bool:
    return df.rdd.getNumPartitions() < need


@pytest.mark.parametrize(
    "table", ["lineitem", "orders", "events", "documents", "embeddings",
              "nation"]
)
def test_probe_matches_rdd_on_testdata(spark, table):
    df = load_table(spark, SF_DIR, table)
    for need in (2, 4, 16):
        assert _scan_is_narrow(df, need) == _truth(df, need), (
            f"{table} need={need}"
        )


def test_probe_matches_rdd_on_projected_and_filtered(spark):
    from pyspark.sql import functions as F

    df = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") >= 0)
    for need in (2, 16):
        assert _scan_is_narrow(df, need) == _truth(df, need)


def test_probe_matches_rdd_on_multifile_corpus(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "corpus")
    d.write.option("maxRecordsPerFile", 20).partitionBy("lang").parquet(out)
    back = spark.read.parquet(out)
    n_files = len(back.inputFiles())
    assert n_files > 4  # the shape under test: many small files
    for need in (2, 4, max(2, n_files // 2)):
        assert _scan_is_narrow(back, need) == _truth(back, need), f"{need}"


def test_probe_falls_back_on_non_file_relations(spark):
    df = load_table(spark, SF_DIR, "embeddings").limit(20).localCheckpoint(
        eager=True
    )
    # no input files — the probe must answer via the RDD, i.e. agree
    assert df.inputFiles() == []
    for need in (2, 64):
        assert _scan_is_narrow(df, need) == _truth(df, need)


def test_conf_bytes_parses_size_suffixes(spark):
    assert _conf_bytes(spark, "spark.nonexistent.key", 7) == 7
    spark.conf.set("spark.bbai.test.bytes", "256m")
    try:
        assert _conf_bytes(spark, "spark.bbai.test.bytes", 0) == 256 << 20
        spark.conf.set("spark.bbai.test.bytes", "134217728")
        assert _conf_bytes(spark, "spark.bbai.test.bytes", 0) == 134217728
        spark.conf.set("spark.bbai.test.bytes", "4mb")
        assert _conf_bytes(spark, "spark.bbai.test.bytes", 0) == 4 << 20
    finally:
        spark.conf.unset("spark.bbai.test.bytes")
