"""Shared fixtures: one local SparkSession per test session, a DuckDB
connection with the testdata views registered (mirroring the driver's
harness), and the spark↔duckdb comparison helper."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from bambooai_spark.session import get_session
from bambooai_spark.io import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session("bambooai-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: columns sorted by name, rows sorted by
    all columns, values as strings (order-insensitive value-hash stand-in)."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: "NULL" if pd.isna(v) else repr(v))
    out = out.sort_values(list(out.columns)).reset_index(drop=True)
    return out


def assert_matches_oracle(spark_df, ddb, sql: str, name: str = "?"):
    got = canonical(spark_df.toPandas())
    want = canonical(ddb.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"[{name}] column mismatch: spark={list(got.columns)} "
        f"oracle={list(want.columns)}"
    )
    assert len(got) == len(want), (
        f"[{name}] row count mismatch: spark={len(got)} oracle={len(want)}"
    )
    if not got.equals(want):
        diff_mask = (got != want).any(axis=1)
        diff = pd.concat(
            [got[diff_mask].head(5), want[diff_mask].head(5)],
            keys=["spark", "oracle"],
        )
        raise AssertionError(f"[{name}] value mismatch:\n{diff}")
