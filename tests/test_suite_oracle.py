"""Oracle-parity tests: every suite spec with an oracle is compared
spark-vs-duckdb at sf0.001 exactly the way the driver compares at sf0.01
(sorted columns, sorted rows, exact values). Rows-only specs are checked
for successful execution and sane shape."""

from __future__ import annotations

import pytest

from bambooai_spark.suite import SPECS
from tests.conftest import SF_DIR, assert_matches_oracle

ORACLE_SPECS = [s for s in SPECS if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in SPECS if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_matches_oracle(spec, spark, ddb):
    df = spec.build(spark, SF_DIR)
    assert_matches_oracle(df, ddb, spec.oracle, spec.name)


@pytest.mark.parametrize(
    "spec", ROWS_ONLY_SPECS, ids=[s.name for s in ROWS_ONLY_SPECS]
)
def test_rows_only_runs(spec, spark):
    df = spec.build(spark, SF_DIR)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
