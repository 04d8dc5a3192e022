#!/usr/bin/env python3
"""Dump .explain("formatted") for headline suite queries to plans/<tag>/.

Usage: python tools/dump_plans.py <suffix> [name ...]
Writes plans/r13/<query>_<suffix>.txt for each headline scan spec (or the
named specs only). Building a DataFrame is driver-side; lifecycle specs
(which write corpora during build) are skipped unless named explicitly.
"""

from __future__ import annotations

import os
import sys

from bambooai_spark.caching import release_caches
from bambooai_spark.session import get_session
from bambooai_spark.suite import SPECS


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("bambooai-spark-plans")
    specs = [s for s in SPECS if (s.name in only if only
                                  else (s.headline and s.regime == "scan"))]
    for s in specs:
        try:
            df = s.build(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {exc}\n"
            print(f"[plans] {s.name} FAILED: {exc}", file=sys.stderr)
        with open(os.path.join(out_dir, f"{s.name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"[plans] {s.name} -> {s.name}_{suffix}.txt", file=sys.stderr)
        release_caches()
    return 0


if __name__ == "__main__":
    sys.exit(main())
