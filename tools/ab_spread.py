#!/usr/bin/env python3
"""In-session alternating A/B of _spread_by on the real suite builders.

Alternates plain/spread iterations inside one session so machine drift
cancels; prints per-variant minima. Throwaway measurement tooling."""

from __future__ import annotations

import os
import sys
import time

from bambooai_spark import suite
from bambooai_spark.caching import release_caches
from bambooai_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("AB_ITERS", "4"))

_orig = suite._spread_by


def _plain(df, *keys):
    return df


def main():
    names = sys.argv[1:]
    spark = get_session("ab-spread")
    by_name = {s.name: s for s in suite.SPECS}
    for name in names:
        spec = by_name[name]
        res = {"plain": [], "spread": []}
        for variant in ("plain", "spread"):  # warm both once
            suite._spread_by = _plain if variant == "plain" else _orig
            spec.build(spark, SF).write.format("noop").mode(
                "overwrite").save()
            release_caches()
        for _ in range(ITERS):
            for variant in ("plain", "spread"):
                suite._spread_by = _plain if variant == "plain" else _orig
                t0 = time.perf_counter()
                spec.build(spark, SF).write.format("noop").mode(
                    "overwrite").save()
                res[variant].append(time.perf_counter() - t0)
                release_caches()
        suite._spread_by = _orig
        print(
            f"{name:32s} plain min={min(res['plain']):.3f} "
            f"spread min={min(res['spread']):.3f}  "
            f"plain={[round(t, 2) for t in res['plain']]} "
            f"spread={[round(t, 2) for t in res['spread']]}"
        )


if __name__ == "__main__":
    main()
