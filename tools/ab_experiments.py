#!/usr/bin/env python3
"""Scratch A/B experiments for the r13 optimization round.

Each experiment builds two semantically-identical DataFrames and times
them with the bench's noop-sink methodology (1 warm-up + N timed, min).
Throwaway measurement tooling — results land in OPTIMIZATION_r13.md.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F
from pyspark.sql import Window

from bambooai_spark.caching import release_caches
from bambooai_spark.io import load_table
from bambooai_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("AB_ITERS", "4"))


def timeit(spark, label, build):
    try:
        build().write.format("noop").mode("overwrite").save()  # warm-up
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"{label:55s} min={min(ts):.3f}s  all={[round(t, 3) for t in ts]}")
    except Exception as exc:
        print(f"{label:55s} FAILED: {exc}")
    finally:
        release_caches()


U63 = "9223372036854775808"  # 2^63
P32 = "4294967296"  # 2^32


def packed_first(id_col: str):
    """Order-isomorphic (id, p) -> DECIMAL packing (null id first)."""
    idu = F.when(F.col(id_col).isNull(), F.lit(0).cast("decimal(21,0)")) \
        .otherwise(F.col(id_col).cast("decimal(20,0)")
                   + F.expr(U63) + F.lit(1))
    return (idu * F.expr(P32) + F.col("p")).alias("_pk")


def main():
    spark = get_session("ab-experiments")
    d = load_table(spark, SF, "documents")
    li = load_table(spark, SF, "lineitem")
    t = F.col("text")
    k = 25

    def spread(df):
        n = spark.sparkContext.defaultParallelism
        return df.repartition(n)

    grams = F.transform(
        F.sequence(F.lit(1), F.length(t) - (k - 1)),
        lambda i: F.struct(
            i.cast("long").alias("p"), F.substring(t, i, k).alias("gram")
        ),
    )

    def pos_df():
        return (
            spread(d).filter(F.length(t) >= k)
            .select(F.col("doc_id"), F.explode(grams).alias("g"))
            .select("doc_id", F.col("g.p").alias("p"),
                    F.col("g.gram").alias("gram"))
        )

    # --- E1: gram stats agg — min(struct) SortAgg vs packed-decimal HashAgg
    def e1_struct():
        return (
            pos_df().groupBy("gram")
            .agg(F.count(F.lit(1)).alias("_cnt"),
                 F.min(F.struct(F.col("doc_id").alias("i"),
                                F.col("p").alias("p"))).alias("_first"))
            .filter(F.col("_cnt") >= 2)
        )

    def e1_packed():
        return (
            pos_df().groupBy("gram")
            .agg(F.count(F.lit(1)).alias("_cnt"),
                 F.min(packed_first("doc_id")).alias("_fpk"))
            .filter(F.col("_cnt") >= 2)
        )

    timeit(spark, "E1a gram stats min(struct) [sortagg]", e1_struct)
    timeit(spark, "E1b gram stats min(packed decimal) [hashagg?]", e1_packed)
    print(e1_packed().explain("formatted") or "", file=sys.stderr)

    # --- E2: q1 — plain scan vs spread scan
    def q1(base):
        return (
            base.filter(F.col("l_shipdate")
                        <= F.lit("2001-09-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("a"),
                 F.sum(F.col("l_extendedprice")
                       .cast("decimal(18,2)")).alias("b"),
                 F.sum((F.col("l_extendedprice").cast("decimal(18,2)")
                        * (F.lit(1) - F.col("l_discount")
                           .cast("decimal(18,2)"))).cast("decimal(18,4)"))
                 .alias("c"),
                 F.count(F.lit(1)).alias("n"))
        )

    timeit(spark, "E2a q1-like plain scan (1 task)", lambda: q1(li))
    timeit(spark, "E2b q1-like spread scan", lambda: q1(spread(li)))

    # --- E3: exact spans keep_first — recompute postings vs persist postings
    def spans_from(pos, dup):
        hits = (
            pos.join(dup, "gram")
            .filter(~((F.col("doc_id") == F.col("_first.i"))
                      & (F.col("p") == F.col("_first.p"))))
            .select("doc_id", "p")
        )
        iw = Window.partitionBy("doc_id").orderBy("p")
        isl = hits.select(
            "doc_id", "p",
            (F.col("p") - F.row_number().over(iw)).alias("_grp"))
        return (
            isl.groupBy("doc_id", "_grp")
            .agg(F.min("p").alias("span_start"),
                 (F.max("p") + F.lit(k - 1)).alias("span_end"),
                 (F.max("p") + F.lit(k) - F.min("p")).alias("span_len"))
            .filter(F.col("span_len") >= k).drop("_grp")
        )

    def e3_recompute():
        pos = pos_df()
        dup = (pos.groupBy("gram")
               .agg(F.count(F.lit(1)).alias("_cnt"),
                    F.min(F.struct(F.col("doc_id").alias("i"),
                                   F.col("p").alias("p"))).alias("_first"))
               .filter(F.col("_cnt") >= 2).select("gram", "_first"))
        return spans_from(pos, dup)

    def e3_persist():
        pos = pos_df().persist()
        from bambooai_spark.caching import track
        track(pos)
        dup = (pos.groupBy("gram")
               .agg(F.count(F.lit(1)).alias("_cnt"),
                    F.min(F.struct(F.col("doc_id").alias("i"),
                                   F.col("p").alias("p"))).alias("_first"))
               .filter(F.col("_cnt") >= 2).select("gram", "_first"))
        return spans_from(pos, dup)

    timeit(spark, "E3a spans, postings recomputed (2 explodes)", e3_recompute)
    timeit(spark, "E3b spans, postings persisted (1 explode)", e3_persist)


if __name__ == "__main__":
    main()
