"""HLL sketch rollups: estimates within the configured error of exact,
union == rebuild (overlap handled correctly, unlike additive counts),
and partitioning-insensitivity of the estimates."""

from __future__ import annotations

from pyspark.sql import functions as F

from bambooai_spark.functions.sketches import (
    distinct_rollup,
    hll_estimate,
    hll_merge,
    hll_sketch,
    rollup_distinct,
)
from bambooai_spark.io import load_table
from tests.conftest import SF_DIR

TOL = 0.05  # generous vs the ~1.6 % RSE at lgk=12


def _events(spark):
    return load_table(spark, SF_DIR, "events")


def test_estimate_within_error(spark):
    e = _events(spark)
    exact = e.select("user_id").distinct().count()
    est = e.agg(hll_estimate(hll_sketch("user_id")).alias("n")).collect()[0]["n"]
    assert abs(est - exact) <= max(2, TOL * exact), (est, exact)


def test_rollup_union_equals_rebuild(spark):
    """Daily sketches unioned to the total == a sketch over everything:
    a user active on many days counts ONCE (the overlap case additive
    counts get wrong)."""
    e = _events(spark).withColumn("day", F.to_date("ts"))
    daily = distinct_rollup(e, "user_id", ["day"])
    assert daily.count() > 1  # the union below actually merges something

    total_from_rollup = rollup_distinct(daily, [F.lit(1).alias("g")]).collect()[
        0
    ]["approx_distinct"]
    total_direct = e.agg(
        hll_estimate(hll_sketch("user_id")).alias("n")
    ).collect()[0]["n"]
    assert total_from_rollup == total_direct  # same input set, same registers

    # and the per-day estimates sum to MORE than the distinct total
    # (users repeat across days) — the sketch union deduplicates
    summed = daily.agg(F.sum("approx_distinct")).collect()[0][0]
    assert summed > total_from_rollup


def test_partitioning_insensitive(spark):
    e = _events(spark)
    a = e.agg(hll_estimate(hll_sketch("user_id")).alias("n")).collect()[0]["n"]
    b = (
        e.repartition(7, "event_type")
        .agg(hll_estimate(hll_sketch("user_id")).alias("n"))
        .collect()[0]["n"]
    )
    assert a == b


def test_grain_regroup(spark):
    """Store at (day, event_type), answer at event_type — the read-time
    regroup stays within error of exact at the coarser grain."""
    e = _events(spark).withColumn("day", F.to_date("ts"))
    stored = distinct_rollup(e, "user_id", ["day", "event_type"])
    by_type = {
        r["event_type"]: r["approx_distinct"]
        for r in rollup_distinct(stored, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(by_type) == set(exact)
    for k, est in by_type.items():
        assert abs(est - exact[k]) <= max(2, TOL * exact[k]), (k, est, exact[k])


def test_merge_is_jvm_side(spark):
    """The whole rollup + union plan stays in JVM aggregates — no Python
    boundary (BatchEvalPython/ArrowEval) anywhere."""
    e = _events(spark).withColumn("day", F.to_date("ts"))
    plan = (
        rollup_distinct(distinct_rollup(e, "user_id", ["day"]), [F.lit(1)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "ArrowEval" not in plan


def test_streaming_sketch_matches_batch(spark):
    """HLL sketches aggregate in Structured Streaming like any typed
    agg — streaming distinct-count rollups match the batch estimates
    exactly (same input set, same registers)."""
    from bambooai_spark.streaming.events import read_events_stream

    sdf = read_events_stream(spark, SF_DIR)
    q = (
        sdf.groupBy("event_type")
        .agg(hll_estimate(hll_sketch("user_id")).alias("n"))
        .writeStream.format("memory")
        .queryName("sketch_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_type"]: r["n"] for r in spark.table("sketch_mem").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in _events(spark)
        .groupBy("event_type")
        .agg(hll_estimate(hll_sketch("user_id")).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0
