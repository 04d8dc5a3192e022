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


# --- KLL: mergeable quantiles ------------------------------------------

RANK_TOL = 0.02  # generous vs the ~0.8 % normalized rank error at k=800


def _exact_rank(df, value_col, v):
    n = df.count()
    at_or_under = df.filter(F.col(value_col) <= F.lit(v)).count()
    return at_or_under / n


def test_qname():
    from bambooai_spark.functions.sketches import _qname

    assert _qname(0.5) == "p50"
    assert _qname(0.95) == "p95"
    assert _qname(0.999) == "p99_9"


def test_kll_quantile_within_rank_error(spark):
    """The value returned for rank q must actually SIT at rank ~q in the
    raw data — the PAC guarantee the k=800 default buys."""
    from bambooai_spark.functions.sketches import kll_quantile, kll_sketch

    e = _events(spark)
    row = e.agg(kll_sketch("value").alias("s")).select(
        kll_quantile("s", 0.5).alias("p50"),
        kll_quantile("s", 0.95).alias("p95"),
    ).collect()[0]
    for q, v in ((0.5, row["p50"]), (0.95, row["p95"])):
        got = _exact_rank(e, "value", v)
        assert abs(got - q) <= RANK_TOL, (q, v, got)


def test_kll_rollup_merge_matches_rebuild(spark):
    """Per-day sketches merged to one: n is tracked LOSSLESSLY (exact row
    count), and the merged quantile stays inside the rank-error band —
    the store-then-regroup path a stored approx_percentile cannot take."""
    from bambooai_spark.functions.sketches import (
        quantile_rollup,
        rollup_quantiles,
    )

    e = _events(spark).withColumn("day", F.to_date("ts"))
    stored = quantile_rollup(e, "value", ["day", "event_type"])
    assert stored.count() > 1
    merged = rollup_quantiles(stored, [F.lit(1).alias("g")]).collect()[0]
    assert merged["n"] == e.count()  # n is exact through the merge
    got = _exact_rank(e, "value", merged["p50"])
    assert abs(got - 0.5) <= RANK_TOL, (merged["p50"], got)


def test_kll_rank_inverse(spark):
    """kll_rank is the inverse lookup: the rank of the p95 value reads
    back as ~0.95."""
    from bambooai_spark.functions.sketches import (
        kll_quantile,
        kll_rank,
        kll_sketch,
    )

    e = _events(spark)
    s = e.agg(kll_sketch("value").alias("s")).persist()
    # the rank argument must be FOLDABLE (a literal) — Spark rejects a
    # composed kll_quantile column, so the inverse goes through a collect
    p95 = s.select(kll_quantile("s", 0.95).alias("v")).collect()[0]["v"]
    row = s.select(kll_rank("s", p95).alias("r")).collect()[0]
    s.unpersist()
    assert abs(row["r"] - 0.95) <= RANK_TOL, row["r"]


def test_kll_rollup_is_jvm_side(spark):
    from bambooai_spark.functions.sketches import (
        quantile_rollup,
        rollup_quantiles,
    )

    e = _events(spark).withColumn("day", F.to_date("ts"))
    plan = (
        rollup_quantiles(quantile_rollup(e, "value", ["day"]), [F.lit(1)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "ArrowEval" not in plan


# --- Theta: set algebra ------------------------------------------------


def test_theta_exact_regime(spark):
    """Below 2^lgk retained entries a theta sketch is EXACT — the test-SF
    cardinalities sit in that regime, which is what lets the suite specs
    carry a plain-SQL oracle."""
    from bambooai_spark.functions.sketches import theta_estimate, theta_sketch

    e = _events(spark)
    est = e.agg(theta_estimate(theta_sketch("user_id")).alias("n")).collect()[
        0
    ]["n"]
    assert est == e.select("user_id").distinct().count()


def test_theta_estimation_mode_error(spark):
    """Past 2^lgk the sketch switches to estimation — error stays within
    a few relative sigma (~1/sqrt(2^12) ≈ 1.6 %) at 200k distincts."""
    from bambooai_spark.functions.sketches import theta_estimate, theta_sketch

    n = 200_000
    df = spark.range(n)
    est = df.agg(theta_estimate(theta_sketch("id")).alias("n")).collect()[0][
        "n"
    ]
    assert abs(est - n) <= 0.05 * n, est


def test_set_overlap_matches_exact(spark):
    """Every Venn cell from set_overlap == the exact join-based answer
    (exact regime)."""
    from bambooai_spark.functions.sketches import set_overlap

    e = _events(spark)
    left = e.filter("value < 60")
    right = e.filter("value >= 40")
    got = set_overlap(left, right, "user_id").collect()[0]
    ls = {r["user_id"] for r in left.select("user_id").distinct().collect()}
    rs = {r["user_id"] for r in right.select("user_id").distinct().collect()}
    assert got["n_left"] == len(ls)
    assert got["n_right"] == len(rs)
    assert got["n_both"] == len(ls & rs)
    assert got["n_either"] == len(ls | rs)
    assert got["n_left_only"] == len(ls - rs)
    assert got["n_right_only"] == len(rs - ls)
    assert got["jaccard"] == len(ls & rs) / len(ls | rs)


def test_set_overlap_empty_sides(spark):
    """Empty inputs: zero counts and NULL jaccard, not a crash or a 0/0."""
    from bambooai_spark.functions.sketches import set_overlap

    e = _events(spark)
    none = e.filter("value < -1")
    got = set_overlap(none, none, "user_id").collect()[0]
    assert got["n_left"] == 0 and got["n_either"] == 0
    assert got["jaccard"] is None


def test_theta_intersect_agg_common_to_all(spark):
    """theta_intersect over per-type sketches == the users present in
    EVERY event type (exact regime)."""
    from bambooai_spark.functions.sketches import (
        theta_estimate,
        theta_intersect,
        theta_sketch,
    )

    e = _events(spark)
    per = e.groupBy("event_type").agg(theta_sketch("user_id").alias("s"))
    est = per.agg(theta_estimate(theta_intersect("s")).alias("n")).collect()[
        0
    ]["n"]
    sets = [
        {r["user_id"] for r in e.filter(F.col("event_type") == t)
         .select("user_id").distinct().collect()}
        for t in [
            r["event_type"]
            for r in e.select("event_type").distinct().collect()
        ]
    ]
    exact = len(set.intersection(*sets))
    assert est == exact


def test_set_overlap_is_jvm_side(spark):
    from bambooai_spark.functions.sketches import set_overlap

    e = _events(spark)
    plan = (
        set_overlap(e.filter("value < 60"), e.filter("value >= 40"), "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "ArrowEval" not in plan
