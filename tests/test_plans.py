"""Plan-quality assertions (SURVEY §4): the headline queries must produce
the plans we designed — pushdown at the scan, pruned reads, broadcast where
intended, top-k as TakeOrderedAndProject, no cartesian products — plus the
executor-side plan guardrail."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from bambooai_spark.executor import SparkCodeExecutor
from bambooai_spark.io import load_table
from bambooai_spark.plans import (
    assert_no_cartesian,
    assert_pruned_scan,
    assert_pushed_filters,
    explain_str,
    plan_flags,
)
from bambooai_spark.suite import SPECS
from tests.conftest import SF_DIR

_BY_NAME = {s.name: s for s in SPECS}


def _build(spark, name):
    return _BY_NAME[name].build(spark, SF_DIR)


def test_q1_scan_pushdown_and_pruning(spark):
    df = _build(spark, "q1_pricing_summary")
    assert_pushed_filters(df, "l_shipdate")
    # lineitem has 16 columns; q1 must read only the 7 it uses (the r13
    # under-parallel spread keys on l_extendedprice, an already-read
    # column, so it must not widen the scan)
    assert_pruned_scan(df, table_cols=16, max_read_cols=7)
    flags = plan_flags(df)
    # ONE aggregation shuffle (partial agg map-side); on single-split
    # local testdata the conditional _spread_by adds its hash
    # repartition ahead of it (a no-op at real scale, where the scan
    # arrives multi-split)
    assert flags["n_exchanges"] <= 2


def test_q3_filters_pushed_on_all_three_tables(spark):
    df = _build(spark, "q3_top_orders")
    flags = plan_flags(df)
    pushed = ";".join(flags["pushed_filters"])
    assert "c_mktsegment" in pushed
    assert "o_orderdate" in pushed
    assert "l_shipdate" in pushed
    assert flags["has_take_ordered"]  # top-10 is NOT a global sort


def test_q5_dims_broadcast(spark):
    flags = plan_flags(_build(spark, "q5_region_revenue"))
    assert flags["n_broadcast_joins"] >= 3  # region/nation/supplier at least
    assert not flags["has_cartesian"]


def test_top_customers_all_joins_broadcast(spark):
    flags = plan_flags(_build(spark, "top_customers"))
    assert flags["n_shuffle_joins"] == 0  # orders/customer/nation all fit
    assert flags["has_take_ordered"]


def test_q6_all_predicates_pushed_minimal_read(spark):
    df = _build(spark, "q6_forecast_revenue")
    flags = plan_flags(df)
    pushed = ";".join(flags["pushed_filters"])
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed
    assert "l_quantity" in pushed
    # scalar agg over 4 columns: scan must not read the other 7
    assert_pruned_scan(df, table_cols=11, max_read_cols=4)
    assert flags["n_exchanges"] == 1  # single-row final agg, one exchange


def test_q10_nation_broadcast_topk_no_sort(spark):
    flags = plan_flags(_build(spark, "q10_returned_items"))
    pushed = ";".join(flags["pushed_filters"])
    assert "o_orderdate" in pushed
    assert "l_returnflag" in pushed
    assert flags["n_broadcast_joins"] >= 1  # nation dim
    assert flags["has_take_ordered"]  # top-20, not a global sort
    assert not flags["has_cartesian"]


def test_zscore_single_window_shuffle(spark):
    df = _build(spark, "zscore_outliers_events")
    flags = plan_flags(df)
    # one window pass over the user partition: exactly one exchange,
    # no self-join of events against its own aggregates
    assert flags["n_exchanges"] == 1
    assert flags["n_shuffle_joins"] == 0 and flags["n_broadcast_joins"] == 0


def test_q18_preagg_before_joins(spark):
    df = _build(spark, "q18_large_orders")
    flags = plan_flags(df)
    assert not flags["has_cartesian"]
    assert flags["has_take_ordered"]  # top-50, not a global sort


def test_knn_brute_force_is_take_ordered(spark):
    flags = plan_flags(_build(spark, "knn_cosine_embeddings"))
    assert flags["has_take_ordered"]  # per-partition top-k, k rows to driver


def test_asof_join_single_shuffle_no_join_explosion(spark):
    flags = plan_flags(_build(spark, "asof_join_events_orders"))
    # union-merge as-of: window over one key shuffle; no join operator at all
    assert flags["n_shuffle_joins"] == 0 and flags["n_broadcast_joins"] == 0
    assert not flags["has_cartesian"]


def test_no_headline_plan_has_cartesian(spark):
    for s in SPECS:
        if s.headline:
            assert_no_cartesian(s.build(spark, SF_DIR))


def test_executor_plan_guardrail_rejects_cartesian(spark):
    orders = load_table(spark, SF_DIR, "orders")
    ex = SparkCodeExecutor(guard_plans=True)
    # disable auto-broadcast so the cross join actually plans as a
    # CartesianProduct (at real scale neither side fits broadcast — that's
    # exactly the case the guard exists for)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        res = ex.execute(
            "df = df.crossJoin(df.select(F.col('o_orderkey').alias('k2')))",
            df=orders, spark=spark,
        )
        assert not res.ok
        assert "guardrail" in res.error or "Cartesian" in res.error
        assert res.df is orders  # rolled back
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # and a sane plan passes the same guard
    ok = ex.execute("df = df.limit(100)", df=orders, spark=spark)
    assert ok.ok


def test_top_parts_per_brand_two_phase_no_sort_cliff(spark):
    flags = plan_flags(_build(spark, "top_parts_per_brand"))
    # two-phase top-k: a (partition, brand) exchange keeps full parallelism
    # (25 brands would otherwise mean 25 tasks), then a brand exchange over
    # only the bounded candidate union — two exchanges, never a global sort
    assert flags["n_exchanges"] == 2
    assert not flags["has_cartesian"]


def test_pivot_orders_two_phase_aggregate(spark):
    flags = plan_flags(_build(spark, "pivot_orders"))
    # explicit pivot values → no distinct-values pre-job; Spark's pivot is
    # two hash aggregates (collapse to (year, priority), then pivot) so the
    # second exchange carries only |groups| rows
    assert flags["n_exchanges"] == 2
    assert not flags["has_cartesian"]


def test_sample_docs_det_prunes_scan(spark):
    df = _build(spark, "sample_docs_det")
    # documents has 5 columns; the sample reads only doc_id/lang/n_chars
    assert_pruned_scan(df, table_cols=5, max_read_cols=3)


def test_tfidf_df_join_is_broadcast(spark):
    flags = plan_flags(_build(spark, "tfidf_docs"))
    assert flags["n_broadcast_joins"] >= 1  # idf table broadcast to tf side
    assert not flags["has_cartesian"]


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    from bambooai_spark.io import write_bucketed

    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    write_bucketed(o, "orders_b", "o_custkey", 8, path=str(tmp_path / "o"))
    write_bucketed(c, "customer_b", "c_custkey", 8, path=str(tmp_path / "c"))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        flags = plan_flags(joined)
        # co-partitioned bucketed scans: the join needs NO exchange
        assert flags["n_exchanges"] == 0
        # and it is not secretly a broadcast either — a real shuffle-free SMJ
        assert flags["n_broadcast_joins"] == 0
        n = joined.count()
        assert n == o.count()  # every order has a customer
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_range_join_is_hash_join_not_nested_loop(spark):
    from bambooai_spark.plans import explain_str

    df = _build(spark, "range_count_events")
    plan = explain_str(df, "simple")
    # the bucketized construction must equi-join on the bin — never the
    # O(n·m) fallback Spark picks for a pure inequality join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # and it IS a join, hash or sort-merge


def test_range_join_matches_brute_force(spark):
    from bambooai_spark.functions.timeseries import range_join

    ev = load_table(spark, SF_DIR, "events").limit(300)
    intervals = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 7 MINUTES")).alias("e"),
    )
    points = ev.select(F.col("event_id").alias("pid"), F.col("ts").alias("pts"))
    got = {
        (r["iid"], r["pid"])
        for r in range_join(
            points, intervals, point_ts="pts", start_ts="s", end_ts="e",
            bucket_seconds=120,  # deliberately ≠ interval length: spans >2 bins
        ).collect()
    }
    want = {
        (r["iid"], r["pid"])
        for r in points.crossJoin(intervals)
        .filter((F.col("pts") >= F.col("s")) & (F.col("pts") < F.col("e")))
        .collect()
    }
    assert got == want and len(want) > 0


def test_rollup_grains_internally_consistent(spark):
    df = _build(spark, "rollup_grains_events")
    by_grain = {
        r["grain"]: (r["n"], round(r["v"], 2))
        for r in df.groupBy("grain")
        .agg(F.sum("n_events").alias("n"), F.sum("total_value").alias("v"))
        .collect()
    }
    # every grain partitions the same rows: totals agree across grains
    assert by_grain["hour"][0] == by_grain["day"][0] == by_grain["month"][0]
    assert by_grain["hour"][1] == by_grain["day"][1] == by_grain["month"][1]


def test_q7_dual_role_nation_broadcast(spark):
    flags = plan_flags(_build(spark, "q7_nation_volume"))
    # supplier + both nation roles broadcast; facts never cross-join
    assert flags["n_broadcast_joins"] >= 3
    assert not flags["has_cartesian"]
    assert "l_shipdate" in ";".join(flags["pushed_filters"])


def test_q19_disjunction_pushed_to_both_scans(spark):
    flags = plan_flags(_build(spark, "q19_disjunctive"))
    pushed = ";".join(flags["pushed_filters"])
    # Catalyst derives the per-side implications of the OR-of-ANDs:
    # the union of quantity ranges lands on the lineitem scan, the
    # brand/size union on the part scan
    assert "l_quantity" in pushed
    assert "p_brand" in pushed
    assert not flags["has_cartesian"]


def test_q22_anti_join_in_plan_scalar_stays_distributed(spark):
    from bambooai_spark.plans import explain_str

    df = _build(spark, "q22_idle_customers")
    plan = explain_str(df, "simple")
    assert "LeftAnti" in plan
    # the global-average scalar rides as a broadcast, not a collect:
    # building the DataFrame must launch no jobs (pure plan construction)


def test_funnel_stages_share_user_keying(spark):
    flags = plan_flags(_build(spark, "funnel_events"))
    assert not flags["has_cartesian"]
    # every stage joins and aggregates on user_id only
    assert flags["n_shuffle_joins"] + flags["n_broadcast_joins"] >= 2


def test_distributed_dense_rank_exact_and_no_single_partition(spark):
    """Two-phase global rank: identical to the single-window dense_rank
    (ties colocate in range partitions, so the bridge is exact) and the
    plan contains no SinglePartition exchange."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bambooai_spark.functions.ranking import distributed_dense_rank
    from bambooai_spark.io import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    # use value rounded to whole units so ties exist and must not split
    base = ev.groupBy("user_id").agg(
        F.floor(F.min("value")).alias("k")
    )
    got = {
        (r["user_id"], r["rnk"])
        for r in distributed_dense_rank(
            base, ["k", "user_id"], out_col="rnk", num_partitions=8
        ).collect()
    }
    want = {
        (r["user_id"], r["rnk"])
        for r in base.select(
            "user_id",
            F.dense_rank().over(Window.orderBy("k", "user_id")).cast("long").alias("rnk"),
        ).collect()
    }
    assert got == want and len(got) > 0
    plan = (
        distributed_dense_rank(base, ["k", "user_id"], out_col="rnk")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_pack_docs_parallel_by_stream(spark):
    """Sequence packing is two-phase: range partition + local window per
    (partition, stream) slice — no SinglePartition funnel in the (lazy,
    pre-checkpoint) plan, even though streams are few."""
    from bambooai_spark.io import load_table
    from bambooai_spark.operators.packing import pack_sequences
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        pack_sequences(
            docs, "doc_id", "text", stream_cols=("lang",),
            checkpoint=False, strategy="twophase",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    spark.catalog.clearCache()
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()
    # column pruning: the text column feeds only the length computation; the
    # scan must not read more than (doc_id, text, lang)
    assert "n_chars" not in plan.split("ReadSchema")[-1]


def test_pack_single_giant_stream_two_phase(spark):
    """One giant stream (every doc in one language) must still pack across
    all range partitions — the classic Window.partitionBy(stream) funnel
    would collapse this to one task. Plan has no SinglePartition, and the
    offsets match the windowed single-stream twin exactly (NULL text rows
    included)."""
    from pyspark.sql import Window
    from bambooai_spark.operators.packing import pack_sequences

    rows = [(i, "en", ("x" * ((i * 37) % 501)) if i % 17 else None) for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string").repartition(8)

    lazy = pack_sequences(
        docs, "doc_id", "text", budget=64, stream_cols=("lang",),
        num_partitions=16, checkpoint=False, strategy="twophase",
    )
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan

    got = {
        (r["doc_id"], r["chunk_id"], r["chunk_offset"])
        for r in lazy.collect()
    }
    spark.catalog.clearCache()
    w = (
        Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    twin = docs.select(
        "doc_id",
        F.coalesce(
            F.sum(F.ceil(F.length("text") / F.lit(4.0)).cast("long")).over(w),
            F.lit(0).cast("long"),
        ).alias("off"),
    )
    want = {
        (r["doc_id"], r["off"] // 64, r["off"] % 64) for r in twin.collect()
    }
    assert got == want and len(got) == 2000


def test_shuffle_shards_no_single_partition_pruned_scan(spark):
    """The deterministic shuffle's only exchange is the n_shards-way hash
    partitioning for the per-shard window — never a SinglePartition sort —
    and the scan reads just the columns the permutation needs."""
    df = _build(spark, "shuffle_shards_docs")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert_no_cartesian(df)


def test_quality_filter_zero_shuffles(spark):
    """The composite quality gate is scan-side: no exchange anywhere."""
    df = _build(spark, "quality_filter_docs")
    flags = plan_flags(df)
    assert flags["n_exchanges"] == 0, flags
    # reads only (doc_id, text) of the 5-column table
    assert_pruned_scan(df, table_cols=5, max_read_cols=2)


def test_unigram_logprob_broadcasts_vocab(spark):
    """The vocab-sized probability relation must broadcast back onto the
    token stream — the corpus itself shuffles only on the doc key for the
    final mean."""
    flags = plan_flags(_build(spark, "unigram_logprob_docs"))
    assert flags["n_broadcast_joins"] >= 1
    assert flags["n_shuffle_joins"] == 0, flags


def test_grouped_top_k_matches_window_twin_and_bounds_candidates(spark):
    """Two-phase per-group top-k equals the plain window on a skewed
    input (one giant group + tiny groups + ties), and the final window's
    input is the bounded per-partition candidate union, not the
    relation."""
    from bambooai_spark.functions.ranking import grouped_top_k

    rows = [(i, "big", (i * 7919) % 1000) for i in range(5000)]
    rows += [(10_000 + i, "tiny", 5) for i in range(4)]  # all-tie group
    df = spark.createDataFrame(rows, "id long, g string, v long").repartition(8)

    out = grouped_top_k(
        df, ["g"], [F.col("v").desc(), F.col("id")], 7, out_col="rn"
    )
    # the two-phase shape is in the plan: a local window + _lrn <= k filter
    # BEFORE the final per-group window, so the final exchange sees only
    # the bounded candidate union
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2
    assert "_lrn" in plan
    got = {(r["g"], r["rn"], r["id"]) for r in out.collect()}
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id"))
    want = {
        (r["g"], r["rn"], r["id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 7)
        .collect()
    }
    assert got == want and len(want) == 7 + 4


def test_grouped_ntile_matches_ntile_twin(spark):
    """Two-phase NTILE equals the plain window including the uneven
    n % k != 0 split (first buckets one row larger) and a single giant
    group."""
    from bambooai_spark.functions.ranking import grouped_ntile

    rows = [(i, "solo", (i * 31) % 97) for i in range(1003)]  # 1003 % 4 = 3
    rows += [(50_000 + i, "small", i) for i in range(6)]      # 6 % 4 = 2
    df = spark.createDataFrame(rows, "id long, g string, v long").repartition(8)

    got = {
        (r["id"], r["b"])
        for r in grouped_ntile(
            df, ["g"], ["v", "id"], 4, out_col="b", num_partitions=16
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r["id"], r["b"])
        for r in df.withColumn("b", F.ntile(4).over(w)).collect()
    }
    assert got == want and len(want) == 1009


def test_grouped_relative_standing_matches_window_twin(spark):
    """Two-phase percent_rank/cume_dist equals the plain window exactly,
    including ties (shared ranks, peers-inclusive cume_dist), a group
    smaller than the partition count, and the single-row group (pr = 0).
    The plan must have no low-cardinality window funnel: every Window's
    partition spec includes the range-partition id, and the bridge enters
    as a BroadcastHashJoin (VERDICT r7 #1 — the 5-segment plain window
    was the tree's one scale-killer)."""
    from bambooai_spark.functions.ranking import grouped_relative_standing

    rows = [(i, "big", (i * 7919) % 211) for i in range(4003)]  # many ties
    rows += [(50_000 + i, "small", i % 3) for i in range(9)]
    rows += [(99_999, "solo", 42)]  # n == 1: pr must be 0.0, cd 1.0
    df = spark.createDataFrame(rows, "id long, g string, v long").repartition(8)

    # order by v ALONE: ~19-way ties per value in "big" exercise shared
    # ranks and peers-inclusive cume_dist; output is still deterministic
    # because tied rows share pr/cd
    out = grouped_relative_standing(
        df, ["g"], ["v"], pr_col="pr", cd_col="cd", num_partitions=16
    )
    got = {(r["id"], r["pr"], r["cd"]) for r in out.collect()}
    w = Window.partitionBy("g").orderBy("v")
    want = {
        (r["id"], r["pr"], r["cd"])
        for r in df.withColumn("pr", F.percent_rank().over(w))
        .withColumn("cd", F.cume_dist().over(w))
        .collect()
    }
    assert got == want and len(want) == 4013
    assert (99_999, 0.0, 1.0) in got

    lazy = grouped_relative_standing(
        df, ["g"], ["v"], num_partitions=16, checkpoint=False
    )
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    assert "BroadcastHashJoin" in plan
    # every window partitions on the range-partition id, never on the
    # raw (3-value) group alone
    for frag in plan.split("Window ")[1:]:
        head = frag.split("\n", 1)[0]
        assert "_pid" in head, head


def test_dense_reid_guards_the_broadcast(spark):
    """dense_reid_by_first_ts routes high-cardinality ids through the
    two-phase rank instead of broadcasting a global-window relation
    (VERDICT r7 advisory: an unguarded F.broadcast(ranked) +
    Window.orderBy would OOM the driver at 100M ids). Both paths must
    return identical rows; the large-N plan must contain neither a
    broadcast of the ranked relation nor a single-partition global sort
    of it."""
    from bambooai_spark.functions.timeseries import dense_reid_by_first_ts

    rows = [(f"id{i:04d}", (i * 37) % 500, i) for i in range(2000)]
    df = spark.createDataFrame(rows, "aid string, ts long, x long").repartition(6)

    small = dense_reid_by_first_ts(df, "aid", "ts")  # 2000 ids <= guard
    # out_col type must not flip at the scale transition (review r8)
    assert small.schema["new_id"].dataType.simpleString() == "bigint"
    want = {(r["aid"], r["x"], r["new_id"]) for r in small.collect()}

    # plan shape under autoBroadcastJoinThreshold=-1: only an EXPLICIT
    # broadcast hint could still broadcast, which is exactly the bug the
    # guard removes — the large path's sole hint is the tiny prefix
    # bridge, which joins on _pid, not the id. (With the conf at its
    # default, AQE auto-broadcasts the 2000-row test relation on its
    # measured size — a correct runtime decision that would not happen
    # at 100M ids, so it is not what this test pins.)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = dense_reid_by_first_ts(df, "aid", "ts", max_broadcast_ids=100)
        assert big.schema["new_id"].dataType.simpleString() == "bigint"
        got = {(r["aid"], r["x"], r["new_id"]) for r in big.collect()}
        assert got == want and len(want) == 2000
        bplan = big._jdf.queryExecution().executedPlan().toString()
        for frag in bplan.split("BroadcastHashJoin")[1:]:
            head = frag.split("\n", 1)[0]
            assert "aid" not in head, head
        # no global single-partition sort: every exchange is either the
        # bridge's range partitioning or the rejoin's hash partitioning
        assert "Exchange SinglePartition" not in bplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.catalog.clearCache()

    splan = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in splan


def test_bridge_is_broadcast_join_not_map_literal(spark):
    """The two-phase prefix bridge re-enters the plan as a BroadcastHashJoin
    of the small prefix relation — never a plan-embedded ``create_map``
    literal, which at cluster partition counts (tens of thousands of
    (partition, group) slices) becomes a multi-MB expression with
    O(entries) GetMapValue work per row. Checked on the heaviest bridge
    user (pack with many partitions) and on distributed_dense_rank."""
    from bambooai_spark.functions.ranking import distributed_dense_rank
    from bambooai_spark.operators.packing import pack_sequences

    rows = [(i, f"s{i % 5}", "x" * (i % 40)) for i in range(800)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).repartition(8)
    packed = pack_sequences(
        docs, "doc_id", "text", stream_cols=("lang",), num_partitions=24,
        strategy="twophase", checkpoint=False,
    )
    plan = packed._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    assert "BroadcastHashJoin" in plan
    assert "map_from" not in plan and "keys: [" not in plan
    assert "GetMapValue" not in plan

    ranked = distributed_dense_rank(
        docs.select("doc_id", F.length("text").alias("len")),
        ["len", "doc_id"],
        num_partitions=24,
        checkpoint=False,
    )
    rplan = ranked._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    assert "BroadcastHashJoin" in rplan
    assert "GetMapValue" not in rplan


def test_pack_strategy_auto_is_cost_based(spark):
    """strategy='auto' packs a small projection with ONE window pass (no
    range exchange, no broadcast bridge — the two-phase machinery is pure
    overhead at this size) and switches to the two-phase plan above the
    size threshold. Both strategies return identical rows."""
    from bambooai_spark.operators.packing import pack_sequences

    rows = [(i, f"s{i % 3}", "x" * (i % 50)) for i in range(500)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).repartition(4)

    small = pack_sequences(docs, "doc_id", "text", stream_cols=("lang",))
    splan = small._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in splan.lower()
    assert "BroadcastHashJoin" not in splan

    forced = pack_sequences(
        docs, "doc_id", "text", stream_cols=("lang",), small_input_bytes=0
    )
    got = {tuple(r) for r in forced.collect()}
    want = {tuple(r) for r in small.collect()}
    assert got == want and len(got) == 500


def test_q12_pushdown_pruning_single_agg_shuffle(spark):
    """q12_shipmodes: shipdate range reaches the lineitem scan, both
    sides read only the columns used (2 of 11 / 2 of 6), and the
    CASE-WHEN pair aggregates map-side — the only required exchange is
    the one on the 3-row agg key (the join may broadcast at test SF or
    shuffle co-partitioned at scale; either is fine, a cartesian is not)."""
    df = _build(spark, "q12_shipmodes")
    assert_pushed_filters(df, "l_shipdate")
    flags = plan_flags(df)
    assert not flags["has_cartesian"]
    pushed = ";".join(flags["pushed_filters"])
    assert "l_orderkey" in pushed  # join-key null filter pushed too
    # partial_sum before the exchange = map-side combine
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan


def test_q2_decorrelated_min_broadcasts_dims(spark):
    """q2_min_cost_supplier: the region→nation→supplier chain and the
    filtered part set enter as broadcasts, the part filter reaches its
    scan, and the decorrelated MIN + join-back never degrades to a
    cartesian. Both agg and join-back key on l_partkey (same-key
    shuffles AQE can stack)."""
    df = _build(spark, "q2_min_cost_supplier")
    flags = plan_flags(df)
    assert flags["n_broadcast_joins"] >= 3
    assert not flags["has_cartesian"]
    pushed = ";".join(flags["pushed_filters"])
    assert "p_type" in pushed and "p_size" in pushed


def test_q9_single_fact_pass_all_dims_broadcast(spark):
    """q9_nation_profit: part/supplier/nation all broadcast so the only
    pre-agg shuffle is the orderkey join; the name LIKE filter reaches
    the part scan; lineitem reads only the 6 columns used."""
    df = _build(spark, "q9_nation_profit")
    flags = plan_flags(df)
    assert flags["n_broadcast_joins"] >= 3
    assert not flags["has_cartesian"]
    assert "p_name" in ";".join(flags["pushed_filters"])
    # assert on the LINEITEM scan specifically — the tiny dim scans would
    # satisfy an any-scan <=6 check even if lineitem regressed to all 11
    li_schemas = [
        s for s in flags["read_schemas"] if "l_orderkey" in s
    ]
    assert li_schemas, flags["read_schemas"]
    for s in li_schemas:
        assert len(s.split(",")) <= 6, s


def test_q11_threshold_scalar_stays_in_plan(spark):
    """q11_value_concentration: the mean-value threshold rides as a
    single-row broadcast against the per-part aggregate (never a
    driver collect — building the frame launches no job), and the
    supplier-region chain broadcasts before the fact scan."""
    df = _build(spark, "q11_value_concentration")
    flags = plan_flags(df)
    # region→nation→supplier chain + the 1-row scalar join
    assert flags["n_broadcast_joins"] >= 3
    plan = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q16_anti_join_then_distinct_no_expand(spark):
    """q16_supplier_diversity: the complaints exclusion is a LeftAnti
    against a broadcast, the part filter prunes partkeys BEFORE the
    pair-distinct, and the single-column count_distinct needs no
    Expand operator (no row multiplication through the aggregate)."""
    df = _build(spark, "q16_supplier_diversity")
    plan = explain_str(df, "simple")
    assert "LeftAnti" in plan
    assert "Expand" not in plan
    flags = plan_flags(df)
    assert not flags["has_cartesian"]
    pushed = ";".join(flags["pushed_filters"])
    assert "p_brand" in pushed


def test_q20_cascaded_aggs_share_partkey(spark):
    """q20_dominant_suppliers: shipdate range pushed to the fact scan,
    the cold-part set broadcast, and the two cascaded aggregates key on
    the same l_partkey as the join-back — no cartesian anywhere in the
    semi-join chain."""
    df = _build(spark, "q20_dominant_suppliers")
    assert_pushed_filters(df, "l_shipdate")
    flags = plan_flags(df)
    assert flags["n_broadcast_joins"] >= 2
    assert not flags["has_cartesian"]


def test_window_offsets_single_user_shuffle(spark):
    """window_offsets_events: all five navigation functions ride ONE
    shuffle on the high-cardinality user_id (shared sort order), never
    a low-cardinality funnel or extra exchanges per function."""
    df = _build(spark, "window_offsets_events")
    flags = plan_flags(df)
    assert flags["n_exchanges"] == 1
    plan = explain_str(df, "simple")
    for frag in plan.split("Window ")[1:]:
        head = frag.split("\n", 1)[0]
        assert "user_id" in head, head


def test_read_corpus_schema_keeps_pruning_and_pushdown(spark, tmp_path):
    """read_corpus pins the manifest's recorded schema (evolution
    correctness) — that explicit schema must not cost the scan its
    column pruning or filter pushdown."""
    from bambooai_spark.operators.writer import append_corpus, read_corpus
    from bambooai_spark.plans import assert_pruned_scan, assert_pushed_filters

    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "corpus")
    append_corpus(docs, out)
    df = (
        read_corpus(spark, out)
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "lang")
    )
    # 4 data columns stored (lang is the partition dir); only doc_id read
    assert_pruned_scan(df, table_cols=4, max_read_cols=1)
    assert_pushed_filters(df, "doc_id")


def test_semdedup_pair_join_is_cell_blocked(spark):
    """semantic_dedup's near-dup self-join must key on the quantizer
    cell (sum-of-cell-squared pairs) — an unblocked N^2 would plan as a
    cartesian or a join without the cell key."""
    from bambooai_spark.plans import explain_str

    plan = explain_str(_build(spark, "semdedup_embeddings"))
    assert "CartesianProduct" not in plan
    # formatted explain lists join keys on their own lines: the pair
    # self-join's equi-key is the block (cell) column
    keys = [ln for ln in plan.splitlines() if "keys" in ln.lower()]
    assert any("blk" in ln for ln in keys), keys


def test_bench_line_slim_at_any_suite_size():
    """The bench stdout artifact must fit the driver's 2000-char tail
    capture whole at ANY suite size: per-query minima live in the
    sidecar, so a simulated 100-spec (and 1000-spec) result line stays
    a small constant, and the guard only ever has to drop 'carried'."""
    import json

    from bench import _final_line

    for n in (100, 1000):
        result = {
            "metric": "headline_total_sec",
            "value": 123.456,
            "unit": "sec",
            "n": n,
            "queries": {},
            "n_lifecycle": 8,
            "lifecycle_total_sec": 31.25,
            "carried": "vs=r10 n=66 now=43.06 prev=42.95",
            "sf": 0.1,
            "cpus": 32,
            "n_failed": 0,
        }
        line = _final_line(dict(result))
        assert len(line) < 400, len(line)
        parsed = json.loads(line)
        assert parsed["n"] == n and parsed["carried"]
    # pathological carried string: guard drops it, line still parses
    big = dict(result, carried="x" * 3000)
    line = _final_line(big)
    assert len(line) <= 1996
    assert json.loads(line)["carried"] is None


def test_bench_inflation_guard_flags_slow_phase():
    """VERDICT r11 #1: a globally slow machine phase inflates a query's
    min and max TOGETHER, sailing through the intra-run >=2x spread
    guard — the carried-baseline guard must flag any query whose min
    exceeds the prior round's min by >1.5x so the post-suite pass
    re-measures it (both samples recorded in the sidecar)."""
    from bench import _inflation_suspects

    prev = {"q1": 1.30, "exact_cut_docs": 2.11, "sketch": 0.65,
            "gone": 0.50}
    # the r11 incident shape: exact_cut reads +92% with a tight intra-run
    # spread; q1 wobbles +20% (dispersion class, not flagged); sketch
    # reads 3x (the r10 incident)
    mins = {"q1": 1.56, "exact_cut_docs": 4.05, "sketch": 1.95,
            "new_spec": 0.80, "failed": -1.0}
    assert _inflation_suspects(mins, prev) == ["exact_cut_docs", "sketch"]
    # boundary: exactly 1.5x is dispersion, not inflation
    assert _inflation_suspects({"q1": 1.95}, {"q1": 1.30}) == []
    assert _inflation_suspects({"q1": 1.96}, {"q1": 1.30}) == ["q1"]
    # degenerate baselines never divide/flag
    assert _inflation_suspects({"q1": 9.0}, {"q1": 0.0}) == []
    assert _inflation_suspects({"q1": 9.0}, {}) == []


def test_bench_sidecar_round_stamp(tmp_path, monkeypatch):
    """ADVICE r11: the sidecar is only trusted as the carried baseline
    when its stamped round matches the newest recorded BENCH_r*.json —
    a stale sidecar (slim round that crashed before its sidecar write)
    falls back to the newest artifact that still carries queries."""
    import json

    import bench

    # a fake repo dir: r10 fat artifact (has queries), r11 slim artifact
    d = tmp_path / "repo"
    d.mkdir()
    (d / "BENCH_r10.json").write_text(json.dumps(
        {"parsed": {"queries": {"q1": 1.0, "q2": 2.0}}, "sf": 0.1}
    ))
    (d / "BENCH_r11.json").write_text(json.dumps(
        {"parsed": {"queries": {}}, "sf": 0.1}
    ))
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(d / "bench.py")
    )
    # no sidecar: fall back to r10's fat artifact
    assert bench._prev_round_queries() == ("r10", {"q1": 1.0, "q2": 2.0}, 0.1)
    # sidecar stamped for r11: trusted
    (d / "BENCH_SPREAD.json").write_text(json.dumps(
        {"round": 11, "sf": 0.1, "queries": {"q1": 0.9, "q3": 3.0}}
    ))
    assert bench._prev_round_queries() == ("r11", {"q1": 0.9, "q3": 3.0}, 0.1)
    # sidecar stamped for an OLDER round (crashed-before-write r11):
    # falls back to r10 instead of mislabeling r9 minima as r11's
    (d / "BENCH_SPREAD.json").write_text(json.dumps(
        {"round": 9, "sf": 0.1, "queries": {"q1": 0.5}}
    ))
    assert bench._prev_round_queries() == ("r10", {"q1": 1.0, "q2": 2.0}, 0.1)
    # legacy unstamped sidecar (r11 shipped one): accepted for continuity
    (d / "BENCH_SPREAD.json").write_text(json.dumps(
        {"sf": 0.1, "queries": {"q1": 0.8}}
    ))
    assert bench._prev_round_queries() == ("r11", {"q1": 0.8}, 0.1)
    # and the stamp a run writes is newest-recorded + 1
    assert bench._newest_recorded_round() == 11


def test_bench_archive_baselines_immediately_prior_round(
    tmp_path, monkeypatch
):
    """Driver-mirror simulation (VERDICT r12 #2): under the live-sidecar
    protocol the driver was structurally blind to the prior round — the
    builder's closing run overwrites BENCH_SPREAD.json stamped N, the
    driver's round-N run refuses it (stamp N != newest artifact N-1)
    and falls back TWO rounds (BENCH_r12 read vs=r10). With per-round
    archives, the round-13 driver run baselines against round 12's
    archived minima even though the live sidecar already belongs to
    round 13."""
    import json

    import bench

    d = tmp_path / "repo"
    d.mkdir()
    # committed artifacts: r10 fat, r11 + r12 slim (no queries on the line)
    (d / "BENCH_r10.json").write_text(json.dumps(
        {"parsed": {"queries": {"q1": 1.0}}, "sf": 0.1}
    ))
    for rnd in (11, 12):
        (d / f"BENCH_r{rnd}.json").write_text(json.dumps(
            {"parsed": {"queries": {}}, "sf": 0.1}
        ))
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(d / "bench.py")
    )
    # round-12 archive (written by r12's own driver run) + a live
    # sidecar ALREADY overwritten by the r13 builder's closing run
    (d / "BENCH_SPREAD_r12.json").write_text(json.dumps(
        {"round": 12, "sf": 0.1, "queries": {"q1": 0.7, "q2": 1.4}}
    ))
    (d / "BENCH_SPREAD.json").write_text(json.dumps(
        {"round": 13, "sf": 0.1, "queries": {"q1": 0.65}}
    ))
    # the r13 driver run sees newest artifact 12 and lands on r12's
    # archived minima — ONE round back, not two
    assert bench._prev_round_queries() == (
        "r12", {"q1": 0.7, "q2": 1.4}, 0.1
    )
    # a mis-stamped archive is refused like a mis-stamped live sidecar
    (d / "BENCH_SPREAD_r12.json").write_text(json.dumps(
        {"round": 9, "sf": 0.1, "queries": {"q1": 0.1}}
    ))
    assert bench._prev_round_queries() == ("r10", {"q1": 1.0}, 0.1)
