"""Hypothesis property tests for the trickiest operator implementations —
random inputs checked against brute-force executable specs. Spark jobs are
slow per-example, so examples are few but adversarial (ties, empty sides,
singleton groups)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from bambooai_spark.functions.timeseries import asof_join, determine_segments
from bambooai_spark.executor.sanitizer import sanitize


# ---------------------------------------------------------------- asof_join

_left_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20)),  # (key, ts)
    min_size=0, max_size=12,
)
_right_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(0, 99)),
    min_size=0, max_size=12,  # (key, ts, value-id) — duplicate ts allowed
)


@settings(max_examples=12, deadline=None)
@given(_left_rows, _right_rows)
def test_asof_join_matches_bruteforce(spark, left_rows, right_rows):
    left_rows = [(i, k, t) for i, (k, t) in enumerate(left_rows)]
    left = spark.createDataFrame(
        left_rows or [(0, 0, 0)], "lid: long, k: long, ts: long"
    )
    right = spark.createDataFrame(
        right_rows or [(99, -1, -1)], "k: long, rts: long, rid: long"
    )
    got = {
        r.lid: (r.rid, r.rts)
        for r in asof_join(
            left, right,
            left_on="k", right_on="k", left_ts="ts", right_ts="rts",
            right_value_cols=["rid", "rts"], tiebreak="rid",
        ).collect()
    }
    # brute-force spec: most recent right row with rts <= ts in same key;
    # ties on rts broken by greatest rid
    rights = right.collect()
    for lid, k, ts in (left_rows or [(0, 0, 0)]):
        cands = [(r.rts, r.rid) for r in rights if r.k == k and r.rts <= ts]
        want = max(cands, key=lambda x: (x[0], x[1])) if cands else None
        have = got[lid]
        if want is None:
            assert have == (None, None), f"lid={lid}: {have} != none"
        else:
            assert have == (want[1], want[0]), f"lid={lid}: {have} != {want}"


# ----------------------------------------------------------- segmentation

@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 1), st.floats(0, 100)), min_size=1, max_size=15),
    st.floats(1.0, 30.0),
)
def test_determine_segments_matches_reference_rule(spark, rows, width):
    df = spark.createDataFrame(
        [(i, k, m) for i, (k, m) in enumerate(rows)], "i: long, k: long, m: double"
    )
    got = {r.i: r.segment_id for r in determine_segments(df, "m", "k", width).collect()}
    # reference rule (ttl:589-648): seg = floor(m/width); NULL when seg >=
    # floor(group_max/width) (the trailing incomplete bucket)
    import math

    by_key: dict[int, float] = {}
    for _i, (k, m) in enumerate(rows):
        by_key[k] = max(by_key.get(k, m), m)
    for i, (k, m) in enumerate(rows):
        complete = math.floor(by_key[k] / width)
        want = math.floor(m / width) if math.floor(m / width) < complete else None
        assert got[i] == want, f"row {i}: {got[i]} != {want}"


# ------------------------------------------------------------- sanitizer

@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=300))
def test_sanitizer_idempotent_and_total(code):
    once = sanitize(code)
    assert sanitize(once) == once  # idempotent: re-sanitizing changes nothing
    for line in once.splitlines():
        # no active line may contain an unbounded collect
        if not line.lstrip().startswith("#"):
            assert ".collect()" not in line or ".limit(" in line


# ------------------------------------------------------------ mixture_sample

_mix_docs = st.lists(
    st.tuples(
        st.sampled_from(["en", "de", "zh"]),  # group
        st.integers(0, 12),                   # words in the doc
    ),
    min_size=0, max_size=16,
)
_mix_budget = st.integers(1, 60)


@settings(max_examples=10, deadline=None)
@given(_mix_docs, _mix_budget)
def test_mixture_sample_matches_bruteforce(spark, docs, budget):
    """The two-phase grouped prefix-sum bridge equals the obvious
    single-threaded spec: per group, docs in (md5(str(id)), id) order are
    taken while the running total BEFORE the doc is under the group's
    budget (boundary doc included)."""
    import hashlib

    from bambooai_spark.operators.packing import mixture_sample

    rows = [
        (i, " ".join(["w"] * n) if n else "", g)
        for i, (g, n) in enumerate(docs)
    ]
    weights = {"en": 0.5, "de": 0.3, "zh": 0.2}
    # brute force: n_tokens = len(split-on-whitespace) — for "" that is
    # [''] -> 1, matching Spark's split semantics
    budgets = {g: int(w * budget) for g, w in weights.items()}
    expect = {}
    for g in sorted(weights):
        total = 0
        for i, text, gg in sorted(
            (r for r in rows if r[2] == g),
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        ):
            n = 1 if text == "" else len(text.split())
            if total < budgets[g]:
                total += n
                expect[i] = (g, n, total)
            else:
                break

    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    got = {
        r["doc_id"]: (r["lang"], r["n_tokens"], r["cum_tokens"])
        for r in mixture_sample(df, weights, budget, num_partitions=3).collect()
    }
    assert got == expect


def test_operators_handle_empty_inputs(spark, tmp_path):
    """Every pipeline operator degrades to an empty (not crashed) result
    on an empty table — the boundary the oracle suite never exercises.
    knn_ivf is the one deliberate exception: training centroids on an
    empty table raises a clear ValueError."""
    import pytest as _pytest

    from bambooai_spark.functions.text import quality_filter, scrub_pii
    from bambooai_spark.operators.dedup import (
        connected_components,
        embedding_near_dup,
        exact_dedup,
        jaccard_near_dup,
        minhash_md5_near_dup,
        minhash_near_dup,
        minhash_signatures_md5,
        simhash,
        simhash_md5,
    )
    from bambooai_spark.operators.packing import (
        mixture_sample,
        pack_sequences,
    )
    from bambooai_spark.operators.shuffle import shuffle_shards
    from bambooai_spark.operators.similarity import (
        knn_brute_force,
        knn_ivf,
    )
    from bambooai_spark.operators.writer import append_corpus, write_corpus

    docs = spark.createDataFrame(
        [], "doc_id LONG, text STRING, lang STRING, source STRING"
    )
    emb = spark.createDataFrame(
        [], "vec_id LONG, embedding ARRAY<DOUBLE>, label STRING"
    )

    assert exact_dedup(docs, "text", "doc_id").count() == 0
    # jaccard's dense path builds a 0-word bitmask on an empty vocabulary —
    # the sum-seed regression this test pins
    assert jaccard_near_dup(docs, "doc_id", "text").count() == 0
    assert minhash_near_dup(docs, "doc_id", "text").count() == 0
    assert minhash_signatures_md5(docs, "doc_id", "text").count() == 0
    assert minhash_md5_near_dup(docs, "doc_id", "text").count() == 0
    assert simhash(docs, "doc_id", "text").count() == 0
    assert simhash_md5(docs, "doc_id", "text").count() == 0
    assert (
        connected_components(
            spark.createDataFrame([], "node LONG"),
            spark.createDataFrame([], "src LONG, dst LONG"),
        ).count()
        == 0
    )
    assert embedding_near_dup(
        emb, "vec_id", "embedding", block_col="label"
    ).count() == 0
    assert knn_brute_force(emb, "vec_id", "embedding", query_id=1).count() == 0
    with _pytest.raises(ValueError, match="empty"):
        knn_ivf(emb, "vec_id", "embedding", query_id=1).count()
    assert pack_sequences(docs, "doc_id", "text").count() == 0
    assert mixture_sample(docs, {"en": 1.0}, 100).count() == 0
    assert shuffle_shards(docs, "doc_id", n_shards=8).count() == 0
    qf = quality_filter("text")
    assert docs.select(qf["keep"]).count() == 0
    assert docs.select(scrub_pii("text")["scrubbed"]).count() == 0
    # empty writes: manifest is empty, not a crash; empty first append
    # leaves a schema-less ledger the next append tolerates
    m = write_corpus(docs, str(tmp_path / "w"))
    assert m.count() == 0
    # empty-path manifest keeps the SOURCE partition-column type
    assert dict(m.dtypes)["lang"] == "string"
    out = str(tmp_path / "a")
    assert append_corpus(docs, out).count() == 0
    assert append_corpus(docs, out).count() == 0  # _SUCCESS-only ledger
    # append into a dir created by an EMPTY write_corpus (data-less
    # corpus, no ledger): seeding must tolerate the footerless dir
    real = spark.createDataFrame(
        [(1, "the real document text here", "en", "s")],
        "doc_id LONG, text STRING, lang STRING, source STRING",
    )
    assert append_corpus(real, str(tmp_path / "w")).count() == 1


def test_operators_handle_null_text(spark):
    """NULL-text rows flow through the pipeline without crashing: empty
    shingle sets for the dedup family, NULL token counts the mixture
    sampler's offset bridge must treat as zero (the regression this
    pins), and the quality gate drops the rows."""
    from bambooai_spark.functions.text import quality_filter
    from bambooai_spark.operators.dedup import (
        jaccard_near_dup,
        minhash_md5_near_dup,
    )
    from bambooai_spark.operators.packing import mixture_sample

    good = "the quick brown fox jumps over the lazy dog ten words"
    docs = spark.createDataFrame(
        [(1, None, "en"), (2, good, "en"), (3, None, "de"), (4, "", "de")],
        "doc_id LONG, text STRING, lang STRING",
    )
    assert jaccard_near_dup(docs, "doc_id", "text").count() == 0
    assert minhash_md5_near_dup(docs, "doc_id", "text").count() == 0
    sampled = mixture_sample(docs, {"en": 0.5, "de": 0.5}, 100).collect()
    # NULL-text rows drop (NULL token count); the empty string counts one
    # whitespace token (split('') == ['']), matching the oracle semantics
    assert sorted(r["doc_id"] for r in sampled) == [2, 4]
    qf = quality_filter("text")
    kept = docs.select("doc_id", qf["keep"].alias("k")).where("k").collect()
    assert [r["doc_id"] for r in kept] == [2]


def test_pack_sequences_duplicate_ids_and_separator_values(spark):
    """Offsets stay a valid non-overlapping prefix sum when id values
    repeat (explicit ROWS frame — the default RANGE frame would lump tied
    ids into one peer group), and multi-column streams whose values embed
    the old '|' separator stay distinct (JSON-injective stream key)."""
    from bambooai_spark.operators.packing import pack_sequences

    rows = [
        # duplicate id 5 inside one stream
        (5, "en", "web", "x" * 40),
        (5, "en", "web", "x" * 80),
        (1, "en", "web", "x" * 20),
        # adversarial: ('a|b', 'c') vs ('a', 'b|c') must NOT merge
        (1, "a|b", "c", "y" * 400),
        (1, "a", "b|c", "z" * 400),
        (2, "a|b", "c", "y" * 40),
        (2, "a", "b|c", "z" * 40),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    out = pack_sequences(
        df, "doc_id", "text", budget=16, stream_cols=("lang", "source"),
        num_partitions=4, strategy="twophase",
    ).collect()

    by_stream: dict = {}
    for r in out:
        by_stream.setdefault((r["lang"], r["source"]), []).append(r)
    assert set(by_stream) == {
        ("en", "web"), ("a|b", "c"), ("a", "b|c")
    }
    # each stream's offsets form an exact exclusive prefix sum: sorted
    # spans tile [0, total) with no gap or overlap
    for rows_ in by_stream.values():
        spans = sorted(
            (r["chunk_id"] * 16 + r["chunk_offset"], r["n_tok"]) for r in rows_
        )
        pos = 0
        for off, n in spans:
            assert off == pos
            pos += n
    # the two '|'-adversarial streams kept independent sums (each starts
    # at 0 with its own 400-token doc first by id order)
    assert len(by_stream[("a|b", "c")]) == 2
    assert len(by_stream[("a", "b|c")]) == 2


# -------------------------------------------------- two-phase group helpers

_grp_rows = st.lists(
    # (group ∈ 3 values incl. one with the old separator char, value, dup-able id)
    st.tuples(st.integers(0, 2), st.integers(0, 9), st.integers(0, 6)),
    min_size=1, max_size=24,
)
_GROUPS = ["en", "a|b", None]


@settings(max_examples=10, deadline=None)
@given(_grp_rows, st.integers(1, 4))
def test_grouped_top_k_property(spark, rows, k):
    """grouped_top_k over random grouped data (ties, NULL group, separator
    chars in group values) equals the plain per-group window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bambooai_spark.functions.ranking import grouped_top_k

    data = [(i, _GROUPS[g], v) for i, (g, v, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, g string, v long").repartition(4)
    got = {
        (r["g"], r["rn"], r["id"])
        for r in grouped_top_k(
            df, ["g"], [F.col("v").desc(), F.col("id")], k, out_col="rn"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id"))
    want = {
        (r["g"], r["rn"], r["id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(_grp_rows, st.integers(1, 5))
def test_grouped_ntile_property(spark, rows, k):
    """grouped_ntile over random grouped data (uneven splits, NULL group,
    groups smaller than the bucket count) equals the plain NTILE window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bambooai_spark.functions.ranking import grouped_ntile

    data = [(i, _GROUPS[g], v) for i, (g, v, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, g string, v long").repartition(4)
    got = {
        (r["id"], r["b"])
        for r in grouped_ntile(
            df, ["g"], ["v", "id"], k, out_col="b", num_partitions=8
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r["id"], r["b"])
        for r in df.withColumn("b", F.ntile(k).over(w)).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(_grp_rows)
def test_grouped_relative_standing_property(spark, rows):
    """grouped_relative_standing over random grouped data (ties on the
    order value, NULL group, separator chars in group values, single-row
    groups) equals the plain percent_rank/cume_dist window bit-for-bit —
    both sides compute the same integer-operand double divisions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bambooai_spark.functions.ranking import grouped_relative_standing

    data = [(i, _GROUPS[g], v) for i, (g, v, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, g string, v long").repartition(4)
    got = {
        (r["id"], r["pr"], r["cd"])
        for r in grouped_relative_standing(
            df, ["g"], ["v"], pr_col="pr", cd_col="cd", num_partitions=8
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v")
    want = {
        (r["id"], r["pr"], r["cd"])
        for r in df.withColumn("pr", F.percent_rank().over(w))
        .withColumn("cd", F.cume_dist().over(w))
        .collect()
    }
    assert got == want


def test_grouped_ntile_and_top_k_validate_k(spark):
    """NTILE(0) raises in ANSI SQL; the two-phase twin must refuse too
    rather than silently producing NULL buckets (ADVICE r5). Same for
    grouped_top_k."""
    import pytest as _pytest

    from bambooai_spark.functions.ranking import grouped_ntile, grouped_top_k

    df = spark.createDataFrame([(1, "a", 1)], "id long, g string, v long")
    with _pytest.raises(ValueError):
        grouped_ntile(df, ["g"], ["v"], 0)
    with _pytest.raises(ValueError):
        grouped_top_k(df, ["g"], ["v"], 0)


def test_prefix_bridge_handles_null_group_keys(spark):
    """grouped_prefix_bridge's driver-side sort must survive NULL group
    keys spread over several partitions (ADVICE r6: the old (key, pid)
    sort key raised TypeError on NULL) — and with_bridge's eqNullSafe
    join must give the NULL group correct offsets and totals."""
    from pyspark.sql import functions as F

    from bambooai_spark.functions.twophase import (
        grouped_prefix_bridge,
        with_bridge,
    )

    rows = [
        (i, None if i % 3 == 0 else ("a" if i % 2 == 0 else "b"), i + 1)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id LONG, g STRING, n LONG")
    part = (
        df.repartition(4, "id")  # NULL-key rows land in MANY partitions
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_skey", F.col("g"))
        .persist()
    )
    try:
        bridge = grouped_prefix_bridge(part, F.sum("n"))
        joined = with_bridge(part, bridge)
        # every row (NULL group included) got a non-null offset and the
        # group's grand total
        assert joined.filter("_offset IS NULL OR _total IS NULL").count() == 0
        want = {
            r["g"]: r["t"]
            for r in df.groupBy("g").agg(F.sum("n").alias("t")).collect()
        }
        got = {
            r["_skey"]: r["_total"]
            for r in joined.select("_skey", "_total").distinct().collect()
        }
        assert got == want
        # offsets partition the total: sum of (slice sums) per group via
        # distinct (pid, offset) rows reconstructs each group's prefix set
        null_slices = (
            bridge.filter("_skey IS NULL").select("_offset", "_total").collect()
        )
        assert len(null_slices) >= 2  # NULLs genuinely spanned partitions
        assert all(r["_total"] == want[None] for r in null_slices)
    finally:
        part.unpersist()


# -------------------------------------------------- schema-evolution helpers

_field_names = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f"]),
    min_size=1, max_size=6, unique=True,
)
def _type_instances():
    from pyspark.sql.types import (
        BinaryType,
        DateType,
        DoubleType,
        LongType,
        StringType,
    )

    return st.sampled_from(
        [LongType(), DoubleType(), StringType(), DateType(), BinaryType()]
    )


@settings(max_examples=50, deadline=None)
@given(_field_names, _field_names, st.data())
def test_unified_schema_json_properties(stored_names, batch_names, data):
    """Pure-python spec of _unified_schema_json: stored field order and
    types win for common names, batch-only fields append in batch order,
    every field comes out nullable, and unifying twice is idempotent."""
    from pyspark.sql.types import StructField, StructType

    from bambooai_spark.operators.writer import _unified_schema_json

    types = _type_instances()

    def mk(names):
        return StructType(
            [
                StructField(
                    n,
                    data.draw(types, label=n),
                    data.draw(st.booleans(), label=f"null-{n}"),
                )
                for n in names
            ]
        )

    stored, batch = mk(stored_names), mk(batch_names)

    class _Fake:  # _unified_schema_json only touches .schema
        schema = batch

    got = _unified_schema_json(stored.jsonValue(), _Fake())
    names = [f["name"] for f in got["fields"]]
    assert names == stored_names + [
        n for n in batch_names if n not in stored_names
    ]
    by_name = {f.name: f for f in stored.fields}
    for f in got["fields"]:
        assert f["nullable"] is True
        if f["name"] in by_name:
            assert f["type"] == by_name[f["name"]].dataType.jsonValue()
    # idempotent: unifying the union with the same batch changes nothing
    again = _unified_schema_json(got, _Fake())
    assert again == got
    # no stored schema: the batch defines it (nullable-forced)
    fresh = _unified_schema_json(None, _Fake())
    assert [f["name"] for f in fresh["fields"]] == batch_names


@settings(max_examples=100, deadline=None)
@given(
    st.binary(min_size=0, max_size=64),
    st.integers(1, 32),
    st.integers(1, 32),
)
def test_stub_resizer_contract(payload, width, height):
    """The stub resizer's executable spec: exactly width*height bytes,
    deterministic, and a pure function of (payload, dims)."""
    from bambooai_spark.operators.multimodal import _stub_resizer

    out, w, h = _stub_resizer(payload, width, height)
    assert (w, h) == (width, height)
    assert len(out) == width * height
    assert _stub_resizer(payload, width, height)[0] == out
    if payload:
        # tiling: the output is a prefix of payload repeated
        reps = -(-(width * height) // len(payload))
        assert out == (payload * reps)[: width * height]


# ----------------------------------------------------------- zorder_key

_z_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-50, 50)),
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
    ),
    min_size=1, max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(_z_rows, st.integers(2, 6))
def test_zorder_key_properties(spark, rows, bits):
    """For any input: every key fits bits*2 bits, identical rows get
    identical keys, and an all-NULL/constant column degrades gracefully
    (rank 0 everywhere) instead of crashing."""
    from bambooai_spark.functions.zorder import zorder_key

    df = spark.createDataFrame(
        [(a, b) for a, b in rows], "a bigint, b double"
    )
    got = zorder_key(df, ("a", "b"), bits=bits).collect()
    assert len(got) == len(rows)
    keys = {}
    for r in got:
        assert 0 <= r["_zkey"] < (1 << (2 * bits)), r
        prev = keys.setdefault((r["a"], r["b"]), r["_zkey"])
        assert prev == r["_zkey"]  # deterministic per value tuple


@settings(max_examples=8, deadline=None)
@given(_z_rows)
def test_zorder_dominance_is_monotonic(spark, rows):
    """Morton keys preserve dominance: if row X <= row Y in EVERY
    dimension (NULLs rank lowest), then zkey(X) <= zkey(Y) — the
    property that makes range predicates on any dimension prunable."""
    from bambooai_spark.functions.zorder import zorder_key

    df = spark.createDataFrame(
        [(a, b) for a, b in rows], "a bigint, b double"
    )
    got = zorder_key(df, ("a", "b"), bits=6).collect()

    def leq(x, y):  # NULL sorts below everything
        if x is None:
            return True
        if y is None:
            return False
        return x <= y

    for r1 in got:
        for r2 in got:
            if leq(r1["a"], r2["a"]) and leq(r1["b"], r2["b"]):
                assert r1["_zkey"] <= r2["_zkey"], (r1, r2)
