"""Property tests for the probabilistic operators (the three no-oracle
CORRECTNESS rows) — each claim in the suite docstrings is asserted here:

- MinHash+LSH near-dup: recall vs the EXACT Jaccard join, and perfect
  precision (candidates are verified with exact Jaccard, so no false
  positives can survive).
- SimHash: the Spark fold is compared against a pure-Python reference
  implementation of the same algorithm (sharing Spark's xxhash64 per-shingle
  values, so the test pins the bit-vote/fold logic), plus the semantic
  property: exact-duplicate docs ⇒ hamming distance 0, near-dups ⇒ small
  distance, random pairs ⇒ ~32 bits.
- knn_lsh: recall@10 vs knn_brute_force across several queries (floors set
  just below measured values: 0.92 avg / 0.8 min at 16 tables × 4 bits).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bambooai_spark.io import load_table
from bambooai_spark.functions.text import word_shingles
from bambooai_spark.operators.dedup import (
    jaccard_near_dup,
    minhash_near_dup,
    simhash,
)
from bambooai_spark.operators.similarity import knn_brute_force, knn_lsh
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


# ------------------------------------------------------------- minhash


def test_minhash_recall_and_precision_vs_exact(spark, docs):
    true = {
        (r.doc_a, r.doc_b)
        for r in jaccard_near_dup(
            docs, "doc_id", "text", n=2, threshold=0.4, strategy="index"
        ).collect()
    }
    found = {
        (r.doc_a, r.doc_b)
        for r in minhash_near_dup(
            docs, "doc_id", "text", n=2, threshold=0.4
        ).collect()
    }
    assert len(true) > 0
    recall = len(true & found) / len(true)
    # dup pairs in the corpus sit at jaccard ≥0.8 where the 16×4 S-curve is
    # ≈1.0; measured recall is 1.0 — floor at 0.9 for robustness
    assert recall >= 0.9, f"minhash recall {recall} < 0.9"
    # verification step re-checks exact jaccard → no false positives, ever
    assert found <= true, f"false positives: {found - true}"


# ------------------------------------------------------------- simhash


def _simhash_py(hashes: list[int]) -> int:
    """Pure-Python SimHash reference: per 64-bit hash, bit i votes +1/-1;
    fingerprint bit i = 1 iff the vote sum is positive."""
    votes = [0] * 64
    for h in hashes:
        h &= (1 << 64) - 1
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    fp = 0
    for i, v in enumerate(votes):
        if v > 0:
            fp |= 1 << i
    return fp


def test_simhash_matches_python_reference(spark, docs):
    sample = docs.limit(20)
    # per-shingle xxhash64 values from Spark (the shared hash primitive)
    hashed = sample.select(
        "doc_id",
        F.transform(word_shingles("text", 2), lambda s: F.xxhash64(s)).alias("hs"),
    ).collect()
    got = {
        r.doc: r.simhash64 for r in simhash(sample, "doc_id", "text").collect()
    }
    for row in hashed:
        want = _simhash_py(list(row.hs))
        have = got[row.doc_id] & (1 << 64) - 1
        assert have == want, f"doc {row.doc_id}: {have:#x} != {want:#x}"


def test_simhash_hamming_separation(spark, docs):
    import random

    fps = {r.doc: r.simhash64 for r in simhash(docs, "doc_id", "text").collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    dups = jaccard_near_dup(
        docs, "doc_id", "text", n=2, threshold=0.8, strategy="index"
    ).collect()
    assert dups
    dup_d = [ham(fps[r.doc_a], fps[r.doc_b]) for r in dups]
    ids = sorted(fps)
    random.seed(7)
    rnd_d = [
        ham(fps[random.choice(ids)], fps[random.choice(ids)]) for _ in range(200)
    ]
    assert max(dup_d) <= 12, f"near-dup hamming too high: {max(dup_d)}"
    assert sum(rnd_d) / len(rnd_d) > 20, "random pairs should differ in ~32 bits"


def test_simhash_deterministic_across_partitionings(spark, docs):
    a = {r.doc: r.simhash64 for r in simhash(docs, "doc_id", "text").collect()}
    b = {
        r.doc: r.simhash64
        for r in simhash(docs.repartition(13), "doc_id", "text").collect()
    }
    assert a == b


# ------------------------------------------------------------- knn_lsh


def test_knn_lsh_recall_at_10(spark, emb):
    recalls = []
    for qid in (0, 7, 23, 42, 99):
        exact = {
            r.vec_id
            for r in knn_brute_force(
                emb, "vec_id", "embedding", query_id=qid, k=10
            ).collect()
        }
        approx = {
            r.vec_id
            for r in knn_lsh(
                emb, "vec_id", "embedding", query_id=qid, k=10,
                n_bits=4, n_tables=16, dim=64,
            ).collect()
        }
        recalls.append(len(exact & approx) / 10)
    avg = sum(recalls) / len(recalls)
    assert min(recalls) >= 0.7, f"recall floor breached: {recalls}"
    assert avg >= 0.85, f"avg recall {avg} < 0.85 ({recalls})"


def test_knn_lsh_scores_are_exact_cosines(spark, emb):
    # approximation affects WHICH rows are considered, never their scores:
    # every returned (id, cosine) must equal the brute-force cosine
    bf = {
        r.vec_id: r.cosine
        for r in knn_brute_force(
            emb, "vec_id", "embedding", query_id=23, k=500
        ).collect()
    }
    for r in knn_lsh(
        emb, "vec_id", "embedding", query_id=23, k=10, n_bits=4, n_tables=16,
        dim=64,
    ).collect():
        assert bf[r.vec_id] == pytest.approx(r.cosine, abs=1e-6)


# ------------------------------------------------------------- simhash join


def test_simhash_near_dup_is_exact_within_bound(spark, docs):
    """The pigeonhole block join is EXACT for its bound: two fingerprints
    within max_hamming bits must agree on a whole block, so the result is
    precisely {pairs with hamming ≤ max_hamming} — verified against a
    brute-force sweep over all fingerprint pairs."""
    from bambooai_spark.operators.dedup import simhash_near_dup

    max_h = 6
    found = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dup(
            docs, "doc_id", "text", max_hamming=max_h
        ).collect()
    }
    fps = {r.doc: r.simhash64 for r in simhash(docs, "doc_id", "text").collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    ids = sorted(fps)
    want = {
        (a, b): ham(fps[a], fps[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(fps[a], fps[b]) <= max_h
    }
    assert len(want) > 0, "corpus has no near-dup fingerprints at this bound"
    assert found == want  # complete AND sound


def test_embedding_near_dup_with_lsh_bucket_block(spark, emb):
    """The documented scale composition: precompute_buckets supplies the
    block key for the embedding near-dup self-join."""
    from bambooai_spark.operators.dedup import embedding_near_dup
    from bambooai_spark.operators.similarity import precompute_buckets

    bucketed = precompute_buckets(
        emb, "embedding", dim=64, n_bits=3, n_tables=1, bucket_prefix="bkt"
    )
    blocked = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup(
            bucketed, "vec_id", "embedding", block_col="bkt_0", threshold=0.4
        ).collect()
    }
    full = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup(
            emb, "vec_id", "embedding", threshold=0.4, allow_full_cross=True
        ).collect()
    }
    # blocking only prunes pairs (never invents them) and a single 3-bit
    # table retains a p^3 share of true pairs (~25% at these cosines); the
    # production path amplifies with more tables, as knn_lsh does
    assert blocked <= full
    assert len(full) > 0 and len(blocked) > 0
    assert len(blocked) / len(full) >= 0.1


# ------------------------------------------------------- semantic_dedup


@given(
    n=st.integers(min_value=0, max_value=10**12),
    target=st.integers(min_value=1, max_value=10**7),
)
@settings(max_examples=200, deadline=None)
def test_semdedup_cell_count_scales_with_corpus(n, target):
    """The derived cell count keeps mean cell size <= target (so pair
    work is ~N*target/2 at any N), never drops below the floor, and is
    monotone in N — a bigger corpus never gets fewer cells."""
    from bambooai_spark.operators.dedup import semdedup_cell_count

    k = semdedup_cell_count(n, target)
    assert k >= 16
    assert k * target >= n  # mean cell size <= target
    if n > 16 * target:
        assert k < n / target + 1  # no over-shoot beyond ceil
    assert semdedup_cell_count(n + target, target) >= k


def test_semdedup_derived_cells_used_when_args_omitted(spark, emb):
    """centroids=None + n_cells=None derives the cell count from a
    df.count() instead of running 16 cells at any N: with a tiny
    target_cell_rows the 500-row corpus must quantize into far more
    than the old fixed-16 default."""
    from bambooai_spark.operators.dedup import semantic_dedup

    out = semantic_dedup(
        emb, "vec_id", "embedding",
        threshold=0.99, target_cell_rows=10,
    )
    # ceil(500/10)=50 trained cells; k-means may leave some empty but
    # the survivors must spread well past the legacy 16-cell default
    n_cells_seen = out.select("cell").distinct().count()
    assert n_cells_seen > 16
    assert out.count() <= 500


def test_semdedup_refuses_exploding_pair_join(spark, emb):
    """The three-tier pair-join guard (the by-omission stance of
    embedding_near_dup's allow_full_cross):
    1. a quantizer too coarse even when balanced (one centroid: N^2/2
       pairs) refuses on the Cauchy-Schwarz LOWER bound — no assignment
       job runs;
    2. cells balanced-safe but SKEWED past the bound refuse on the
       measured per-cell counts (the one case worth an extra job);
    3. max_cell_pairs=None opts out entirely."""
    import numpy as np

    from bambooai_spark.operators.dedup import semantic_dedup
    from bambooai_spark.operators.similarity import md5_centroids

    one_cell = md5_centroids(emb, "vec_id", "embedding", 1)
    with pytest.raises(ValueError, match="balanced cells"):
        semantic_dedup(
            emb, "vec_id", "embedding",
            centroids=one_cell, threshold=0.3, assign="exact",
            max_cell_pairs=1000.0,  # 500 rows in one cell -> ~125k pairs
        )

    # skew band: k=2 makes the balanced estimate ~62k (under the 70k
    # bound), but a far-away second centroid captures nothing, so the
    # MEASURED count is ~125k (over) — only the exact tier catches it
    dim = len(np.asarray(one_cell)[0])
    skewed = [list(np.asarray(one_cell)[0]), [1e6] * dim]
    with pytest.raises(ValueError, match="SKEWED"):
        semantic_dedup(
            emb, "vec_id", "embedding",
            centroids=skewed, threshold=0.3, assign="exact",
            max_cell_pairs=70_000.0,
        )

    # explicit opt-out still runs (small-N escape hatch)
    out = semantic_dedup(
        emb, "vec_id", "embedding",
        centroids=one_cell, threshold=0.3, assign="exact",
        max_cell_pairs=None,
    )
    assert out.count() > 0


# ------------------------------------------------------------- knn_ivf


def test_knn_ivf_recall_and_exact_scores(spark, emb):
    from bambooai_spark.operators.similarity import knn_brute_force, knn_ivf

    recalls = []
    for qid in (0, 7, 23, 42, 99):
        exact = {
            r.vec_id: r.cosine
            for r in knn_brute_force(
                emb, "vec_id", "embedding", query_id=qid, k=10
            ).collect()
        }
        approx = {
            r.vec_id: r.cosine
            for r in knn_ivf(
                emb, "vec_id", "embedding", query_id=qid, k=10,
                n_cells=16, nprobe=4,
            ).collect()
        }
        recalls.append(len(set(exact) & set(approx)) / 10)
        for vid, cos in approx.items():
            if vid in exact:  # scores are exact cosines, never approximated
                assert cos == pytest.approx(exact[vid], abs=1e-6)
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.5, f"IVF recall too low: {recalls}"


def test_ivf_training_deterministic(spark, emb):
    from bambooai_spark.operators.similarity import train_ivf_centroids

    import numpy as np

    a = train_ivf_centroids(emb, "embedding", n_cells=8)
    b = train_ivf_centroids(emb, "embedding", n_cells=8)
    assert np.array_equal(a, b)
    assert a.shape == (8, 64)


def test_connected_components_crafted_graph(spark):
    """Chain (diameter > 1 forces multiple propagation rounds), a separate
    2-clique, and singletons — cluster_id must be the component minimum,
    independent of partitioning."""
    from bambooai_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 11)], ["node"])
    # chain 1-2-3-4-5, pair 7-8; 6, 9, 10 are singletons
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (4, 5), (8, 7)], ["src", "dst"]
    ).repartition(7)
    out = connected_components(nodes.repartition(5), edges)
    got = {r["node"]: r["cluster_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 7, 8: 7, 9: 9, 10: 10}


def test_dense_overlap_blocked_fallback_matches_broadcast(spark, docs):
    """Above the N guard the dense bitset product must switch from
    broadcasting the whole mask relation to the hash-blocked grid join —
    identical pairs, and no nested-loop broadcast of the masks in the plan
    (the only broadcast left is the tiny block grid)."""
    from bambooai_spark.operators.dedup import jaccard_near_dup as jnd
    from bambooai_spark.operators import dedup as dd

    sample = docs.limit(120)
    baseline = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in jnd(sample, "doc_id", "text", strategy="dense").collect()
    }
    # force the fallback with a guard far below the sample size
    orig = dd.DENSE_DOCS_BROADCAST_MAX
    dd.DENSE_DOCS_BROADCAST_MAX = 16
    try:
        blocked_df = jnd(sample, "doc_id", "text", strategy="dense")
        plan = blocked_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        blocked = {
            (r["doc_a"], r["doc_b"], r["jaccard"]) for r in blocked_df.collect()
        }
    finally:
        dd.DENSE_DOCS_BROADCAST_MAX = orig
    assert blocked == baseline
    assert len(baseline) > 0


def test_connected_components_hybrid_paths_agree(spark):
    """Driver union-find fast path and the distributed label-propagation
    loop return identical (node, cluster_id) assignments — including
    isolated nodes and a multi-hop chain whose minimum must propagate."""
    from bambooai_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame(
        [(i,) for i in range(10)], "node LONG"
    )
    # chain 0-1-2-3 (diameter 3), pair 5-6, isolated 4,7,8,9
    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (2, 3), (6, 5)], "src LONG, dst LONG"
    )
    fast = {
        (r["node"], r["cluster_id"])
        for r in connected_components(nodes, edges).collect()
    }
    dist = {
        (r["node"], r["cluster_id"])
        for r in connected_components(
            nodes, edges, driver_max_edges=None
        ).collect()
    }
    want = {(0, 0), (1, 0), (2, 0), (3, 0), (4, 4), (5, 5), (6, 5),
            (7, 7), (8, 8), (9, 9)}
    assert fast == want and dist == want


def test_quantize_int8_codes_and_error_bound(spark, emb):
    """int8 quantization exactness: codes within [-127,127], zero vectors
    roundtrip exactly, and the dequantized dot of every pair sits within
    the analytic error bound |err| <= (|a|_1·sb + |b|_1·sa)/2 + d·sa·sb/4
    of the exact float dot (half-ulp per element per side)."""
    from pyspark.sql import functions as F

    from bambooai_spark.functions.vectors import (
        dequantize_dot,
        dot,
        quantize_int8,
    )

    q = quantize_int8("embedding")
    sample = (
        emb.limit(20)
        .select("vec_id", "embedding", q["scale"].alias("s"), q["codes"].alias("c"))
    )
    rows = sample.collect()
    for r in rows:
        assert all(-127 <= x <= 127 for x in r["c"])
    a = sample.select(
        F.col("vec_id").alias("ida"), F.col("embedding").alias("va"),
        F.col("s").alias("sa"), F.col("c").alias("ca"),
    )
    b = sample.select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("vb"),
        F.col("s").alias("sb"), F.col("c").alias("cb"),
    )
    pairs = (
        a.join(b, F.col("ida") < F.col("idb"))
        .select(
            dot("va", "vb").alias("exact"),
            dequantize_dot("ca", "sa", "cb", "sb").alias("approx"),
            F.aggregate(
                F.col("va").cast("array<double>"), F.lit(0.0),
                lambda acc, x: acc + F.abs(x),
            ).alias("l1a"),
            F.aggregate(
                F.col("vb").cast("array<double>"), F.lit(0.0),
                lambda acc, x: acc + F.abs(x),
            ).alias("l1b"),
            F.col("sa"), F.col("sb"), F.size("ca").alias("d"),
        )
        .collect()
    )
    assert len(pairs) > 100
    for r in pairs:
        bound = (r["l1a"] * r["sb"] + r["l1b"] * r["sa"]) / 2 + (
            r["d"] * r["sa"] * r["sb"] / 4
        )
        assert abs(r["exact"] - r["approx"]) <= bound + 1e-9


# ------------------------------------------------------- cache lifecycle


def _persistent_rdd_ids(spark) -> set[int]:
    ids = spark.sparkContext._jsc.sc().getPersistentRDDs().keys()
    it = ids.iterator()
    out = set()
    while it.hasNext():
        out.add(int(str(it.next())))
    return out


def test_tracked_caches_release_after_materialization(spark, docs):
    """Operators whose persisted intermediates feed lazy return plans
    register them with the caching module; release_caches() must free
    every tracked entry so repeated pipelines don't accumulate executor
    cache for the session lifetime. Assertions track RDD IDS, not raw
    counts — the ContextCleaner reclaims earlier tests' localCheckpoint
    blocks on GC at arbitrary moments, which shifts counts but cannot
    produce this test's ids."""
    from bambooai_spark.caching import release_caches
    from bambooai_spark.operators.dedup import jaccard_near_dup

    release_caches()  # start from a clean slate
    spark.catalog.clearCache()
    base = _persistent_rdd_ids(spark)
    out = jaccard_near_dup(docs.limit(80), "doc_id", "text", strategy="dense")
    out.count()  # materialize — the cached postings/masks are now live
    fresh = _persistent_rdd_ids(spark) - base
    assert fresh
    released = release_caches()
    assert released > 0
    assert not (_persistent_rdd_ids(spark) & fresh)


def test_dense_rank_and_cc_leave_no_cache_entries(spark, docs):
    """distributed_dense_rank eagerly checkpoints its output and releases
    the ranked intermediate; connected_components' distributed branch
    unpersists both edge relations. Neither may leave CacheManager entries
    behind — those live for the whole session, unlike localCheckpoint
    blocks, which the ContextCleaner reclaims on JVM GC."""
    from pyspark.sql import functions as F

    from bambooai_spark.caching import release_caches
    from bambooai_spark.functions.ranking import distributed_dense_rank
    from bambooai_spark.operators.dedup import connected_components

    def cache_manager_empty() -> bool:
        return spark._jsparkSession.sharedState().cacheManager().isEmpty()

    release_caches()
    spark.catalog.clearCache()
    assert cache_manager_empty()

    ranked = distributed_dense_rank(
        docs.select("doc_id", F.length("text").alias("len")), ["len"]
    )
    assert ranked.count() > 0
    assert cache_manager_empty()

    nodes = spark.createDataFrame([(i,) for i in range(8)], "node LONG")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "src LONG, dst LONG"
    )
    cc = connected_components(nodes, edges, driver_max_edges=None)
    assert cc.count() == 8
    assert cache_manager_empty()


# ------------------------------------------------------------- PQ / ADC


def test_knn_pq_recall_and_exact_scores(spark, emb):
    from bambooai_spark.operators.pq import knn_pq, train_pq_codebooks
    from bambooai_spark.operators.similarity import knn_brute_force

    books = train_pq_codebooks(emb, "embedding", m=8, ksub=64)
    recalls = []
    for qid in (0, 7, 23, 42, 99):
        exact = {
            r.vec_id: r.cosine
            for r in knn_brute_force(
                emb, "vec_id", "embedding", query_id=qid, k=10
            ).collect()
        }
        approx = {
            r.vec_id: r.cosine
            for r in knn_pq(
                emb, "vec_id", "embedding", query_id=qid, k=10,
                codebooks=books, refine=4,
            ).collect()
        }
        recalls.append(len(set(exact) & set(approx)) / 10)
        for vid, cos in approx.items():
            if vid in exact:  # rescore is exact cosine, never the ADC value
                assert cos == pytest.approx(exact[vid], abs=1e-6)
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.6, f"PQ recall too low: {recalls}"


def test_pq_training_deterministic_and_shapes(spark, emb):
    import numpy as np

    from bambooai_spark.operators.pq import train_pq_codebooks

    a = train_pq_codebooks(emb, "embedding", m=8, ksub=16)
    b = train_pq_codebooks(emb, "embedding", m=8, ksub=16)
    assert np.array_equal(a, b)
    # determinism must survive a DIFFERENT partitioning/scan order — a
    # bare limit() would sample different rows here (ADVICE r10); the
    # xxhash64 total order pins the sample to the values themselves
    c = train_pq_codebooks(
        emb.repartition(13, "vec_id"), "embedding", m=8, ksub=16
    )
    assert np.array_equal(a, c)
    assert a.shape == (8, 16, 8)  # (m, ksub, dim/m)
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(emb, "embedding", m=7)


def test_pq_encode_exact_matches_numpy(spark, emb):
    """The engine-portable SQL encode and the Arrow-batched numpy encode
    agree code-for-code on the SAME (md5) codebooks — the parity that
    makes the oracle twin evidence for the production path."""
    import numpy as np

    from bambooai_spark.operators.pq import (
        md5_pq_codebooks,
        pq_encode,
        pq_encode_exact,
    )

    books = md5_pq_codebooks(emb, "vec_id", "embedding", m=8, ksub=16)
    a = {
        r.vec_id: list(r.c)
        for r in pq_encode(emb, "embedding", np.asarray(books), out_col="c")
        .select("vec_id", "c")
        .collect()
    }
    b = {
        r.vec_id: list(r.c)
        for r in pq_encode_exact(
            emb, "vec_id", "embedding", books, out_col="c"
        )
        .select("vec_id", "c")
        .collect()
    }
    assert a == b
    assert all(len(c) == 8 for c in a.values())
    assert all(0 <= x < 16 for c in a.values() for x in c)


def test_pq_adc_orders_like_true_distance(spark, emb):
    """ADC is approximate, but on the m-code grain it must correlate:
    the ADC-nearest refine*k shortlist recovers most of the true top-k
    (that's the whole contract knn_pq builds on)."""
    import numpy as np

    from bambooai_spark.operators.pq import (
        pq_adc_score,
        pq_encode,
        pq_lut,
        train_pq_codebooks,
    )

    books = train_pq_codebooks(emb, "embedding", m=8, ksub=64)
    enc = pq_encode(emb, "embedding", books, out_col="_pq")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    lut = pq_lut(q, books)
    got = (
        enc.filter(F.col("vec_id") != 0)
        .withColumn("_adc", pq_adc_score("_pq", lut, books.shape[1]))
        .orderBy("_adc", "vec_id")
        .limit(40)
        .collect()
    )
    # ADC values are sums of LUT entries — recompute driver-side
    for r in got[:10]:
        want = sum(lut[j * books.shape[1] + c] for j, c in enumerate(r._pq))
        assert r._adc == pytest.approx(want, rel=1e-12)


def test_cluster_profile_paths_agree_and_cover(spark, emb):
    """numpy and exact assignment produce the SAME profile on the same
    centroids (rounded cosines absorb the last-ulp float divergence),
    sizes cover the corpus, and coherence is a valid cosine mean."""
    from bambooai_spark.operators.similarity import (
        cluster_profile,
        md5_centroids,
    )

    cents = md5_centroids(emb, "vec_id", "embedding", 8)
    a = cluster_profile(
        emb, "vec_id", "embedding", centroids=cents, assign="exact"
    ).collect()
    b = cluster_profile(
        emb, "vec_id", "embedding", centroids=cents, assign="numpy"
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert sum(r["n"] for r in a) == emb.count()
    assert all(-1.0 <= r["coherence"] <= 1.0 for r in a)
    # members sit closer to their own centroid than a random cosine:
    # every cluster's coherence is positive on this synthetic corpus
    assert all(r["coherence"] > 0 for r in a), a


def test_knn_pq_refuses_codes_without_books(spark, emb):
    from bambooai_spark.operators.pq import knn_pq, pq_encode, train_pq_codebooks

    books = train_pq_codebooks(emb, "embedding", m=8, ksub=16)
    enc = pq_encode(emb, "embedding", books, out_col="pq_code")
    with pytest.raises(ValueError, match="without the codebooks"):
        knn_pq(enc, "vec_id", "embedding", query_id=0, code_col="pq_code")


def test_dense_array_mask_regime_matches_unrolled(spark, docs):
    """r13 (found by the 10x stress run): the unrolled scalar-column
    mask layout dies in the analyzer at large word counts, so above
    DENSE_UNROLL_WORDS_MAX the mask stays one array<long> column — the
    two layouts (and the blocked grid under the array layout) must emit
    identical exact-Jaccard pairs."""
    from bambooai_spark.operators import dedup as dd
    from bambooai_spark.operators.dedup import jaccard_near_dup as jnd

    sample = docs.limit(120)
    baseline = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in jnd(sample, "doc_id", "text", strategy="dense").collect()
    }
    orig_u, orig_b = dd.DENSE_UNROLL_WORDS_MAX, dd.DENSE_DOCS_BROADCAST_MAX
    dd.DENSE_UNROLL_WORDS_MAX = 0  # force the array-mask layout
    try:
        arr = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in jnd(
                sample, "doc_id", "text", strategy="dense"
            ).collect()
        }
        assert arr == baseline
        # array layout + blocked grid together
        dd.DENSE_DOCS_BROADCAST_MAX = 16
        arr_blocked = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in jnd(
                sample, "doc_id", "text", strategy="dense"
            ).collect()
        }
        assert arr_blocked == baseline
    finally:
        dd.DENSE_UNROLL_WORDS_MAX = orig_u
        dd.DENSE_DOCS_BROADCAST_MAX = orig_b
    assert len(baseline) > 0


def test_jaccard_auto_dispatch_is_cost_based(spark):
    """r13 (second 10x stress finding): vocabulary size alone is not the
    dense-regime signal — a small-vocab corpus whose shingles are NOT
    dense across docs makes the N^2 block product orders of magnitude
    worse than the index join. auto now compares N^2/2*words against
    DENSE_COST_RATIO * sum(df^2): low-density routes to index,
    high-density to dense, identical pairs either way."""
    from bambooai_spark.operators.dedup import jaccard_near_dup as jnd

    # low density: 300 docs, shingles shared by at most the (2i, 2i+1)
    # twin — vocab well under DENSE_VOCAB_MAX, df <= 2
    sparse_rows = [
        (i, f"tok{i // 2}a tok{i // 2}b tok{i // 2}c tok{i // 2}d")
        for i in range(300)
    ]
    sparse = spark.createDataFrame(sparse_rows, "doc_id long, text string")
    sparse_df = jnd(sparse, "doc_id", "text", n=2, threshold=0.5)
    plan = sparse_df._jdf.queryExecution().optimizedPlan().toString()
    assert "bit_count" not in plan  # index join picked
    got = {(r["doc_a"], r["doc_b"]) for r in sparse_df.collect()}
    assert got == {(2 * i, 2 * i + 1) for i in range(150)}

    # high density: 80 docs drawing from ~12 tokens — every shingle in
    # a large doc fraction; the bitset product is the measured winner
    dense_rows = [
        (i, " ".join(f"w{(i + j) % 12}" for j in range(6)))
        for i in range(80)
    ]
    densedf = spark.createDataFrame(dense_rows, "doc_id long, text string")
    dense_out = jnd(densedf, "doc_id", "text", n=2, threshold=0.5)
    plan2 = dense_out._jdf.queryExecution().optimizedPlan().toString()
    assert "bit_count" in plan2  # dense product picked
    # exactness parity across the dispatch
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in jnd(
            densedf, "doc_id", "text", n=2, threshold=0.5,
            strategy="index",
        ).collect()
    }
    assert {
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in dense_out.collect()
    } == want
