"""Deduplication operators, exact → fuzzy, each with a 100 TB story.

- exact:   hash-groupBy on a text fingerprint. One shuffle on the md5 key;
           map-side partial aggregation collapses duplicates early.
- jaccard: word-shingle inverted-index self-join — the exact set-similarity
           join. Cost is Σ_shingle df(shingle)²; hot shingles are the skew
           risk, so a document-frequency cap drops stop-shingles (standard
           prefix-filter trick).
- minhash: MinHash signatures + LSH banding — the sub-quadratic path. Only
           documents sharing a band bucket are compared; recall tuned via
           (bands, rows).
- simhash: 64-bit bit-majority fingerprint; near-dups differ in ≤k bits.
- embedding: cosine-threshold near-dup pairs, blocked to avoid the full
           cross product.

Seeded hashing uses ``xxhash64(seed_lit, value)`` — Spark's xxhash64 over
(seed, value) gives an independent-enough hash family deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bambooai_spark.functions.text import fingerprint, word_shingles
from bambooai_spark.functions.vectors import cosine
from bambooai_spark.numeric import col_of


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str, *, normalize: bool = False
) -> DataFrame:
    """Exact duplicate groups: fingerprint → (keep_id = min id, dup_count).

    Equivalent to the reference's "strong match keeps the better record"
    upsert (qa_retrieval.py:157-202) with similarity=1.0.
    """
    return (
        df.select(
            fingerprint(text_col, normalize=normalize).alias("fp"), F.col(id_col)
        )
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _shingle_index(
    df: DataFrame, id_col: str, text_col: str, n: int, max_doc_freq: int | None
) -> DataFrame:
    tok = df.select(
        F.col(id_col).alias("doc"), F.explode(word_shingles(text_col, n)).alias("sh")
    )
    if max_doc_freq:
        hot = (
            tok.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("sh")
        )
        # left_anti on the (small) hot-shingle list — broadcast
        tok = tok.join(F.broadcast(hot), "sh", "left_anti")
    return tok


def jaccard_near_dup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join via inverted index.

    tok(doc, shingle) ⋈ tok on shingle → shared counts → jaccard =
    shared / (|A| + |B| − shared). Returns (doc_a, doc_b, jaccard≥threshold).
    Shuffles: one on shingle (the join), one on the pair (the count) — both
    key-partitioned, no cross product.
    """
    tok = _shingle_index(df, id_col, text_col, n, max_doc_freq)
    sizes = tok.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    t1 = tok.select(F.col("doc").alias("doc_a"), "sh")
    t2 = tok.select(F.col("doc").alias("doc_b"), "sh")
    pairs = (
        t1.join(t2, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def _min_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int, num_hashes: int
) -> DataFrame:
    """(doc, seed, minh): per-document minimum of xxhash64(seed, shingle)
    for each of ``num_hashes`` seeds.

    Shape matters here: explode shingles to rows FIRST, then hash each
    scalar shingle ``num_hashes`` times. Building the signature as one
    nested array expression inlines the whole shingle computation per seed
    (Catalyst's CollapseProject), exploding codegen size ~64× — measured
    60× slower. The row form is linear work and aggregates with a plain
    map-side-combining groupBy.
    """
    sh = df.select(
        F.col(id_col).alias("doc"), F.explode(word_shingles(text_col, n)).alias("sh")
    )
    hashed = sh.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_hashes - 1)),
                lambda i: F.xxhash64(i, F.col("sh")),
            )
        ).alias("seed", "h"),
    )
    return hashed.groupBy("doc", "seed").agg(F.min("h").alias("minh"))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 2, num_hashes: int = 64
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    xxhash64(i, shingle). Documents with no shingles are absent."""
    mh = _min_hashes(df, id_col, text_col, n, num_hashes)
    return mh.groupBy("doc").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seed", "minh"))),
            lambda x: x["minh"],
        ).alias("sig")
    )


def minhash_near_dup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup detection (sub-quadratic).

    Signature → ``bands`` band-hashes → explode → bucket join: only documents
    agreeing on at least one full band are candidates; candidates are then
    verified with exact shingle Jaccard. With 64 hashes / 16 bands / 4 rows
    the S-curve crosses ~0.5 — pairs ≥ threshold are found with high
    probability, pairs ≪ threshold almost never collide, so the verify join
    touches a tiny candidate set instead of all O(N²) pairs.
    """
    rows = num_hashes // bands
    mh = _min_hashes(df, id_col, text_col, n, num_hashes)
    # band rows directly from (doc, seed, minh): band_id = seed DIV rows;
    # band_hash folds the band's min-hashes in seed order.
    band = (
        mh.withColumn("band_id", (F.col("seed") / rows).cast("int"))
        .groupBy("doc", "band_id")
        .agg(
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "minh"))),
                        lambda x: x["minh"].cast("string"),
                    ),
                )
            ).alias("band_hash")
        )
    )
    cands = (
        band.alias("x")
        .join(band.alias("y"), ["band_id", "band_hash"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    # verify candidates with exact Jaccard (inverted index restricted to
    # candidate docs would be even cheaper; at candidate scale a direct
    # intersection on the shingle arrays is fine and avoids a join)
    sh_a = df.select(
        F.col(id_col).alias("doc_a"), word_shingles(text_col, n).alias("sh_a")
    )
    sh_b = df.select(
        F.col(id_col).alias("doc_b"), word_shingles(text_col, n).alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    return (
        cands.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 2
) -> DataFrame:
    """64-bit SimHash: per shingle hash, each bit votes ±1; fingerprint bit i
    is the sign of the vote sum. Fold over the shingle array — per-row,
    no shuffle."""
    sh = word_shingles(text_col, n)
    zeros = F.array_repeat(F.lit(0), 64)
    votes = F.aggregate(
        sh,
        zeros,
        lambda acc, s: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: (
                    F.call_function("shiftright", F.xxhash64(s), i).bitwiseAND(
                        F.lit(1)
                    )
                ).cast("int")
                * 2
                - 1,
            ),
            lambda a, b: a + b,
        ),
    )
    bits = F.transform(votes, lambda v: (v > 0).cast("long"))
    fp = F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.lit(63)).cast("array<long>"),
            lambda b, i: F.when(
                b == 1,
                F.call_function("shiftleft", F.lit(1).cast("long"), i.cast("int")),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseXOR(x),
    )
    return df.select(F.col(id_col).alias("doc"), fp.alias("simhash64"))


def embedding_near_dup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    block_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs. ``block_col`` (cluster label, LSH
    bucket, shard key…) bounds the self-join — without it this is the full
    N² cross product, which is only acceptable for small N. At scale, feed
    the bucket id from ``similarity.knn_lsh``'s hyperplane signature."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        *( [F.col(block_col).alias("blk")] if block_col else []),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
        *( [F.col(block_col).alias("blk")] if block_col else []),
    )
    joined = a.join(b, ["blk"] if block_col else None) if block_col else a.crossJoin(b)
    cos = cosine("v_a", "v_b")
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= threshold)
        .select(
            "id_a", "id_b", F.round(cos, 6).alias("cosine")
        )
    )
