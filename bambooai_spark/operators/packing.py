"""Sequence packing — the concat-and-chunk step that turns a filtered,
deduplicated corpus into fixed-length training windows (GPT-style
pretraining packing: documents are concatenated in a deterministic order
and sliced into ``budget``-token chunks; a document may straddle a chunk
boundary).

This is the last hop of the LLM data pipeline the other operators feed
(dedup → quality filter → sample → PACK): every doc gets its global token
offset inside its stream, from which its chunk id and in-chunk offset are
pure integer arithmetic. Deterministic by construction: (stream, id) order,
integer token counts, no floats.

Scale: the per-stream exclusive prefix sum is computed TWO-PHASE
(range-partition on (stream, id) → local cumsum per partition slice →
per-(partition, stream) totals broadcast-joined back as an exclusive
prefix), the same pattern as ``functions.ranking.distributed_dense_rank``
and ``mixture_sample`` below. A single giant stream (one language at
100 TB) therefore still packs across all partitions — no
``Window.partitionBy(stream)`` funnel where five languages means five
tasks. The bridge is one small row per partition-stream slice
(~#partitions rows, never row data).

Strategy choice is COST-BASED (the same stance as Spark picking a
broadcast join by size estimate): the two-phase plan costs two wide
exchanges plus a pinning materialization, which is pure overhead when the
projected input fits comfortably in one task's sort. ``strategy="auto"``
(default) packs small inputs with the plain per-stream window and
switches to two-phase above ``small_input_bytes``; the threshold reads
the optimizer's size estimate, so unknown sizes fail safe to two-phase.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def est_bpe_tokens(text_col: str | Column) -> Column:
    """ceil(chars/4) — the common LLM token estimate; identical to
    ``functions.text.token_stats``'s ``est_bpe_tokens`` so packing and
    token accounting agree."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.ceil(F.length(c) / F.lit(4.0)).cast("long")


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the optimized plan; Long.MaxValue-ish
    when unknown, which makes ``auto`` fail safe to the two-phase path."""
    try:
        return int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return 1 << 62


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    budget: int = 2048,
    stream_cols: tuple[str, ...] = ("lang",),
    num_partitions: int | None = None,
    checkpoint: bool = True,
    strategy: str = "auto",
    small_input_bytes: int = 32 << 20,
) -> DataFrame:
    """Assign every document its packed position: ``(id, streams…, n_tok,
    chunk_id, chunk_offset)`` where ``chunk_id = offset // budget`` and
    ``chunk_offset = offset % budget`` over the exclusive prefix sum of
    token counts in (stream, id) order.

    ``strategy``: ``"window"`` = one per-stream window pass (one shuffle;
    one task per stream — optimal when the projection fits a single
    task's sort); ``"twophase"`` = range-partition + prefix bridge (stays
    parallel on few/one giant streams); ``"auto"`` (default) picks by the
    optimizer's size estimate of the 3-column projection vs
    ``small_input_bytes``. Both strategies produce identical rows.

    ``small_input_bytes`` is compared against Catalyst's ``sizeInBytes``,
    which for file sources is an ON-DISK (compressed) estimate — a
    heavily compressed text column can be several times larger in memory.
    The 32 MB default leaves that headroom (≈4× for typical snappy text)
    so ``auto`` never routes a spill-sized input into the single-task
    window sort; oversize or unknown estimates fail safe to two-phase.

    Two-phase details: range-partition on ``(streams…, id)`` so one
    stream spans many ordered partitions; local inclusive cumsum per
    ``(partition, stream)`` slice; a broadcast-joined prefix relation of
    per-slice totals bridges the partitions. Exclusive offset =
    inclusive cumsum − own count + bridge prefix. The partitioned
    projection is persisted across the bridge pass and the final pass
    (``repartitionByRange`` re-samples its bounds on recompute, so
    partition ids must be pinned); with ``checkpoint=True`` (default)
    the output is eagerly localCheckpoint'ed so the cache entry is
    released here, ``checkpoint=False`` keeps the lazy plan inspectable
    (plan tests) and leaves the cache to the caller.
    """
    if strategy not in ("auto", "window", "twophase"):
        raise ValueError(f"unknown strategy {strategy!r}")
    from bambooai_spark.functions.twophase import (  # noqa: PLC0415
        grouped_prefix_bridge,
        stream_key,
        with_bridge,
    )

    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_tok = est_bpe_tokens(text_col).alias("n_tok")
    base = df.select(F.col(id_col), *[F.col(c) for c in stream_cols], n_tok)
    chunk_cols = lambda off: [  # noqa: E731
        F.expr(f"{off} DIV {int(budget)}").cast("long").alias("chunk_id"),
        (F.col(off) % F.lit(budget)).cast("long").alias("chunk_offset"),
    ]

    if strategy == "window" or (
        strategy == "auto" and _estimated_bytes(base) <= small_input_bytes
    ):
        wst = (
            Window.partitionBy(*stream_cols)
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return base.withColumn(
            "_off",
            F.coalesce(F.sum("n_tok").over(wst), F.lit(0).cast("long")),
        ).select(id_col, *stream_cols, "n_tok", *chunk_cols("_off"))

    part = (
        base.repartitionByRange(n, *stream_cols, id_col)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_skey", stream_key(stream_cols))
        .persist()
    )
    # per-(partition, stream) totals: the bridge rows — range partitioning
    # keeps each stream's slices contiguous, so ~#partitions rows total
    bridge = grouped_prefix_bridge(part, F.sum("n_tok"))
    if bridge is None:
        part.unpersist()
        return base.select(
            id_col,
            *stream_cols,
            "n_tok",
            F.lit(0).cast("long").alias("chunk_id"),
            F.lit(0).cast("long").alias("chunk_offset"),
        ).limit(0)
    # explicit ROWS frame: the default RANGE frame would lump duplicate
    # id values into one peer group and produce overlapping offsets
    wloc = (
        Window.partitionBy("_pid", "_skey")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive prefix = inclusive local cumsum − own n_tok + bridge;
    # coalesce handles NULL n_tok rows (inclusive sum skips NULLs, and a
    # leading all-NULL run makes the inclusive sum itself NULL)
    off = (
        F.coalesce(F.sum("n_tok").over(wloc), F.lit(0).cast("long"))
        - F.coalesce(F.col("n_tok"), F.lit(0).cast("long"))
        + F.col("_offset")
    ).cast("long")
    # integer DIV, not floor(double/) — offsets in a 100 TB corpus
    # flirt with 2^53, where double division starts misrounding
    out = (
        with_bridge(part, bridge)
        .withColumn("_off", off)
        .select(id_col, *stream_cols, "n_tok", *chunk_cols("_off"))
    )
    if checkpoint:
        # materialize so the persisted input can be released now
        out = out.localCheckpoint(eager=True)
        part.unpersist()
    # checkpoint=False keeps the lazy plan for inspection (plan tests);
    # the persisted input stays cached until the caller clears it
    return out


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    total_budget: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    num_partitions: int | None = None,
) -> DataFrame:
    """Token-budget mixture sampling — "take ``total_budget`` tokens at
    this language/domain mix": each group gets
    ``floor(weight/sum(weights) * total_budget)`` tokens, filled greedily
    in deterministic ``(md5(id), id)`` order; the document that crosses
    the budget line is still included (greedy fill, standard pretraining
    sampling semantics — the cut is exact to one document).

    Scale: a per-group running sum over a handful of giant groups is the
    WORST case for ``Window.partitionBy(group)`` — five languages at
    100 TB means five tasks. This uses the exact two-phase bridge of
    ``functions.ranking.distributed_dense_rank`` generalized to grouped
    running sums: range-partition on ``(group, key)`` (a group spans many
    ordered partitions), local cumsum per ``(partition, group)``, and a
    broadcast-joined prefix of per-(partition, group) token totals — one
    small row per partition-group slice, never row data.

    Returns ``(id, group, n_tokens, cum_tokens)`` for the sampled docs;
    ``n_tokens`` is whitespace word count (``functions.text.tokens``),
    matching the oracle's ``len(regexp_split_to_array(text, '\\s+'))``.
    """
    from bambooai_spark.functions.text import tokens  # noqa: PLC0415

    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    wsum = float(sum(weights.values()))
    budgets = {g: int(w / wsum * total_budget) for g, w in weights.items()}
    bmap = F.create_map(
        *[F.lit(x) for g in sorted(budgets) for x in (g, budgets[g])]
    )
    base = df.select(
        F.col(id_col),
        F.col(group_col),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("_key"),
    ).where(F.col(group_col).isin(list(budgets)))
    from bambooai_spark.functions.twophase import (  # noqa: PLC0415
        grouped_prefix_bridge,
        with_bridge,
    )

    part = (
        base.repartitionByRange(n, group_col, "_key", id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # per-(partition, group) totals: the bridge rows (#partitions x #groups
    # touched per partition — ranges are contiguous, so ~#partitions rows).
    # The whitelisted group values are the key directly (no stream_key
    # needed — they're caller-chosen language codes).
    bridge = grouped_prefix_bridge(part, F.sum("n_tokens"), key_col=group_col)
    if bridge is None:
        part.unpersist()
        return base.select(
            id_col, group_col, "n_tokens",
            F.lit(None).cast("long").alias("cum_tokens"),
        ).limit(0)
    # ROWS frame for the same duplicate-key safety as pack_sequences
    wloc = (
        Window.partitionBy("_pid", group_col)
        .orderBy("_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (F.sum("n_tokens").over(wloc) + F.col("_offset")).cast("long")
    out = (
        with_bridge(part, bridge, key_col=group_col)
        .withColumn("cum_tokens", cum)
        .where(F.col("cum_tokens") - F.col("n_tokens") < bmap[F.col(group_col)])
        .select(id_col, group_col, "n_tokens", "cum_tokens")
        # materialize so the persisted input can be released now (same
        # persist/checkpoint pairing as distributed_dense_rank)
        .localCheckpoint(eager=True)
    )
    part.unpersist()
    return out


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    fractions: dict[str, float] | None = None,
    default_label: str = "train",
    salt: str = "split",
    cluster_col: str | None = None,
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment at DUPLICATE-CLUSTER grain
    — the leakage-safe holdout splitter. A per-row random split leaks:
    two copies (or near-duplicates) of one document land on both sides
    and the eval set scores memorization. Here the assignment key is the
    whole cluster — by default the normalized text fingerprint (every
    exact duplicate shares a side), or ``cluster_col`` when the caller
    brings near-dup cluster ids (e.g. :func:`~bambooai_spark.operators
    .dedup.dedup_clusters` output), so near-duplicates can't straddle
    the split either.

    Assignment is pure hashing, no RNG and no state: ``md5(key || '|' ||
    salt)`` is a uniform 128-bit draw, and a label whose cumulative
    fraction boundary the hex string falls under wins (md5 hex strings
    of equal length compare lexicographically = numerically). The same
    corpus, salt, and fractions always produce the same split — across
    runs, partitionings, and engines (md5 is oracle-portable) — and a
    re-ingested duplicate lands on the side its cluster already owns.
    Plan: one scan-side projection, no shuffle, no UDF.

    ``fractions`` maps label -> mass (insertion order = boundary order);
    the remaining mass is ``default_label``. Default: 1% val.
    """
    from bambooai_spark.functions.text import fingerprint  # noqa: PLC0415

    fractions = {"val": 0.01} if fractions is None else dict(fractions)
    if not fractions:
        raise ValueError("leakage_safe_split: fractions is empty")
    if default_label in fractions:
        raise ValueError(
            f"leakage_safe_split: default_label {default_label!r} also "
            "appears in fractions"
        )
    total = sum(fractions.values())
    if total > 1 or any(v <= 0 for v in fractions.values()):
        raise ValueError(
            f"leakage_safe_split: fractions must be positive and sum "
            f"to <= 1 (got {fractions})"
        )
    key = (
        F.col(cluster_col).cast("string")
        if cluster_col
        else fingerprint(text_col, normalize=True)
    )
    h = F.md5(F.concat(key, F.lit("|" + salt)))
    expr = None
    cum = 0.0
    for label, frac in fractions.items():
        cum += frac
        # the cumulative boundary as a 32-hex-digit string: lexicographic
        # compare of lowercase fixed-width hex IS the numeric compare
        bound = format(min(int(cum * (1 << 128)), (1 << 128) - 1), "032x")
        branch = h < F.lit(bound)
        expr = (
            F.when(branch, F.lit(label))
            if expr is None
            else expr.when(branch, F.lit(label))
        )
    return df.withColumn(out, expr.otherwise(F.lit(default_label)))


def split_leakage_report(
    df: DataFrame,
    key,
    split_col: str = "split",
) -> DataFrame:
    """The leakage guard for an EXTERNALLY assigned split: one row per
    assignment key (a column name or Column — e.g. the normalized text
    fingerprint, or a near-dup cluster id) that appears in MORE than one
    split, with the straddled labels. Empty = leakage-free.
    :func:`leakage_safe_split` output is leakage-free by construction;
    this is for auditing splits made elsewhere. One map-side-partial
    groupBy; output is bounded by the number of violating keys."""
    k = F.col(key) if isinstance(key, str) else key
    return (
        df.groupBy(k.alias("key"))
        .agg(
            F.array_sort(
                F.collect_set(F.col(split_col))
            ).alias("splits"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .filter(F.size("splits") > 1)
    )


def quality_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    *,
    score,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    num_partitions: int | None = None,
) -> DataFrame:
    """The quality-curation planner executed: per group, keep the
    BEST-scoring documents until the group's token budget is spent —
    "the top N billion tokens of each language by quality score", the
    curation move behind filtered pretraining mixes (quality-classifier
    or perplexity scores; any higher-is-better column works). Greedy
    fill in deterministic ``(score DESC, id)`` order; the document that
    crosses the budget line is included (same boundary semantics as
    :func:`mixture_sample`, which is this operator with a uniform random
    order instead of a score).

    Scale: identical two-phase shape as :func:`mixture_sample` — a
    handful of giant groups is the worst case for
    ``Window.partitionBy(group)``, so the running sum range-partitions
    on ``(group, -score, id)``, cumsums locally, and broadcast-joins the
    per-(partition, group) prefix bridge; no single-task group sort.

    Returns ``(id, group, score, n_tokens, cum_tokens)`` for the kept
    docs. The per-group cutoff ("admit anything scoring above X from
    now on") is ``kept.groupBy(group).agg(F.min("score"))``.
    """
    from bambooai_spark.functions.text import tokens  # noqa: PLC0415
    from bambooai_spark.functions.twophase import (  # noqa: PLC0415
        grouped_prefix_bridge,
        with_bridge,
    )

    if not budgets:
        raise ValueError("quality_budget_sample: budgets is empty")
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    sc = F.col(score) if isinstance(score, str) else score
    bmap = F.create_map(
        *[F.lit(x) for g in sorted(budgets) for x in (g, budgets[g])]
    )
    base = df.select(
        F.col(id_col),
        F.col(group_col),
        sc.cast("double").alias("score"),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        # range keys must ASCEND: negate the score so best sorts first
        (-sc.cast("double")).alias("_key"),
    ).where(F.col(group_col).isin(list(budgets)))
    part = (
        base.repartitionByRange(n, group_col, "_key", id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    bridge = grouped_prefix_bridge(part, F.sum("n_tokens"), key_col=group_col)
    if bridge is None:
        part.unpersist()
        return base.select(
            id_col, group_col, "score", "n_tokens",
            F.lit(None).cast("long").alias("cum_tokens"),
        ).limit(0)
    wloc = (
        Window.partitionBy("_pid", group_col)
        .orderBy("_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (F.sum("n_tokens").over(wloc) + F.col("_offset")).cast("long")
    out = (
        with_bridge(part, bridge, key_col=group_col)
        .withColumn("cum_tokens", cum)
        .where(F.col("cum_tokens") - F.col("n_tokens") < bmap[F.col(group_col)])
        .select(id_col, group_col, "score", "n_tokens", "cum_tokens")
        .localCheckpoint(eager=True)
    )
    part.unpersist()
    return out
