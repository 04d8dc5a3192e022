"""The curation pipeline as ONE callable — the product surface over the
per-stage operators (VERDICT r11 #4's composition, packaged).

``curate_corpus`` takes a LIVE curated corpus (already ingested through
the gates — :func:`~bambooai_spark.streaming.documents.ingest_to_corpus`
or its streaming twin own that stage) and runs the training-set
assembly: per-group quality-budget fill → leakage-safe split (asserted
leak-free) → per-(split, group) sequence packing → deterministic
sharded JSONL export. Returns the exported relation read BACK from the
shards (what a training consumer will actually see) plus a per-stage
ATTRITION report — the accounting every pipeline team reconstructs by
hand when a training set comes out smaller than expected.

Every stage is the already-oracled operator (`quality_budget_sample`,
`leakage_safe_split`, `pack_sequences`, `export_jsonl_shards`), so the
composition inherits their scale contracts: two-phase prefix bridges
instead of per-group windows, scan-side split hashing, one exchange for
the shard permutation, no UDFs anywhere.

Reference scope note: the reference has no data pipeline at all (its
data layer is a single in-memory pandas frame, SURVEY §1.1); this is
the BASELINE-mandated scale layer's top-level verb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate_corpus(
    spark: SparkSession,
    corpus_path: str,
    export_path: str,
    *,
    budgets: dict[str, int],
    score,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    pack_budget: int = 2048,
    n_shards: int = 16,
    split_salt: str = "split",
    pack_strategy: str = "auto",
    keep_cols: tuple[str, ...] = (),
    report: bool = True,
    overwrite: bool = False,
) -> tuple[DataFrame, DataFrame | None]:
    """Assemble a training set from the live corpus at ``corpus_path``
    and export it as ``n_shards`` JSONL shards under ``export_path``.

    - ``budgets``/``score``: per-``group_col`` token budgets filled
      best-first by ``score`` (any higher-is-better column expression —
      a classifier or perplexity score in production); boundary doc
      included (:func:`~bambooai_spark.operators.packing
      .quality_budget_sample` semantics).
    - ``fractions``: split label -> mass for
      :func:`~bambooai_spark.operators.packing.leakage_safe_split`
      (default 1% val), assigned at duplicate-cluster grain; the split
      is ASSERTED leak-free via ``split_leakage_report`` before
      anything is written — a non-empty report raises.
    - packing: each ``(split, group)`` stream packed into
      ``pack_budget``-token chunks (``pack_sequences``; ``auto``
      strategy routes big streams through the two-phase bridge).
    - export: md5-permuted JSONL shards with intra-shard positions
      (``export_jsonl_shards(keep_pos=True)``), carrying ``id, group,
      split, score, n_tok, chunk_id, chunk_offset`` plus ``keep_cols``.

    Returns ``(exported, report)``:

    - ``exported`` — the shard files read back (the consumer's view),
      with ``shard``/``pos`` columns;
    - ``report`` — one row per (stage, group): ``stage`` in ``live ->
      budget_kept -> split=<label>...``, with ``n_docs`` and
      ``n_tokens`` (whitespace tokens, the budget-fill unit), computed
      from the SAME frames the pipeline shipped — no heavy stage runs
      twice, though the ``live`` row does cost one extra corpus-scan
      aggregation; ``report=False`` skips all of it and returns None.

    ``overwrite=False`` (default) fails FAST when ``export_path``
    already exists — before any heavy stage runs — matching
    ``export_jsonl_shards``' refuse-to-interleave contract; pass True
    to replace a crashed (manifest-less) export. A corpus whose own
    column is named ``score`` stays usable: the computed quality score
    travels under a reserved name internally and lands in the output as
    ``score`` only at the edge (keep the stored column via
    ``keep_cols`` — any name except the output's own columns).
    """
    from bambooai_spark.functions.text import (  # noqa: PLC0415
        fingerprint,
        tokens,
    )
    from bambooai_spark.operators.export import (  # noqa: PLC0415
        export_jsonl_shards,
    )
    from bambooai_spark.operators.packing import (  # noqa: PLC0415
        leakage_safe_split,
        pack_sequences,
        quality_budget_sample,
        split_leakage_report,
    )
    from bambooai_spark.operators.writer import read_corpus  # noqa: PLC0415

    from bambooai_spark.operators.writer import _fs_exists  # noqa: PLC0415

    if not budgets:
        raise ValueError("curate_corpus: budgets is empty")
    if not overwrite and _fs_exists(spark, export_path):
        # fail FAST: export_jsonl_shards would refuse too, but only
        # after the budget fill, leak check, and packing already ran
        raise ValueError(
            f"curate_corpus: {export_path} already exists — pass "
            "overwrite=True to replace it (a crashed export leaves no "
            "manifest and is invisible to manifest-trusting readers)"
        )
    live = read_corpus(spark, corpus_path)
    n_tok_ws = F.size(tokens(text_col)).cast("long")

    kept = quality_budget_sample(
        live, budgets, score=score,
        id_col=id_col, text_col=text_col, group_col=group_col,
    )
    if kept.isEmpty():  # checkpointed output: the probe is driver-cheap
        raise ValueError(
            "curate_corpus: the budget fill selected nothing — the "
            f"budgets name groups ({sorted(budgets)}) absent from "
            "the corpus, or the corpus is empty"
        )
    # the computed quality score joins under a reserved name: a corpus
    # whose OWN column is called 'score' (the documented production
    # case) must not make the projection ambiguous — callers keep it
    # via keep_cols
    sel = live.join(
        kept.select(id_col, F.col("score").alias("_q_score")), id_col
    )
    sp = leakage_safe_split(
        sel, id_col, text_col, fractions=fractions, salt=split_salt,
    ).persist()
    try:
        leaks = split_leakage_report(
            sp, fingerprint(text_col, normalize=True)
        ).count()
        if leaks:
            raise RuntimeError(
                f"curate_corpus: {leaks} duplicate clusters straddle the "
                "split — refusing to export a leaking training set (did "
                "an externally assigned split column survive upstream?)"
            )
        packed = pack_sequences(
            sp, id_col, text_col, budget=pack_budget,
            stream_cols=("split", group_col), strategy=pack_strategy,
        )
        final = sp.select(
            id_col, group_col, "split",
            F.round("_q_score", 6).alias("score"),
            *[F.col(c) for c in keep_cols],
        ).join(
            packed.select(id_col, "n_tok", "chunk_id", "chunk_offset"),
            id_col,
        )
        export_jsonl_shards(
            final, export_path, id_col, n_shards=n_shards,
            keep_pos=True, overwrite=overwrite,
        )

        # attrition report from the frames already shipped: one
        # map-side-partial groupBy per stage over narrow projections
        def _stage(df: DataFrame, stage: str, tok) -> DataFrame:
            return df.groupBy(
                F.lit(stage).alias("stage"), F.col(group_col).alias("grp")
            ).agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.coalesce(F.sum(tok), F.lit(0))
                .cast("long").alias("n_tokens"),
            )

        rep = None
        if report:
            rep = (
                _stage(live, "live", n_tok_ws)
                .unionByName(
                    _stage(kept, "budget_kept", F.col("n_tokens"))
                )
                .unionByName(
                    sp.groupBy(
                        F.concat(F.lit("split="), F.col("split")).alias(
                            "stage"
                        ),
                        F.col(group_col).alias("grp"),
                    ).agg(
                        F.count(F.lit(1)).cast("long").alias("n_docs"),
                        F.coalesce(F.sum(n_tok_ws), F.lit(0))
                        .cast("long").alias("n_tokens"),
                    )
                )
                .select(
                    "stage",
                    F.col("grp").alias(group_col),
                    "n_docs",
                    "n_tokens",
                )
                # bounded: (#stages + #splits) x #groups rows — pin them
                # so the report survives sp.unpersist()
                .localCheckpoint(eager=True)
            )
    finally:
        sp.unpersist()
    # read back with an EXPLICIT schema — the shipped frame's own, plus
    # the export bookkeeping columns (pos in the JSON, shard from the
    # partition directory): schema inference would cost one extra full
    # scan of the export per call (spark.read.json infers eagerly), and
    # the JSON source parses a declared long/double identically to
    # inferring-then-casting it (guide §1/§6 — r13)
    from pyspark.sql.types import (  # noqa: PLC0415
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    read_schema = StructType(
        list(final.schema.fields)
        + [
            StructField("pos", LongType()),
            StructField("shard", IntegerType()),
        ]
    )
    exported = spark.read.schema(read_schema).json(export_path)
    # cast EVERY pipeline column back to its shipped dtype — including
    # the caller-chosen keep_cols, which spark.read.json would otherwise
    # re-infer (a kept date comes back string, an int comes back bigint)
    # and the consumer view's schema would drift from the shipped frame
    # for exactly those columns (ADVICE r12)
    dtypes = dict(final.dtypes)
    exported = exported.select(
        F.col(id_col).cast(dtypes[id_col]).alias(id_col),
        F.col(group_col).cast("string").alias(group_col),
        F.col("split").cast("string").alias("split"),
        F.col("score").cast("double").alias("score"),
        *[F.col(c).cast(dtypes[c]).alias(c) for c in keep_cols],
        F.col("n_tok").cast("long").alias("n_tok"),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_offset").cast("long").alias("chunk_offset"),
        F.col("shard").cast("int").alias("shard"),
        F.col("pos").cast("long").alias("pos"),
    )
    return exported, rep
