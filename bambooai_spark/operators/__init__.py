"""Scale-out LLM-data-pipeline operators (BASELINE north-star: dedup,
similarity search, text analysis, multimodal — each designed for 100 TB).

The reference's only dedup is the episodic-memory upsert at cosine ≥0.94
(qa_retrieval.py:146-202) and its only similarity search is a top-k vector
query (qa_retrieval.py:100-144), both driver-side over a handful of records.
These modules are the distributed versions of those semantics over full
tables.
"""

from bambooai_spark.operators.dedup import (
    benchmark_grams,
    exact_dedup,
    contamination_cut,
    contamination_fraction,
    contamination_spans,
    exact_substring_cut,
    exact_substring_spans,
    splice_spans,
    hamming_near_dup,
    jaccard_near_dup,
    minhash_signatures,
    minhash_near_dup,
    semantic_dedup,
    simhash,
    embedding_near_dup,
)
from bambooai_spark.operators.curation import curate_corpus
from bambooai_spark.operators.gram_store import (
    boilerplate_cut,
    boilerplate_spans,
    build_gram_store,
    duplicated_grams,
    gram_counts,
    read_gram_store,
    refresh_gram_store,
    repair_gram_store,
)
from bambooai_spark.operators.pq import (
    knn_pq,
    pq_encode,
    train_pq_codebooks,
)
from bambooai_spark.operators.multimodal import (
    dhash_images,
    image_near_dup,
)
from bambooai_spark.operators.similarity import (
    knn_brute_force,
    knn_lsh,
    label_centroids,
)
from bambooai_spark.operators.export import export_jsonl_shards
from bambooai_spark.operators.vector_store import (
    append_vector_corpus,
    prune_vector_store,
    query_vector_corpus,
    query_vector_corpus_many,
    rebuild_vector_store,
    refresh_vector_store,
    set_corpus_watermark,
    validate_vector_store,
    vector_store_skew,
    write_vector_corpus,
)
from bambooai_spark.operators.filestats import (
    bloom_config,
    enable_file_stats,
    explain_pruning,
    rebuild_file_stats,
    set_bloom_filters,
)
from bambooai_spark.operators.maintenance import (
    auto_maintain,
    auto_maintain_vector_store,
    suggest_maintenance,
    suggest_vector_maintenance,
)
from bambooai_spark.operators.neardup_gate import (
    near_dup_gate,
    rebuild_signatures,
    record_signatures,
)
from bambooai_spark.operators.lease import (
    CorpusLease,
    CorpusLeaseHeld,
    CorpusLeaseLost,
    corpus_lease,
)
from bambooai_spark.operators.writer import (
    append_corpus,
    append_corpus_txn,
    build_manifest,
    compact_corpus,
    corpus_history,
    delete_from_corpus,
    latest_committed_batch,
    read_corpus,
    read_corpus_changes,
    recover_staging,
    merge_corpus,
    update_corpus,
    update_corpus_from,
    validate_corpus,
    write_corpus,
)

__all__ = [
    "exact_dedup",
    "exact_substring_spans",
    "exact_substring_cut",
    "curate_corpus",
    "build_gram_store",
    "duplicated_grams",
    "gram_counts",
    "read_gram_store",
    "refresh_gram_store",
    "repair_gram_store",
    "boilerplate_spans",
    "boilerplate_cut",
    "contamination_spans",
    "benchmark_grams",
    "contamination_cut",
    "contamination_fraction",
    "splice_spans",
    "knn_pq",
    "pq_encode",
    "train_pq_codebooks",
    "jaccard_near_dup",
    "minhash_signatures",
    "minhash_near_dup",
    "simhash",
    "embedding_near_dup",
    "hamming_near_dup",
    "semantic_dedup",
    "dhash_images",
    "image_near_dup",
    "knn_brute_force",
    "knn_lsh",
    "label_centroids",
    "write_corpus",
    "enable_file_stats",
    "rebuild_file_stats",
    "set_bloom_filters",
    "bloom_config",
    "explain_pruning",
    "read_corpus_changes",
    "merge_corpus",
    "update_corpus",
    "update_corpus_from",
    "latest_committed_batch",
    "refresh_vector_store",
    "prune_vector_store",
    "set_corpus_watermark",
    "CorpusLease",
    "CorpusLeaseHeld",
    "CorpusLeaseLost",
    "corpus_lease",
    "near_dup_gate",
    "suggest_maintenance",
    "auto_maintain",
    "suggest_vector_maintenance",
    "auto_maintain_vector_store",
    "rebuild_vector_store",
    "validate_vector_store",
    "vector_store_skew",
    "append_vector_corpus",
    "query_vector_corpus",
    "query_vector_corpus_many",
    "write_vector_corpus",
    "record_signatures",
    "rebuild_signatures",
    "append_corpus",
    "append_corpus_txn",
    "build_manifest",
    "compact_corpus",
    "corpus_history",
    "delete_from_corpus",
    "export_jsonl_shards",
    "read_corpus",
    "recover_staging",
    "validate_corpus",
]
