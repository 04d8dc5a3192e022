"""bambooai_spark — a PySpark-native analytics engine.

Capability target: the query and data-processing surface of pgalko/BambooAI
(see SURVEY.md for the full inventory), re-expressed Spark-first:

- ``sources``   — ingestion (CSV scan with datetime coercion, bounded aux
                  previews, header-only schema scans — reference A1, A3-A5)
                  and the catalog-backed dataset registry.
- ``profiler``  — the bounded-context profile/sample surface feeding every
                  prompt (summary string, offset-25 head, 100-row sample,
                  columns listing, HTML preview, value_counts — A8, A10-A12).
- ``functions`` — the prescribed operator surface (SURVEY.md §2.B): filters,
                  aggregations, window/time-series ops, calendar bucketing,
                  segmentation, pace/drift helpers — all pure column
                  expressions that stay inside whole-stage codegen.
- ``operators`` — scale-out LLM-data-pipeline operators: deduplication
                  (exact, MinHash-LSH, SimHash, n-gram Jaccard with dense/
                  sparse strategy selection), similarity search (brute-force
                  and LSH kNN with precomputed buckets), text analysis
                  (lang-id, quality, tokens, fingerprints).
- ``executor``  — the sandboxed code executor (reference A13-A15) re-pointed
                  at ``{'df': DataFrame, 'spark': SparkSession}``: sanitizer,
                  versioned commit/rollback, traceback filter.
- ``streaming`` — Structured Streaming surface for the events table
                  (tumbling/session windows, watermark dedup).
- ``plans``     — plan inspection/guardrail utilities: pushdown/pruning/
                  broadcast assertions for tests, cartesian-product guard
                  for the executor.

Design stance (100 TB): declarative DataFrame plans so Catalyst handles
pushdown/pruning/join selection; decimal-exact aggregation for deterministic
results; broadcast hints only for genuinely small dims; AQE on for runtime
skew/partition handling; no driver-side loops over data.
"""

__version__ = "0.1.0"

from bambooai_spark.session import get_session
from bambooai_spark.io import load_table, load_tables, TABLES
from bambooai_spark.facade import BambooAI

__all__ = ["BambooAI", "get_session", "load_table", "load_tables", "TABLES", "__version__"]
