"""bambooai_spark — a PySpark-native analytics engine.

Capability target: the query and data-processing surface of pgalko/BambooAI
(see SURVEY.md for the full inventory), re-expressed Spark-first:

- ``sources``   — ingestion (CSV/Parquet scans with schema capture, the
                  reference's A1-A5 operators) and the dataset registry.
- ``functions`` — the prescribed operator surface (SURVEY.md §2.B): filters,
                  aggregations, window/time-series ops, calendar bucketing,
                  segmentation, pace/drift helpers — all pure column
                  expressions that stay inside whole-stage codegen.
- ``operators`` — scale-out LLM-data-pipeline operators: deduplication
                  (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity
                  search (brute-force and LSH kNN), text analysis
                  (lang-id, quality, tokens, fingerprints), multimodal
                  column plumbing.
- ``streaming`` — Structured Streaming surface for the events table
                  (tumbling/sliding/session windows, watermark dedup).
- ``plans``     — plan inspection/guardrail utilities.
- ``executor``  — the sandboxed code executor (reference A13-A15) re-pointed
                  at ``{'df': DataFrame, 'spark': SparkSession}``.

Design stance (100 TB): declarative DataFrame plans so Catalyst handles
pushdown/pruning/join selection; decimal-exact aggregation for deterministic
results; broadcast hints only for genuinely small dims; AQE on for runtime
skew/partition handling; no driver-side loops over data.
"""

__version__ = "0.1.0"

from bambooai_spark.session import get_session
from bambooai_spark.io import load_table, load_tables, TABLES

__all__ = ["get_session", "load_table", "load_tables", "TABLES", "__version__"]
