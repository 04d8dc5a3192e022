"""Sandboxed code execution — the reference's actual query engine (SURVEY
§2.A A13-A15): every user question ends in generated code running against a
pre-loaded ``df``.

- ``sanitizer``  — extract ```python blocks from LLM responses, neutralize
                   blacklisted imports, strip ``__main__`` wrappers, and add
                   Spark-specific guards (unbounded collect/toPandas, session
                   shutdown). Reference: bambooai/messages/reg_ex.py:56-136.
- ``executor``   — ``SparkCodeExecutor``: exec with ``{'df': DataFrame,
                   'spark': session}``, stdout capture, success-commit /
                   error-rollback (free via DataFrame immutability — the
                   reference needs ``df.copy()``, code_executor.py:103),
                   versioned temp views, generated-dataset harvest.
                   Reference: bambooai/code_executor.py:101-215.
- ``traceback_filter`` — map ``<string>`` line numbers to the generated code,
                   excerpt ±3 lines, unwrap Py4J/AnalysisException to the
                   salient cause, truncate to 1000 chars.
                   Reference: bambooai/code_executor.py:252-322.
"""

from bambooai_spark.executor.sanitizer import extract_code, sanitize
from bambooai_spark.executor.executor import SparkCodeExecutor, ExecutionResult
from bambooai_spark.executor.traceback_filter import filter_exec_traceback

__all__ = [
    "extract_code",
    "sanitize",
    "SparkCodeExecutor",
    "ExecutionResult",
    "filter_exec_traceback",
]
