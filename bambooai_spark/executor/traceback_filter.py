"""Traceback filter (reference A14, bambooai/code_executor.py:252-322).

Same contract: map ``<string>`` line numbers back to the generated code,
excerpt the failing region with a ``-->`` marker, truncate to 1000 chars —
plus the Spark-specific step the pandas original doesn't need: unwrap
Py4J / AnalysisException walls to the salient cause line, because a raw
Py4JJavaError carries hundreds of JVM stack lines that would blow the error
corrector's context for zero signal.
"""

from __future__ import annotations

import re

MAX_CHARS = 1000

# Spark exception classes whose str() contains a JVM stack to strip.
_JVM_NOISE = re.compile(r"^\s*at [\w.$]+\(.*\)$")
_SALIENT = (
    "AnalysisException",
    "ParseException",
    "IllegalArgumentException",
    "PythonException",
    "SparkRuntimeException",
    "NumberFormatException",
    "ArithmeticException",
)


def _salient_cause(exception_value: str) -> str:
    """Reduce a Py4J/JVM error wall to its salient cause lines: drop
    ``at ...`` stack frames and JVM driver noise, keep the message and any
    named Spark exception lines."""
    lines = [l for l in exception_value.splitlines() if not _JVM_NOISE.match(l)]
    keep: list[str] = []
    for l in lines:
        s = l.strip()
        if not s:
            continue
        if s.startswith(("Driver stacktrace:", "Caused by:")) and keep:
            continue
        if "JVM stacktrace" in s:
            break
        keep.append(l)
        if len(keep) >= 8:
            break
    return "\n".join(keep) if keep else exception_value[:200]


def _error_lines(tb_text: str) -> list[int]:
    out = []
    for line in tb_text.splitlines():
        if '<string>' in line and ", line " in line:
            try:
                out.append(int(line.split(", line ")[1].split(",")[0]))
            except (IndexError, ValueError):
                pass
    return out


def filter_exec_traceback(
    code: str,
    full_traceback: str,
    exception_type: str,
    exception_value: str,
) -> str:
    """Compact, code-anchored error report for the error-correction loop."""
    code_lines = code.splitlines()
    err_lines = _error_lines(full_traceback)
    cause = _salient_cause(exception_value)

    if err_lines:
        n = err_lines[-1]  # innermost frame in the generated code
        start = max(0, n - 3)
        end = min(len(code_lines), n + 2)
        excerpt = "\n".join(
            f"{i}: {'--> ' if i == n else '    '}{code_lines[i - 1]}"
            for i in range(start + 1, end + 1)
        )
        out = (
            f"Error occurred in the following code snippet:\n\n{excerpt}\n\n"
            f"Error on line {n}:\n{exception_type}: {cause}\n"
        )
    else:
        out = f"{exception_type}: {cause}\n"

    if len(out) > MAX_CHARS:
        out = out[:MAX_CHARS] + "\n[...] (truncated to 1000 characters)\n"
    return out
