"""Code sanitizer / rewriter (reference A15, bambooai/messages/reg_ex.py:56-136).

Same contract as the reference — take an LLM response, return a runnable
script with dangerous constructs neutralized as comments (so the error
corrector sees *why* a line was removed) — plus Spark-specific rules the
pandas original doesn't need:

- **unbounded driver materialization**: ``.collect()`` / ``.toPandas()`` /
  ``.toLocalIterator()`` on a line with no ``limit(`` / ``take(`` / ``head(``
  bound is commented out. At 100 TB an unbounded collect is a driver OOM; the
  sanitizer is the static safety net in front of the sandbox.
- **session shutdown**: ``spark.stop()`` / ``sc.stop()`` would kill the
  shared engine session.
- **primary-table clobber**: ``df = pd.DataFrame(...)`` / ``df = pd.read_*``
  reassignments are commented (the sandbox pre-loads ``df`` as a Spark
  DataFrame; reference reg_ex.py:114-127 has the pandas analog).
"""

from __future__ import annotations

import re

# Reference blacklist (reg_ex.py:58-62) minus `sys` is still blocked — the
# whole-word match also catches `os.system` via `exec`/`socket` etc. We keep
# the list identical so generated-code contracts carry over.
IMPORT_BLACKLIST = (
    "subprocess",
    "sys",
    "exec",
    "socket",
    "urllib",
    "shutil",
    "pickle",
    "ctypes",
    "multiprocessing",
    "tempfile",
    "glob",
    "pty",
    "commands",
    "cgi",
    "cgitb",
    "xml.etree.ElementTree",
    "builtins",
)

# Spark-side dangerous calls (any occurrence disables the line).
_SPARK_FORBIDDEN = (
    "spark.stop",
    "sc.stop",
    "sparkContext.stop",
    "setLogLevel",
    "spark.sparkContext._gateway",
    # process/filesystem escapes the reference-era blacklist misses
    # (`os` itself stays allowed — generated code legitimately uses
    # os.path for dataset paths)
    "os.system",
    "os.popen",
    "os.exec",
    "os.spawn",
    "os.remove",
    "os.rmdir",
    "os.unlink",
    "eval(",
    "__import__",
)

_COLLECT_RE = re.compile(r"\.(collect|toPandas|toLocalIterator)\s*\(")
# a bound only counts with a LITERAL argument at or under the cap (or the
# inherently single-row no-arg first()/head()): `.take(n)` with a runtime
# variable, or `.head(10**9)`, is not a bound the sanitizer can trust.
# The bound must sit in the SAME method chain as the collect — only plain
# chained calls with paren-free arguments may come between it and the
# collect token, so `x = df.first(); rows = df.collect()` is NOT legitimized
# by the unrelated first().
_BOUND_BEFORE_COLLECT_RE = re.compile(
    r"\.(limit|take|head|tail|first)\s*\(\s*([0-9_]+)?\s*\)"
    r"((?:\s*\.\w+\s*\([^()]*\))*)\s*$"
)
#: largest literal row bound accepted on a collect-to-driver line — generous
#: for display/sample contexts, far below driver-OOM territory
MAX_DRIVER_ROWS = 100_000

# methods allowed BETWEEN the bound and the collect: each preserves or
# shrinks the row count, so the literal bound still bounds the collect.
# join/crossJoin/union (row-multiplying) and anything unknown invalidate
# the bound — `.limit(100).crossJoin(other).toPandas()` collects
# 100 x |other| rows and must not be trusted.
_ROW_PRESERVING_CALLS = frozenset(
    {
        "select", "selectExpr", "drop", "withColumn", "withColumns",
        "withColumnRenamed", "withColumnsRenamed", "alias", "toDF",
        "where", "filter", "distinct", "dropDuplicates", "drop_duplicates",
        "dropna", "fillna", "na", "replace", "orderBy", "sort",
        "sortWithinPartitions", "coalesce", "repartition", "cache",
        "persist", "hint", "checkpoint", "localCheckpoint", "limit",
    }
)
_INTERM_CALL_RE = re.compile(r"\.(\w+)\s*\(")
# generator expressions multiply rows even inside a whitelisted select
_GENERATOR_RE = re.compile(r"\b(explode|explode_outer|posexplode"
                           r"|posexplode_outer|inline|inline_outer"
                           r"|stack|json_tuple)\s*\(")


def _has_trusted_bound(line: str) -> bool:
    """True iff EVERY collect-class call on the line is directly preceded,
    within its own method chain, by a trusted literal bound, with only
    row-preserving calls in between."""
    hits = list(_COLLECT_RE.finditer(line))
    if not hits:
        return False
    for c in hits:
        m = _BOUND_BEFORE_COLLECT_RE.search(line[: c.start()])
        if m is None:
            return False
        interm = m.group(3) or ""
        if any(
            name not in _ROW_PRESERVING_CALLS
            for name in _INTERM_CALL_RE.findall(interm)
        ):
            return False
        if _GENERATOR_RE.search(interm):
            return False
        arg = m.group(2)
        if arg is None:
            # no-arg first()/head() return a single Row; no-arg
            # limit()/take()/tail() are TypeErrors, not unbounded reads
            continue
        if int(arg.replace("_", "")) > MAX_DRIVER_ROWS:
            return False
    return True
# reference reg_ex.py:107-110 matches the blacklist as whole words on EVERY
# line (not only import statements) — `exec(...)` or `pickle.loads(...)` in
# a code body is neutralized too
_BLACKLIST_RE = re.compile(
    r"\b(" + "|".join(map(re.escape, IMPORT_BLACKLIST)) + r")\b"
)
_DF_CLOBBER_RE = re.compile(
    r"(?<![A-Za-z0-9_])df\s*=\s*pd\.(DataFrame|read_\w+)\s*\("
)
_MAIN_RE = re.compile(r"^(\s*)if\s+__name__\s*==\s*['\"]__main__['\"]\s*:\s*$")


def extract_code(response: str) -> str:
    """Pull the ```python fenced blocks out of an LLM response (reference
    reg_ex.py:64-75); falls back to bare ``` fences, then to the raw text if
    it looks like code (contains no fences at all)."""
    segments = re.findall(r"```python\s*\n(.*?)```", response, re.DOTALL)
    if not segments:
        segments = re.findall(r"```\s*\n(.*?)```", response, re.DOTALL)
    if not segments:
        return response.strip() if "```" not in response else ""
    return "\n\n".join(seg.strip("\n") for seg in segments).strip()


def _strip_main_block(lines: list[str]) -> list[str]:
    """Dedent the body of ``if __name__ == '__main__':`` into the top level
    (reference reg_ex.py find_main_block/process_main_block)."""
    out: list[str] = []
    i = 0
    while i < len(lines):
        m = _MAIN_RE.match(lines[i])
        if not m:
            out.append(lines[i])
            i += 1
            continue
        base_indent = len(m.group(1))
        i += 1
        body: list[str] = []
        while i < len(lines):
            line = lines[i]
            if line.strip() and (len(line) - len(line.lstrip())) <= base_indent:
                break
            body.append(line)
            i += 1
        # dedent by the body's minimal indentation
        indents = [len(l) - len(l.lstrip()) for l in body if l.strip()]
        shift = min(indents) if indents else 0
        out.extend(l[shift:] if l.strip() else l for l in body)
    return out


def sanitize(code: str) -> str:
    """Line-level neutralization pass. Every disabled line is kept as a
    comment with the reason, so the traceback/error-correction loop can see
    what was removed and emit a compliant retry."""
    lines = _strip_main_block(code.splitlines())
    out: list[str] = []
    for line in lines:
        if line.lstrip().startswith("# not allowed"):
            out.append(line)  # already neutralized — idempotence
            continue
        if _BLACKLIST_RE.search(line):
            out.append(f"# not allowed (blacklisted name): {line.strip()}")
            continue
        if any(tok in line for tok in _SPARK_FORBIDDEN):
            out.append(f"# not allowed (session control): {line.strip()}")
            continue
        if _COLLECT_RE.search(line) and not _has_trusted_bound(line):
            out.append(
                f"# not allowed (unbounded collect to driver — add .limit(n)): "
                f"{line.strip()}"
            )
            continue
        if _DF_CLOBBER_RE.search(line):
            out.append(
                f"# not allowed (df is pre-loaded as a Spark DataFrame): "
                f"{line.strip()}"
            )
            continue
        if "plt.savefig" in line:
            indent = line[: len(line) - len(line.lstrip())]
            out.append(indent + "plt.show()")
            continue
        out.append(line)
    result = "\n".join(out)
    return re.sub(r"\n{3,}", "\n\n", result).strip()


def extract_and_sanitize(response: str) -> str:
    return sanitize(extract_code(response))
