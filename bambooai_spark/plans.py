"""Plan inspection & guardrails (SURVEY §4: the rebuild's optimizer story
is "let Catalyst do it, then VERIFY it did" — these utilities make plan
quality checkable in tests and enforceable in the executor).

- ``explain_str``   — the formatted plan as a string (what ``.explain``
  prints, capturable).
- ``plan_flags``    — structural facts: pushed filters, read schemas,
  exchange count, broadcast vs shuffle joins, cartesian products,
  whole-stage-codegen span count.
- ``assert_pushed_filters`` / ``assert_pruned_scan`` / ``assert_no_cartesian``
  — test-time guards that a plan is the plan we want.
- ``guard_plan``    — the executor-side guardrail (SURVEY §4 candidate #1):
  reject generated code whose committed plan contains a cartesian product —
  the N² shape no generated query should ever ship at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(jmode.fromString(mode))


def plan_flags(df: DataFrame) -> dict:
    plan = explain_str(df)
    simple = explain_str(df, "simple")
    return {
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "read_schemas": re.findall(r"ReadSchema: struct<([^>]*)>", plan),
        "n_exchanges": len(re.findall(r"\bExchange\b", simple)),
        "n_broadcast_joins": len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", simple)),
        "n_shuffle_joins": len(re.findall(r"SortMergeJoin|ShuffledHashJoin", simple)),
        "has_cartesian": "CartesianProduct" in simple,
        "n_codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", simple))),
        "has_take_ordered": "TakeOrderedAndProject" in simple,
    }


def assert_pushed_filters(df: DataFrame, column: str) -> None:
    """The scan must push at least one filter mentioning ``column``."""
    pushed = ";".join(plan_flags(df)["pushed_filters"])
    assert column in pushed, (
        f"no pushed filter on {column!r}; PushedFilters were [{pushed}]"
    )


def assert_pruned_scan(df: DataFrame, table_cols: int, max_read_cols: int) -> None:
    """At least one scan must read ≤ max_read_cols of the table's columns
    (column pruning reached the reader)."""
    schemas = plan_flags(df)["read_schemas"]
    widths = [len(s.split(",")) for s in schemas if s]
    assert widths and min(widths) <= max_read_cols, (
        f"no pruned scan: read widths {widths} vs table {table_cols} cols"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    assert not plan_flags(df)["has_cartesian"], (
        "plan contains CartesianProduct:\n" + explain_str(df, "simple")[:2000]
    )


def guard_plan(df: DataFrame) -> str | None:
    """Executor guardrail: return a rejection reason if the plan has a
    shape generated code must never commit, else None."""
    flags = plan_flags(df)
    if flags["has_cartesian"]:
        return (
            "plan contains an unconstrained CartesianProduct (N^2 row "
            "explosion); add a join condition or block the self-join"
        )
    return None
