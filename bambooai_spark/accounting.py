"""Token/cost accounting (reference A22, bambooai/log_manager.py:45-192).

The reference keeps per-LLM-call token logs in a JSON file and computes
per-chain / per-model rollups in Python loops. Here the log is an
append-only list of records on the driver (calls are driver-side events)
and the rollups are Spark group-bys — so the same accounting scales from a
session log to a fleet-wide table of millions of calls unchanged.
"""

from __future__ import annotations

import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class LLMCall:
    chain_id: str
    agent: str
    model: str
    prompt_tokens: int
    completion_tokens: int
    elapsed_sec: float
    cost_usd: float = 0.0
    ts: float = field(default_factory=time.time)

    @property
    def total_tokens(self) -> int:
        return self.prompt_tokens + self.completion_tokens


class TokenLog:
    """Append-only call log with Spark-side rollups."""

    def __init__(self) -> None:
        self.calls: list[LLMCall] = []

    def record(self, call: LLMCall) -> None:
        self.calls.append(call)

    def to_df(self, spark: SparkSession) -> DataFrame:
        schema = (
            "chain_id string, agent string, model string, prompt_tokens long,"
            " completion_tokens long, elapsed_sec double, cost_usd double,"
            " ts double"
        )
        return spark.createDataFrame(
            [asdict(c) for c in self.calls] or [], schema=schema
        )

    @staticmethod
    def rollup(df: DataFrame, *keys: str) -> DataFrame:
        """Per-key totals/averages (reference log_manager.py:125-192
        summaries: sum/avg tokens, elapsed, cost, tokens/sec)."""
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum("prompt_tokens").alias("prompt_tokens"),
            F.sum("completion_tokens").alias("completion_tokens"),
            F.sum(F.col("prompt_tokens") + F.col("completion_tokens")).alias(
                "total_tokens"
            ),
            F.round(F.sum("elapsed_sec"), 3).alias("elapsed_sec"),
            F.round(F.sum("cost_usd"), 6).alias("cost_usd"),
            F.round(
                F.sum("completion_tokens") / F.sum("elapsed_sec"), 2
            ).alias("tokens_per_sec"),
        )
