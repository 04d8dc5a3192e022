"""Token/cost accounting (reference A22, bambooai/log_manager.py:45-192).

The reference keeps per-LLM-call token logs in a JSON file and computes
per-chain / per-model rollups in Python loops. Here the log is an
append-only list of records on the driver (calls are driver-side events)
and the rollups are Spark group-bys — so the same accounting scales from a
session log to a fleet-wide table of millions of calls unchanged.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: rotation policy for the consolidated on-disk log — reference
#: log_manager.py:42 caps it at 5 MB with 3 rotated backups.
LOG_MAX_BYTES = 5 * 1024 * 1024
LOG_BACKUPS = 3


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
    """Append-only call log with Spark-side rollups.

    With ``log_path`` set, every record is also appended as one JSON line
    to a size-rotated file (``log``, ``log.1`` … ``log.{backups}``, oldest
    dropped) — the reference's consolidated-log policy, which it caps at
    5 MB × 3 rotations (log_manager.py:42) instead of growing unboundedly.
    """

    def __init__(
        self,
        log_path: str | None = None,
        *,
        max_bytes: int = LOG_MAX_BYTES,
        backups: int = LOG_BACKUPS,
    ) -> None:
        self.calls: list[LLMCall] = []
        self.log_path = log_path
        self.max_bytes = max_bytes
        self.backups = backups

    def _rotate_if_needed(self, incoming: int) -> None:
        """Shift log → log.1 → … → log.{backups} when the next append would
        cross ``max_bytes``; the oldest backup falls off."""
        try:
            size = os.path.getsize(self.log_path)
        except OSError:
            return
        if size + incoming <= self.max_bytes:
            return
        oldest = f"{self.log_path}.{self.backups}"
        if os.path.exists(oldest):
            os.remove(oldest)
        for i in range(self.backups - 1, 0, -1):
            src = f"{self.log_path}.{i}"
            if os.path.exists(src):
                os.replace(src, f"{self.log_path}.{i + 1}")
        os.replace(self.log_path, f"{self.log_path}.1")

    def record(self, call: LLMCall) -> None:
        self.calls.append(call)
        if self.log_path:
            line = json.dumps(asdict(call)) + "\n"
            self._rotate_if_needed(len(line))
            with open(self.log_path, "a") as f:
                f.write(line)

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
