"""Agent/control layer (reference §2.C, SURVEY M3) re-pointed at PySpark.

The reference's control flow — expert routing → analyst selection → plan →
codegen → sandboxed execution with a self-healing retry loop → summary
(bambooai/bambooai.py:335-489, 550-684) — with every data-plane call going
through this repo's Spark-native layers (profiler, executor, registry) and
the codegen contract targeting ``df: pyspark.sql.DataFrame`` + ``spark``.

The LLM is pluggable (``llm: Callable[[system, user], str]``): production
wires a provider client; tests wire a scripted stub — LLM nondeterminism
stays out of the correctness gate (SURVEY §5).
"""

from bambooai_spark.agent.parsing import (
    extract_expert,
    extract_analyst,
    extract_yaml_block,
)
from bambooai_spark.agent.memory import EpisodicMemory, MemoryHit
from bambooai_spark.agent.messages import MessageManager, remove_examples
from bambooai_spark.agent.orchestrator import AgentOrchestrator, AgentResult
from bambooai_spark.agent.session import AgentSession

__all__ = [
    "AgentOrchestrator",
    "AgentResult",
    "AgentSession",
    "EpisodicMemory",
    "MemoryHit",
    "MessageManager",
    "extract_expert",
    "extract_analyst",
    "extract_yaml_block",
    "remove_examples",
]
