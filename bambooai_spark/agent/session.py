"""Conversation session — the thread/chain lifecycle around the orchestrator
(reference bambooai.py:495-552 ``pd_agent_converse``).

The reference keys every interaction by (thread_id, chain_id): each question
starts a new chain in the current thread, its outcome is persisted through
the storage manager (``store_interaction``), and passing an earlier
``chain_id`` RESTORES that chain's QA history as the starting point —
branching a conversation from any past state. This module is that contract
over the repo's ``InteractionStore`` (A20) + ``AgentOrchestrator`` +
``MessageManager``: driver-side control-plane state only, no Spark jobs.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame

from bambooai_spark.agent.orchestrator import AgentOrchestrator, AgentResult
from bambooai_spark.storage import InteractionStore


class AgentSession:
    """One conversation thread: ask → persist chain; restore → branch."""

    def __init__(
        self,
        orchestrator: AgentOrchestrator,
        store: InteractionStore,
        *,
        thread_id: str = "default",
    ):
        self.orch = orchestrator
        self.store = store
        self.thread_id = str(thread_id)
        self.tasks: list[str] = []  # reference message_manager.tasks
        # chains continue from what the thread already holds (reference uses
        # wall-clock ids; a dense counter keeps replays deterministic)
        existing = self.store.load_thread(self.thread_id)["chains"]
        # a thread may hold non-numeric chain ids (reference-style wall-clock
        # strings, or a caller-chosen id) — they don't advance the counter
        start = 1 + max(
            (int(c) for c in existing if str(c).isdigit()), default=0
        )
        self._chain_ids = itertools.count(start)
        self.last_chain_id: str | None = None

    def ask(
        self,
        question: str,
        df: DataFrame,
        *,
        df_name: str | None = None,
        **converse_kwargs,
    ) -> AgentResult:
        """Run one chain and persist its outcome (reference
        ``_process_question`` + ``store_interaction``, bambooai.py:639-684).
        The chain identity event goes out first so a streaming client can
        tag everything that follows (reference ``send_chain_id``)."""
        chain_id = next(self._chain_ids)
        self.last_chain_id = str(chain_id)
        self.orch.output.send_chain_id(self.thread_id, str(chain_id), df_name)
        result = self.orch.converse(
            question, df, chain_id=str(chain_id), **converse_kwargs
        )
        if result.intent:
            self.tasks.append(result.intent)
        self.store.save_chain(
            self.thread_id,
            str(chain_id),
            {
                "question": question,
                "intent": result.intent,
                "plan": result.plan,
                "executed_code": result.code,
                "summary": result.summary,
                "ok": result.ok,
                "corrections": result.corrections,
                "qa_pairs": list(self.orch.messages.qa_pairs),
                "tasks": list(self.tasks),
            },
        )
        return result

    def run_user_code(
        self,
        code: str,
        df: DataFrame,
        *,
        question: str | None = None,
        **run_kwargs,
    ) -> AgentResult:
        """User-code chain — persisted like any other (reference stores
        ``code_type='user'`` chains identically)."""
        chain_id = next(self._chain_ids)
        self.last_chain_id = str(chain_id)
        self.orch.output.send_chain_id(self.thread_id, str(chain_id))
        result = self.orch.run_user_code(
            code, df, question=question, chain_id=str(chain_id), **run_kwargs
        )
        self.store.save_chain(
            self.thread_id,
            str(chain_id),
            {
                "question": question,
                "intent": result.intent,
                "plan": None,
                "executed_code": result.code,
                "summary": result.summary,
                "ok": result.ok,
                "corrections": result.corrections,
                "qa_pairs": list(self.orch.messages.qa_pairs),
                "tasks": list(self.tasks),
                "code_type": "user",
            },
        )
        return result

    def restore(self, chain_id: str) -> bool:
        """Branch from a past chain: its QA pairs and task list become the
        current conversation state (reference ``restore_interaction``,
        bambooai.py:514-519). Returns whether the chain existed."""
        record = self.store.load_chain(self.thread_id, str(chain_id))
        if record is None:
            return False
        self.orch.messages.qa_pairs = list(record.get("qa_pairs") or [])
        self.tasks = list(record.get("tasks") or [])
        return True

    def reset(self) -> None:
        """Reference ``action='reset'`` (bambooai.py:501-505): clear the
        in-memory conversation state; persisted chains stay on disk."""
        self.orch.messages.qa_pairs = []
        self.tasks = []
