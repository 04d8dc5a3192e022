"""``BambooAI`` — the reference's user-facing class surface on the Spark
engine (reference ``bambooai/bambooai.py:10-552``), so a user of the
reference can switch with the smallest possible edit:

    from bambooai_spark import BambooAI
    bamboo = BambooAI(df, llm=..., planning=True, vector_db=True)
    bamboo.pd_agent_converse("Count the number of runs per month in 2021")

Differences from the reference, all deliberate:

- ``df`` is a ``pyspark.sql.DataFrame`` (the whole point of the rebuild);
- ``llm`` is the engine's pluggable ``(system, user) -> str`` callable —
  wire a provider adapter from :mod:`bambooai_spark.agent.providers`
  instead of the reference's env-var model registry;
- ``pd_agent_converse`` RETURNS the :class:`AgentResult` (the reference
  returns None and only prints) — a superset, nothing breaks;
- the reference's no-question mode (interactive stdin loop until
  ``exit``) is supported via the same signature: call
  ``pd_agent_converse()`` with neither ``question`` nor ``user_code``
  and it prompts on stdin per turn, exactly like the reference's
  CLI/Jupyter mode (bambooai.py:538-552).

Everything else follows the reference's semantics: wall-clock thread ids
when none is given, ``action='reset'`` clears conversation state, passing
an earlier ``chain_id`` restores that chain as the branch point
(bambooai.py:495-552), ``df_ontology`` takes a path to an ontology file
whose text feeds the Dataframe Inspector, ``vector_db=True`` turns on
rank-gated episodic memory, and auxiliary datasets are file paths the
generated code may join.

Remote execution (reference ``EXECUTION_MODE=api``, bambooai.py:41-43):
``execution_mode="api"`` + ``executor_api_url`` (or the
``EXECUTION_MODE``/``EXECUTOR_API_BASE_URL`` env vars) runs every turn's
code in a remote executor service — the frame uploads once at
construction (or pass ``executor_df_name`` for a dataset already
registered on the service). In api mode ``auxiliary_datasets`` upload to
the service once at construction and every turn's ``/execute`` rebuilds
the sandbox ``aux['<name>']`` tables server-side from those paths
(reference api-mode aux flow, code_executor_api.py:379-406);
``sample_first`` is ignored (a local-probe optimization that would
re-apply mutations to the already-mutated server frame).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame

from bambooai_spark.agent.memory import EpisodicMemory
from bambooai_spark.agent.orchestrator import AgentOrchestrator, AgentResult
from bambooai_spark.agent.session import AgentSession
from bambooai_spark.storage import InteractionStore


class BambooAI:
    """Reference-shaped entry point over AgentOrchestrator/AgentSession."""

    def __init__(
        self,
        df: DataFrame,
        *,
        llm,
        user_id: str | None = None,
        auxiliary_datasets: list[str] | None = None,
        max_conversations: int = 4,
        vector_db: bool = False,
        memory: EpisodicMemory | None = None,
        search_tool: bool = False,
        tools: dict | None = None,
        exploratory: bool = True,
        df_ontology: str | None = None,
        planning: bool = False,
        df_id: str | None = None,
        store_dir: str | None = None,
        sample_first: int | None = None,
        output=None,
        rank_fn=None,
        execution_mode: str | None = None,
        executor_api_url: str | None = None,
        executor_df_name: str | None = None,
        executor_shared_dir: str | None = None,
        executor_max_upload_rows: int | None = None,
    ):
        if df is None:
            raise ValueError("df is required (a pyspark.sql.DataFrame)")
        self.df = df
        self.spark = df.sparkSession
        self.user_id = user_id
        self.df_id = df_id
        self.auxiliary_datasets = list(auxiliary_datasets or [])
        # reference: df_ontology is a PATH to the ontology file
        # (bambooai.py df_ontology param); accept raw ontology text too
        self.ontology: str | None = None
        if df_ontology:
            if os.path.exists(df_ontology):
                with open(df_ontology) as fh:
                    self.ontology = fh.read()
            else:
                self.ontology = df_ontology
        if memory is None and vector_db:
            memory = EpisodicMemory(self.spark)
        self.memory = memory
        if memory is not None and rank_fn is None:
            # without a rank the write gate never fires (the reference asks
            # the model to rate the solution 0-10, bambooai.py:652-670)
            rank_fn = self._llm_rank_fn(llm)
        # reference gates the search tool on key availability; here the
        # caller supplies the implementations (tools dict), search_tool
        # only expresses intent for parity
        self.search_tool = search_tool
        # the reference's split deployment (bambooai.py:41-43): with
        # EXECUTION_MODE=api + EXECUTOR_API_BASE_URL, code executes in a
        # remote executor service; the local frame is uploaded once and
        # every turn POSTs against the server-side df_name
        self.execution_mode = (
            execution_mode or os.environ.get("EXECUTION_MODE", "local")
        )
        remote_executor = None
        if self.execution_mode == "api":
            if sample_first:
                # sample-first is a LOCAL probe optimization; remotely the
                # probe would execute against the full server-side dataset
                # and the promote run would re-apply the same mutation to
                # the already-mutated frame
                sample_first = None
            from bambooai_spark.executor.client import (  # noqa: PLC0415
                RemoteExecutorClient,
                RemoteSparkExecutor,
            )

            url = executor_api_url or os.environ.get("EXECUTOR_API_BASE_URL")
            if not url:
                raise ValueError(
                    "execution_mode='api' needs executor_api_url (or the "
                    "EXECUTOR_API_BASE_URL environment variable)"
                )
            # executor_df_name addresses a dataset ALREADY registered on
            # the service (the reference web-app flow); otherwise the FULL
            # frame uploads once, eagerly — before any sample-first probe
            # could pin a limited frame as the server-side dataset. (df_id
            # stays what it is elsewhere: a local display label.)
            # executor_shared_dir — storage both this session and the
            # service can read (file://, hdfs://, s3a://): the frame is
            # written there at full parallelism and registered by PATH
            # (zero bytes over HTTP) instead of the single-file upload
            shared = executor_shared_dir or os.environ.get(
                "EXECUTOR_SHARED_DIR"
            )
            # executor_max_upload_rows — the single-file HTTP upload
            # refuses frames above this (spill guard, default 100k in
            # RemoteSparkExecutor); the refusal's advice to "raise
            # max_upload_rows" must be reachable from here (ADVICE r7)
            kw: dict = {}
            rows_env = os.environ.get("EXECUTOR_MAX_UPLOAD_ROWS")
            if executor_max_upload_rows is not None:
                kw["max_upload_rows"] = executor_max_upload_rows
            elif rows_env:
                kw["max_upload_rows"] = int(rows_env)
            remote_executor = RemoteSparkExecutor(
                RemoteExecutorClient(url),
                df_name=executor_df_name,
                shared_dir=shared,
                **kw,
            )
            if executor_df_name is None:
                remote_executor.ensure_uploaded(df)
            if self.auxiliary_datasets:
                # upload each aux file ONCE at construction; every turn's
                # /execute names the returned server paths and the service
                # rebuilds aux['<name>'] from them with the same
                # deterministic naming the local sandbox uses (reference
                # api-mode aux flow: executor_client.upload_aux_dataset →
                # code_executor_api.py:379-406). Prompt previews still read
                # the local files — same bytes, zero extra round-trips.
                remote_executor.aux_paths = [
                    remote_executor.client.upload_aux_dataset(p)
                    for p in self.auxiliary_datasets
                ]
        self._orch = AgentOrchestrator(
            self.spark,
            llm,
            planning=planning,
            memory=memory,
            tools=tools,
            sample_first=sample_first,
            # reference webui=True swaps in WebOutputManager; here any
            # OutputManager (e.g. QueueOutputManager) plugs in directly
            output=output,
            max_conversations=max_conversations,
            rank_fn=rank_fn,
            # exploratory=False (reference: skip routing, force Data
            # Analyst)
            exploratory=exploratory,
            executor=remote_executor,
        )
        self.exploratory = exploratory
        self._max_conversations = max_conversations
        self._store_dir = store_dir
        self._session: AgentSession | None = None
        self._last_auto_tid: int | None = None
        self.thread_id: str | None = None
        self.chain_id: str | None = None

    @staticmethod
    def _llm_rank_fn(llm):
        """Default memory-write rank: ask the model to rate the solution
        0-10 (reference's rank prompt, bambooai.py:652-670); unparseable
        replies rate 0 (never stored)."""
        import re  # noqa: PLC0415

        def rank(result) -> int:
            resp = llm(
                "Rate the quality of this data-analysis solution on a "
                "scale of 0 to 10. Reply with a single integer only.",
                f"Task: {result.intent}\n\nCode:\n{result.code}\n\n"
                f"Summary: {result.summary}",
            )
            m = re.search(r"\d+", str(resp))
            return max(0, min(10, int(m.group()))) if m else 0

        return rank

    # -- session plumbing ---------------------------------------------

    def _ensure_session(self, thread_id) -> AgentSession:
        if thread_id is not None:
            tid = str(thread_id)
        elif self.thread_id is not None:
            tid = self.thread_id
        else:
            # wall-clock ids like the reference, but monotonic: a reset
            # followed by a converse within the same second must start a
            # genuinely fresh thread, not resume the old one
            t = int(time.time())
            if self._last_auto_tid is not None and t <= self._last_auto_tid:
                t = self._last_auto_tid + 1
            self._last_auto_tid = t
            tid = str(t)
        if self._session is None or self._session.thread_id != tid:
            store = InteractionStore(
                self._store_dir
                or os.path.join("threads", self.user_id or "default")
            )
            self._session = AgentSession(self._orch, store, thread_id=tid)
            # the orchestrator's QA history belongs to the previous thread —
            # a fresh thread starts clean (restore() repopulates on branch)
            self._orch.messages.qa_pairs = []
            self.chain_id = None
        self.thread_id = tid
        return self._session

    def reset_messages_and_logs(self) -> None:
        """Reference ``action='reset'``: clear conversation state; the
        next converse starts a fresh thread."""
        if self._session is not None:
            self._session.reset()
        self._session = None
        self.thread_id = None
        self.chain_id = None

    # -- the entry point ----------------------------------------------

    def pd_agent_converse(
        self,
        question: str | None = None,
        action: str | None = None,
        thread_id=None,
        chain_id=None,
        image: str | None = None,
        user_code: str | None = None,
    ) -> AgentResult | None:
        """One conversational turn (reference bambooai.py:495-552).

        ``action='reset'`` clears state and returns None. ``chain_id``
        (when different from the current chain) restores that chain's QA
        history as the branch point before the new turn. With neither
        ``question`` nor ``user_code``, enters the reference's
        interactive loop: prompt on stdin each turn until ``exit``
        (bambooai.py:538-552); returns the LAST turn's result."""
        if action == "reset":
            self.reset_messages_and_logs()
            return None
        if question is None and user_code is None:
            last: AgentResult | None = None
            while True:
                q = input("Enter your question or type 'exit': ")
                if q.strip().lower() == "exit":
                    self.reset_messages_and_logs()
                    return last
                last = self.pd_agent_converse(
                    q, thread_id=self.thread_id, image=image
                )
            # unreachable
        sess = self._ensure_session(thread_id)
        if chain_id is not None and str(chain_id) != str(self.chain_id):
            if not sess.restore(str(chain_id)):
                raise ValueError(
                    f"unknown chain {chain_id!r} on thread "
                    f"{self.thread_id!r} — nothing to branch from"
                )
        gen_dir = os.path.join(
            "datasets", self.user_id or "", "generated",
            str(self.thread_id),
        )
        if user_code is not None:
            result = sess.run_user_code(
                user_code,
                self.df,
                question=question,
                generated_datasets_path=gen_dir,
            )
        else:
            result = sess.ask(
                question,
                self.df,
                df_name=self.df_id,
                image=image,
                ontology=self.ontology,
                aux_datasets=self.auxiliary_datasets,
                generated_datasets_path=gen_dir,
            )
        self.chain_id = sess.last_chain_id
        # adopt a mutated df on success — the reference's mutated-table
        # semantics (code_executor.py:140; SURVEY §1.1)
        if result.ok and result.df is not None:
            self.df = result.df
        return result
