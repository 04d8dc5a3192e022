"""Output managers — the streaming seam between the agent loop and a
client (reference ``bambooai/output_manager.py`` +
``bambooai/web_output_manager.py:13-76``).

The reference runs the agent in a worker thread while the web handler
drains an output queue of JSON events: text/thought tokens tagged with the
chain id, the (thread, chain, df) identity event, plots-as-data, and the
final rank-request payload. The agent side only ever calls the manager —
it never knows whether a CLI, a test, or a chunked HTTP response is
listening.

Event vocabulary (one JSON object per line on the wire):

- ``{"type": "id", "thread_id", "chain_id", "df_name"}`` — chain identity,
  first event of every chain (reference ``send_chain_id``).
- ``{"thought": str, "chain_id"}`` — agent-internal progress (routing,
  plan, codegen, corrections).
- ``{"text": str, "chain_id"}`` — user-facing answer tokens.
- ``{"type": "result", "stdout", "chain_id"}`` — the sandbox's captured
  stdout after a successful execution (reference display_results).
- ``{"type": "plot", "format", "data", "chain_id"}`` — one per harvested
  figure (matplotlib → base64 PNG, plotly → figure JSON).
- ``{"rank_data": {...}}`` — terminal event: the chain's metadata for the
  client's rank prompt (reference app.py:955-957).
"""

from __future__ import annotations

import json
import queue
import re


class OutputManager:
    """No-op sink — the default for library/batch use; also the base class
    so the agent code has exactly one emission API."""

    def emit(self, event: dict) -> None:  # pragma: no cover - trivial
        pass

    # -- convenience wrappers (the agent calls these, never emit()) ----

    def send_chain_id(
        self, thread_id: str, chain_id: str, df_name: str | None = None
    ) -> None:
        self.emit(
            {
                "type": "id",
                "thread_id": thread_id,
                "chain_id": chain_id,
                "df_name": df_name,
            }
        )

    def thought(self, message: str, chain_id: str | None = None) -> None:
        self.emit({"thought": message, "chain_id": chain_id})

    def text(self, message: str, chain_id: str | None = None) -> None:
        self.emit({"text": message, "chain_id": chain_id})

    def text_stream(self, message: str, chain_id: str | None = None) -> None:
        """Emit a full message as whitespace-preserving chunks — the
        reference streams per-token from the model callback; with a plain
        (system, user) -> str LLM the summary arrives whole, so it is
        re-chunked here to keep the wire contract incremental."""
        for chunk in _chunks(message):
            self.text(chunk, chain_id)

    def plot(self, plot: dict, chain_id: str | None = None) -> None:
        self.emit({"type": "plot", **plot, "chain_id": chain_id})

    def rank_data(self, payload: dict) -> None:
        self.emit({"rank_data": payload})

    def request_user_feedback(
        self,
        query_clarification: str,
        context_needed: str,
        chain_id: str | None = None,
        timeout: float | None = None,
    ) -> str | None:
        """Ask the user a clarifying question mid-chain (reference
        ``request_user_feedback``, web_output_manager.py:68-76 — the web
        manager emits the request event and the Flask /submit_feedback
        route feeds the answer back through the input queue). The no-op
        base has no user: returns None immediately."""
        return None


def _chunks(message: str, size: int = 24) -> list[str]:
    """Split on whitespace boundaries into ~size-char chunks, preserving
    the exact original text (concatenating the chunks reproduces it)."""
    toks = re.findall(r"\s*\S+", message)
    consumed = sum(len(t) for t in toks)
    if consumed < len(message):  # trailing whitespace
        toks.append(message[consumed:])
    out: list[str] = []
    buf = ""
    for t in toks:
        if buf and len(buf) + len(t) > size:
            out.append(buf)
            buf = t
        else:
            buf += t
    if buf:
        out.append(buf)
    return out


class QueueOutputManager(OutputManager):
    """Queue-backed sink for the chunked-HTTP flow (reference
    ``WebOutputManager``): the worker thread emits, the handler drains
    ``output_queue`` and yields one JSON line per event."""

    def __init__(self) -> None:
        self.output_queue: queue.Queue[str] = queue.Queue()
        self.input_queue: queue.Queue[str] = queue.Queue()

    def emit(self, event: dict) -> None:
        self.output_queue.put(json.dumps(event))

    def request_user_feedback(
        self,
        query_clarification: str,
        context_needed: str,
        chain_id: str | None = None,
        timeout: float | None = 300.0,
    ) -> str | None:
        """Emit the request event, then BLOCK the agent worker until the
        client posts the answer to /submit_feedback (which enqueues it
        here) or the timeout lapses — the reference's input-queue
        round-trip."""
        self.emit(
            {
                "type": "request_user_context",
                "query_clarification": query_clarification,
                "context_needed": context_needed,
                "chain_id": chain_id,
            }
        )
        try:
            return self.input_queue.get(timeout=timeout)
        except queue.Empty:
            return None
