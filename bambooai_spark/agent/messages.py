"""Conversation-window and QA-pair pruning contracts (reference
messages/message_manager.py:6-180 + messages/reg_ex.py:233-244).

These are the bounds that keep a long-running agent session's prompts from
growing without limit — pure driver-side arithmetic, no Spark:

- message window: ``MAX_CONVERSATIONS = 2·max_conversations − 1`` entries
  after the system message; when exceeded, the OLDEST user/assistant
  exchange (two messages) is dropped (message_manager.py:8,135-139);
- tool hygiene: ``tool_calls``/``role=tool`` messages never persist across
  turns (message_manager.py:130-133);
- QA history: custom-operation entries are replaced, not accumulated
  (:141-154); the formatted history keeps only the most recent
  ``max_qa_pairs`` (8) pairs (:156-163);
- example stripping: once the first correction round has run, the
  ``EXAMPLE OUTPUT: ```python ...``` `` blocks are removed from prior user
  messages — the example misled the model, keeping it re-misleads every
  retry (reg_ex.py:233-244, applied at bambooai.py:789).
"""

from __future__ import annotations

import re

#: identifiers of "custom operation" tasks that replace, never accumulate
#: (reference message_manager.py:142-146)
CUSTOM_IDENTIFIERS = (
    "User requested to run the code to do a custom analysis of the activity with ID:",
    "User manually edited your code, and requested to run it, and return the result.",
)

_EXAMPLE_PATTERN = re.compile(r"EXAMPLE OUTPUT:\s*```python.*?```\s*", re.DOTALL)


def remove_examples(messages: list[dict]) -> list[dict]:
    """Strip ``EXAMPLE OUTPUT:`` python blocks from user messages in place
    (reference reg_ex.py:233-244) — called after the first error correction
    so a misleading example is not replayed on every retry."""
    for msg in messages:
        if msg.get("role") == "user" and "content" in msg:
            msg["content"] = _EXAMPLE_PATTERN.sub("", msg["content"])
    return messages


class MessageManager:
    """Bounded message/QA history with the reference's pruning arithmetic."""

    def __init__(self, max_conversations: int = 4, max_qa_pairs: int = 8):
        # the window counts MESSAGES after the system prompt: each
        # conversation is a (user, assistant) pair, and the current turn's
        # user message is in flight — hence 2·max − 1 (message_manager.py:8)
        self.max_messages = max_conversations * 2 - 1
        self.max_qa_pairs = max_qa_pairs
        self.qa_pairs: list[dict] = []

    def maintain(self, messages: list[dict]) -> list[dict]:
        """Reference ``messages_maintenace`` (message_manager.py:128-139):
        drop tool messages, then drop the oldest exchange (the two messages
        right after the system prompt) while over the window."""
        for i in range(len(messages) - 1, -1, -1):
            msg = messages[i]
            if "tool_calls" in msg or msg.get("role") == "tool":
                messages.pop(i)
        while len(messages) > self.max_messages:
            # index 0 is the system message; 1 and 2 are the oldest exchange
            messages.pop(1)
            messages.pop(1)
        return messages

    def append_qa_pair(self, question: str, results: str) -> None:
        """Reference :141-154 — custom-operation entries never persist:
        EVERY append first evicts all existing custom entries (they describe
        one-off runs, stale the moment anything newer lands)."""
        self.qa_pairs = [
            p
            for p in self.qa_pairs
            if not any(ident in p["task"] for ident in CUSTOM_IDENTIFIERS)
        ]
        self.qa_pairs.append({"task": question, "result": results})

    def format_qa_pairs(self) -> str:
        """Reference :156-180 — trims to the last ``max_qa_pairs`` (the trim
        is persistent, matching the reference's in-place slice) and renders
        the numbered history block used in Theorist/planner prompts."""
        if not self.qa_pairs:
            return "No previous analyses."
        if len(self.qa_pairs) > self.max_qa_pairs:
            self.qa_pairs = self.qa_pairs[-self.max_qa_pairs :]
        out = ["Previous Analyses:"]
        for i, pair in enumerate(self.qa_pairs, 1):
            out.append(f"\n{i}. Task: {pair['task']}")
            lines = [ln for ln in pair["result"].split("\n") if ln.strip()]
            out.append("Result:\n" + "\n".join(lines))
            if i < len(self.qa_pairs):
                out.append("-" * 5)
        return "\n".join(out)
