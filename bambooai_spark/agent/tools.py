"""Agent tool contracts + dispatch loop (reference
bambooai/messages/tools_definition.py:1-198 and the provider dispatch loops,
e.g. models/anthropic_models.py:153-227).

The reference defines two tools — ``google_search`` and
``request_user_context`` — in three provider-specific schema dialects and
dispatches inside each provider client. Here the schema is one
provider-agnostic dict (adapters can reshape it) and dispatch is a single
loop over an injected ``tools`` registry, so the engine never imports a
provider SDK: the LLM callable returns either prose or a fenced
```tool_call JSON block, and the loop feeds tool results back until prose
arrives or ``max_iters`` is hit (the reference's ReAct bound,
google_search.py:18 MAX_ITERATIONS=5).
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable

MAX_ITERATIONS = 5  # reference google_search.py:18

TOOL_DEFINITIONS: list[dict] = [
    {
        "name": "google_search",
        "description": "Search the web for current information.",
        "parameters": {
            "type": "object",
            "properties": {
                "search_query": {
                    "type": "string",
                    "description": "The search query",
                }
            },
            "required": ["search_query"],
        },
    },
    {
        "name": "request_user_context",
        "description": "Ask the user a clarifying question.",
        "parameters": {
            "type": "object",
            "properties": {
                "query_clarification": {
                    "type": "string",
                    "description": "The clarifying question for the user",
                },
                "context_needed": {
                    "type": "string",
                    "description": "Why the context is needed",
                },
            },
            "required": ["query_clarification", "context_needed"],
        },
    },
]

_TOOL_CALL_RE = re.compile(r"```tool_call\s*\n(.*?)```", re.DOTALL)


def parse_tool_call(response: str) -> tuple[str, dict] | None:
    """→ (tool_name, arguments) if the response is a tool call, else None.
    Malformed JSON inside a tool_call fence returns None (treated as prose,
    matching the reference's lenient parse-or-fallthrough)."""
    m = _TOOL_CALL_RE.search(response)
    if not m:
        return None
    try:
        data = json.loads(m.group(1))
        return data["tool"], data.get("arguments", {})
    except (json.JSONDecodeError, KeyError, TypeError):
        return None


def run_tool_loop(
    llm: Callable[[str, str], str],
    system: str,
    user: str,
    tools: dict[str, Callable[..., str]],
    *,
    max_iters: int = MAX_ITERATIONS,
) -> str:
    """ReAct loop: call the LLM, dispatch any tool call, append the result,
    repeat until a prose answer or the iteration bound (then the last
    response is returned as-is)."""
    transcript = user
    response = llm(system, transcript)
    for _ in range(max_iters):
        call = parse_tool_call(response)
        if call is None:
            return response
        name, args = call
        if name not in tools:
            result = f"error: unknown tool {name!r}"
        else:
            try:
                result = tools[name](**args)
            except TypeError as e:
                result = f"error: bad arguments for {name}: {e}"
        transcript = f"{transcript}\n\n[tool {name} returned]\n{result}"
        response = llm(system, transcript)
    return response
