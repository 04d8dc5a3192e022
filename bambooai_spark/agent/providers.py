"""Real-provider LLM adapters (reference ``bambooai/models/*.py`` — the
openai/anthropic/gemini/ollama dispatch clients).

The engine's seam is a plain ``(system, user) -> str`` callable; tests
inject scripted ones. This module proves the seam against a real wire
format: ``openai_adapter`` produces a callable that speaks the public
OpenAI chat-completions JSON contract (the one wire format every provider
in the reference's model registry also emulates — ollama, groq, deepseek
all serve it).

Transport is injectable so the contract is testable with recorded
fixtures and no network; the default transport POSTs with the key from
``OPENAI_API_KEY`` and is only exercised when ``BAMBOOAI_SPARK_LIVE_LLM``
is set (integration-skipped otherwise — this sandbox has no keys).

Structured image parts (see orchestrator.LLM) map to the provider's
``image_url`` data-URL form.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

OPENAI_URL = "https://api.openai.com/v1/chat/completions"

Transport = Callable[[dict], dict]


def _content_for(user) -> str | list[dict]:
    """Engine user payload → OpenAI message content. Plain strings pass
    through; [text, image] part lists become the provider's multimodal
    content array."""
    if isinstance(user, str):
        return user
    out: list[dict] = []
    for part in user:
        if part.get("type") == "text":
            out.append({"type": "text", "text": part["text"]})
        elif part.get("type") == "image":
            out.append(
                {
                    "type": "image_url",
                    "image_url": {
                        "url": "data:image/png;base64," + part["data"]
                    },
                }
            )
    return out


def build_request(model: str, system: str, user) -> dict:
    """The chat-completions request body for one engine LLM call."""
    return {
        "model": model,
        "messages": [
            {"role": "system", "content": system},
            {"role": "user", "content": _content_for(user)},
        ],
    }


def parse_response(resp: dict) -> str:
    """Extract the assistant text; raises KeyError/IndexError on a body
    that doesn't meet the contract (surfaced, not swallowed — a malformed
    provider response should fail loudly, not look like prose)."""
    return resp["choices"][0]["message"]["content"]


def _default_transport(body: dict) -> dict:
    """POST to the public endpoint with the env key. Import-gated and only
    reachable when the caller explicitly opted in."""
    import urllib.request

    key = os.environ.get("OPENAI_API_KEY")
    if not key:
        raise RuntimeError("OPENAI_API_KEY is not set")
    req = urllib.request.Request(
        os.environ.get("OPENAI_BASE_URL", OPENAI_URL),
        data=json.dumps(body).encode("utf-8"),
        headers={
            "Content-Type": "application/json",
            "Authorization": f"Bearer {key}",
        },
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read().decode("utf-8"))


def openai_adapter(
    model: str = "gpt-4o-mini", transport: Transport | None = None
):
    """→ an engine LLM callable speaking the OpenAI wire contract.

    ``transport`` defaults to the real HTTP POST; inject a fake for
    contract tests (it receives the request body dict, returns the parsed
    response body dict)."""
    send = transport or _default_transport

    def llm(system: str, user) -> str:
        return parse_response(send(build_request(model, system, user)))

    return llm
