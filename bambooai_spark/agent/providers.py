"""Real-provider LLM adapters (reference ``bambooai/models/*.py`` — the
openai/anthropic/gemini/ollama dispatch clients).

The engine's seam is a plain ``(system, user) -> str`` callable; tests
inject scripted ones. This module proves the seam against the real wire
formats the reference dispatches to:

- ``openai_adapter`` — the public OpenAI chat-completions JSON contract
  (the wire format groq/deepseek/openrouter/vllm in the reference's model
  registry also emulate: ``models/openai_models.py`` and siblings);
- ``openai_compatible_adapter`` + the named family
  (``deepseek/groq/mistral/openrouter/vllm/local_adapter``) — one
  base-URL/key-env parameterization covering every OpenAI-wire variant
  the reference registers (``models/{deepseek,groq,mistral,openrouter,
  vllm,local}_models.py``);
- ``anthropic_adapter`` — the public Anthropic Messages contract
  (top-level ``system``, content-block list, base64 image source —
  reference ``models/anthropic_models.py:33-56`` routes through the same
  shapes via its openai→anthropic message conversion);
- ``gemini_adapter`` — the public Gemini ``generateContent`` contract
  (``system_instruction`` + ``contents``/``parts`` with ``inline_data``
  blobs — reference ``models/gemini_models.py:33-90``);
- ``ollama_adapter`` — ollama's OpenAI-compatible ``/v1/chat/completions``
  endpoint (reference ``models/ollama_models.py``); same body/response as
  openai, localhost base URL, no key.

Transport is injectable so each contract is testable with recorded
fixtures and no network; the default transports POST with the key from
the provider's standard env var and are only exercised when
``BAMBOOAI_SPARK_LIVE_LLM`` is set (integration-skipped otherwise — this
sandbox has no keys).

Structured image parts (see orchestrator.LLM) map to each provider's
image form: OpenAI data-URL ``image_url``, Anthropic base64 ``source``
block, Gemini ``inline_data`` blob.
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


def ollama_adapter(
    model: str = "llama3.1",
    transport: Transport | None = None,
    base_url: str | None = None,
):
    """Ollama serves the OpenAI chat-completions contract locally with no
    API key (reference ``models/ollama_models.py``) — same request/response
    as :func:`openai_adapter`, different endpoint and no auth header.

    ``OLLAMA_BASE_URL`` is the *default* only — an explicitly passed
    ``base_url`` always wins over the environment."""
    if base_url is None:
        base_url = os.environ.get(
            "OLLAMA_BASE_URL", "http://localhost:11434/v1/chat/completions"
        )

    def _local_transport(body: dict) -> dict:
        import urllib.request

        req = urllib.request.Request(
            base_url,
            data=json.dumps(body).encode("utf-8"),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read().decode("utf-8"))

    send = transport or _local_transport

    def llm(system: str, user) -> str:
        return parse_response(send(build_request(model, system, user)))

    return llm


# ---- OpenAI-compatible provider family ------------------------------------
# The reference's deepseek/groq/mistral/openrouter/vllm registries
# (models/{deepseek,groq,mistral,openrouter,vllm}_models.py) all speak the
# OpenAI chat-completions wire with a different base URL + key env var —
# one parameterized factory covers the family.


def openai_compatible_adapter(
    base_url: str,
    *,
    model: str,
    api_key_env: str | None = None,
    api_key: str | None = None,
    extra_headers: dict[str, str] | None = None,
    transport: Transport | None = None,
    timeout: float = 120.0,
):
    """→ an engine LLM callable for ANY OpenAI-wire endpoint.

    ``api_key`` wins over ``api_key_env``; with neither, no Authorization
    header is sent (self-hosted endpoints). ``extra_headers`` rides along
    for providers wanting attribution headers (e.g. openrouter)."""

    def _transport(body: dict) -> dict:
        import urllib.request  # noqa: PLC0415

        headers = {"Content-Type": "application/json"}
        key = api_key
        if key is None and api_key_env:
            key = os.environ.get(api_key_env)
            if not key:
                raise RuntimeError(f"{api_key_env} is not set")
        if key:
            headers["Authorization"] = f"Bearer {key}"
        headers.update(extra_headers or {})
        req = urllib.request.Request(
            base_url,
            data=json.dumps(body).encode("utf-8"),
            headers=headers,
        )
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read().decode("utf-8"))

    send = transport or _transport

    def llm(system: str, user) -> str:
        return parse_response(send(build_request(model, system, user)))

    return llm


def deepseek_adapter(model: str = "deepseek-chat", **kw):
    """DeepSeek (reference models/deepseek_models.py:12-19 — OpenAI client
    pointed at api.deepseek.com with DEEPSEEK_API_KEY)."""
    return openai_compatible_adapter(
        os.environ.get(
            "DEEPSEEK_BASE_URL", "https://api.deepseek.com/chat/completions"
        ),
        model=model,
        api_key_env="DEEPSEEK_API_KEY",
        **kw,
    )


def groq_adapter(model: str = "llama-3.3-70b-versatile", **kw):
    """Groq (reference models/groq_models.py:11-16 — GROQ_API_KEY; Groq's
    public OpenAI-compatible endpoint)."""
    return openai_compatible_adapter(
        os.environ.get(
            "GROQ_BASE_URL",
            "https://api.groq.com/openai/v1/chat/completions",
        ),
        model=model,
        api_key_env="GROQ_API_KEY",
        **kw,
    )


def mistral_adapter(model: str = "mistral-large-latest", **kw):
    """Mistral (reference models/mistral_models.py:7-12 — MISTRAL_API_KEY;
    Mistral's public chat-completions endpoint is OpenAI-shaped)."""
    return openai_compatible_adapter(
        os.environ.get(
            "MISTRAL_BASE_URL", "https://api.mistral.ai/v1/chat/completions"
        ),
        model=model,
        api_key_env="MISTRAL_API_KEY",
        **kw,
    )


def openrouter_adapter(model: str = "openrouter/auto", **kw):
    """OpenRouter (reference models/openrouter_models.py:12-18 —
    OPENROUTER_API_KEY against openrouter.ai/api/v1)."""
    return openai_compatible_adapter(
        os.environ.get(
            "OPENROUTER_BASE_URL",
            "https://openrouter.ai/api/v1/chat/completions",
        ),
        model=model,
        api_key_env="OPENROUTER_API_KEY",
        **kw,
    )


def vllm_adapter(model: str = "default", **kw):
    """vLLM server (reference models/vllm_models.py:12-22 — localhost:8000
    or the REMOTE_VLLM host, dummy key 'EMPTY')."""
    return openai_compatible_adapter(
        os.environ.get(
            "REMOTE_VLLM", "http://localhost:8000/v1/chat/completions"
        ),
        model=model,
        api_key="EMPTY",
        **kw,
    )


def gemini_openai_adapter(model: str = "gemini-2.0-flash", **kw):
    """Gemini over the OpenAI wire (reference
    models/gemini_models_openai.py:12-19 — the OpenAI client pointed at
    Google's public OpenAI-compat endpoint
    ``generativelanguage.googleapis.com/v1beta/openai/`` with
    GEMINI_API_KEY as the bearer token). The NATIVE-wire twin is
    :func:`gemini_adapter`; this one exists because the reference ships
    both and some proxies only speak the OpenAI shape."""
    return openai_compatible_adapter(
        os.environ.get(
            "GEMINI_OPENAI_BASE_URL",
            "https://generativelanguage.googleapis.com/v1beta/openai/"
            "chat/completions",
        ),
        model=model,
        api_key_env="GEMINI_API_KEY",
        **kw,
    )


def local_adapter(model: str = "local", **kw):
    """Self-hosted OpenAI-compatible endpoint, no key (the Spark-side
    substitution for the reference's in-process transformers pipeline,
    models/local_models.py — llama.cpp/tgi/vllm all serve this wire)."""
    return openai_compatible_adapter(
        os.environ.get(
            "LOCAL_LLM_BASE_URL",
            "http://localhost:8080/v1/chat/completions",
        ),
        model=model,
        **kw,
    )


def convert_messages_to_alpaca(messages: list[dict]) -> str:
    """OpenAI-shaped message list → Alpaca instruction format, the
    reference's prompt rewrite for in-process WizardCoder/Phind models
    (models/local_models.py:16-40): system text verbatim, user turns as
    ``### Instruction:``, assistant turns as ``### Response:``; any
    ``Example Output:`` tail is stripped (the reference found the model
    interprets example code instead of generating) and a trailing user
    turn gets an empty ``### Response:`` to complete.

    Reference-parity quirk, kept deliberately: the strip is GLOBAL over
    the formatted string (local_models.py:34 applies ``re.sub(...,
    flags=re.S)`` after formatting), so in a multi-turn history
    everything after the FIRST ``Example Output:`` marker is dropped —
    including later turns. The adapter's own calls are two-message
    (system + user), where the quirk only trims the intended tail."""
    import re  # noqa: PLC0415

    formatted = ""
    last_role = None
    for item in messages:
        role, content = item["role"], item["content"]
        if role == "system":
            formatted += content + "\n"
        elif role == "user":
            formatted += "### Instruction: " + content + "\n"
        elif role == "assistant":
            formatted += "### Response: " + content + "\n"
        last_role = role
    formatted = re.sub(r"Example Output:.*", "", formatted, flags=re.S)
    if last_role == "user":
        formatted += "### Response:\n"
    return formatted


def transformers_local_adapter(
    model: str = "WizardLM/WizardCoder-15B-V1.0",
    *,
    pipe=None,
    max_length: int = 16_000,
):
    """In-process HF-transformers provider — the faithful analog of the
    reference's ``local_models.llm_stream`` (models/local_models.py:1-60,
    the last provider family without one; :func:`local_adapter` remains
    the served-endpoint substitution). Import-gated like the
    Pinecone/Qdrant backends: ``transformers``/``torch`` load lazily on
    the first call, 4-bit nf4 double-quant unless an 80 GB+ GPU is
    present (float16 then), generation with the reference's sampling
    params (top_k=1, repetition_penalty=1.1, return_full_text=False).

    ``pipe`` injects a ready text-generation pipeline (prompt →
    ``[{"generated_text": ...}]``) — the contract-test seam, and the way
    to reuse one loaded model across adapters."""

    def _load():
        try:
            import torch  # noqa: PLC0415
            from transformers import (  # noqa: PLC0415
                AutoModelForCausalLM,
                AutoTokenizer,
                BitsAndBytesConfig,
                pipeline,
            )
        except ImportError as exc:
            raise RuntimeError(
                "transformers_local_adapter needs the 'transformers' and "
                "'torch' packages; install them, or serve the model over "
                "an OpenAI-compatible endpoint and use local_adapter()"
            ) from exc
        big_gpu = (
            torch.cuda.is_available()
            and torch.cuda.get_device_properties(0).total_memory / 1e9 >= 80
        )
        cfg = (
            {"torch_dtype": torch.float16}
            if big_gpu
            else {
                "quantization_config": BitsAndBytesConfig(
                    load_in_4bit=True,
                    bnb_4bit_quant_type="nf4",
                    bnb_4bit_use_double_quant=True,
                    bnb_4bit_compute_dtype=torch.bfloat16,
                )
            }
        )
        m = AutoModelForCausalLM.from_pretrained(
            model, trust_remote_code=True, device_map="auto", **cfg
        )
        m.eval()
        tok = AutoTokenizer.from_pretrained(model, use_fast=True)
        return (
            pipeline("text-generation", model=m, tokenizer=tok),
            {
                "do_sample": True,
                "top_k": 1,
                "num_return_sequences": 1,
                "eos_token_id": tok.eos_token_id,
                "max_length": max_length,
                "repetition_penalty": 1.1,
                "return_full_text": False,
            },
        )

    state: dict = {}

    def llm(system: str, user) -> str:
        content = _content_for(user)
        if not isinstance(content, str):
            # text-only models: keep the text parts, drop images
            content = "\n".join(
                p["text"] for p in content if p.get("type") == "text"
            )
        prompt = convert_messages_to_alpaca(
            [
                {"role": "system", "content": system},
                {"role": "user", "content": content},
            ]
        )
        if pipe is not None:
            result = pipe(prompt)
        else:
            if "pipe" not in state:
                state["pipe"], state["kw"] = _load()
            result = state["pipe"](prompt, **state["kw"])
        return result[0]["generated_text"]

    return llm


# ---- Anthropic Messages contract -----------------------------------------

ANTHROPIC_URL = "https://api.anthropic.com/v1/messages"
ANTHROPIC_VERSION = "2023-06-01"


def _anthropic_content(user) -> str | list[dict]:
    if isinstance(user, str):
        return user
    out: list[dict] = []
    for part in user:
        if part.get("type") == "text":
            out.append({"type": "text", "text": part["text"]})
        elif part.get("type") == "image":
            out.append(
                {
                    "type": "image",
                    "source": {
                        "type": "base64",
                        "media_type": "image/png",
                        "data": part["data"],
                    },
                }
            )
    return out


def anthropic_build_request(
    model: str, system: str, user, max_tokens: int = 4096
) -> dict:
    """Messages-API body: system is a TOP-LEVEL field, not a message role
    (the conversion the reference does in ``convert_openai_to_anthropic``,
    anthropic_models.py:30-43)."""
    return {
        "model": model,
        "max_tokens": max_tokens,
        "system": system,
        "messages": [{"role": "user", "content": _anthropic_content(user)}],
    }


def anthropic_parse_response(resp: dict) -> str:
    """First text block of the content list (reference reads
    ``response.content[0].text``, anthropic_models.py:52); skips any
    non-text blocks rather than mis-indexing them."""
    for block in resp["content"]:
        if block.get("type", "text") == "text":
            return block["text"]
    raise KeyError("no text block in Anthropic response content")


def _anthropic_transport(body: dict) -> dict:
    import urllib.request

    key = os.environ.get("ANTHROPIC_API_KEY")
    if not key:
        raise RuntimeError("ANTHROPIC_API_KEY is not set")
    req = urllib.request.Request(
        os.environ.get("ANTHROPIC_BASE_URL", ANTHROPIC_URL),
        data=json.dumps(body).encode("utf-8"),
        headers={
            "Content-Type": "application/json",
            "x-api-key": key,
            "anthropic-version": ANTHROPIC_VERSION,
        },
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read().decode("utf-8"))


def anthropic_adapter(
    model: str = "claude-sonnet-4-20250514",
    transport: Transport | None = None,
    max_tokens: int = 4096,
):
    """→ an engine LLM callable speaking the Anthropic Messages contract."""
    send = transport or _anthropic_transport

    def llm(system: str, user) -> str:
        return anthropic_parse_response(
            send(anthropic_build_request(model, system, user, max_tokens))
        )

    return llm


# ---- Gemini generateContent contract -------------------------------------

GEMINI_URL = (
    "https://generativelanguage.googleapis.com/v1beta/models/"
    "{model}:generateContent"
)


def _gemini_parts(user) -> list[dict]:
    if isinstance(user, str):
        return [{"text": user}]
    out: list[dict] = []
    for part in user:
        if part.get("type") == "text":
            out.append({"text": part["text"]})
        elif part.get("type") == "image":
            out.append(
                {
                    "inline_data": {
                        "mime_type": "image/png",
                        "data": part["data"],
                    }
                }
            )
    return out


def gemini_build_request(system: str, user) -> dict:
    """generateContent body: ``system_instruction`` + user ``contents`` of
    typed parts (text / inline_data blob — the shapes the reference builds
    in ``convert_openai_to_gemini``, gemini_models.py:33-57)."""
    return {
        "system_instruction": {"parts": [{"text": system}]},
        "contents": [{"role": "user", "parts": _gemini_parts(user)}],
    }


def gemini_parse_response(resp: dict) -> str:
    parts = resp["candidates"][0]["content"]["parts"]
    texts = [p["text"] for p in parts if "text" in p]
    if not texts:
        raise KeyError("no text part in Gemini response")
    return "".join(texts)


def gemini_adapter(
    model: str = "gemini-2.0-flash", transport: Transport | None = None
):
    """→ an engine LLM callable speaking the Gemini REST contract. The
    model name rides in the URL, so the default transport closes over it;
    injected fake transports receive only the body (model-independent)."""

    def _transport(body: dict) -> dict:
        import urllib.request

        key = os.environ.get("GEMINI_API_KEY") or os.environ.get(
            "GOOGLE_API_KEY"
        )
        if not key:
            raise RuntimeError("GEMINI_API_KEY is not set")
        url = os.environ.get(
            "GEMINI_BASE_URL", GEMINI_URL.format(model=model)
        )
        req = urllib.request.Request(
            url,
            data=json.dumps(body).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "x-goog-api-key": key,
            },
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read().decode("utf-8"))

    send = transport or _transport

    def llm(system: str, user) -> str:
        return gemini_parse_response(send(gemini_build_request(system, user)))

    return llm
