"""Response parsing — the reference's IR extraction contracts
(bambooai/messages/reg_ex.py:151-231) kept byte-compatible: YAML inside
```yaml fences (or bare), with regex fallbacks on malformed output."""

from __future__ import annotations

import re

import yaml


def extract_yaml_block(response: str) -> str:
    """Last fenced YAML block, else YAML-root-keyed content, else ''
    (reference _extract_plan/_extract_data_model semantics)."""
    segs = re.findall(r"```(?:yaml\s*)?(.*?)\s*```", response, re.DOTALL)
    if segs:
        return segs[-1]
    rooted = re.findall(
        r"^([a-zA-Z_][a-zA-Z0-9_]*:(?:\n(?:[ ]{2}.*|\n)*)+)", response, re.MULTILINE
    )
    return "\n".join(rooted) if rooted else ""


def _load_yaml(response: str) -> dict | None:
    segs = re.findall(r"```(?:yaml\s*)?(.*?)\s*```", response, re.DOTALL)
    content = segs[0] if segs else response
    try:
        data = yaml.safe_load(content)
        return data if isinstance(data, dict) else None
    except yaml.YAMLError:
        return None


def extract_expert(response: str) -> tuple[str | None, bool | None, int | None]:
    """→ (expert, requires_dataset, confidence); regex fallback on the
    expert name (reference _extract_expert)."""
    data = _load_yaml(response)
    if data is not None:
        try:
            return data["expert"], data["requires_dataset"], data["confidence"]
        except KeyError:
            pass
    m = re.search(r"Data Analyst|Research Specialist", response)
    return (m.group() if m else None), None, None


def extract_analyst(response: str) -> tuple:
    """→ (analyst, unknown, condition, data_descr, intent_breakdown)
    (reference _extract_analyst)."""
    data = _load_yaml(response)
    if data is not None:
        try:
            return (
                data["analyst"],
                data["unknown"],
                data["condition"],
                data.get("data"),
                data["intent_breakdown"],
            )
        except KeyError:
            pass
    m = re.search(r"Data Analyst DF|Data Analyst Generic", response)
    return (m.group() if m else None), None, None, None, None
