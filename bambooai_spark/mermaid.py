"""Mermaid graph generators (reference A21, bambooai/utils.py:400-846).

Compact reimplementation of the two renderers — YAML data model → entity
graph, YAML plan → flowchart — emitting valid mermaid with the same
semantic content (hierarchy, keys, measurements, relationships; plan
sections with step lists). The reference's 440 lines are mostly styling;
styling parity is a non-goal, content parity is tested.
"""

from __future__ import annotations

import re

import yaml


def _sid(s: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", str(s))


def _label(s: str) -> str:
    out = str(s).replace('"', "'")
    return out if len(out) <= 60 else out[:57] + "..."


def generate_model_graph(yaml_string: str) -> str:
    """Data-model YAML (hierarchy/keys/measurements/relationships — the
    Dataframe Inspector's IR, default_prompts.yaml:1020-1110) → mermaid
    ``graph TD``."""
    data = yaml.safe_load(yaml_string) or {}
    lines = ["graph TD"]

    def walk(node, parent_id: str | None):
        if isinstance(node, dict):
            name = node.get("name")
            nid = _sid(name) if name else parent_id
            if name:
                extra = [
                    f"{k}: {node[k]}"
                    for k in ("type", "dataset_source_identifier", "units")
                    if node.get(k)
                ]
                text = "<br/>".join([f"<b>{_label(name)}</b>"] + [_label(e) for e in extra])
                lines.append(f'    {nid}["{text}"]')
                if parent_id and parent_id != nid:
                    lines.append(f"    {parent_id} --> {nid}")
            for k, v in node.items():
                if isinstance(v, (dict, list)):
                    walk(v, nid)
        elif isinstance(node, list):
            for item in node:
                walk(item, parent_id)

    for section, content in (data.items() if isinstance(data, dict) else []):
        sec_id = _sid(section)
        lines.append(f'    {sec_id}(["{_label(section)}"])')
        walk(content, sec_id)

    for rel in (data.get("relationships") or []) if isinstance(data, dict) else []:
        if isinstance(rel, dict) and rel.get("from") and rel.get("to"):
            lbl = _label(rel.get("type", "relates"))
            lines.append(f'    {_sid(rel["from"])} -- "{lbl}" --> {_sid(rel["to"])}')
    return "\n".join(lines)


def generate_plan_graph(yaml_string: str) -> str:
    """Plan YAML (the Planner's IR: problem_reflection / data_operations /
    analysis_steps / ... ) → mermaid ``graph TB`` flowchart with one
    subgraph per section and chained step nodes."""
    data = yaml.safe_load(yaml_string) or {}
    lines = ["graph TB", "    A[Plan]"]
    for section, content in (data.items() if isinstance(data, dict) else []):
        sec_id = _sid(section)
        lines.append(f"    A --> {sec_id}")
        lines.append(f'    subgraph {sec_id}["{_label(section)}"]')
        if isinstance(content, list):
            prev = None
            for i, item in enumerate(content):
                nid = f"{sec_id}_{i}"
                lines.append(f'        {nid}["{_label(item)}"]')
                if prev:
                    lines.append(f"        {prev} --> {nid}")
                prev = nid
        elif content is not None:
            lines.append(f'        {sec_id}_v["{_label(content)}"]')
        lines.append("    end")
    return "\n".join(lines)
