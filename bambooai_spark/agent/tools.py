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

Additions mirroring the reference's SmartSearchOrchestrator
(google_search.py:40-90, 301-377):

- ``Action: <name>: <input>`` lines are accepted as an alternative call
  syntax (the reference's action_re) — dispatched positionally.
- ``calculate`` — the reference feeds the action input to bare ``eval``
  (google_search.py:370-377); ``safe_calculate`` keeps the contract but
  evaluates on an AST whitelist (arithmetic operators + a fixed math
  function table, no names, no attributes, no subscripts).
- search fallback — the reference switches search backends via
  WEB_SEARCH_MODE (``google_ai`` grounded search vs the scraping
  pipeline); here a failing ``google_search`` falls back to a registered
  ``grounded_search`` tool with the same query, inside the same loop.
"""

from __future__ import annotations

import ast
import json
import math
import operator
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
        "name": "calculate",
        "description": "Evaluate an arithmetic expression.",
        "parameters": {
            "type": "object",
            "properties": {
                "expression": {
                    "type": "string",
                    "description": "Arithmetic expression, e.g. (17.5*4)/3",
                }
            },
            "required": ["expression"],
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
# reference SmartSearchOrchestrator.action_re (google_search.py:41)
_ACTION_RE = re.compile(r"^Action: (\w+): (.*)$", re.MULTILINE)

# ---------------------------------------------------------------- calculate

_BIN_OPS = {
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.FloorDiv: operator.floordiv,
    ast.Mod: operator.mod,
    ast.Pow: operator.pow,
}
_UNARY_OPS = {ast.UAdd: operator.pos, ast.USub: operator.neg}
_CALC_FUNCS: dict[str, Callable] = {
    "abs": abs,
    "round": round,
    "min": min,
    "max": max,
    "sqrt": math.sqrt,
    "log": math.log,
    "log10": math.log10,
    "exp": math.exp,
    "sin": math.sin,
    "cos": math.cos,
    "tan": math.tan,
}
_CALC_NAMES = {"pi": math.pi, "e": math.e}
_POW_LIMIT = 1_000  # |exponent| cap — bare eval would accept 9**9**9
# magnitude cap on every INTERMEDIATE integer: the per-pow exponent cap
# alone is defeated by nesting (((2**1000)**1000)**1000 keeps each exponent
# legal while the value explodes), so each result is also size-checked
_MAX_INT_BITS = 4_096


def _checked(value):
    if isinstance(value, int) and value.bit_length() > _MAX_INT_BITS:
        raise ValueError(f"intermediate result exceeds {_MAX_INT_BITS} bits")
    return value


def _calc_eval(node: ast.AST):
    """Recursive evaluator over the whitelisted AST — no compile/eval, so
    nothing outside this walk can ever execute (the reference calculator is
    a bare ``eval(code)``, google_search.py:370-377; same contract, safe)."""
    if isinstance(node, ast.Expression):
        return _calc_eval(node.body)
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float)) and not isinstance(
            node.value, bool
        ):
            return _checked(node.value)
        raise ValueError(f"non-numeric constant {node.value!r}")
    if isinstance(node, ast.BinOp) and type(node.op) in _BIN_OPS:
        left, right = _calc_eval(node.left), _calc_eval(node.right)
        if isinstance(node.op, ast.Pow):
            if abs(right) > _POW_LIMIT:
                raise ValueError(
                    f"exponent out of range (|exp| <= {_POW_LIMIT})"
                )
            if (
                isinstance(left, int)
                and isinstance(right, int)
                and right > 0
                and abs(left) > 1
                and (abs(left).bit_length() - 1) * right > _MAX_INT_BITS
            ):
                # predict the blow-up instead of computing it: bit_length of
                # |left|**right is ~ right * log2|left|
                raise ValueError(
                    f"intermediate result exceeds {_MAX_INT_BITS} bits"
                )
        return _checked(_BIN_OPS[type(node.op)](left, right))
    if isinstance(node, ast.UnaryOp) and type(node.op) in _UNARY_OPS:
        return _UNARY_OPS[type(node.op)](_calc_eval(node.operand))
    if isinstance(node, ast.Call):
        if (
            isinstance(node.func, ast.Name)
            and node.func.id in _CALC_FUNCS
            and not node.keywords
        ):
            return _CALC_FUNCS[node.func.id](
                *[_calc_eval(a) for a in node.args]
            )
        raise ValueError("only whitelisted math functions may be called")
    if isinstance(node, ast.Name):
        if node.id in _CALC_NAMES:
            return _CALC_NAMES[node.id]
        raise ValueError(f"unknown name {node.id!r}")
    raise ValueError(f"disallowed syntax: {type(node).__name__}")


def safe_calculate(expression: str) -> str:
    """AST-whitelisted arithmetic eval; returns the result (or the error)
    as a string — the reference calculator's observable contract."""
    try:
        tree = ast.parse(expression.strip(), mode="eval")
        return str(_calc_eval(tree))
    except (ValueError, SyntaxError, ZeroDivisionError, OverflowError,
            TypeError) as e:
        return str(e)


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


def parse_action_line(response: str) -> tuple[str, str] | None:
    """→ (action, raw input) for the reference's ``Action: name: input``
    syntax (google_search.py:79-82 takes the FIRST matching line)."""
    m = _ACTION_RE.search(response)
    return (m.group(1), m.group(2)) if m else None


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
    response is returned as-is).

    Two call syntaxes are accepted — the fenced ```tool_call JSON block
    (kwargs dispatch) and the reference's ``Action: name: input`` line
    (positional dispatch). ``calculate`` is always available (the
    reference registers its Calculator unconditionally,
    google_search.py:52-57); a registered tool of the same name wins. A
    ``google_search`` tool that RAISES falls back to a registered
    ``grounded_search`` backend with the same arguments — the reference's
    alternative search mode behind one dispatch."""
    transcript = user
    response = llm(system, transcript)
    for _ in range(max_iters):
        name: str
        args: dict | None
        raw: str | None
        call = parse_tool_call(response)
        if call is not None:
            name, args = call
            raw = None
        else:
            action = parse_action_line(response)
            if action is None:
                return response
            name, raw = action
            args = None

        def _dispatch(fn) -> str:
            return fn(raw) if args is None else fn(**args)

        if name == "calculate" and name not in tools:
            result = safe_calculate(
                raw if raw is not None else args.get("expression", "")
            )
        elif name not in tools:
            result = f"error: unknown tool {name!r}"
        else:
            try:
                result = _dispatch(tools[name])
            except TypeError as e:
                result = f"error: bad arguments for {name}: {e}"
            except Exception as e:  # noqa: BLE001 — backend fallback seam
                if name == "google_search" and "grounded_search" in tools:
                    name = "grounded_search"
                    try:
                        result = _dispatch(tools[name])
                    except Exception as e2:  # noqa: BLE001 — both backends down
                        # stays inside the loop as an error result, like any
                        # other tool failure — the LLM decides what's next
                        result = f"error: {name} failed: {e2}"
                else:
                    result = f"error: {name} failed: {e}"
        transcript = f"{transcript}\n\n[tool {name} returned]\n{result}"
        response = llm(system, transcript)
    return response
