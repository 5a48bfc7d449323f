"""Restricted numeric-expression evaluator — the Painless-sandbox analog.

The reference's `script` / `script_score` queries run Painless, which is a
real sandbox precisely because scripts arrive inside client query dicts
(modules/lang-painless/). Python ``eval`` with an empty ``__builtins__`` is
NOT a sandbox (``().__class__.__bases__[0].__subclasses__()`` escapes it), so
query-supplied expressions are parsed with ``ast`` and walked against an
explicit whitelist instead: arithmetic / comparison / boolean-bitwise
operators, numeric constants, whitelisted names, and calls to whitelisted
functions only. Attribute access, subscripts, lambdas, comprehensions and
starred/keyword call forms are rejected outright.
"""

from __future__ import annotations

import ast
from typing import Any, Mapping

__all__ = ["ScriptError", "safe_eval_expr"]


class ScriptError(ValueError):
    """A query-supplied script failed validation or evaluation."""


_BINOPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.FloorDiv: lambda a, b: a // b,
    ast.Mod: lambda a, b: a % b,
    ast.Pow: lambda a, b: a ** b,
    # & and | double as vectorized and/or over boolean arrays
    ast.BitAnd: lambda a, b: a & b,
    ast.BitOr: lambda a, b: a | b,
    ast.BitXor: lambda a, b: a ^ b,
}

_UNARY = {
    ast.USub: lambda a: -a,
    ast.UAdd: lambda a: +a,
    ast.Invert: lambda a: ~a,
    ast.Not: lambda a: ~a if hasattr(a, "dtype") else (not a),
}

_CMPOPS = {
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
}


def _eval_node(node: ast.AST, env: Mapping[str, Any]) -> Any:
    if isinstance(node, ast.Expression):
        return _eval_node(node.body, env)
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float, bool)):
            return node.value
        raise ScriptError(f"non-numeric constant {node.value!r}")
    if isinstance(node, ast.Name):
        if node.id not in env:
            raise ScriptError(f"unknown name '{node.id}'")
        return env[node.id]
    if isinstance(node, ast.BinOp):
        fn = _BINOPS.get(type(node.op))
        if fn is None:
            raise ScriptError(f"operator {type(node.op).__name__} not allowed")
        return fn(_eval_node(node.left, env), _eval_node(node.right, env))
    if isinstance(node, ast.UnaryOp):
        fn = _UNARY.get(type(node.op))
        if fn is None:
            raise ScriptError(f"operator {type(node.op).__name__} not allowed")
        return fn(_eval_node(node.operand, env))
    if isinstance(node, ast.Compare):
        left = _eval_node(node.left, env)
        result = None
        for op, comp in zip(node.ops, node.comparators):
            fn = _CMPOPS.get(type(op))
            if fn is None:
                raise ScriptError(
                    f"comparison {type(op).__name__} not allowed")
            right = _eval_node(comp, env)
            part = fn(left, right)
            result = part if result is None else (result & part)
            left = right
        return result
    if isinstance(node, ast.BoolOp):
        # vectorized: and -> &, or -> | (operands are boolean arrays/scalars)
        vals = [_eval_node(v, env) for v in node.values]
        out = vals[0]
        for v in vals[1:]:
            out = (out & v) if isinstance(node.op, ast.And) else (out | v)
        return out
    if isinstance(node, ast.IfExp):
        # evaluated non-lazily; fine for pure numeric expressions
        test = _eval_node(node.test, env)
        body = _eval_node(node.body, env)
        orelse = _eval_node(node.orelse, env)
        if hasattr(test, "dtype"):
            import numpy as np

            return np.where(test, body, orelse)
        return body if test else orelse
    if isinstance(node, ast.Call):
        if not isinstance(node.func, ast.Name):
            raise ScriptError("only direct calls to whitelisted functions")
        if node.keywords:
            raise ScriptError("keyword arguments not allowed")
        fn = env.get(node.func.id)
        if fn is None or not callable(fn):
            raise ScriptError(f"unknown function '{node.func.id}'")
        return fn(*[_eval_node(a, env) for a in node.args])
    raise ScriptError(f"syntax {type(node).__name__} not allowed")


# ---------------------------------------------------------------------------
# stored scripts — the _scripts/{id} API analog (script/StoredScriptSource,
# cluster-state script metadata). The registry lives in the submitting
# process; resolve ids to sources BEFORE shipping queries to searcher actors
# (inline_stored_scripts), mirroring how the reference compiles stored
# scripts from cluster state that every node already holds.

_STORED: dict[str, str] = {}


def put_stored_script(script_id: str, source: str) -> None:
    """Store a script, validating at store time like the reference's
    compile-on-store (PutStoredScriptRequest)."""
    ast.parse(source, mode="eval")  # syntax gate now, not at first use
    _STORED[script_id] = source


def get_stored_script(script_id: str) -> str | None:
    return _STORED.get(script_id)


def delete_stored_script(script_id: str) -> None:
    _STORED.pop(script_id, None)


def resolve_script(spec: Any) -> str:
    """str | {'source': s} | {'id': i} -> expression source."""
    if isinstance(spec, str):
        return spec
    if isinstance(spec, Mapping):
        if "source" in spec:
            src = spec["source"]
            if spec.get("lang") == "expression":
                src = compile_expression(src)
            return src
        if "id" in spec:
            src = _STORED.get(spec["id"])
            if src is None:
                raise ScriptError(f"stored script [{spec['id']}] not found")
            return src
    raise ScriptError("script must be a string or a {source}/{id} object")


def inline_stored_scripts(q: Any) -> Any:
    """Recursively replace {'script': {'id': ...}} with the stored source —
    call on the driver before shipping a query tree to searcher actors
    (whose processes don't share this registry)."""
    if isinstance(q, dict):
        out = {}
        for k, v in q.items():
            if k == "script":
                out[k] = resolve_script(v)
            else:
                out[k] = inline_stored_scripts(v)
        return out
    if isinstance(q, list):
        return [inline_stored_scripts(v) for v in q]
    return q


def safe_eval_expr(expr: str, env: Mapping[str, Any]) -> Any:
    """Evaluate a numeric expression against `env` under the whitelist.

    `env` maps names to numpy arrays / scalars / whitelisted callables.
    Raises ScriptError on any disallowed construct (attribute access,
    subscripts, f-strings, comprehensions, non-numeric literals, ...).
    """
    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError as e:
        raise ScriptError(f"invalid expression: {e}") from e
    return _eval_node(tree, env)


def _find_top(s: str, ch: str, start: int = 0) -> int:
    depth = 0
    for i in range(start, len(s)):
        c = s[i]
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == ch and depth == 0:
            return i
    return -1


def _rewrite_parens(s: str) -> str:
    """Rewrite ternaries inside each top-level parenthesized group."""
    out = []
    i = 0
    while i < len(s):
        if s[i] == "(":
            depth = 1
            j = i + 1
            while j < len(s) and depth:
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                j += 1
            out.append("(" + _rewrite_ternary(s[i + 1:j - 1]) + ")")
            i = j
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _rewrite_ternary(s: str) -> str:
    """Right-associative `c ? a : b` -> `where((c), (a), (b))`."""
    q = _find_top(s, "?")
    if q < 0:
        return _rewrite_parens(s) if "?" in s else s
    # matching ':' at top level, skipping nested ternaries in the then-branch
    depth = 0
    nested = 0
    c_idx = -1
    for i in range(q + 1, len(s)):
        c = s[i]
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "?" and depth == 0:
            nested += 1
        elif c == ":" and depth == 0:
            if nested == 0:
                c_idx = i
                break
            nested -= 1
    if c_idx < 0:
        raise ScriptError(f"unbalanced ternary in expression: {s!r}")
    cond = _rewrite_ternary(s[:q])
    then = _rewrite_ternary(s[q + 1:c_idx])
    other = _rewrite_ternary(s[c_idx + 1:])
    return f"where(({cond}), ({then}), ({other}))"


def compile_expression(source: str) -> str:
    """Lucene-expression syntax (modules/lang-expression,
    ExpressionScriptEngine.java) -> the sandbox dialect: `doc['f'].value`
    becomes a bare field name, `&&`/`||` become the vectorized `&`/`|`,
    the ternary becomes a `where(...)` call."""
    import re

    src = re.sub(r"doc\[\s*['\"]([A-Za-z_][\w.]*)['\"]\s*\]\.value",
                 r"\1", source)
    # 'and'/'or', NOT '&'/'|': the bitwise forms bind tighter than
    # comparisons in the sandbox AST, mis-grouping `a > 1 && b > 2`; the
    # BoolOp handler vectorizes and/or over arrays
    src = src.replace("&&", " and ").replace("||", " or ")
    return _rewrite_ternary(src)
