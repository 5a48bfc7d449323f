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
        if isinstance(node.value, (int, float, bool, str)):
            return node.value
        raise ScriptError(f"constant {node.value!r} not allowed")
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
        if isinstance(node.func, ast.Attribute):
            # Painless String/Java method calls on values — the attr name
            # must be in the explicit method whitelist; arbitrary
            # attribute access stays rejected (sandbox escape vector)
            if node.keywords:
                raise ScriptError("keyword arguments not allowed")
            attr = node.func.attr
            if attr not in _STR_METHODS:
                raise ScriptError(f"method '.{attr}()' not allowed")
            recv = _eval_node(node.func.value, env)
            args = [_eval_node(a, env) for a in node.args]
            return _str_method(attr, recv, args)
        if not isinstance(node.func, ast.Name):
            raise ScriptError("only direct calls to whitelisted functions")
        if node.keywords:
            raise ScriptError("keyword arguments not allowed")
        fn = env.get(node.func.id)
        if fn is None or not callable(fn):
            raise ScriptError(f"unknown function '{node.func.id}'")
        return fn(*[_eval_node(a, env) for a in node.args])
    if isinstance(node, ast.Attribute):
        # ONLY `params.<key>` map access (Painless script params) — the
        # receiver must literally be the name `params` bound to a plain
        # mapping; everything else (object attributes, dunders) rejected
        if (isinstance(node.value, ast.Name) and node.value.id == "params"
                and isinstance(env.get("params"), Mapping)):
            p = env["params"]
            if node.attr not in p:
                raise ScriptError(f"unknown param '{node.attr}'")
            return p[node.attr]
        raise ScriptError("attribute access not allowed")
    raise ScriptError(f"syntax {type(node).__name__} not allowed")


# Painless String (java.lang.String + Painless augmentation) method
# whitelist — each lowered to a vectorized pandas .str kernel when the
# receiver is an array, plain Python when scalar.
_STR_METHODS = frozenset({
    "contains", "startsWith", "endsWith", "substring", "toLowerCase",
    "toUpperCase", "trim", "length", "indexOf", "equals", "replace",
    "isEmpty",
})


def _str_method(attr: str, recv: Any, args: list) -> Any:
    import numpy as np

    vec = isinstance(recv, np.ndarray)
    if vec:
        import pandas as pd

        s = pd.Series(recv, copy=False).astype(str)
        if attr == "contains":
            return s.str.contains(args[0], regex=False).to_numpy()
        if attr == "startsWith":
            return s.str.startswith(args[0]).to_numpy()
        if attr == "endsWith":
            return s.str.endswith(args[0]).to_numpy()
        if attr == "substring":
            # Java semantics: begin inclusive, end exclusive
            end = args[1] if len(args) > 1 else None
            return s.str.slice(args[0], end).to_numpy(dtype=object)
        if attr == "toLowerCase":
            return s.str.lower().to_numpy(dtype=object)
        if attr == "toUpperCase":
            return s.str.upper().to_numpy(dtype=object)
        if attr == "trim":
            return s.str.strip().to_numpy(dtype=object)
        if attr == "length":
            return s.str.len().to_numpy(dtype=np.int64)
        if attr == "indexOf":
            return s.str.find(args[0]).to_numpy(dtype=np.int64)
        if attr == "equals":
            return (s == args[0]).to_numpy()
        if attr == "replace":
            return s.str.replace(args[0], args[1],
                                 regex=False).to_numpy(dtype=object)
        if attr == "isEmpty":
            return (s.str.len() == 0).to_numpy()
    else:
        r = str(recv)
        if attr == "contains":
            return args[0] in r
        if attr == "startsWith":
            return r.startswith(args[0])
        if attr == "endsWith":
            return r.endswith(args[0])
        if attr == "substring":
            return r[args[0]:args[1]] if len(args) > 1 else r[args[0]:]
        if attr == "toLowerCase":
            return r.lower()
        if attr == "toUpperCase":
            return r.upper()
        if attr == "trim":
            return r.strip()
        if attr == "length":
            return len(r)
        if attr == "indexOf":
            return r.find(args[0])
        if attr == "equals":
            return r == args[0]
        if attr == "replace":
            return r.replace(args[0], args[1])
        if attr == "isEmpty":
            return len(r) == 0
    raise ScriptError(f"method '.{attr}()' not allowed")


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
    inq: str | None = None  # ' or " while inside a string literal
    for i in range(start, len(s)):
        c = s[i]
        if inq:
            if c == inq and s[i - 1] != "\\":
                inq = None
        elif c in "'\"":
            inq = c
        elif c in "([":
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
    # matching ':' at top level, skipping nested ternaries in the
    # then-branch and ? / : inside string literals
    depth = 0
    nested = 0
    c_idx = -1
    inq: str | None = None
    for i in range(q + 1, len(s)):
        c = s[i]
        if inq:
            if c == inq and s[i - 1] != "\\":
                inq = None
        elif c in "'\"":
            inq = c
        elif c in "([":
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


def compile_painless(source: str) -> str:
    """Painless expression subset (modules/lang-painless) -> the sandbox
    dialect. Covers the single-expression script bodies real users write
    in script_score / script fields / script queries:

      doc['f'].value              -> bare field name (doc-values access)
      doc['f'].value.contains(..) -> whitelisted String method call
      params.x                    -> params map access (AST-gated)
      a ? b : c                   -> where((a), (b), (c)) (vectorized)
      && || !                     -> and / or / not (vectorized BoolOp)

    Statements (`def x = ...;`, loops, returns) are NOT supported — the
    analog is expression-scoped by design; the sandbox architecture
    (AST whitelist, no attribute escape) is the contract, the surface
    grows method-by-method."""
    import re

    src = source.strip().rstrip(";")
    if src.startswith("return "):
        src = src[len("return "):]
    src = re.sub(r"doc\[\s*['\"]([A-Za-z_][\w.]*)['\"]\s*\]\.value",
                 r"\1", src)
    src = src.replace("&&", " and ").replace("||", " or ")
    # Painless `!cond` -> `not cond` (but leave `!=` alone)
    src = re.sub(r"!(?!=)", " not ", src)
    return _rewrite_ternary(src).strip()


def _split_statements(src: str) -> list[str]:
    """Split on top-level ';' (quote- and paren-aware)."""
    out, buf, depth = [], [], 0
    inq: str | None = None
    for ch in src:
        if inq:
            buf.append(ch)
            if ch == inq and (len(buf) < 2 or buf[-2] != "\\"):
                inq = None
        elif ch in "'\"":
            inq = ch
            buf.append(ch)
        elif ch in "([":
            depth += 1
            buf.append(ch)
        elif ch in ")]":
            depth -= 1
            buf.append(ch)
        elif ch == ";" and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return [s for s in out if s]


_DECL_RX = None  # compiled lazily in compile_painless_script


def compile_painless_script(source: str) -> list[tuple[str | None, str]]:
    """Painless STATEMENT subset -> [(local_name | None, expr_src), ...].

    Covers the multi-statement script bodies real users write:

      def base = doc['f'].value / 100.0;      # local declaration
      double bonus = cond ? 0.5 : 0.0;        # typed declaration
      base = base * 2;                        # reassignment
      return base + bonus;                    # final return / bare expr

    Each statement's right-hand side goes through the same expression
    rewriting as compile_painless; evaluation binds locals progressively
    (safe_eval_script). Loops / if-blocks / method-def are NOT supported
    — the sandbox stays expression-scoped per statement."""
    import re

    global _DECL_RX
    if _DECL_RX is None:
        _DECL_RX = re.compile(
            r"^(?:def|int|long|float|double|boolean|String)\s+"
            r"([A-Za-z_]\w*)\s*=\s*(.+)$", re.S)
    out: list[tuple[str | None, str]] = []
    stmts = _split_statements(source)
    for i, st in enumerate(stmts):
        if st.startswith("return "):
            if i != len(stmts) - 1:
                raise ScriptError("return must be the final statement")
            out.append((None, compile_painless(st[len("return "):])))
            continue
        m = _DECL_RX.match(st)
        if m:
            out.append((m.group(1), compile_painless(m.group(2))))
            continue
        am = re.match(r"^([A-Za-z_]\w*)\s*=(?!=)\s*(.+)$", st, re.S)
        if am:
            out.append((am.group(1), compile_painless(am.group(2))))
            continue
        if i == len(stmts) - 1:
            out.append((None, compile_painless(st)))
        else:
            raise ScriptError(f"unsupported statement: {st!r}")
    if not out or out[-1][0] is not None:
        raise ScriptError("script must end in a return / expression")
    return out


def safe_eval_script(stmts: list[tuple[str | None, str]],
                     env: Mapping[str, Any]) -> Any:
    """Evaluate a compile_painless_script statement list: locals bind
    progressively into a copy of env (never mutating the caller's), the
    final expression's value is returned."""
    scope = dict(env)
    result = None
    for name, expr in stmts:
        val = safe_eval_expr(expr, scope)
        if name is None:
            result = val
        else:
            scope[name] = val
    return result


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
