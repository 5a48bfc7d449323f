"""ES|QL scalar-expression engine: tokenizer + Pratt parser + pyarrow
lowering.

Reference surface: x-pack/plugin/esql expression grammar
(EsqlBaseParser.g4 booleanExpression / operatorExpression /
primaryExpression) and the scalar function registry
(x-pack/plugin/esql/src/main/java/.../expression/function/
EsqlFunctionRegistry.java). From-scratch implementation: every
expression compiles to a closure `pa.Table -> pa.Array` built from
vectorized pyarrow.compute kernels — evaluation is one kernel call per
AST node per batch, never a Python loop over rows.

Supported grammar:
  literals        42, -3.5, "str", TRUE, FALSE, NULL
  columns         bare identifiers (dotted names allowed)
  arithmetic      + - * / (MOD(a,b) as a function)
  comparison      == != > >= < <=
  boolean         NOT, AND, OR (usual precedence), parentheses
  predicates      x IN (a, b, c) / NOT IN, x LIKE "wild*card?",
                  x RLIKE "regex", x IS NULL / IS NOT NULL
  functions       ABS ROUND SQRT FLOOR CEIL POW LOG10 MOD GREATEST LEAST
                  LENGTH TO_UPPER TO_LOWER TRIM LTRIM RTRIM CONCAT
                  SUBSTRING LEFT RIGHT REPLACE STARTS_WITH ENDS_WITH
                  LOCATE SPLIT REVERSE
                  TO_INTEGER TO_DOUBLE TO_STRING TO_LONG
                  DATE_TRUNC DATE_EXTRACT
                  CASE COALESCE
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RX = re.compile(r"""
    (?P<ws>\s+)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<num>\d+\.\d+|\d+|\.\d+)
  | (?P<op>==|!=|>=|<=|[><+\-*/(),])
  | (?P<name>[A-Za-z_][\w.]*)
""", re.X)

_KEYWORDS = {"AND", "OR", "NOT", "IN", "LIKE", "RLIKE", "IS", "NULL",
             "TRUE", "FALSE"}


def tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RX.match(src, pos)
        if not m:
            raise ValueError(f"bad ES|QL expression at {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "name" and text.upper() in _KEYWORDS:
            out.append((text.upper(), text))
        else:
            out.append((kind, text))
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------- parser

class _Parser:
    """Pratt parser -> tuple AST.

    Nodes: ("lit", v) ("col", name) ("not"|"and"|"or", ...)
           ("cmp", op, l, r) ("arith", op, l, r) ("neg", x)
           ("in", x, [lits], negated) ("like"|"rlike", x, pat, negated)
           ("isnull", x, negated) ("call", NAME, [args])
    """

    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind and v != kind:
            raise ValueError(f"expected {kind}, got {v!r}")
        return v

    def parse(self):
        node = self.or_expr()
        if self.peek()[0] != "eof":
            raise ValueError(f"trailing tokens at {self.peek()[1]!r}")
        return node

    def or_expr(self):
        node = self.and_expr()
        while self.peek()[0] == "OR":
            self.next()
            node = ("or", node, self.and_expr())
        return node

    def and_expr(self):
        node = self.not_expr()
        while self.peek()[0] == "AND":
            self.next()
            node = ("and", node, self.not_expr())
        return node

    def not_expr(self):
        if self.peek()[0] == "NOT":
            self.next()
            return ("not", self.not_expr())
        return self.predicate()

    def predicate(self):
        node = self.additive()
        k, v = self.peek()
        negated = False
        if k == "NOT":
            self.next()
            k, v = self.peek()
            if k not in ("IN", "LIKE", "RLIKE"):
                raise ValueError(f"expected IN/LIKE/RLIKE after NOT, got {v!r}")
            negated = True
        if k == "op" and v in ("==", "!=", ">", ">=", "<", "<="):
            self.next()
            return ("cmp", v, node, self.additive())
        if k == "IN":
            self.next()
            self.expect("(")
            lits = [self.additive()]
            while self.peek()[1] == ",":
                self.next()
                lits.append(self.additive())
            self.expect(")")
            return ("in", node, lits, negated)
        if k in ("LIKE", "RLIKE"):
            self.next()
            pk, pv = self.next()
            if pk != "str":
                raise ValueError("LIKE/RLIKE pattern must be a string literal")
            return (k.lower(), node, _unquote(pv), negated)
        if k == "IS":
            self.next()
            neg = False
            if self.peek()[0] == "NOT":
                self.next()
                neg = True
            self.expect("NULL")
            return ("isnull", node, neg)
        return node

    def additive(self):
        node = self.multiplicative()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = ("arith", op, node, self.multiplicative())
        return node

    def multiplicative(self):
        node = self.unary()
        while self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            node = ("arith", op, node, self.unary())
        return node

    def unary(self):
        if self.peek()[1] == "-":
            self.next()
            return ("neg", self.unary())
        return self.primary()

    def primary(self):
        k, v = self.next()
        if v == "(":
            node = self.or_expr()
            self.expect(")")
            return node
        if k == "num":
            return ("lit", float(v) if "." in v else int(v))
        if k == "str":
            return ("lit", _unquote(v))
        if k == "TRUE":
            return ("lit", True)
        if k == "FALSE":
            return ("lit", False)
        if k == "NULL":
            return ("lit", None)
        if k == "name":
            if self.peek()[1] == "(":
                self.next()
                args = []
                if self.peek()[1] != ")":
                    args.append(self.or_expr())
                    while self.peek()[1] == ",":
                        self.next()
                        args.append(self.or_expr())
                self.expect(")")
                return ("call", v.upper(), args)
            return ("col", v)
        raise ValueError(f"unexpected token {v!r}")


def _unquote(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s[1:-1])


def parse_expr(src: str):
    return _Parser(tokenize(src)).parse()


# ---------------------------------------------------------------- lowering

_CMP_KERNEL = {"==": pc.equal, "!=": pc.not_equal, ">": pc.greater,
               ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal}
_ARITH_KERNEL = {"+": pc.add, "-": pc.subtract, "*": pc.multiply,
                 "/": pc.divide}


def _wild_to_regex(pat: str) -> str:
    """ES|QL LIKE wildcards: * = any run, ? = one char (WildcardLike)."""
    out = "^"
    for ch in pat:
        out += ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
    return out + "$"


def _as_array(v, n: int):
    """Broadcast a Python scalar result to length n when needed."""
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v
    return pa.array([v] * n)


def _is_scalar(node) -> bool:
    if node[0] == "lit":
        return True
    if node[0] in ("neg",):
        return _is_scalar(node[1])
    return False


def _scalar_value(node):
    if node[0] == "lit":
        return node[1]
    if node[0] == "neg":
        return -_scalar_value(node[1])
    raise ValueError("not a scalar")


def evaluate(node, t: pa.Table):
    """Evaluate an AST against a batch; returns pa array/chunked array or a
    Python scalar (for pure-literal subtrees)."""
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "col":
        name = node[1]
        if name not in t.column_names:
            raise KeyError(f"unknown column {name!r}")
        return t[name]
    if kind == "neg":
        v = evaluate(node[1], t)
        return -v if not isinstance(v, (pa.Array, pa.ChunkedArray)) \
            else pc.negate(v)
    if kind == "arith":
        left = evaluate(node[2], t)
        right = evaluate(node[3], t)
        return _ARITH_KERNEL[node[1]](left, right)
    if kind == "cmp":
        return _CMP_KERNEL[node[1]](evaluate(node[2], t),
                                    evaluate(node[3], t))
    if kind == "and":
        return pc.and_kleene(evaluate(node[1], t), evaluate(node[2], t))
    if kind == "or":
        return pc.or_kleene(evaluate(node[1], t), evaluate(node[2], t))
    if kind == "not":
        return pc.invert(evaluate(node[1], t))
    if kind == "in":
        arr = evaluate(node[1], t)
        vals = [_scalar_value(x) for x in node[2]]
        mask = pc.is_in(arr, value_set=pa.array(vals))
        return pc.invert(mask) if node[3] else mask
    if kind == "like":
        arr = evaluate(node[1], t)
        mask = pc.match_substring_regex(arr, _wild_to_regex(node[2]))
        return pc.invert(mask) if node[3] else mask
    if kind == "rlike":
        arr = evaluate(node[1], t)
        mask = pc.match_substring_regex(arr, "^(?:" + node[2] + ")$")
        return pc.invert(mask) if node[3] else mask
    if kind == "isnull":
        arr = evaluate(node[1], t)
        return pc.is_valid(arr) if node[2] else pc.is_null(arr)
    if kind == "call":
        return _call(node[1], node[2], t)
    raise ValueError(f"bad AST node {kind}")


def _call(name: str, args, t: pa.Table):
    a = [evaluate(x, t) for x in args]

    def arr0():
        for v in a:
            if isinstance(v, (pa.Array, pa.ChunkedArray)):
                return v
        raise ValueError(f"{name} needs at least one column argument")

    if name == "ABS":
        return pc.abs(a[0])
    if name == "SQRT":
        return pc.sqrt(a[0])
    if name == "FLOOR":
        return pc.floor(a[0])
    if name == "CEIL":
        return pc.ceil(a[0])
    if name == "LOG10":
        return pc.log10(a[0])
    if name == "POW":
        return pc.power(a[0], a[1])
    if name == "ROUND":
        nd = a[1] if len(a) > 1 else 0
        # ES Maths.round rounds half away from zero; pyarrow names that
        # mode "half_towards_infinity".
        return pc.round(a[0], ndigits=int(nd),
                        round_mode="half_towards_infinity")
    if name == "MOD":
        # no modulo kernel in pyarrow: a - (a // b) * b (trunc division)
        q = pc.divide(a[0], a[1])
        if pa.types.is_floating(q.type):
            q = pc.trunc(q)
        return pc.subtract(a[0], pc.multiply(q, a[1]))
    if name == "GREATEST":
        return pc.max_element_wise(*a)
    if name == "LEAST":
        return pc.min_element_wise(*a)
    if name == "LENGTH":
        return pc.utf8_length(a[0])
    if name == "TO_UPPER":
        return pc.utf8_upper(a[0])
    if name == "TO_LOWER":
        return pc.utf8_lower(a[0])
    if name == "TRIM":
        return pc.utf8_trim_whitespace(a[0])
    if name == "LTRIM":
        return pc.utf8_ltrim_whitespace(a[0])
    if name == "RTRIM":
        return pc.utf8_rtrim_whitespace(a[0])
    if name == "REVERSE":
        return pc.utf8_reverse(a[0])
    if name == "CONCAT":
        n = len(t)
        parts = [v if isinstance(v, (pa.Array, pa.ChunkedArray))
                 else _as_array(str(v), n) for v in a]
        return pc.binary_join_element_wise(*parts, "")
    if name == "SUBSTRING":
        # ES|QL SUBSTRING(str, start, [len]) is 1-based
        start = int(a[1]) - 1 if int(a[1]) > 0 else int(a[1])
        stop = None if len(a) < 3 else (start + int(a[2]))
        return pc.utf8_slice_codeunits(a[0], start, stop)
    if name == "LEFT":
        return pc.utf8_slice_codeunits(a[0], 0, int(a[1]))
    if name == "RIGHT":
        return pc.utf8_slice_codeunits(a[0], -int(a[1]), None)
    if name == "REPLACE":
        return pc.replace_substring_regex(a[0], pattern=a[1],
                                          replacement=a[2])
    if name == "STARTS_WITH":
        return pc.starts_with(a[0], pattern=a[1])
    if name == "ENDS_WITH":
        return pc.ends_with(a[0], pattern=a[1])
    if name == "LOCATE":
        # 1-based index of substring, 0 when absent (EsqlFunctionRegistry)
        return pc.add(pc.find_substring(a[0], pattern=a[1]), 1)
    if name == "SPLIT":
        return pc.split_pattern(a[0], a[1])
    if name == "TO_INTEGER" or name == "TO_LONG":
        v = a[0]
        if isinstance(v, (pa.Array, pa.ChunkedArray)) and \
                pa.types.is_floating(v.type):
            v = pc.trunc(v)
        return pc.cast(v, pa.int64())
    if name == "TO_DOUBLE":
        return pc.cast(a[0], pa.float64())
    if name == "TO_STRING":
        return pc.cast(a[0], pa.string())
    if name == "DATE_TRUNC":
        unit = a[0] if isinstance(a[0], str) else str(a[0])
        return pc.floor_temporal(a[1], unit=unit.lower())
    if name == "DATE_EXTRACT":
        unit = (a[0] if isinstance(a[0], str) else str(a[0])).lower()
        fns = {"year": pc.year, "month": pc.month, "day": pc.day,
               "hour": pc.hour, "minute": pc.minute, "second": pc.second,
               "day_of_week": pc.day_of_week, "day_of_year": pc.day_of_year}
        return pc.cast(fns[unit](a[1]), pa.int64())
    if name == "CASE":
        # CASE(c1, v1, c2, v2, ..., [default]) -> chained if_else
        n = len(t)
        default = a[-1] if len(a) % 2 == 1 else None
        pairs = list(zip(a[:-1:2], a[1::2])) if len(a) % 2 == 1 \
            else list(zip(a[::2], a[1::2]))
        out = default if isinstance(default, (pa.Array, pa.ChunkedArray)) \
            else _as_array(default, n)
        for cond, val in reversed(pairs):
            val = val if isinstance(val, (pa.Array, pa.ChunkedArray)) \
                else _as_array(val, n)
            out = pc.if_else(cond, val, out)
        return out
    if name == "COALESCE":
        n = len(t)
        arrs = [v if isinstance(v, (pa.Array, pa.ChunkedArray))
                else _as_array(v, n) for v in a]
        # NULL literals arrive null-typed; cast them to the first real type
        # so the coalesce kernel has a concrete signature.
        target = next((v.type for v in arrs
                       if not pa.types.is_null(v.type)), None)
        if target is not None:
            arrs = [v.cast(target) if pa.types.is_null(v.type) else v
                    for v in arrs]
        out = arrs[0]
        for v in arrs[1:]:
            out = pc.coalesce(out, v)
        return out
    raise ValueError(f"unsupported ES|QL function {name}")


def to_dataset_filter(src: str):
    """Lower a WHERE AST to a pyarrow.dataset expression for scan-time
    pushdown (parquet row-group statistics pruning — the analog of the
    reference's PointRangeQuery/BKD skip at the Lucene segment level).
    Returns None when any node has no dataset-expression equivalent
    (functions, LIKE, arithmetic on columns, ...) — the caller then
    falls back to the per-batch kernel filter."""
    import pyarrow.dataset as pads

    def lower(node):
        kind = node[0]
        if kind == "cmp":
            left, right = _operand(node[2]), _operand(node[3])
            if left is None or right is None:
                return None
            op = node[1]
            return {"==": left.__eq__, "!=": left.__ne__,
                    ">": left.__gt__, ">=": left.__ge__,
                    "<": left.__lt__, "<=": left.__le__}[op](right)
        if kind == "and":
            a, b = lower(node[1]), lower(node[2])
            return a & b if a is not None and b is not None else None
        if kind == "or":
            a, b = lower(node[1]), lower(node[2])
            return a | b if a is not None and b is not None else None
        if kind == "not":
            a = lower(node[1])
            return ~a if a is not None else None
        if kind == "in":
            if node[1][0] != "col":
                return None
            expr = pads.field(node[1][1]).isin(
                [_scalar_value(x) for x in node[2]])
            return ~expr if node[3] else expr
        if kind == "isnull":
            if node[1][0] != "col":
                return None
            expr = pads.field(node[1][1]).is_null()
            return ~expr if node[2] else expr
        return None

    def _operand(node):
        if node[0] == "col":
            return pads.field(node[1])
        if _is_scalar(node):
            return pads.scalar(_scalar_value(node))
        return None

    try:
        return lower(parse_expr(src))
    except Exception:
        return None


def compile_predicate(src: str):
    """WHERE body -> (pa.Table -> pa.Table) batch filter."""
    ast = parse_expr(src)

    def f(t: pa.Table) -> pa.Table:
        mask = evaluate(ast, t)
        if not isinstance(mask, (pa.Array, pa.ChunkedArray)):
            return t if mask else t.slice(0, 0)
        return t.filter(mask)

    return f


def compile_eval(name: str, src: str):
    """EVAL name = expr -> (pa.Table -> pa.Table) column appender."""
    ast = parse_expr(src)

    def f(t: pa.Table) -> pa.Table:
        v = evaluate(ast, t)
        if not isinstance(v, (pa.Array, pa.ChunkedArray)):
            v = _as_array(v, len(t))
        if name in t.column_names:
            t = t.remove_column(t.column_names.index(name))
        return t.append_column(name, v)

    return f
