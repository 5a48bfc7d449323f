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
  arithmetic      + - * / % (MOD(a,b) as a function)
  comparison      == != > >= < <=
  boolean         NOT, AND, OR (usual precedence), parentheses
  predicates      x IN (a, b, c) / NOT IN, x LIKE "wild*card?",
                  x RLIKE "regex", x IS NULL / IS NOT NULL
  functions       ABS ROUND SQRT FLOOR CEIL POW LOG10 MOD GREATEST LEAST
                  EXP LOG SIN COS TAN ASIN ACOS ATAN ATAN2 SIGNUM CBRT
                  SINH COSH TANH TO_RADIANS TO_DEGREES
                  E PI TAU HYPOT SCALB COPY_SIGN ROUND_TO
                  LENGTH TO_UPPER TO_LOWER TRIM LTRIM RTRIM CONCAT
                  SUBSTRING LEFT RIGHT REPLACE STARTS_WITH ENDS_WITH
                  LOCATE SPLIT REVERSE REPEAT SPACE
                  BIT_LENGTH BYTE_LENGTH TO_BASE64 FROM_BASE64
                  MD5 SHA1 SHA256 HASH
                  TO_INTEGER TO_DOUBLE TO_STRING TO_LONG
                  DATE_TRUNC DATE_EXTRACT DATE_DIFF DATE_FORMAT DATE_PARSE
                  CASE COALESCE
  multivalue      MV_COUNT MV_MIN MV_MAX MV_SUM MV_AVG MV_MEDIAN
                  MV_FIRST MV_LAST MV_CONCAT MV_DEDUPE MV_SORT MV_SLICE
                  MV_APPEND MV_ZIP MV_PERCENTILE
                  MV_PSERIES_WEIGHTED_SUM MV_MEDIAN_ABSOLUTE_DEVIATION
"""

from __future__ import annotations

import base64
import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RX = re.compile(r"""
    (?P<ws>\s+)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<num>\d+\.\d+|\d+|\.\d+)
  | (?P<op>==|!=|>=|<=|::|[><+\-*/%(),\[\]])
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
            if self.peek()[1] == "(":
                # pattern list (8.16): col LIKE ("a*", "b*") — any-match
                self.next()
                pats = []
                while True:
                    pk, pv = self.next()
                    if pk != "str":
                        raise ValueError(
                            "LIKE/RLIKE patterns must be string literals")
                    pats.append(_unquote(pv))
                    if self.peek()[1] == ",":
                        self.next()
                        continue
                    break
                self.expect(")")
                return (k.lower(), node, pats, negated)
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
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            node = ("arith", op, node, self.unary())
        return node

    def unary(self):
        if self.peek()[1] == "-":
            self.next()
            return ("neg", self.unary())
        return self.postfix()

    def postfix(self):
        # `expr::type` inline cast (esql 8.14, EsqlBaseParser
        # primaryExpression CAST_OP dataType) — sugar for the TO_* call
        node = self.primary()
        while self.peek()[1] == "::":
            self.next()
            k, v = self.next()
            fn = _CAST_FNS.get(v.lower()) if k == "name" else None
            if fn is None:
                raise ValueError(f"unsupported cast type {v!r}")
            node = ("call", fn, [node])
        return node

    def primary(self):
        k, v = self.next()
        if v == "(":
            node = self.or_expr()
            self.expect(")")
            return node
        if v == "[":
            # dense-vector literal [1.0, 2.0, ...] (esql vector functions)
            items = []
            if self.peek()[1] != "]":
                items.append(self.additive())
                while self.peek()[1] == ",":
                    self.next()
                    items.append(self.additive())
            self.expect("]")
            return ("vlit", items)
        if k == "num":
            # date-period/time-duration literal `<n> <unit>` (EsqlBaseParser
            # qualifiedIntegerLiteral: `NOW() - 20 day`): fixed-width units
            # only, like the date-math grammar
            nk, nv = self.peek()
            if nk == "name" and nv.lower().rstrip("s") in _DUR_UNITS:
                self.next()
                import datetime as _dt

                n = float(v) if "." in v else int(v)
                return ("lit", _dt.timedelta(
                    seconds=n * _DUR_UNITS[nv.lower().rstrip("s")]))
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


_DUR_UNITS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
              "week": 7 * 86400}

# deterministic request clock for NOW() (the reference resolves NOW()
# from the request context; gates and oracles inject the same instant —
# the same convention as the date-math range gate)
ESQL_NOW = "2024-01-25T13:45:00"


# `::type` -> conversion function (EsqlDataTypeConverter: the cast
# operator resolves to the same functions as the TO_* calls)
_CAST_FNS = {
    "long": "TO_LONG", "unsigned_long": "TO_LONG", "int": "TO_INTEGER",
    "integer": "TO_INTEGER", "double": "TO_DOUBLE", "string": "TO_STRING",
    "keyword": "TO_STRING", "text": "TO_STRING", "boolean": "TO_BOOLEAN",
    "bool": "TO_BOOLEAN", "datetime": "TO_DATETIME", "date": "TO_DATETIME",
    "ip": "TO_IP", "version": "TO_VERSION", "geo_point": "TO_GEOPOINT",
    "geo_shape": "TO_GEOSHAPE",
}


def _unquote(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s[1:-1])


def parse_expr(src: str):
    return _Parser(tokenize(src)).parse()


# ---------------------------------------------------------------- lowering

_CMP_KERNEL = {"==": pc.equal, "!=": pc.not_equal, ">": pc.greater,
               ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal}
# `%` is ES|QL Mod (EsqlBaseParser arithmeticBinary) — pyarrow has no
# modulo kernel, so lower to a - floor-div(a, b) * b on the same types
def _pc_mod(a, b):
    q = pc.floor(pc.divide(pc.cast(a, pa.float64()),
                           pc.cast(b, pa.float64())))
    out = pc.subtract(pc.cast(a, pa.float64()), pc.multiply(q, pc.cast(b, pa.float64())))
    at = a.type if isinstance(a, (pa.Array, pa.ChunkedArray)) else None
    if at is not None and pa.types.is_integer(at):
        return pc.cast(out, pa.int64())
    return out


_ARITH_KERNEL = {"+": pc.add, "-": pc.subtract, "*": pc.multiply,
                 "/": pc.divide, "%": _pc_mod}


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
        pats = node[2] if isinstance(node[2], list) else [node[2]]
        rx = "|".join(_wild_to_regex(p) for p in pats)
        mask = pc.match_substring_regex(arr, rx)
        return pc.invert(mask) if node[3] else mask
    if kind == "rlike":
        arr = evaluate(node[1], t)
        pats = node[2] if isinstance(node[2], list) else [node[2]]
        rx = "^(?:" + "|".join(f"(?:{p})" for p in pats) + ")$"
        mask = pc.match_substring_regex(arr, rx)
        return pc.invert(mask) if node[3] else mask
    if kind == "isnull":
        arr = evaluate(node[1], t)
        return pc.is_valid(arr) if node[2] else pc.is_null(arr)
    if kind == "vlit":
        vals = [evaluate(x, t) for x in node[1]]
        if any(isinstance(v, (pa.Array, pa.ChunkedArray)) for v in vals):
            raise ValueError("vector literal elements must be constants")
        return np.asarray(vals, np.float64)
    if kind == "call":
        return _call(node[1], node[2], t)
    raise ValueError(f"bad AST node {kind}")


def _vec_matrix(v) -> np.ndarray:
    """list<float> / fixed_size_list column -> (n, d) float64 matrix.
    Requires constant per-row length (the dense_vector `dims` contract)."""
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    if isinstance(v, np.ndarray):  # already a literal query vector
        return v.reshape(1, -1)
    lens = pc.list_value_length(v).to_numpy(zero_copy_only=False)
    if lens.size == 0:
        return np.empty((0, 0), np.float64)
    d = int(lens[0])
    if not (lens == d).all():
        raise ValueError("vector column has ragged lengths")
    flat = v.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(-1, d)


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
    if name == "INTERVAL":
        # fixed-width INTERVAL literal (x-pack sql INTERVAL arithmetic,
        # expression/literal/interval) -> an Arrow duration scalar;
        # `ts + INTERVAL n UNIT` then rides the ordinary pc.add /
        # pc.subtract kernels. Calendar units (MONTH/YEAR) have no fixed
        # width and are rejected, matching the engine's duration model.
        unit = (a[0] if isinstance(a[0], str) else str(a[0])).lower()
        unit = unit[:-1] if unit.endswith("s") else unit
        scale = {"second": 1_000_000, "minute": 60_000_000,
                 "hour": 3_600_000_000, "day": 86_400_000_000,
                 "week": 604_800_000_000}
        if unit not in scale:
            raise ValueError(f"INTERVAL unit {unit!r} not supported "
                             "(fixed-width second..week only)")
        return pa.scalar(int(a[1]) * scale[unit], pa.duration("us"))
    if name == "DATE_ADD":
        # DATE_ADD('unit', n, ts) (x-pack sql DateAdd function)
        return pc.add(a[2], _call("INTERVAL", args[:2], t))
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
    if name == "EXP":
        return pc.exp(a[0])
    if name == "LOG":
        # LOG(x) natural log; LOG(base, x) two-arg (esql Log function)
        if len(a) == 1:
            return pc.ln(a[0])
        return pc.divide(pc.ln(pc.cast(a[1], pa.float64())),
                         math.log(float(a[0])) if not isinstance(
                             a[0], (pa.Array, pa.ChunkedArray))
                         else pc.ln(pc.cast(a[0], pa.float64())))
    if name in ("SIN", "COS", "TAN", "ASIN", "ACOS", "ATAN"):
        return getattr(pc, name.lower())(pc.cast(a[0], pa.float64()))
    if name in ("SINH", "COSH", "TANH"):
        # Sinh/Cosh/Tanh (8.14) — no pyarrow kernel; one numpy ufunc
        v = np.asarray(pc.cast(a[0], pa.float64()))
        return pa.array(getattr(np, name.lower())(v), pa.float64(),
                        from_pandas=True)
    if name in ("TO_RADIANS", "TO_DEGREES"):
        # ToRadians/ToDegrees: exact pi-ratio scaling, same literal as SQL
        v = pc.cast(a[0], pa.float64())
        k = (math.pi / 180.0) if name == "TO_RADIANS" else (180.0 / math.pi)
        return pc.multiply(v, k)
    if name == "ATAN2":
        n = len(t)
        y = a[0] if isinstance(a[0], (pa.Array, pa.ChunkedArray)) \
            else _as_array(float(a[0]), n)
        x = a[1] if isinstance(a[1], (pa.Array, pa.ChunkedArray)) \
            else _as_array(float(a[1]), n)
        return pc.atan2(pc.cast(y, pa.float64()), pc.cast(x, pa.float64()))
    if name == "SIGNUM":
        return pc.cast(pc.sign(a[0]), pa.float64())
    if name == "CBRT":
        v = arr0().combine_chunks() if isinstance(
            arr0(), pa.ChunkedArray) else arr0()
        return pa.array(np.cbrt(np.asarray(pc.cast(v, pa.float64()))),
                        pa.float64(), from_pandas=True)
    if name == "HYPOT":
        ax = np.asarray(pc.cast(a[0], pa.float64()).combine_chunks()
                        if isinstance(a[0], pa.ChunkedArray)
                        else pc.cast(a[0], pa.float64()))
        ay = np.asarray(pc.cast(a[1], pa.float64()).combine_chunks()
                        if isinstance(a[1], pa.ChunkedArray)
                        else pc.cast(a[1], pa.float64()))
        return pa.array(np.hypot(ax, ay), pa.float64(), from_pandas=True)
    if name == "SCALB":
        # Scalb (8.18 scalar/math/Scalb.java): d * 2^scaleFactor.
        # Multiplying a double by a power of two is exact (exponent
        # shift), so the SQL twin `d * power(2, k)` is bit-identical.
        n = len(t)
        d = np.asarray(pc.cast(
            a[0] if isinstance(a[0], (pa.Array, pa.ChunkedArray))
            else _as_array(a[0], n), pa.float64()).combine_chunks()
            if isinstance(a[0], pa.ChunkedArray) else pc.cast(
                a[0] if isinstance(a[0], (pa.Array, pa.ChunkedArray))
                else _as_array(a[0], n), pa.float64()))
        if isinstance(a[1], (pa.Array, pa.ChunkedArray)):
            k = np.asarray(pc.cast(a[1], pa.int64()))
            return pa.array(d * np.exp2(k.astype(np.float64)),
                            pa.float64(), from_pandas=True)
        return pa.array(d * math.pow(2.0, int(a[1])), pa.float64(),
                        from_pandas=True)
    if name == "COPY_SIGN":
        # CopySign (8.18 scalar/math/CopySign.java): |mag| with sign's
        # sign bit (Java Math.copySign == np.copysign).
        n = len(t)
        mag = np.asarray(pc.cast(
            a[0] if isinstance(a[0], (pa.Array, pa.ChunkedArray))
            else _as_array(a[0], n), pa.float64()))
        sgn = np.asarray(pc.cast(
            a[1] if isinstance(a[1], (pa.Array, pa.ChunkedArray))
            else _as_array(a[1], n), pa.float64()))
        return pa.array(np.copysign(mag, sgn), pa.float64(),
                        from_pandas=True)
    if name == "ROUND_TO":
        # RoundTo (8.18 scalar/math/RoundTo.java): round DOWN to the
        # greatest fixed point <= value; values below the smallest
        # point take the smallest point. Vectorized via searchsorted
        # over the sorted point list (the reference builds the same
        # sorted-array binary search in RoundToDouble).
        pts = np.array(sorted(float(x) for x in a[1:]), dtype=np.float64)
        v = np.asarray(pc.cast(a[0], pa.float64()))
        idx = np.searchsorted(pts, v, side="right") - 1
        out = pts[np.clip(idx, 0, len(pts) - 1)]
        mask = np.isnan(v)
        if mask.any():
            out = out.copy()
            out[mask] = np.nan
        return pa.array(out, pa.float64(), from_pandas=True)
    if name == "E":
        return math.e
    if name == "PI":
        return math.pi
    if name == "TAU":
        return math.tau
    if name == "REPEAT":
        return pc.binary_repeat(a[0], int(a[1]))
    if name == "SPACE":
        reps = a[0] if isinstance(a[0], (pa.Array, pa.ChunkedArray)) \
            else int(a[0])
        return pc.binary_repeat(_as_array(" ", len(t)), reps)
    if name == "BIT_LENGTH":
        return pc.multiply(pc.binary_length(a[0]), 8)
    if name == "BYTE_LENGTH":
        return pc.binary_length(a[0])
    if name == "TO_BASE64":
        # no arrow base64 kernel: per-value codec (3-byte block coding
        # can't be expressed as a batch string kernel)
        vals = a[0].to_pylist()
        return pa.array([None if v is None else
                         base64.b64encode(v.encode()).decode("ascii")
                         for v in vals], pa.string())
    if name == "NOW":
        # request-clock constant (x-pack esql scalar/date/Now.java);
        # deterministic injection via ESQL_NOW, like the date-math gate
        import datetime as _dt

        return _dt.datetime.fromisoformat(ESQL_NOW)
    if name in ("TO_GEOPOINT", "TO_GEOSHAPE", "ST_X", "ST_Y", "ST_DISTANCE",
                "ST_INTERSECTS", "ST_WITHIN", "ST_CONTAINS", "ST_DISJOINT",
                "ST_GEOHASH", "ST_GEOTILE", "ST_GEOHEX",
                "ST_ENVELOPE", "ST_XMIN", "ST_XMAX", "ST_YMIN", "ST_YMAX",
                "TO_CARTESIANPOINT", "TO_CARTESIANSHAPE"):
        # the reference dispatches ST_DISTANCE on the argument's spatial
        # type (geo -> haversine, cartesian -> planar); this evaluator is
        # type-erased, so cartesian-ness is detected syntactically: an
        # inline TO_CARTESIANPOINT/TO_CARTESIANSHAPE in either arg subtree
        cart = _subtree_has_call(args, ("TO_CARTESIANPOINT",
                                        "TO_CARTESIANSHAPE"))
        return _st_call(name, a, t, cartesian=cart)
    if name in ("MD5", "SHA1", "SHA256") or name == "HASH":
        # Md5/Sha1/Sha256 + Hash(alg, input) (esql 8.16,
        # x-pack/plugin/esql .../function/scalar/string/Hash.java) —
        # per-value digest: hashing is inherently per-row (each digest is
        # C code); output is the lowercase hex string, like the reference
        import hashlib
        if name == "HASH":
            alg = (a[0] if isinstance(a[0], str) else str(a[0])).lower()
            col = a[1]
        else:
            alg, col = name.lower(), a[0]
        if alg not in ("md5", "sha1", "sha256", "sha384", "sha512"):
            raise ValueError(f"HASH: unsupported algorithm {alg!r}")
        h = getattr(hashlib, alg)
        vals = col.to_pylist() if isinstance(
            col, (pa.Array, pa.ChunkedArray)) else [col]
        return pa.array([None if v is None else h(v.encode()).hexdigest()
                         for v in vals], pa.string())
    if name == "FROM_BASE64":
        vals = a[0].to_pylist()
        return pa.array([None if v is None else
                         base64.b64decode(v).decode("utf-8", "replace")
                         for v in vals], pa.string())
    if name == "DATE_DIFF":
        # elapsed WHOLE units between start and end (Java
        # ChronoUnit.between — NOT DuckDB's boundary-crossing date_diff)
        unit = (a[0] if isinstance(a[0], str) else str(a[0])).lower()
        micros = {"second": 10**6, "minute": 60 * 10**6,
                  "hour": 3600 * 10**6, "day": 86400 * 10**6,
                  "week": 7 * 86400 * 10**6}[unit.rstrip("s")]
        start, end = a[1], a[2]
        d = pc.cast(pc.cast(pc.subtract(
            pc.cast(end, pa.timestamp("us")),
            pc.cast(start, pa.timestamp("us"))),
            pa.duration("us")), pa.int64())
        # arrow int64 divide truncates toward zero (C semantics) — exactly
        # ChronoUnit.between's whole-elapsed-units behavior
        return pc.divide(d, micros)
    if name == "DATE_FORMAT":
        fmt = a[0] if isinstance(a[0], str) else str(a[0])
        # whole-second precision: arrow %S renders fractional digits on
        # sub-second units, Java "ss" never does
        val = pc.cast(a[1], pa.timestamp("s"), safe=False)
        return pc.strftime(val, format=_java_strftime(fmt))
    if name == "DATE_PARSE":
        fmt = a[0] if isinstance(a[0], str) else str(a[0])
        val = a[1] if isinstance(a[1], (pa.Array, pa.ChunkedArray)) \
            else _as_array(a[1], len(t))
        return pc.strptime(val, format=_java_strftime(fmt), unit="us")
    if name == "CATEGORIZE":
        # esql Categorize grouping function (8.16) — numeric-token
        # wildcarding, same convention as the categorize_text agg
        return pc.replace_substring_regex(a[0], "[0-9]+", "#")
    if name == "TO_DATETIME":
        # string -> ISO parse; number -> epoch MILLIS (esql ToDatetime
        # semantics: numeric input is millis-since-epoch)
        v = a[0]
        typ = v.type if isinstance(v, (pa.Array, pa.ChunkedArray)) else None
        if typ is not None and pa.types.is_string(typ):
            return pc.strptime(v, format="%Y-%m-%dT%H:%M:%S", unit="us")
        ms = pc.cast(v, pa.int64()) if typ is not None else int(v)
        return pc.cast(pc.multiply(ms, 1000), pa.timestamp("us"))
    if name == "TO_DATE_NANOS":
        # ToDateNanos (8.14, date_nanos support in ES|QL): datetime ->
        # nanosecond-precision timestamp; numeric input is NANOS since
        # epoch (unlike TO_DATETIME's millis); string -> ISO parse.
        v = a[0]
        typ = v.type if isinstance(v, (pa.Array, pa.ChunkedArray)) else None
        if typ is not None and pa.types.is_timestamp(typ):
            return pc.cast(v, pa.timestamp("ns"))
        if typ is not None and pa.types.is_string(typ):
            return pc.cast(pc.strptime(v, format="%Y-%m-%dT%H:%M:%S",
                                       unit="us"), pa.timestamp("ns"))
        ns = pc.cast(v, pa.int64()) if typ is not None else int(v)
        return pc.cast(ns, pa.timestamp("ns"))
    if name == "TO_UNSIGNED_LONG":
        # ToUnsignedLong (esql unsigned_long support): u64 cast; an
        # out-of-range value converts to null (ES|QL conversion-failure
        # semantics: null result + response warning, not an error)
        v = a[0]
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            iv = np.asarray(pc.cast(v, pa.int64()))
            mask = (iv < 0) | np.asarray(pc.is_null(v))
            return pa.array(iv.astype(np.uint64), pa.uint64(),
                            mask=mask)
        return None if int(v) < 0 else int(v)
    if name == "TO_BOOLEAN":
        v = a[0]
        typ = v.type if isinstance(v, (pa.Array, pa.ChunkedArray)) else None
        if typ is not None and pa.types.is_string(typ):
            return pc.equal(pc.utf8_lower(v), "true")
        if typ is not None:
            return pc.not_equal(pc.cast(v, pa.float64()), 0.0)
        return bool(v)
    if name == "TO_VERSION":
        return pc.cast(a[0], pa.string()) if isinstance(
            a[0], (pa.Array, pa.ChunkedArray)) else str(a[0])
    if name == "TO_IP":
        # validation-only at this layer: dotted-quad strings pass through
        # canonically (IpFieldMapper stores the packed form; our columnar
        # carrier is the canonical string)
        _ipv4_to_u32(a[0])
        return a[0]
    if name == "CIDR_MATCH":
        # CIDR_MATCH(ip, "block", ...) — true when ip falls in ANY block
        # (esql CIDRMatch, same contract as the `terms` CIDR filter on an
        # ip field). Fully vectorized: one u32 parse + per-block shift-eq.
        v = _ipv4_to_u32(a[0])
        out = None
        for block in a[1:]:
            net, _, plen = str(block).partition("/")
            p = int(plen) if plen else 32
            shift = np.uint32(32 - p)
            netv = _ipv4_to_u32(pa.array([net]))[0] >> shift
            hit = (v >> shift) == netv if p else np.ones(len(v), bool)
            out = hit if out is None else (out | hit)
        return pa.array(out)
    if name == "IP_PREFIX":
        # IP_PREFIX(ip, v4len, v6len) -> network address at that prefix
        # (esql IpPrefix, 8.14); v6 inputs are out of scope (v4 corpus).
        v = _ipv4_to_u32(a[0])
        p = int(a[1])
        masked = (v >> np.uint32(32 - p)) << np.uint32(32 - p) \
            if p else np.zeros(len(v), np.uint32)
        parts = [pc.cast(pa.array(((masked >> s) & 0xFF).astype(np.int64)),
                         pa.string()) for s in (24, 16, 8, 0)]
        return pc.binary_join_element_wise(
            parts[0], parts[1], parts[2], parts[3], ".")
    if name.startswith("MV_"):
        return _mv_call(name, a, t)
    if name.startswith("V_"):
        # dense-vector similarity functions (x-pack esql vector family,
        # 8.19 experimental: VectorSimilarityFunction analogs) — one
        # (n, d) float64 matmul-style kernel per batch, no per-row Python
        A = _vec_matrix(a[0])
        if name == "V_MAGNITUDE":
            return pa.array(np.sqrt((A * A).sum(axis=1)))
        B = _vec_matrix(a[1] if isinstance(a[1], (pa.Array, pa.ChunkedArray,
                                                  np.ndarray))
                        else np.asarray(a[1], np.float64))
        if name == "V_COSINE":
            num = (A * B).sum(axis=1)
            den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
            return pa.array(num / den)
        if name == "V_DOT_PRODUCT":
            return pa.array((A * B).sum(axis=1))
        if name == "V_L1_NORM":
            return pa.array(np.abs(A - B).sum(axis=1))
        if name == "V_L2_NORM":
            return pa.array(np.sqrt(((A - B) ** 2).sum(axis=1)))
        if name == "V_HAMMING":
            return pa.array((A != B).sum(axis=1).astype(np.float64))
        raise ValueError(f"unsupported vector function {name}")
    raise ValueError(f"unsupported ES|QL function {name}")


_WKT_POINT_RX = (r"^\s*POINT\s*\(\s*(?P<x>[-+0-9.eE]+)"
                 r"\s+(?P<y>[-+0-9.eE]+)\s*\)\s*$")


def _wkt_xy(v, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) float64 arrays from a WKT POINT column or scalar literal."""
    if isinstance(v, str):
        from ..geo import parse_wkt

        kind, pt = parse_wkt(v)
        if kind != "point":
            raise ValueError(f"expected a POINT, got {kind}")
        return (np.full(n, pt[0]), np.full(n, pt[1]))
    ex = pc.extract_regex(pc.cast(v, pa.string()), _WKT_POINT_RX)
    x = pc.cast(pc.struct_field(ex, "x"), pa.float64())
    y = pc.cast(pc.struct_field(ex, "y"), pa.float64())
    if pc.any(pc.and_(pc.is_null(x), pc.is_valid(v))).as_py():
        raise ValueError("geo_point column contains non-POINT WKT")
    return (np.asarray(x, np.float64), np.asarray(y, np.float64))


# GeoUtils.EARTH_MEAN_RADIUS (server/src/main/java/org/elasticsearch/
# common/geo/GeoUtils.java) — the radius behind ES|QL StDistance (geo)
_EARTH_MEAN_RADIUS_M = 6371008.7714


def _subtree_has_call(node, names) -> bool:
    """True if any ("call", NAME, ...) with NAME in names appears in the
    AST subtree (args may be a list of nodes)."""
    if isinstance(node, (list, tuple)):
        if (len(node) >= 2 and node[0] == "call"
                and isinstance(node[1], str) and node[1] in names):
            return True
        return any(_subtree_has_call(x, names) for x in node)
    return False


def _st_call(name: str, a, t: pa.Table, cartesian: bool = False):
    """ES|QL spatial function family (8.12-8.16, x-pack/plugin/esql
    .../expression/function/scalar/spatial/{StX,StY,StDistance,
    StIntersects,StWithin,StContains,StDisjoint}.java and .../grid/
    {StGeohash,StGeotile,StGeohex}.java). geo_point/geo_shape values are
    carried as WKT strings (the columnar analog of the reference's
    encoded-long points); every function lowers to one vectorized
    extract + numpy kernel per batch. ST_GEOHEX uses the repo's
    documented axial-hex H3 substitute (same kernel as geohex_grid)."""
    from .. import geo

    n = len(t)
    if name in ("TO_GEOPOINT", "TO_GEOSHAPE",
                "TO_CARTESIANPOINT", "TO_CARTESIANSHAPE"):
        v = a[0]
        if isinstance(v, str):
            geo.parse_wkt(v)  # validate the literal
            return v
        if name in ("TO_GEOPOINT", "TO_CARTESIANPOINT"):
            _wkt_xy(v, n)  # validate every value parses as a point
        return v
    if name == "ST_X":
        return pa.array(_wkt_xy(a[0], n)[0], pa.float64())
    if name == "ST_Y":
        return pa.array(_wkt_xy(a[0], n)[1], pa.float64())
    if name in ("ST_ENVELOPE", "ST_XMIN", "ST_XMAX", "ST_YMIN", "ST_YMAX"):
        # StEnvelope / StXMin / StXMax / StYMin / StYMax (8.15-8.18,
        # scalar/spatial/{StEnvelope,StXMin,...}.java). Envelopes render
        # as the ES Rectangle WKT `BBOX (west, east, north, south)`.
        # Inputs: a shape WKT literal (bbox over its vertices), a BBOX
        # string (vectorized single-regex field extraction), or a POINT
        # column (degenerate envelope).
        v = a[0]
        if isinstance(v, str) and not v.lstrip().upper().startswith("BBOX"):
            kind, coords = geo.parse_wkt(v)
            if kind == "polygon":  # list of rings; bbox of the outer ring
                coords = coords[0]
            # envelope is already normalized by parse_wkt to the two
            # (minx, miny) / (maxx, maxy) corner points
            pts = np.atleast_2d(np.asarray(coords, np.float64))
            box = (pts[:, 0].min(), pts[:, 0].max(),
                   pts[:, 1].max(), pts[:, 1].min())
            if name == "ST_ENVELOPE":
                return (f"BBOX ({box[0]!r}, {box[1]!r}, "
                        f"{box[2]!r}, {box[3]!r})")
            return {"ST_XMIN": box[0], "ST_XMAX": box[1],
                    "ST_YMAX": box[2], "ST_YMIN": box[3]}[name]
        sv = v if isinstance(v, str) else pc.cast(v, pa.string())
        is_bbox = (sv.lstrip().upper().startswith("BBOX")
                   if isinstance(sv, str)
                   else pc.any(pc.starts_with(sv, "BBOX")).as_py())
        if is_bbox:
            ex = pc.extract_regex(
                sv if not isinstance(sv, str) else pa.array([sv] * n),
                r"^BBOX \((?P<w>[-+0-9.eE]+), (?P<e>[-+0-9.eE]+), "
                r"(?P<nn>[-+0-9.eE]+), (?P<s>[-+0-9.eE]+)\)$")
            f = {"ST_XMIN": "w", "ST_XMAX": "e",
                 "ST_YMAX": "nn", "ST_YMIN": "s"}
            if name == "ST_ENVELOPE":
                return sv
            return pc.cast(pc.struct_field(ex, f[name]), pa.float64())
        x, y = _wkt_xy(v, n)
        if name == "ST_ENVELOPE":
            return pa.array(
                [f"BBOX ({xi!r}, {xi!r}, {yi!r}, {yi!r})"
                 for xi, yi in zip(x, y)], pa.string())
        return pa.array(x if name in ("ST_XMIN", "ST_XMAX") else y,
                        pa.float64())
    if name == "ST_DISTANCE":
        x1, y1 = _wkt_xy(a[0], n)
        x2, y2 = _wkt_xy(a[1], n)
        if cartesian:
            # StDistance over cartesian_point (8.14): planar euclidean.
            # Explicit products so the SQL twin is double-identical.
            dx, dy = x2 - x1, y2 - y1
            return pa.array(np.sqrt(dx * dx + dy * dy), pa.float64())
        la1, la2 = np.radians(y1), np.radians(y2)
        sa = np.sin(np.radians(y2 - y1) / 2.0)
        so = np.sin(np.radians(x2 - x1) / 2.0)
        # explicit products (not **2) so the SQL twin's sin(x)*sin(x)
        # form is the literally identical double expression
        h = sa * sa + np.cos(la1) * np.cos(la2) * (so * so)
        d = 2.0 * _EARTH_MEAN_RADIUS_M * np.arcsin(np.sqrt(h))
        return pa.array(d, pa.float64())
    if name in ("ST_INTERSECTS", "ST_WITHIN", "ST_CONTAINS", "ST_DISJOINT"):
        # point column vs shape literal (either argument order; for
        # CONTAINS the containing shape is the literal side)
        col, lit = (a[0], a[1]) if isinstance(a[1], str) else (a[1], a[0])
        if not isinstance(lit, str):
            raise ValueError(f"{name}: one argument must be a shape literal")
        x, y = _wkt_xy(col, n)
        kind, coords = geo.parse_wkt(lit)
        if kind == "point":
            inside = (x == coords[0]) & (y == coords[1])
        elif kind == "envelope":
            (x1, y1), (x2, y2) = coords
            inside = (x >= x1) & (x <= x2) & (y >= y1) & (y <= y2)
        elif kind == "polygon":
            inside = geo.points_in_polygon(coords, x, y)
        else:
            raise ValueError(f"{name}: unsupported shape kind {kind}")
        return pa.array(~inside if name == "ST_DISJOINT" else inside)
    # grid functions: ST_GEOHASH(p, precision) / ST_GEOTILE(p, zoom) /
    # ST_GEOHEX(p, resolution)
    x, y = _wkt_xy(a[0], n)
    k = int(a[1])
    if name == "ST_GEOHASH":
        return pa.array(geo.geohash_encode(y, x, k), pa.string())
    if name == "ST_GEOTILE":
        return pa.array(geo.geotile_cell(y, x, k), pa.string())
    return pa.array(geo.geohex_cell(y, x, 15.0), pa.string())


def _ipv4_to_u32(arr) -> np.ndarray:
    """Dotted-quad string array -> uint32 vector (no per-row Python: one
    split kernel, one flat int cast, one stride-4 dot)."""
    if isinstance(arr, str):
        arr = pa.array([arr])
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    parts = pc.split_pattern(arr, ".")
    if parts.null_count or not np.all(
            np.asarray(pc.list_value_length(parts)) == 4):
        raise ValueError("TO_IP: malformed IPv4 literal in input")
    flat = np.asarray(pc.cast(parts.flatten(), pa.int64()))
    if flat.min() < 0 or flat.max() > 255:
        raise ValueError("TO_IP: octet out of range")
    o = flat.reshape(-1, 4).astype(np.uint32)
    return (o[:, 0] << np.uint32(24)) | (o[:, 1] << np.uint32(16)) \
        | (o[:, 2] << np.uint32(8)) | o[:, 3]


def _java_strftime(fmt: str) -> str:
    """Java DateTimeFormatter pattern subset -> strftime (the esql
    DATE_FORMAT/DATE_PARSE surface uses Java patterns)."""
    out = fmt
    for j, s in (("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"),
                 ("HH", "%H"), ("mm", "%M"), ("ss", "%S")):
        out = out.replace(j, s)
    return out


def _list_parts(arr):
    """list column -> (lengths int64 w/ null->0, flat values array,
    offsets int64). Rebuilt from list_value_length/list_flatten so
    sliced or null-bearing ListArrays can't misalign (same hazard the
    ingest foreach fix covers)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lens = pc.list_value_length(arr)
    valid = pc.is_valid(arr)
    lens = pc.if_else(valid, lens, 0)
    ln = np.asarray(pc.cast(lens, pa.int64()))
    flat = pc.list_flatten(arr)
    off = np.concatenate([[0], np.cumsum(ln)])
    return ln, flat, off, np.asarray(valid)


def _mv_call(name: str, a, t: pa.Table):
    """Multivalue (list-typed) esql functions, all segment-vectorized:
    per-list reductions via np.add/min/max.reduceat over the flattened
    value buffer; sort/dedupe via one factorize + lexsort over
    (row, code) pairs — no Python loop over rows."""
    arr = a[0]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if name == "MV_COUNT":
        return pc.cast(pc.list_value_length(arr), pa.int64())
    if name == "MV_CONCAT":
        if not pa.types.is_string(arr.type.value_type):
            arr = pc.cast(arr, pa.list_(pa.string()))
        return pc.binary_join(arr, a[1])
    if name == "MV_SLICE":
        start = int(a[1])
        stop = int(a[2]) + 1 if len(a) > 2 else None  # end inclusive
        return pc.list_slice(arr, start, stop)
    if name == "MV_APPEND":
        other = a[1]
        if isinstance(other, pa.ChunkedArray):
            other = other.combine_chunks()
        l1, f1, o1, v1 = _list_parts(arr)
        l2, f2, o2, v2 = _list_parts(other)
        rows = np.concatenate([np.repeat(np.arange(len(l1)), l1),
                               np.repeat(np.arange(len(l2)), l2)])
        order = np.argsort(rows, kind="stable")  # arr values first per row
        flat = pa.concat_arrays([f1.cast(f2.type) if f1.type != f2.type
                                 else f1, f2]).take(pa.array(order))
        offs = np.concatenate([[0], np.cumsum(l1 + l2)])
        return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), flat)
    ln, flat, off, valid = _list_parts(arr)
    n = len(ln)
    nz = ln > 0
    starts = off[:-1][nz]
    if name in ("MV_SUM", "MV_AVG", "MV_MIN", "MV_MAX", "MV_MEDIAN"):
        v = np.asarray(pc.cast(flat, pa.float64()))
        out = np.full(n, np.nan)
        if starts.size:
            if name == "MV_SUM":
                out[nz] = np.add.reduceat(v, starts)
            elif name == "MV_AVG":
                out[nz] = np.add.reduceat(v, starts) / ln[nz]
            elif name == "MV_MIN":
                out[nz] = np.minimum.reduceat(v, starts)
            elif name == "MV_MAX":
                out[nz] = np.maximum.reduceat(v, starts)
            else:  # MV_MEDIAN: per-segment sorted interpolation
                rows = np.repeat(np.arange(n), ln)
                o = np.lexsort((v, rows))
                sv = v[o]
                h = (ln[nz] - 1) / 2.0
                lo = starts + np.floor(h).astype(np.int64)
                hi = starts + np.ceil(h).astype(np.int64)
                out[nz] = (sv[lo] + sv[hi]) / 2.0
        return pa.array(out, pa.float64(), from_pandas=True)
    if name in ("MV_FIRST", "MV_LAST"):
        idx = np.where(nz, off[:-1] if name == "MV_FIRST" else off[1:] - 1,
                       0).astype(np.int64)
        taken = flat.take(pa.array(idx, pa.int64())) if len(flat) else \
            pa.nulls(n, arr.type.value_type)
        mask = pa.array(nz & valid)
        return pc.if_else(mask, taken, pa.nulls(n, taken.type))
    if name in ("MV_SORT", "MV_DEDUPE"):
        desc = len(a) > 1 and str(a[1]).upper() == "DESC"
        codes, uniq = pd.factorize(np.asarray(flat.to_pandas()), sort=True)
        rows = np.repeat(np.arange(n), ln)
        key = -codes if desc else codes
        o = np.lexsort((key, rows))
        sc, sr = codes[o], rows[o]
        if name == "MV_DEDUPE":
            keep = np.ones(len(sc), bool)
            if len(sc) > 1:
                keep[1:] = (sc[1:] != sc[:-1]) | (sr[1:] != sr[:-1])
            sc, sr = sc[keep], sr[keep]
            ln = np.bincount(sr, minlength=n).astype(np.int64)
        vals = pa.array(uniq[sc], type=arr.type.value_type)
        offs = np.concatenate([[0], np.cumsum(ln)])
        out = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), vals)
        # null input rows stay null (the length trick maps them to [])
        return pc.if_else(pa.array(valid), out,
                          pa.nulls(n, out.type)) if not valid.all() else out
    if name == "MV_PERCENTILE":
        # MvPercentile (8.14): exact per-row linear interpolation on the
        # sorted values (NOT the t-digest the PERCENTILE agg uses)
        p = float(a[1])
        v = np.asarray(pc.cast(flat, pa.float64()))
        out = np.full(n, np.nan)
        if starts.size:
            rows = np.repeat(np.arange(n), ln)
            o = np.lexsort((v, rows))
            sv = v[o]
            h = (ln[nz] - 1) * (p / 100.0)
            lo = np.floor(h).astype(np.int64)
            hi = np.minimum(lo + 1, ln[nz] - 1)
            frac = h - lo
            out[nz] = (sv[starts + lo]
                       + (sv[starts + hi] - sv[starts + lo]) * frac)
        return pa.array(out, pa.float64(), from_pandas=True)
    if name == "MV_MEDIAN_ABSOLUTE_DEVIATION":
        # MvMedianAbsoluteDeviation (8.15): per-row median(|x - median(x)|)
        # — two segment-vectorized median passes (lexsort + interpolation)
        v = np.asarray(pc.cast(flat, pa.float64()))
        out = np.full(n, np.nan)
        if starts.size:
            rows = np.repeat(np.arange(n), ln)
            o = np.lexsort((v, rows))
            sv = v[o]
            h = (ln[nz] - 1) / 2.0
            lo = starts + np.floor(h).astype(np.int64)
            hi = starts + np.ceil(h).astype(np.int64)
            med = (sv[lo] + sv[hi]) / 2.0
            dev = np.abs(v - np.repeat(med, ln[nz]))
            o2 = np.lexsort((dev, rows))
            sd = dev[o2]
            out[nz] = (sd[lo] + sd[hi]) / 2.0
        return pa.array(out, pa.float64(), from_pandas=True)
    if name == "MV_PSERIES_WEIGHTED_SUM":
        # MvPSeriesWeightedSum (8.15): sum of value_i / (i+1)^p in list
        # order (i 0-based) — the relevance decay used by semantic rerank
        p = float(a[1])
        v = np.asarray(pc.cast(flat, pa.float64()))
        out = np.full(n, np.nan)
        if starts.size:
            pos = np.arange(len(v)) - np.repeat(off[:-1], ln)
            # divide by (i+1)^p (not multiply by the inverse) so the
            # doubles match the SQL twin's `val / pow(i, p)` bit-for-bit
            out[nz] = np.add.reduceat(v / np.power(pos + 1.0, p), starts)
        return pa.array(out, pa.float64(), from_pandas=True)
    if name == "MV_ZIP":
        # MvZip (8.14): element-wise join of two lists with a delimiter;
        # the longer list's unpaired tail passes through un-joined
        # (binary_join_element_wise null_handling='skip' gives exactly
        # that pass-through)
        other = a[1]
        if isinstance(other, pa.ChunkedArray):
            other = other.combine_chunks()
        delim = str(a[2]) if len(a) > 2 else ","
        l2, f2, o2, v2 = _list_parts(other)
        ml = np.maximum(ln, l2)
        rows = np.repeat(np.arange(n), ml)
        tot = int(ml.sum())
        j = np.arange(tot) - np.repeat(np.concatenate([[0],
                                                       np.cumsum(ml)])[:-1],
                                       ml)
        def gather(fl, lens, offs):
            if len(fl) == 0:
                return pa.nulls(tot, pa.string())
            inside = j < lens[rows]
            idx = np.where(inside, offs[:-1][rows] + j, 0)
            g = pc.cast(fl, pa.string()).take(pa.array(idx, pa.int64()))
            return pc.if_else(pa.array(inside), g,
                              pa.nulls(tot, pa.string()))
        joined = pc.binary_join_element_wise(
            gather(flat, ln, off), gather(f2, l2, o2), delim,
            null_handling="skip")
        offs = np.concatenate([[0], np.cumsum(ml)])
        out = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), joined)
        both_null = ~(valid | v2)
        if both_null.any():
            out = pc.if_else(pa.array(~both_null), out,
                             pa.nulls(n, out.type))
        return out
    raise ValueError(f"unsupported ES|QL multivalue function {name}")


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
