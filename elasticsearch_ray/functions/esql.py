"""Minimal ES|QL (8.11 piped query language) executor over Ray Data.

Reference surface: x-pack/plugin/esql — EsqlParser grammar (FROM, WHERE,
EVAL, STATS..BY, SORT, LIMIT, KEEP). This is a from-scratch pipe-command
parser that lowers each stage onto the idiomatic Ray Data shape:

- FROM           -> ray.data.read_parquet (column-pruned to the fields the
                    later stages touch)
- WHERE          -> vectorized pyarrow.compute predicate inside map_batches
- EVAL           -> pc arithmetic appended per batch
- STATS .. BY    -> per-batch partial groupby (combiner) + tiny final merge
                    on the driver (group-cardinality table, never row-
                    cardinality)
- SORT / LIMIT / KEEP -> applied to the reduced result

- DISSECT        -> pc.extract_regex (pattern compiled from the %{name}
                    dissect grammar) appended per batch
- MV_EXPAND      -> vectorized list explode (list_parent_indices + take)
- LOOKUP JOIN    -> the 8.18 lookup-index join: the small side is read once,
                    ray.put-broadcast, and merged inside map_batches (never
                    a shuffle join)
- row-mode SORT/LIMIT (no STATS) -> per-batch partial top-k on the sort
                    key; the driver merges (batches x limit) partials only

WHERE and EVAL route through the full scalar-expression engine
(functions/esql_expr.py): comparisons, AND/OR/NOT with parentheses,
IN / LIKE / RLIKE / IS NULL, arithmetic, and the scalar function
registry (math, string, date, CASE/COALESCE, multivalue) — every
expression compiles once to a pyarrow.compute closure and runs as
vectorized kernels per batch.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_CMP = {"==": "equal", "!=": "not_equal", ">=": "greater_equal",
        "<=": "less_equal", ">": "greater", "<": "less"}
_AGGS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "COUNT_DISTINCT",
         "MEDIAN", "PERCENTILE", "MEDIAN_ABSOLUTE_DEVIATION",
         "STD_DEV", "WEIGHTED_AVG", "VALUES",
         "RATE", "ST_CENTROID_AGG", "ST_EXTENT_AGG"}


def _lit(tok: str):
    tok = tok.strip()
    if tok.startswith('"') and tok.endswith('"'):
        return tok[1:-1]
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    return float(tok)


def parse(query: str) -> list[tuple[str, str]]:
    """Split an ES|QL string into (COMMAND, body) stages."""
    # split on | at top level only — a | inside a "string literal"
    # (e.g. MV_CONCAT(x, "|")) or inside parentheses (FORK branches)
    # is part of the stage body
    segs, buf, inq, esc, depth = [], [], False, False, 0
    for ch in query:
        if esc:
            buf.append(ch)
            esc = False
        elif ch == "\\" and inq:
            buf.append(ch)
            esc = True
        elif ch == '"':
            buf.append(ch)
            inq = not inq
        elif not inq and ch in "()":
            depth += 1 if ch == "(" else -1
            buf.append(ch)
        elif ch == "|" and not inq and depth == 0:
            segs.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    segs.append("".join(buf))
    stages = []
    for seg in segs:
        seg = seg.strip()
        if not seg:
            continue
        cmd, _, body = seg.partition(" ")
        stages.append((cmd.upper(), body.strip()))
    if not stages or stages[0][0] not in ("FROM", "ROW", "TS", "SHOW"):
        raise ValueError("ES|QL query must start with FROM, TS, ROW or SHOW")
    return stages


def _fork_branches(body: str) -> list[str]:
    """Split a FORK body into its top-level ( .. ) branch pipelines."""
    out, buf, inq, depth = [], [], False, 0
    for ch in body:
        if ch == '"':
            inq = not inq
            buf.append(ch)
        elif not inq and ch == "(":
            depth += 1
            if depth > 1:
                buf.append(ch)
        elif not inq and ch == ")":
            depth -= 1
            if depth == 0:
                out.append("".join(buf).strip())
                buf = []
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
    return out


def _where_fn(body: str):
    """WHERE body -> vectorized batch filter via the full scalar-expression
    engine (esql_expr): comparisons, AND/OR/NOT, IN, LIKE/RLIKE, IS NULL,
    arithmetic and scalar functions all lower to pyarrow.compute kernels."""
    from .esql_expr import compile_predicate

    return compile_predicate(body)


def _eval_fn(body: str):
    """EVAL name = expr -> per-batch appended column via esql_expr.
    Multiple comma-separated assignments run left-to-right so later
    expressions can reference earlier ones (EsqlParser evalCommand)."""
    from .esql_expr import compile_eval, parse_expr  # noqa: F401

    assigns: list[tuple[str, str]] = []
    for part in _split_top(body):
        name, eq, expr = part.partition("=")
        if not eq:
            raise ValueError(f"unsupported EVAL assignment: {part!r}")
        assigns.append((name.strip(), expr.strip()))
    fns = [compile_eval(n, e) for n, e in assigns]

    def f(t: pa.Table) -> pa.Table:
        for fn in fns:
            t = fn(t)
        return t

    return f


def _dissect_fn(body: str):
    """DISSECT <col> <pattern> — the dissect grammar's %{name} keys become
    named regex captures; literal text between keys must match exactly
    (x-pack esql Dissect command / ingest-common DissectProcessor)."""
    col, _, pattern = body.partition(" ")
    pattern = pattern.strip()
    if pattern.startswith('"') and pattern.endswith('"'):
        pattern = pattern[1:-1]
    rx = ""
    pos = 0
    for m in re.finditer(r"%\{(\w+)\}", pattern):
        rx += re.escape(pattern[pos:m.start()]) + f"(?P<{m.group(1)}>.*?)"
        pos = m.end()
    rx += re.escape(pattern[pos:])
    rx = "^" + rx + "$"

    def f(t: pa.Table) -> pa.Table:
        st = pc.extract_regex(t[col], rx)
        for field in st.type:
            t = t.append_column(field.name, pc.struct_field(st, field.name))
        return t

    return f


def _mv_expand_fn(col: str):
    def f(t: pa.Table) -> pa.Table:
        lst = t[col]
        parents = pc.list_parent_indices(lst)
        flat = pc.list_flatten(lst)
        others = t.remove_column(t.column_names.index(col)).take(parents)
        return others.append_column(col, flat)

    return f


def _lookup_join_stage(sf_dir: str, body: str):
    """LOOKUP JOIN <table> ON <left_key> == <right_key> (ES|QL 8.18
    lookup-mode index join): the lookup side is small by contract — read
    once on the driver, ray.put-broadcast, merged per batch."""
    import os

    import pyarrow.parquet as pq
    import ray

    m = re.fullmatch(r"(\w+)\s+ON\s+([\w.]+)\s*==\s*([\w.]+)", body.strip(),
                     flags=re.I)
    if not m:
        raise ValueError(f"unsupported LOOKUP JOIN: {body!r}")
    table, lkey, rkey = m.groups()
    small = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"))
    small_df = small.to_pandas().set_index(rkey)
    ref = ray.put(small_df)

    def f(t: pa.Table) -> pa.Table:
        sd = ray.get(ref)
        df = t.to_pandas()
        joined = df.join(sd, on=lkey, how="left")
        return pa.Table.from_pandas(joined, preserve_index=False)

    return f


def _enrich_stage(sf_dir: str, body: str):
    """ENRICH <policy-table> ON <match_field> [WITH f1, f2] (x-pack
    EnrichPolicyRunner / EnrichLookupService): the enrich index is small
    by contract — read once, projected to match + WITH fields,
    ray.put-broadcast, merged per batch; never a shuffle join."""
    import os

    import pyarrow.parquet as pq
    import ray

    m = re.fullmatch(
        r"(\w+)\s+ON\s+([\w.]+)(?:\s*==\s*([\w.]+))?(?:\s+WITH\s+(.+))?",
        body.strip(), flags=re.I)
    if not m:
        raise ValueError(f"unsupported ENRICH: {body!r}")
    table, lkey, rkey, withs = m.groups()
    rkey = rkey or lkey  # bare ON field: match field shares the name
    cols = [rkey] + ([c.strip() for c in withs.split(",")] if withs else [])
    small = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"),
                          columns=cols if withs else None)
    small_df = small.to_pandas().set_index(rkey)
    ref = ray.put(small_df)

    def f(t: pa.Table) -> pa.Table:
        sd = ray.get(ref)
        df = t.to_pandas()
        joined = df.join(sd, on=lkey, how="left")
        return pa.Table.from_pandas(joined, preserve_index=False)

    return f


def _parse_sort_specs(body: str) -> list[tuple[str, bool, str]]:
    """SORT body -> [(key, ascending, na_position)]. ES|QL treats null as
    larger than any value (EsqlParser orderExpression default), so nulls
    land last ascending / first descending unless NULLS FIRST/LAST says
    otherwise."""
    specs = []
    for item in body.split(","):
        toks = item.split()
        key = toks[0]
        asc = True
        na = None
        i = 1
        while i < len(toks):
            u = toks[i].upper()
            if u in ("ASC", "DESC"):
                asc = u == "ASC"
            elif u == "NULLS" and i + 1 < len(toks):
                i += 1
                na = "first" if toks[i].upper() == "FIRST" else "last"
            i += 1
        if na is None:
            na = "last" if asc else "first"
        specs.append((key, asc, na))
    return specs


def _sort_frame(df: pd.DataFrame,
                specs: list[tuple[str, bool, str]]) -> pd.DataFrame:
    """Stable multi-key sort honouring a per-key na_position (pandas takes
    only one na_position per call, so sort per key from last to first)."""
    for key, asc, na in reversed(specs):
        df = df.sort_values(key, ascending=asc, na_position=na,
                            kind="mergesort")
    return df


def _expand_cols(items: list[str], columns: list[str],
                 keep_order: bool = True) -> list[str]:
    """KEEP/DROP projection with qualified-name wildcards (EsqlParser
    qualifiedNamePattern): `user*` expands in current column order."""
    import fnmatch

    out: list[str] = []
    for p in items:
        if "*" in p:
            out.extend(c for c in columns
                       if fnmatch.fnmatch(c, p) and c not in out)
        else:
            if p not in columns:
                raise KeyError(f"unknown column {p!r}")
            if p not in out:
                out.append(p)
    return out


def _split_top(s: str) -> list[str]:
    """Split on commas outside parentheses (function args keep theirs)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p for p in (x.strip() for x in parts) if p]


# ---------------- full-text functions (MATCH / QSTR / KQL, 8.16-8.18) ----

_FT_RX = re.compile(r"\b(MATCH_PHRASE|MULTI_MATCH|MATCH|QSTR|KQL|TERM)\s*\(", re.I)


def _split_logical(s: str, op: str) -> list[str]:
    """Split `s` on the word `op` (AND / OR, case-insensitive) at top level
    only — never inside quotes or parentheses."""
    rx = re.compile(rf"\b{op}\b", re.I)
    parts, depth, inq, start, i = [], 0, False, 0, 0
    while i < len(s):
        ch = s[i]
        if ch == '"':
            inq = not inq
        elif not inq and ch == "(":
            depth += 1
        elif not inq and ch == ")":
            depth -= 1
        elif not inq and depth == 0:
            m = rx.match(s, i)
            if m and (i == 0 or not s[i - 1].isalnum()):
                parts.append(s[start:i])
                i = m.end()
                start = i
                continue
        i += 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _balanced(s: str) -> bool:
    """True when a leading '(' pairs with the string's final ')' — i.e. the
    whole expression is one parenthesized group."""
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0 and i != len(s) - 1:
                return False
    return depth == 0


def _unq(s: str) -> str:
    s = s.strip()
    return s[1:-1] if s.startswith('"') and s.endswith('"') else s


def _ft_call(name: str, argstr: str) -> dict:
    """Lower one full-text function call to an engine query dict
    (x-pack/plugin/esql fulltext functions: Match.java, QueryString.java,
    Kql.java — each `translate()`s to the corresponding Lucene query)."""
    args = _split_top(argstr)
    if name == "QSTR":
        from ..search.engine import parse_query_string

        return parse_query_string(_unq(args[0]))
    if name == "KQL":
        return _kql_to_query(_unq(args[0]))
    field, text = args[0].strip(), _unq(args[1])
    opts: dict[str, str] = {}
    if len(args) > 2:  # MATCH(field, query, {"operator": "AND", ...})
        # _split_top is paren-aware, not brace-aware: rejoin the map literal
        for om in re.finditer(r'"(\w+)"\s*:\s*"?([^,}"]+)"?',
                              ",".join(args[2:])):
            opts[om.group(1)] = om.group(2).strip()
    if name == "MATCH":
        q: dict = {"kind": "match", "field": field, "text": text}
        if "operator" in opts:
            q["operator"] = opts["operator"].lower()
        if "minimum_should_match" in opts:
            q["minimum_should_match"] = int(opts["minimum_should_match"])
        if "boost" in opts:
            q["boost"] = float(opts["boost"])
        return q
    if name == "MATCH_PHRASE":
        q = {"kind": "match_phrase", "field": field, "text": text}
        if "slop" in opts:
            q["slop"] = int(opts["slop"])
        if "boost" in opts:
            q["boost"] = float(opts["boost"])
        return q
    if name == "TERM":
        # Term (8.17 fulltext/Term.java): exact term on one field, no
        # analysis of the query side
        return {"kind": "term", "field": field, "term": text}
    if name == "MULTI_MATCH":
        # MultiMatch (8.18 fulltext/MultiMatch.java): first arg is the
        # query text, remaining bare args are fields
        # fields are bare identifiers; map-literal pieces (brace-split by
        # the paren-aware splitter) are consumed by the opts regex above
        fields = [a.strip() for a in args[1:]
                  if re.fullmatch(r"[\w.]+", a.strip())]
        q = {"kind": "multi_match", "text": _unq(args[0]),
             "fields": fields, "type": opts.get("type", "best_fields")}
        if "tie_breaker" in opts:
            q["tie_breaker"] = float(opts["tie_breaker"])
        if "operator" in opts:
            q["operator"] = opts["operator"].lower()
        return q
    raise ValueError(f"unsupported full-text function: {name}")


def _kql_to_query(s: str) -> dict:
    """Tiny KQL -> query-dict compiler (x-pack kql plugin, KqlParser.g4
    subset): and/or/not (case-insensitive), parentheses, `field:value`,
    `field:"phrase"`, wildcard values, bare terms on the default field."""
    toks = re.findall(r'"[^"]*"|\(|\)|:|[^\s():]+', s)

    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        node = parse_and()
        should = [node]
        while peek() is not None and peek().lower() == "or":
            take()
            should.append(parse_and())
        if len(should) == 1:
            return node
        return {"kind": "bool", "should": should}

    def parse_and():
        # NOT children fold into the SAME bool's must_not (KqlParser builds
        # one boolean query; a nested pure-negative bool would add Lucene's
        # constant match_all score, which the reference's shape avoids)
        nodes = [parse_not()]
        while peek() is not None and peek().lower() == "and":
            take()
            nodes.append(parse_not())
        if len(nodes) == 1 and not nodes[0][0]:
            return nodes[0][1]
        must = [n for neg, n in nodes if not neg]
        must_not = [n for neg, n in nodes if neg]
        q: dict = {"kind": "bool"}
        if must:
            q["must"] = must
        if must_not:
            q["must_not"] = must_not
        return q

    def parse_not():
        if peek() is not None and peek().lower() == "not":
            take()
            neg, node = parse_not()
            return (not neg, node)
        return (False, parse_primary())

    def value_query(field, v):
        if v.startswith('"'):
            return {"kind": "match_phrase", "text": v[1:-1],
                    **({"field": field} if field else {})}
        if "*" in v:
            return {"kind": "wildcard", "pattern": v.lower(),
                    **({"field": field} if field else {})}
        return {"kind": "match", "text": v, "operator": "and",
                **({"field": field} if field else {})}

    def parse_primary():
        t = take()
        if t == "(":
            node = parse_or()
            if peek() == ")":
                take()
            return node
        if peek() == ":":
            take()
            return value_query(t, take())
        return value_query(None, t)

    node = parse_or()
    if pos != len(toks):
        raise ValueError(f"trailing KQL tokens: {toks[pos:]}")
    return node


def _contains_ft(s: str) -> bool:
    return _FT_RX.search(s) is not None


def _ft_node_to_query(s: str) -> dict:
    """Lower a WHERE subexpression that contains full-text calls into one
    engine query dict. AND -> bool.must, OR -> bool.should, NOT ->
    bool.must_not; a scalar predicate nested under OR/NOT is rejected the
    same way the reference rejects non-pushable full-text plans
    (EsqlCapabilities FULL_TEXT_FUNCTIONS must translate to Lucene)."""
    s = s.strip()
    ors = _split_logical(s, "OR")
    if len(ors) > 1:
        return {"kind": "bool", "should": [_ft_node_to_query(x) for x in ors]}
    ands = _split_logical(s, "AND")
    if len(ands) > 1:
        return {"kind": "bool", "must": [_ft_node_to_query(x) for x in ands]}
    if re.match(r"NOT\b", s, re.I):
        return {"kind": "bool",
                "must_not": [_ft_node_to_query(s[3:].strip())]}
    if s.startswith("(") and s.endswith(")") and _balanced(s):
        return _ft_node_to_query(s[1:-1])
    m = re.fullmatch(r"(MATCH_PHRASE|MULTI_MATCH|MATCH|QSTR|KQL|TERM)\s*\((.*)\)", s,
                     re.I | re.S)
    if m:
        return _ft_call(m.group(1).upper(), m.group(2))
    raise ValueError(
        f"predicate {s!r} is combined with a full-text function by OR/NOT "
        "and is not pushable to the index (the reference requires "
        "full-text functions to translate to a Lucene query)")


def _parse_ft_where(body: str) -> tuple[dict, str | None]:
    """Split a WHERE body into (index query dict, residual scalar predicate).
    Top-level AND conjuncts that contain no full-text call stay behind as a
    normal vectorized row filter; everything else is lowered to the engine."""
    conj = _split_logical(body, "AND")
    ft_parts = [c for c in conj if _contains_ft(c)]
    scalar_parts = [c for c in conj if not _contains_ft(c)]
    if not ft_parts:
        raise ValueError("no full-text function in WHERE")
    if len(ft_parts) == 1:
        q = _ft_node_to_query(ft_parts[0])
    else:
        q = {"kind": "bool", "must": [_ft_node_to_query(c) for c in ft_parts]}
    residual = " AND ".join(scalar_parts) if scalar_parts else None
    return q, residual


def _matched_set_filter(ids: np.ndarray, sc: np.ndarray, id_col: str,
                        want_score: bool, score_col: str = "_score"):
    """Vectorized per-batch filter by a (sorted) matched-id set, optionally
    attaching the pushed-down query's relevance score column."""
    order = np.argsort(ids)
    ids_s = ids[order]
    sc_s = sc[order].astype(np.float64)

    def f(t: pa.Table) -> pa.Table:
        d = t[id_col].to_numpy(zero_copy_only=False)
        if ids_s.size == 0:
            out = t.slice(0, 0)
            if want_score:
                out = out.append_column(score_col,
                                        pa.array([], pa.float64()))
            return out
        pos = np.minimum(np.searchsorted(ids_s, d), ids_s.size - 1)
        mask = ids_s[pos] == d
        out = t.filter(pa.array(mask))
        if want_score:
            out = out.append_column(
                score_col, pa.array(sc_s[pos[mask]], pa.float64()))
        return out

    return f


_KNN_RX = re.compile(r"\bKNN\s*\(", re.I)


def _knn_filter_fn(sf_dir: str, table: str, call_text: str,
                   want_score: bool):
    """KNN function pushdown (x-pack esql vector Knn.java, 8.19
    experimental): WHERE KNN(field, [query...], {"k": n}) runs ONE exact
    cosine top-k pass over the vector column — per-batch float64 partial
    top-k (the HNSW per-segment search analog), driver merge of
    (batches x k) candidates only — then filters the row stream by the
    matched id set. _score uses the dense_vector cosine convention
    (1 + cos) / 2."""
    m = re.fullmatch(
        r"KNN\s*\(\s*([\w.]+)\s*,\s*\[([^\]]*)\]\s*(?:,\s*\{(.*)\})?\s*\)",
        call_text.strip(), re.I | re.S)
    if not m:
        raise ValueError(f"unsupported KNN call: {call_text!r}")
    field = m.group(1)
    q = np.asarray([float(x) for x in m.group(2).split(",")], np.float64)
    k = 10
    if m.group(3):
        km = re.search(r'"k"\s*:\s*(\d+)', m.group(3))
        if km:
            k = int(km.group(1))
    if table != "embeddings":
        raise ValueError("KNN needs a dense_vector source; only "
                         "`embeddings` carries one in this harness")
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = pq.read_schema(path).remove_metadata()
    cols = ["vec_id", field]
    ds = rd.read_parquet(path, columns=cols,
                         schema=pa.schema([schema.field(c) for c in cols]))

    def partial_topk(t: pa.Table) -> pa.Table:
        from .esql_expr import _vec_matrix

        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        V = _vec_matrix(t[field])
        num = V @ q
        den = np.sqrt((V * V).sum(axis=1)) * np.sqrt((q * q).sum())
        cos = num / den
        kk = min(k, cos.size)
        top = np.argpartition(-cos, kk - 1)[:kk] if kk else np.arange(0)
        return pa.table({"vec_id": pa.array(ids[top], pa.int64()),
                         "cos": pa.array(cos[top], pa.float64())})

    parts = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["cos", "vec_id"],
                              ascending=[False, True]).head(k)
    ids = parts["vec_id"].to_numpy(np.int64)
    sc = (1.0 + parts["cos"].to_numpy(np.float64)) / 2.0
    return _matched_set_filter(ids, sc, "vec_id", want_score)


def _ft_filter_fn(sf_dir: str, table: str, qdict: dict, want_score: bool):
    """Execute the pushed-down query once against the cached documents
    index (the reference runs the translated Lucene query per shard) and
    return a vectorized per-batch filter over the row stream. The matched
    (doc_id, _score) set is query-result-sized — far smaller than the
    corpus — and rides into each map task with the serialized closure
    (one object-store copy per worker at real scale; the 100-TB shape is
    the same broadcast-small-side pattern as terms-lookup)."""
    if table != "documents":
        raise ValueError(
            "full-text functions need an indexed source; only `documents` "
            "has a search index in this harness")
    from ..pipelines.fulltext import documents_searcher

    ids, sc = documents_searcher(sf_dir)._eval(qdict)
    return _matched_set_filter(ids, sc, "doc_id", want_score)


def _rewrite_bucket(expr: str) -> str:
    """BUCKET(col, span) (x-pack esql Bucket function, 8.14 grouping
    form) -> plain scalar expression: `1 <calendar-unit>` spans become
    DATE_TRUNC, numeric widths become FLOOR(col / w) * w."""
    m = re.fullmatch(r"BUCKET\(\s*([\w.]+)\s*,\s*(\d+)\s+(\w+?)s?\s*\)",
                     expr, flags=re.I)
    if m:
        col, n, unit = m.groups()
        if int(n) != 1:
            raise ValueError("BUCKET supports 1-unit calendar spans")
        return f'DATE_TRUNC("{unit.lower()}", {col})'
    m = re.fullmatch(r"BUCKET\(\s*([\w.]+)\s*,\s*(\d+(?:\.\d+)?)\s*\)",
                     expr, flags=re.I)
    if m:
        col, w = m.groups()
        return f"FLOOR({col} / {w}) * {w}"
    return expr


def _parse_stats(body: str) -> tuple[list[tuple], list[str], list]:
    """-> ([(alias, FN, col, arg2|None), ...], by, by_evals). arg2 is
    PERCENTILE's rank or WEIGHTED_AVG's weight column; by_evals are
    compiled `BY alias = expr` grouping stages (Bucket et al.)."""
    aggs_part, _, by_part = body.partition(" BY ")
    by, by_evals = [], []
    for item in _split_top(by_part):
        name, eq, expr = item.partition("=")
        if eq:
            from .esql_expr import compile_eval

            by.append(name.strip())
            by_evals.append(compile_eval(name.strip(),
                                         _rewrite_bucket(expr.strip())))
        else:
            by.append(item)
    specs = []
    for item in _split_top(aggs_part):
        alias, _, call = item.partition("=")
        # per-aggregate filter clause: `alias = FN(col) WHERE pred`
        # (esql FilteredExpression, 8.16) — the predicate masks the rows
        # feeding THIS aggregate only; groups still form over all rows
        call, _, where_src = call.strip().partition(" WHERE ")
        # nested time-series form OUTER(INNER_OVER_TIME(col)) (8.19 TS
        # aggregates): inner per-series (per _tsid, per bucket) reduce,
        # outer across series within the BY group
        m2 = re.fullmatch(
            r"(\w+)\(\s*(\w+)_OVER_TIME\(\s*([\w.]+)\s*\)\s*\)",
            call.strip(), re.I)
        if m2:
            outer, inner = m2.group(1).upper(), m2.group(2).upper()
            if outer not in ("AVG", "SUM", "MIN", "MAX") or inner not in (
                    "AVG", "SUM", "MIN", "MAX", "COUNT", "LAST", "FIRST"):
                raise ValueError(f"unsupported OVER_TIME agg: {item!r}")
            if where_src.strip():
                raise ValueError("per-agg WHERE is not supported with "
                                 "OVER_TIME aggregates")
            specs.append((alias.strip(), "OVER_TIME", m2.group(3),
                          (outer, inner), None))
            continue
        m3 = re.fullmatch(
            r'(?i)TOP\(\s*([\w.]+)\s*,\s*(\d+)\s*,\s*"(asc|desc)"\s*\)',
            call.strip())
        if m3:
            # TOP(col, k, order) (8.16 Top aggregate): multivalue top-k
            specs.append((alias.strip(), "TOP", m3.group(1),
                          (int(m3.group(2)), m3.group(3).lower()),
                          where_src.strip() or None))
            continue
        m = re.fullmatch(
            r"(\w+)\(\s*(\*|[\w.]+)\s*(?:,\s*([\w.]+)\s*)?\)", call.strip())
        if m and m.group(1).upper() in _AGGS:
            specs.append((alias.strip(), m.group(1).upper(), m.group(2),
                          m.group(3), where_src.strip() or None))
            continue
        # expression argument (EsqlParser allows any expression inside a
        # single-arg aggregate, e.g. SUM(price * (1 - discount))): lower
        # to a hidden EVAL column computed per batch before the combiner
        me = re.fullmatch(r"(\w+)\(\s*(.+)\s*\)", call.strip(), re.S)
        if me and me.group(1).upper() in _AGGS and me.group(1).upper() in (
                "SUM", "AVG", "MIN", "MAX", "COUNT", "MEDIAN",
                "COUNT_DISTINCT", "VALUES", "STD_DEV"):
            from .esql_expr import compile_eval

            hidden = f"__sarg{len(by_evals)}"
            by_evals.append(compile_eval(hidden, me.group(2)))
            specs.append((alias.strip(), me.group(1).upper(), hidden,
                          None, where_src.strip() or None))
            continue
        raise ValueError(f"unsupported STATS agg: {item!r}")
    return specs, by, by_evals


def run(sf_dir: str, query: str, *, reader=None) -> pd.DataFrame:
    """Execute an ES|QL pipe query; returns the reduced pandas result."""
    import os

    import ray.data as rd

    stages = parse(query)
    if stages[0][0] == "SHOW":
        # SHOW INFO (EsqlParser showCommand, the only SHOW form): one
        # constant row of build metadata — version / date / hash
        # (x-pack/plugin/esql/.../plan/logical/show/ShowInfo.java)
        if stages[0][1].strip().upper() != "INFO":
            raise ValueError("SHOW supports only INFO")
        from .. import __version__

        out = pd.DataFrame({"version": [__version__],
                            "date": ["2026-08-19T00:00:00Z"],
                            "hash": ["esray000"]})
        return _apply_post(out, stages[1:])
    fork_at = next((i for i, (c, _) in enumerate(stages) if c == "FORK"),
                   None)
    if fork_at is not None:
        # FORK (x-pack esql Fork, 8.19): run each parenthesized branch as
        # its own sub-pipeline over the shared prefix, tag with _fork, and
        # union the (driver-small) branch results. Each branch is a
        # separate streaming pass — the reference plans N sub-plans the
        # same way; the prefix's scan pruning/pushdown reapplies per
        # branch.
        prefix = " | ".join(f"{c} {b}".strip() for c, b in stages[:fork_at])
        branches = _fork_branches(stages[fork_at][1])
        if len(branches) < 2:
            raise ValueError("FORK needs at least two ( .. ) branches")
        frames = []
        for i, br in enumerate(branches, start=1):
            sub = run(sf_dir, prefix + (" | " + br if br.strip() else ""),
                      reader=reader)
            sub.insert(0, "_fork", f"fork{i}")
            frames.append(sub)
        out = pd.concat(frames, ignore_index=True)
        return _apply_post(out, stages[fork_at + 1:])
    if stages[0][0] == "ROW":
        # ROW command: a single literal row as the source (x-pack esql
        # RowExec) — each assignment evaluated against a 1-row dummy
        from .esql_expr import evaluate, parse_expr

        dummy = pa.table({"__r": pa.array([0])})
        cols = {}
        for item in _split_top(stages[0][1]):
            name, _, expr = item.partition("=")
            v = evaluate(parse_expr(expr.strip()), dummy)
            cols[name.strip()] = v if isinstance(
                v, (pa.Array, pa.ChunkedArray)) else pa.array([v])
        ds = rd.from_arrow(pa.table(cols))
        stats_specs = by = None
        post: list[tuple[str, str]] = []
        for cmd, body in stages[1:]:
            if cmd == "EVAL":
                ds = ds.map_batches(_eval_fn(body), batch_format="pyarrow")
            elif cmd == "STATS":
                stats_specs, by, _ = _parse_stats(body)
            else:
                post.append((cmd, body))
        if stats_specs is not None:
            return _apply_post(_stats_table(ds, stats_specs, by or []), post)
        return _apply_post(ds.to_pandas(), post)
    from_spec = stages[0][1].split()[0]
    # FROM accepts comma-separated index patterns with optional cluster
    # prefixes (EsqlParser indexPattern: `events,remote:events,logs-*`);
    # each resolves to a parquet table in sf_dir (a `cluster:` prefix is
    # the cross-cluster qualifier — same data plane in this harness)
    patterns = [p.strip() for p in from_spec.split(",") if p.strip()]
    table = patterns[0].rpartition(":")[2]
    # FROM <table> METADATA _score (EsqlParser metadata option): expose the
    # pushed-down query's relevance score as a `_score` column
    want_score = re.search(r"\bMETADATA\b[\s\S]*\b_score\b", stages[0][1],
                           re.I) is not None
    want_index = re.search(r"\bMETADATA\b[\s\S]*\b_index\b", stages[0][1],
                           re.I) is not None
    if want_score and len(patterns) > 1:
        raise ValueError("METADATA _score needs a single indexed source")

    # full-text pushdown: a WHERE directly after FROM whose predicate holds
    # MATCH/MATCH_PHRASE/QSTR/KQL runs ONCE against the search index (the
    # reference translates these functions to Lucene queries executed per
    # shard); the row stream is then filtered by the matched doc-id set.
    # Non-full-text AND-conjuncts stay behind as a vectorized row filter.
    ft_stage = None
    ft_id_col = "doc_id"
    if len(stages) > 1 and stages[1][0] == "WHERE" and _contains_ft(
            stages[1][1]):
        qdict, residual = _parse_ft_where(stages[1][1])
        stages = ([stages[0]] +
                  ([("WHERE", residual)] if residual else []) + stages[2:])
        ft_stage = _ft_filter_fn(sf_dir, table, qdict, want_score)
    elif len(stages) > 1 and stages[1][0] == "WHERE" and _KNN_RX.search(
            stages[1][1]):
        conj = _split_logical(stages[1][1], "AND")
        knn_parts = [c for c in conj if _KNN_RX.search(c)]
        if len(knn_parts) != 1:
            raise ValueError("exactly one KNN() conjunct is supported")
        residual_parts = [c for c in conj if not _KNN_RX.search(c)]
        residual = " AND ".join(residual_parts) if residual_parts else None
        stages = ([stages[0]] +
                  ([("WHERE", residual)] if residual else []) + stages[2:])
        ft_stage = _knn_filter_fn(sf_dir, table, knn_parts[0], want_score)
        ft_id_col = "vec_id"
    elif want_score:
        raise ValueError(
            "METADATA _score requires a full-text or KNN WHERE")

    # column pruning: every identifier later stages reference
    used: set[str] = set()
    for cmd, body in stages[1:]:
        used.update(re.findall(r"[A-Za-z_][\w.]*", body))
    if any("RATE(" in body.upper() for _, body in stages[1:]):
        used.add("ts")  # RATE orders samples by the implicit ts column
    if any("_OVER_TIME(" in body.upper() for _, body in stages[1:]):
        used.update(("ts", "user_id"))  # implicit series dims (_tsid)
    if ft_stage is not None:
        used.add(ft_id_col)  # the pushed query's join key
    # KEEP/DROP wildcards: a pattern like `user*` must keep matching schema
    # columns readable even though the bare identifier isn't a column name
    wild_pats = {p.strip() for cmd, body in stages[1:]
                 if cmd in ("KEEP", "DROP")
                 for p in body.split(",") if "*" in p}
    # scan-time predicate pushdown: a leading WHERE whose expression has a
    # pyarrow.dataset equivalent filters at the parquet scanner (row-group
    # statistics pruning — the BKD/PointRangeQuery skip analog), not in a
    # downstream map_batches stage
    pushed_where = None
    if reader is None and len(stages) > 1 and stages[1][0] == "WHERE":
        from .esql_expr import to_dataset_filter

        expr = to_dataset_filter(stages[1][1])
        if expr is not None:
            pushed_where = stages[1]
            stages = [stages[0]] + stages[2:]

    if reader is not None:
        ds = reader(table)
    else:
        import fnmatch as _fn
        import pyarrow.parquet as pq

        # resolve patterns -> [(qualified name, file name)]
        resolved: list[tuple[str, str]] = []
        for pat in patterns:
            cluster, _, name = pat.rpartition(":")
            if "*" in name:
                names = sorted(
                    f[:-8] for f in os.listdir(sf_dir)
                    if f.endswith(".parquet")
                    and _fn.fnmatch(f[:-8], name))
            else:
                names = [name]
            for n in names:
                resolved.append((f"{cluster}:{n}" if cluster else n, n))
        if not resolved:
            raise ValueError(f"no indices match {from_spec!r}")
        path = os.path.join(sf_dir, f"{resolved[0][1]}.parquet")
        schema = pq.read_schema(path).remove_metadata()
        if wild_pats:
            import fnmatch

            used.update(c for c in schema.names
                        for p in wild_pats if fnmatch.fnmatch(c, p))
        drop_pats = {p.strip() for cmd, body in stages[1:] if cmd == "DROP"
                     for p in body.split(",")}
        if drop_pats:
            # DROP is subtractive: every non-dropped column flows through
            # to the result, so it must be read even if nothing names it
            import fnmatch

            used.update(c for c in schema.names
                        if not any(fnmatch.fnmatch(c, p)
                                   for p in drop_pats))
        cols = [c for c in schema.names if c in used] or schema.names
        if any(cmd == "SAMPLE" for cmd, _ in stages[1:]):
            # SAMPLE hashes the first integer column — keep it readable
            key = next((c for c in schema.names
                        if pa.types.is_integer(schema.field(c).type)), None)
            if key and key not in cols:
                cols = [key] + cols
        sub_schema = pa.schema([schema.field(c) for c in cols])
        kw = {"filter": expr} if pushed_where is not None else {}
        parts_ds = []
        for qual, name in resolved:
            d = rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                                columns=cols, schema=sub_schema, **kw)
            if want_index:
                def _tag(t: pa.Table, _q=qual) -> pa.Table:
                    return t.append_column(
                        "_index", pa.array([_q] * len(t), pa.string()))

                d = d.map_batches(_tag, batch_format="pyarrow")
            parts_ds.append(d)
        ds = parts_ds[0] if len(parts_ds) == 1 else \
            parts_ds[0].union(*parts_ds[1:])

    if ft_stage is not None:
        ds = ds.map_batches(ft_stage, batch_format="pyarrow")

    stats_specs = by = None
    post: list[tuple[str, str]] = []
    for cmd, body in stages[1:]:
        if cmd == "WHERE" and stats_specs is None:
            ds = ds.map_batches(_where_fn(body), batch_format="pyarrow")
        elif cmd == "EVAL" and stats_specs is None:
            ds = ds.map_batches(_eval_fn(body), batch_format="pyarrow")
        elif cmd == "DISSECT" and stats_specs is None:
            ds = ds.map_batches(_dissect_fn(body), batch_format="pyarrow")
        elif cmd == "GROK" and stats_specs is None:
            ds = ds.map_batches(_grok_fn(body), batch_format="pyarrow")
        elif cmd == "MV_EXPAND" and stats_specs is None:
            ds = ds.map_batches(_mv_expand_fn(body.strip()),
                                batch_format="pyarrow")
        elif cmd == "RENAME" and stats_specs is None:
            rm = re.fullmatch(r"([\w.]+)\s+AS\s+([\w.]+)", body.strip(),
                              flags=re.I)
            if not rm:
                raise ValueError(f"unsupported RENAME: {body!r}")
            old, new = rm.groups()

            def _rename(t: pa.Table, _o=old, _n=new) -> pa.Table:
                return t.rename_columns(
                    [_n if c == _o else c for c in t.column_names])

            ds = ds.map_batches(_rename, batch_format="pyarrow")
        elif cmd == "DROP" and stats_specs is None:
            drop_cols = [c.strip() for c in body.split(",")]

            def _drop(t: pa.Table, _d=tuple(drop_cols)) -> pa.Table:
                import fnmatch

                gone = {c for c in t.column_names
                        for p in _d if fnmatch.fnmatch(c, p)}
                return t.select(
                    [c for c in t.column_names if c not in gone])

            ds = ds.map_batches(_drop, batch_format="pyarrow")
        elif cmd == "ENRICH" and stats_specs is None:
            ds = ds.map_batches(_enrich_stage(sf_dir, body),
                                batch_format="pyarrow")
        elif cmd == "LOOKUP" and stats_specs is None:
            jb = re.sub(r"^JOIN\s+", "", body.strip(), flags=re.I)
            ds = ds.map_batches(_lookup_join_stage(sf_dir, jb),
                                batch_format="pyarrow")
        elif cmd == "RERANK" and stats_specs is None:
            ds = ds.map_batches(_rerank_fn(body), batch_format="pyarrow")
        elif cmd == "COMPLETION" and stats_specs is None:
            ds = ds.map_batches(_completion_fn(body), batch_format="pyarrow")
        elif cmd == "SAMPLE" and stats_specs is None:
            ds = ds.map_batches(_sample_fn(body), batch_format="pyarrow")
        elif cmd == "INLINESTATS" and stats_specs is None:
            # ES|QL INLINESTATS (8.16 preview): aggregate, then join the
            # group table back onto every row. Two streaming passes over
            # the input; the group table is driver-small by contract and
            # ray.put-broadcast into the second pass — never a shuffle
            # join (x-pack esql InlineStats plan = aggregate + hash join).
            ispecs, iby, iby_evals = _parse_stats(body)
            for bev in iby_evals:
                ds = ds.map_batches(bev, batch_format="pyarrow")
            frame = _stats_table(ds, ispecs, iby or [])
            ds = ds.map_batches(_inline_join_fn(frame, iby or []),
                                batch_format="pyarrow")
        elif cmd == "STATS":
            if stats_specs is not None:
                # chained STATS (EsqlParser allows repeated aggregations:
                # the second one runs over the first's reduced table,
                # which is group-cardinality-small by contract) —
                # materialize the intermediate frame, apply any pending
                # post commands, and continue the pipeline from it
                frame = _apply_post(
                    _stats_table(ds, stats_specs, by or []), post)
                post = []
                ds = rd.from_pandas(frame)
            stats_specs, by, by_evals = _parse_stats(body)
            for bev in by_evals:
                ds = ds.map_batches(bev, batch_format="pyarrow")
        elif cmd in ("SORT", "LIMIT", "KEEP", "WHERE", "CHANGE_POINT"):
            if cmd == "CHANGE_POINT" and stats_specs is None:
                raise ValueError(
                    "CHANGE_POINT requires a preceding STATS (the command "
                    "is bounded to a reduced series; x-pack esql caps it "
                    "at 1,000 input rows for the same reason)")
            post.append((cmd, body))
        else:
            raise ValueError(f"unsupported ES|QL command: {cmd}")

    if stats_specs is None:
        return _run_row_mode(ds, post)
    out = _stats_table(ds, stats_specs, by or [])
    return _apply_post(out, post)


def _rerank_fn(body: str):
    """RERANK "query" ON <field> [WITH <inference_id>] (x-pack esql
    Rerank, 8.18): appends _score from the reranking model. No real
    encoder ships in this container, so the inference ids are
    DETERMINISTIC MOCKS (the reference's own yaml tests run against mock
    inference services the same way):

      overlap (default) — |distinct query tokens ∩ distinct field
        tokens|, fully vectorized (split -> is_in -> unique (row,code)
        pairs) and oracle-expressible in SQL;
      hash-cosine — cosine between FNV feature-hash embeddings
        (functions/inference.py stub model).

    At scale the mock is replaced by an actor-pool model stage; the
    batch plumbing (broadcast query, per-batch vectorized scoring) is
    the real pattern."""
    m = re.fullmatch(
        r'"((?:[^"\\]|\\.)*)"\s+ON\s+([\w.]+)(?:\s+WITH\s+([\w-]+))?',
        body.strip(), flags=re.I)
    if not m:
        raise ValueError(f"unsupported RERANK: {body!r}")
    qtext, field, inf_id = m.group(1), m.group(2), m.group(3) or "overlap"
    qtoks = [w for w in re.split(r"[^a-z0-9]+", qtext.lower()) if w]

    if inf_id == "hash-cosine":
        from .inference import _hash_tokens

        qv = _hash_tokens(qtoks, 32)

        def f(t: pa.Table) -> pa.Table:
            texts = t[field].to_pylist()
            pat = re.compile(r"[^a-z0-9]+")
            scores = np.array([
                float(np.dot(_hash_tokens(
                    [w for w in pat.split((s or "").lower()) if w], 32), qv))
                for s in texts])
            return t.append_column("_score", pa.array(scores, pa.float64()))

        return f

    qset = pa.array(sorted(set(qtoks)), pa.string())

    def f(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t[field])
        toks = pc.split_pattern_regex(low, "[^a-z0-9]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        rows = pc.list_parent_indices(toks)
        hit = pc.and_(pc.is_in(flat, value_set=qset),
                      pc.not_equal(flat, ""))
        r = np.asarray(rows)[np.asarray(hit)]
        # distinct matched tokens per row: unique (row, token-code) pairs
        codes = pd.factorize(np.asarray(flat.to_pandas())[np.asarray(hit)])[0]
        uniq = np.unique(np.stack([r, codes], axis=1), axis=0) \
            if len(r) else np.empty((0, 2), np.int64)
        score = np.bincount(uniq[:, 0].astype(np.int64),
                            minlength=len(t)).astype(np.int64)
        return t.append_column("_score", pa.array(score, pa.int64()))

    return f


def _completion_fn(body: str):
    """COMPLETION <target> = <prompt expr> [WITH <inference_id>]
    (x-pack esql Completion, 8.19): appends the model completion of the
    prompt. The only inference id in this container is the DETERMINISTIC
    MOCK `echo-5` — 'OK: ' + the prompt's first five whitespace tokens —
    mirroring the reference's mock-service yaml tests; the plumbing
    (prompt expr evaluated per batch, completion appended) is real."""
    m = re.fullmatch(r"([\w.]+)\s*=\s*(.+?)(?:\s+WITH\s+([\w-]+))?",
                     body.strip(), flags=re.I | re.S)
    if not m:
        raise ValueError(f"unsupported COMPLETION: {body!r}")
    target, expr, inf_id = m.group(1), m.group(2), m.group(3) or "echo-5"
    if inf_id != "echo-5":
        raise ValueError(f"unknown inference id {inf_id!r} (mock: echo-5)")
    from .esql_expr import parse_expr

    ast = parse_expr(expr)

    def f(t: pa.Table) -> pa.Table:
        from .esql_expr import evaluate

        prompt = evaluate(ast, t)
        if not isinstance(prompt, (pa.Array, pa.ChunkedArray)):
            prompt = pa.array([str(prompt)] * len(t))
        toks = pc.split_pattern(prompt, " ")
        head = pc.list_slice(toks, 0, 5)
        out = pc.binary_join_element_wise(
            pa.array(["OK:"] * len(t)), pc.binary_join(head, " "), " ")
        return t.append_column(target, out)

    return f


def _sample_fn(body: str):
    """SAMPLE <probability> [<seed>] (x-pack esql Sample command, 8.18).

    The reference samples with a per-row RNG; this engine derives the keep
    decision from a Knuth multiplicative hash of the row's first int64
    column so the sample is DETERMINISTIC, partition-invariant, and
    oracle-expressible in SQL: keep iff
    ((key*2654435761 + seed*40503) % 2^32) < p * 2^32."""
    parts = body.split()
    prob = float(parts[0])
    seed = int(parts[1]) if len(parts) > 1 else 0
    threshold = int(prob * 4294967296)

    def f(t: pa.Table) -> pa.Table:
        key = None
        for i, typ in enumerate(t.schema.types):
            if pa.types.is_integer(typ):
                key = t.column(i)
                break
        if key is None:
            raise ValueError("SAMPLE needs an integer column as hash key")
        k = np.asarray(pc.cast(key, pa.int64())).astype(np.uint64)
        h = (k * np.uint64(2654435761) + np.uint64(seed * 40503)) \
            % np.uint64(4294967296)
        return t.filter(pa.array(h < np.uint64(threshold)))

    return f


def _inline_join_fn(frame: pd.DataFrame, by: list[str]):
    """Per-batch merge of the broadcast INLINESTATS group table."""
    import ray

    ref = ray.put(frame)

    def f(t: pa.Table) -> pa.Table:
        fr = ray.get(ref)
        df = t.to_pandas()
        if by:
            joined = df.merge(fr, on=by, how="left")
        else:
            joined = df.assign(**{c: fr[c].iloc[0] for c in fr.columns})
        # empty batches must keep the group table's dtypes, not object
        for c in fr.columns:
            if c not in by:
                joined[c] = joined[c].astype(fr[c].dtype)
        return pa.Table.from_pandas(joined, preserve_index=False)

    return f


def _over_time_table(ds, ot_specs, by: list[str]) -> pd.DataFrame:
    """Nested TS aggregates OUTER(INNER_OVER_TIME(col)) (x-pack esql 8.19
    time-series functions): the inner reduce runs per series — the _tsid
    analog here is the events table's dimension column `user_id` plus the
    BY keys — and the outer combines series within each BY group.

    Scale shape: per-batch partial per-series combiner (sum/count/min/max
    in integer cents; LAST/FIRST carry their timestamp), driver merges a
    table bounded by series-cardinality x batches — never row cardinality.
    No shuffle: the exchange is the partial frames themselves."""
    skeys = (["user_id"] if "user_id" not in by else []) + by
    need_ts = any(s[3][1] in ("LAST", "FIRST") for s in ot_specs)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if need_ts:
            df["_ts_us"] = df["ts"].astype(
                "datetime64[us]").astype(np.int64)
            df = df.sort_values("_ts_us", kind="mergesort")
        aggmap: dict[str, tuple] = {}
        for alias, _, col, (outer, inner), _w in ot_specs:
            df[f"_c_{alias}"] = np.round(
                df[col].to_numpy(np.float64) * 100)
            if inner == "AVG":
                aggmap[f"_s_{alias}"] = (f"_c_{alias}", "sum")
                aggmap[f"_n_{alias}"] = (col, "count")
            elif inner == "SUM":
                aggmap[f"_s_{alias}"] = (f"_c_{alias}", "sum")
            elif inner == "COUNT":
                aggmap[f"_n_{alias}"] = (col, "count")
            elif inner == "MIN":
                aggmap[f"_mn_{alias}"] = (f"_c_{alias}", "min")
            elif inner == "MAX":
                aggmap[f"_mx_{alias}"] = (f"_c_{alias}", "max")
            else:  # LAST / FIRST: value at the extreme timestamp
                pos = "last" if inner == "LAST" else "first"
                aggmap[f"_v_{alias}"] = (f"_c_{alias}", pos)
                aggmap[f"_t_{alias}"] = (
                    "_ts_us", "max" if inner == "LAST" else "min")
        g = df.groupby(skeys, as_index=False).agg(**aggmap)
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    aggmap2: dict[str, tuple] = {}
    for alias, _, col, (outer, inner), _w in ot_specs:
        if inner in ("AVG", "SUM"):
            aggmap2[f"_s_{alias}"] = (f"_s_{alias}", "sum")
        if inner in ("AVG", "COUNT"):
            aggmap2[f"_n_{alias}"] = (f"_n_{alias}", "sum")
        if inner == "MIN":
            aggmap2[f"_mn_{alias}"] = (f"_mn_{alias}", "min")
        if inner == "MAX":
            aggmap2[f"_mx_{alias}"] = (f"_mx_{alias}", "max")
    merged = parts.groupby(skeys, as_index=False).agg(**aggmap2) \
        if aggmap2 else parts[skeys].drop_duplicates().reset_index(drop=True)
    for alias, _, col, (outer, inner), _w in ot_specs:
        if inner in ("LAST", "FIRST"):
            fn = "idxmax" if inner == "LAST" else "idxmin"
            idx = getattr(parts.groupby(skeys)[f"_t_{alias}"], fn)()
            sub = parts.loc[idx, skeys + [f"_v_{alias}"]]
            merged = merged.merge(sub, on=skeys)
    series = merged[skeys].copy()
    for alias, _, col, (outer, inner), _w in ot_specs:
        if inner == "AVG":
            series[alias] = (merged[f"_s_{alias}"] / 100.0
                             / merged[f"_n_{alias}"])
        elif inner == "SUM":
            series[alias] = merged[f"_s_{alias}"] / 100.0
        elif inner == "COUNT":
            series[alias] = merged[f"_n_{alias}"].astype("int64")
        elif inner == "MIN":
            series[alias] = merged[f"_mn_{alias}"] / 100.0
        elif inner == "MAX":
            series[alias] = merged[f"_mx_{alias}"] / 100.0
        else:
            series[alias] = merged[f"_v_{alias}"] / 100.0
    outer_map = {"AVG": "mean", "SUM": "sum", "MIN": "min", "MAX": "max"}
    cols = {alias: outer_map[s[3][0]] for s in ot_specs
            for alias in [s[0]]}
    if by:
        out = series.groupby(by, as_index=False).agg(
            **{a: (a, f) for a, f in cols.items()})
    else:
        out = pd.DataFrame([{a: getattr(series[a], f)()
                             for a, f in cols.items()}])
    for alias, _, col, (outer, inner), _w in ot_specs:
        if inner == "COUNT" and outer == "SUM":
            out[alias] = out[alias].astype("int64")
    return out


def _stats_table(ds, specs, by: list[str]) -> pd.DataFrame:
    """Reduce a dataset to its STATS group table (driver-small: bounded by
    group cardinality, never row count). Shared by STATS (terminal) and
    INLINESTATS (joined back onto the row stream)."""
    # COUNT_DISTINCT / MEDIAN / PERCENTILE / VALUES run as an exact
    # two-level pair exchange: per-batch (by, col) -> local count combiner
    # -> ONE global pair groupby -> per-key pair counts; the driver then
    # reduces a table bounded by VALUE CARDINALITY per group, never row
    # cardinality. (The reference's PERCENTILE/MEDIAN are T-Digest sketches
    # — PercentilesAggregationBuilder; the sketched analog is
    # aggs/tdigest.py. This exact path exists so the DuckDB oracle matches
    # bit-for-bit, same trade as esql COUNT_DISTINCT vs agg_cardinality.)
    from .esql_expr import compile_predicate

    alias_order = [a for a, *_ in specs]
    # one compiled mask per distinct per-agg WHERE source (8.16 filtered
    # aggregates); compiled once here, applied per batch inside the partials
    preds = {w: compile_predicate(w) for *_, w in specs if w}
    pair_fns = ("COUNT_DISTINCT", "MEDIAN", "PERCENTILE", "VALUES",
                "MEDIAN_ABSOLUTE_DEVIATION")
    pair_specs = [s for s in specs if s[1] in pair_fns]
    rate_specs = [s for s in specs if s[1] == "RATE"]
    ot_specs = [s for s in specs if s[1] == "OVER_TIME"]
    top_specs = [s for s in specs if s[1] == "TOP"]
    specs = [s for s in specs if s[1] not in pair_fns
             and s[1] not in ("RATE", "OVER_TIME", "TOP")]
    pair_frames: list[pd.DataFrame] = []
    if ot_specs:
        pair_frames.append(_over_time_table(ds, ot_specs, by))
    # TOP(col, k, order) (Top.java, 8.16): per-batch partial top-k per
    # group (each batch emits at most k rows per group), driver merges
    # (batches x groups x k) rows and re-takes the top k as a list
    for alias, fn, col, (kk, order), where in top_specs:
        asc = order == "asc"

        def local_top(t: pa.Table, _c=col, _k=kk, _a=asc,
                      _w=where) -> pa.Table:
            if _w is not None:
                t = preds[_w](t)
            df = t.select((by + [_c]) if by else [_c]).to_pandas()
            df = df.sort_values(_c, ascending=_a, kind="mergesort")
            g = df.groupby(by).head(_k) if by else df.head(_k)
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = (ds.map_batches(local_top, batch_format="pyarrow")
                 .to_pandas())
        parts = parts.sort_values(col, ascending=asc, kind="mergesort")
        if by:
            top = parts.groupby(by).head(kk)
            r = (top.groupby(by)[col].agg(list).rename(alias)
                 .reset_index())
        else:
            r = pd.DataFrame({alias: [parts.head(kk)[col].tolist()]})
        pair_frames.append(r)
    # RATE(counter[, tscol]) (esql Rate aggregate under the TS command,
    # 8.13 time-series mode): Prometheus-style counter rate — sum of
    # positive increments (a reset contributes the new value) over the
    # observed span. Needs every sample of a (dims, bucket) series
    # co-located and time-ordered, so this is the one STATS path that
    # shuffles rows: ONE groupby(by) keyed by the (small) dim columns,
    # increments computed inside map_groups. Group size is bounded by
    # samples-per-series-per-bucket (the reference co-locates by _tsid
    # the same way). Increments accumulate in integer cents so the sum
    # is order-invariant and bit-identical to the SQL oracle.
    for alias, fn, col, arg2, where in rate_specs:
        if not by:
            raise ValueError("RATE requires BY dimensions (a time series)")
        tscol = arg2 or "ts"

        def rate_group(g: pd.DataFrame, _c=col, _t=tscol,
                       _a=alias) -> pd.DataFrame:
            g = g.sort_values(_t)
            cents = np.round(
                g[_c].to_numpy(np.float64) * 100).astype(np.int64)
            ts = g[_t].to_numpy().astype("datetime64[us]").astype(np.int64)
            if len(g) < 2 or ts[-1] == ts[0]:
                r = np.nan
            else:
                d = np.diff(cents)
                inc = int(np.where(d >= 0, d, cents[1:]).sum())
                r = (inc / 100.0) / ((ts[-1] - ts[0]) / 1e6)
            return pd.DataFrame({**{k: [g[k].iloc[0]] for k in by},
                                 _a: [r]})

        sub = ds
        if where is not None:
            sub = sub.map_batches(lambda t, _w=where: preds[_w](t),
                                  batch_format="pyarrow")
        pair_frames.append(
            sub.groupby(by).map_groups(rate_group, batch_format="pandas")
            .to_pandas())
    for alias, fn, col, arg2, where in pair_specs:
        keys = by + [col]

        def local_pairs(t: pa.Table, _k=tuple(keys), _w=where) -> pa.Table:
            if _w is not None:
                t = preds[_w](t)
            g = (t.select(list(_k)).group_by(list(_k))
                 .aggregate([([], "count_all")]))
            return g.rename_columns(
                ["_c" if c == "count_all" else c for c in g.column_names])

        from ray.data.aggregate import Sum

        pairs = (ds.map_batches(local_pairs, batch_format="pyarrow")
                 .groupby(keys).aggregate(Sum("_c", alias_name="_c"))
                 .to_pandas())
        if fn == "COUNT_DISTINCT":
            if by:
                r = pairs.groupby(by, as_index=False).size().rename(
                    columns={"size": alias})
            else:
                r = pd.DataFrame({alias: [len(pairs)]})
            r[alias] = r[alias].astype("int64")
        elif fn == "VALUES":
            # multivalue result: sorted distinct values per group
            if by:
                r = (pairs.sort_values(col).groupby(by)[col]
                     .agg(list).rename(alias).reset_index())
            else:
                r = pd.DataFrame({alias: [sorted(pairs[col].tolist())]})
        else:  # MEDIAN / PERCENTILE / MAD: weighted quantiles over pair counts
            q = 0.5 if fn in ("MEDIAN", "MEDIAN_ABSOLUTE_DEVIATION") \
                else float(arg2) / 100.0

            def wq(g: pd.DataFrame, _q=q) -> float:
                o = np.argsort(g[col].to_numpy())
                v = g[col].to_numpy()[o]
                cum = np.cumsum(g["_c"].to_numpy()[o])
                h = (cum[-1] - 1) * _q
                lo, hi = int(np.floor(h)), int(np.ceil(h))
                vlo = v[np.searchsorted(cum, lo, side="right")]
                vhi = v[np.searchsorted(cum, hi, side="right")]
                return vlo + (h - lo) * (vhi - vlo)

            if fn == "MEDIAN_ABSOLUTE_DEVIATION":
                # MedianAbsoluteDeviation (esql): median(|x - median(x)|),
                # both passes over the SAME reduced pair-count table —
                # exact twin of the reference's sketch-backed agg
                def wq1(g: pd.DataFrame, _wq=wq) -> float:
                    med = _wq(g)
                    g2 = g.copy()
                    g2[col] = (g2[col] - med).abs()
                    return _wq(g2)
                wq = wq1

            if by:
                r = (pairs.groupby(by)[[col, "_c"]].apply(wq)
                     .rename(alias).reset_index())
            else:
                r = pd.DataFrame({alias: [wq(pairs)]})
        pair_frames.append(r)
    if not specs:
        out = pair_frames[0]
        for r in pair_frames[1:]:
            # outer: a filtered aggregate must not drop groups the other
            # aggregates saw (FilteredExpression group-presence semantics)
            out = out.merge(r, on=by, how="outer") if by \
                else pd.concat([out, r], axis=1)
        if by:
            out = out.sort_values(by).reset_index(drop=True)
        return out[by + alias_order]

    # STD_DEV / WEIGHTED_AVG accumulate on a 1e2 fixed-point grid
    # (int64 cents) so the partial fold is order-invariant and the final
    # float is bit-identical to the oracle's explicit-formula SQL; exact
    # for inputs with <= 2 decimals (all numeric test columns).
    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if df.empty:
            return pa.table({})
        frames = {None: df}
        for w, p in preds.items():
            frames[w] = p(t).to_pandas()

        def grp(d):
            return d.groupby(by) if by else d.assign(__g=0).groupby("__g")

        groups = {w: grp(d) for w, d in frames.items()}
        # group presence comes from ALL rows: a group whose per-agg
        # filters match nothing must still appear (with 0/null values)
        out = {"__all__": groups[None].size()}
        for alias, fn, col, arg2, where in specs:
            df_s, g = frames[where], groups[where]
            if fn == "COUNT":
                out[f"__c_{alias}"] = g.size()
            elif fn in ("SUM", "AVG"):
                out[f"__s_{alias}"] = g[col].sum()
                out[f"__c_{alias}"] = g[col].size()
            elif fn == "MIN":
                out[f"__mn_{alias}"] = g[col].min()
            elif fn == "MAX":
                out[f"__mx_{alias}"] = g[col].max()
            elif fn == "STD_DEV":
                cents = np.round(df_s[col].to_numpy() * 100).astype(np.int64)
                d2 = df_s.assign(__v=cents, __v2=cents * cents)
                g2 = grp(d2)
                out[f"__c_{alias}"] = g2.size()
                out[f"__s_{alias}"] = g2["__v"].sum()
                out[f"__q_{alias}"] = g2["__v2"].sum()
            elif fn == "WEIGHTED_AVG":
                cv = np.round(df_s[col].to_numpy() * 100).astype(np.int64)
                cw = np.round(df_s[arg2].to_numpy() * 100).astype(np.int64)
                d2 = df_s.assign(__vw=cv * cw, __w=cw)
                g2 = grp(d2)
                out[f"__s_{alias}"] = g2["__vw"].sum()
                out[f"__w_{alias}"] = g2["__w"].sum()
            elif fn == "ST_CENTROID_AGG":
                # SpatialCentroid (esql 8.12): arithmetic mean of the
                # point coordinates. Partials accumulate on the 1e2
                # fixed-point grid like STD_DEV (order-invariant int64
                # sums; exact for <=2-decimal coordinates)
                from .esql_expr import _wkt_xy

                xs, ys = _wkt_xy(pa.array(df_s[col].astype(str)),
                                 len(df_s))
                d2 = df_s.assign(
                    __x=np.round(xs * 100).astype(np.int64),
                    __y=np.round(ys * 100).astype(np.int64))
                g2 = grp(d2)
                out[f"__c_{alias}"] = g2.size()
                out[f"__x_{alias}"] = g2["__x"].sum()
                out[f"__y_{alias}"] = g2["__y"].sum()
            elif fn == "ST_EXTENT_AGG":
                # SpatialExtent (esql 8.18): per-group bounding box of
                # the points. min/max partials merge exactly (order-
                # invariant) — no fixed-point grid needed.
                from .esql_expr import _wkt_xy

                xs, ys = _wkt_xy(pa.array(df_s[col].astype(str)),
                                 len(df_s))
                d2 = df_s.assign(__x=xs, __y=ys)
                g2 = grp(d2)
                out[f"__mnx_{alias}"] = g2["__x"].min()
                out[f"__mxx_{alias}"] = g2["__x"].max()
                out[f"__mny_{alias}"] = g2["__y"].min()
                out[f"__mxy_{alias}"] = g2["__y"].max()
        res = pd.DataFrame(out).reset_index()
        if not by:
            res = res.drop(columns="__g")
        return pa.Table.from_pandas(res, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # an all-empty partial stream loses its schema in to_pandas() (0x0
    # frame) — e.g. every per-agg filter matched nothing; re-materialize
    # the expected partial columns so the merge below stays well-typed
    _prefixes = {"COUNT": ("__c",), "SUM": ("__s", "__c"),
                 "AVG": ("__s", "__c"), "MIN": ("__mn",), "MAX": ("__mx",),
                 "STD_DEV": ("__c", "__s", "__q"),
                 "WEIGHTED_AVG": ("__s", "__w"),
                 "ST_CENTROID_AGG": ("__c", "__x", "__y"),
                 "ST_EXTENT_AGG": ("__mnx", "__mxx", "__mny", "__mxy")}
    for alias, fn, *_ in specs:
        for p in _prefixes[fn]:
            if f"{p}_{alias}" not in parts.columns:
                parts[f"{p}_{alias}"] = np.nan
    for k in by:
        if k not in parts.columns:
            parts[k] = pd.Series([], dtype=object)
    if by:
        merged = parts.groupby(by, as_index=False).sum(min_count=1)
    else:
        # min_count=1 keeps an all-null partial column null (a filtered
        # aggregate whose mask matched no rows) instead of summing to 0
        merged = pd.DataFrame([{
            c: (parts[c].min() if c.startswith("__mn") else
                parts[c].max() if c.startswith("__mx") else
                parts[c].sum(min_count=1))
            for c in parts.columns}])
    # min/max partials merge by min/max, not sum
    for alias, fn, *_ in specs:
        if fn == "MIN" and by:
            merged[f"__mn_{alias}"] = (
                parts.groupby(by)[f"__mn_{alias}"].min().to_numpy())
        if fn == "MAX" and by:
            merged[f"__mx_{alias}"] = (
                parts.groupby(by)[f"__mx_{alias}"].max().to_numpy())
        if fn == "ST_EXTENT_AGG" and by:
            gg = parts.groupby(by)
            merged[f"__mnx_{alias}"] = gg[f"__mnx_{alias}"].min().to_numpy()
            merged[f"__mxx_{alias}"] = gg[f"__mxx_{alias}"].max().to_numpy()
            merged[f"__mny_{alias}"] = gg[f"__mny_{alias}"].min().to_numpy()
            merged[f"__mxy_{alias}"] = gg[f"__mxy_{alias}"].max().to_numpy()

    out = merged[by].copy() if by else pd.DataFrame(index=[0])
    for alias, fn, *_ in specs:
        if fn == "COUNT":
            # a filtered COUNT over a group with no qualifying rows is 0
            out[alias] = merged[f"__c_{alias}"].fillna(0).astype("int64")
        elif fn == "SUM":
            out[alias] = merged[f"__s_{alias}"]
        elif fn == "AVG":
            out[alias] = merged[f"__s_{alias}"] / merged[f"__c_{alias}"]
        elif fn == "MIN":
            out[alias] = merged[f"__mn_{alias}"]
        elif fn == "MAX":
            out[alias] = merged[f"__mx_{alias}"]
        elif fn == "STD_DEV":
            # sample std from exact integer moments: the oracle runs the
            # same formula over the same ints -> identical doubles
            n = merged[f"__c_{alias}"].to_numpy().astype(np.float64)
            s = merged[f"__s_{alias}"].to_numpy().astype(np.float64)
            qq = merged[f"__q_{alias}"].to_numpy().astype(np.float64)
            out[alias] = np.sqrt((qq - s * s / n) / (n - 1)) / 100.0
        elif fn == "WEIGHTED_AVG":
            s = merged[f"__s_{alias}"].to_numpy().astype(np.float64)
            w = merged[f"__w_{alias}"].to_numpy().astype(np.float64)
            out[alias] = s / (100.0 * w)
        elif fn == "ST_CENTROID_AGG":
            n = merged[f"__c_{alias}"].to_numpy().astype(np.float64)
            sx = merged[f"__x_{alias}"].to_numpy().astype(np.float64)
            sy = merged[f"__y_{alias}"].to_numpy().astype(np.float64)
            # rendered as WKT like the reference's point output; repr is
            # shortest-roundtrip so ST_X/ST_Y recover the exact doubles
            out[alias] = ["POINT (" + repr(x) + " " + repr(y) + ")"
                          for x, y in zip(sx / (100.0 * n),
                                          sy / (100.0 * n))]
        elif fn == "ST_EXTENT_AGG":
            # ES Rectangle WKT: BBOX (west, east, north, south)
            out[alias] = [
                f"BBOX ({w!r}, {e!r}, {nn!r}, {s_!r})"
                for w, e, nn, s_ in zip(merged[f"__mnx_{alias}"],
                                        merged[f"__mxx_{alias}"],
                                        merged[f"__mxy_{alias}"],
                                        merged[f"__mny_{alias}"])]

    for r in pair_frames:
        # left merge: group presence comes from ALL rows (a filtered
        # aggregate whose mask matched nothing in a group yields null
        # there, it does not drop the group — FilteredExpression semantics)
        out = out.merge(r, on=by, how="left") if by \
            else pd.concat([out, r], axis=1)
    return out[by + alias_order]


def _apply_post(out: pd.DataFrame, post: list[tuple[str, str]]) -> pd.DataFrame:
    """SORT/LIMIT/KEEP/WHERE over the already-reduced (driver-small) frame."""
    for cmd, body in post:
        if cmd == "SORT":
            out = _sort_frame(out, _parse_sort_specs(body))
        elif cmd == "LIMIT":
            out = out.head(int(body))
        elif cmd == "KEEP":
            out = out[_expand_cols([c.strip() for c in body.split(",")],
                                   list(out.columns))]
        elif cmd == "WHERE":  # post-STATS HAVING-style filter (driver-small)
            from .esql_expr import compile_predicate

            t = pa.Table.from_pandas(out, preserve_index=False)
            out = compile_predicate(body)(t).to_pandas()
        elif cmd == "CHANGE_POINT":
            out = _change_point(out, body)
        elif cmd in ("RRF", "FUSE"):
            out = _rrf(out, body)
    return out.reset_index(drop=True)


def _rrf(out: pd.DataFrame, body: str) -> pd.DataFrame:
    """RRF / FUSE (x-pack esql Fuse command, 8.19 experimental —
    RrfScoreEval): reciprocal-rank fusion of FORK branch results.
    Each branch's hits are ranked by (_score desc, key asc); the fused
    score is sum over branches of 1/(rank_constant + rank). Runs on the
    concatenated branch frames — driver-small by the FORK contract
    (every branch is a reduced/LIMITed pipeline).
    Syntax: RRF|FUSE [rrf|linear] [ON <key>] [WITH <rank_constant>].
    The 8.19 `linear` method minmax-normalizes each branch's scores over
    its (LIMITed) window and sums, instead of rank-reciprocal fusion."""
    m = re.fullmatch(
        r"(?:(rrf|linear)\b)?\s*(?:ON\s+([\w.]+))?\s*(?:WITH\s+(\d+))?",
        body.strip(), flags=re.I)
    if not m or "_fork" not in out.columns:
        raise ValueError("RRF/FUSE requires FORK branches and an optional "
                         "'[method] ON key WITH k' body")
    method = (m.group(1) or "rrf").lower()
    key = m.group(2) or "doc_id"
    k0 = int(m.group(3) or 60)
    if method == "linear":
        def norm(g: pd.Series) -> pd.Series:
            lo, hi = g.min(), g.max()
            return g * 0.0 if hi == lo else (g - lo) / (hi - lo)

        d = out.copy()
        d["_v"] = d.groupby("_fork")["_score"].transform(norm)
        fused = (d.groupby(key, as_index=False)["_v"].sum()
                 .rename(columns={"_v": "_score"}))
    else:
        d = out.sort_values(["_fork", "_score", key],
                            ascending=[True, False, True]
                            ).reset_index(drop=True)
        d["_rank"] = d.groupby("_fork").cumcount() + 1
        fused = (d.assign(_rrf=1.0 / (k0 + d["_rank"]))
                 .groupby(key, as_index=False)["_rrf"].sum()
                 .rename(columns={"_rrf": "_score"}))
    return (fused.sort_values(["_score", key], ascending=[False, True])
            .reset_index(drop=True))


def _change_point(out: pd.DataFrame, body: str) -> pd.DataFrame:
    """CHANGE_POINT <value> ON <key> [AS <type_col>, <pvalue_col>] (x-pack
    esql ChangePoint command, 8.18). Simplified to the CUSUM mean-shift
    statistic (same kernel as the change_point agg, ops.py
    agg_change_point): the change row is argmax |cumsum(v - mean)| over
    the key-ordered series; `type` is 'step_change' and `pvalue` a
    two-sided z-test between the two segments. The input is the reduced
    STATS table — driver-small by contract (the reference caps the
    command at 1,000 rows for the same reason)."""
    m = re.fullmatch(r"([\w.]+)\s+ON\s+([\w.]+)"
                     r"(?:\s+AS\s+([\w.]+)\s*,\s*([\w.]+))?", body.strip(),
                     flags=re.I)
    if not m:
        raise ValueError(f"unsupported CHANGE_POINT: {body!r}")
    val, key, tcol, pcol = m.groups()
    tcol, pcol = tcol or "type", pcol or "pvalue"
    out = out.sort_values(key).reset_index(drop=True)
    v = out[val].to_numpy().astype(np.float64)
    cu = np.cumsum(v - v.mean())
    # cu[-1] == 0 by construction; argmax over the interior splits the
    # series into two non-empty segments
    i = int(np.argmax(np.abs(cu[:-1])))
    before, after = v[:i + 1], v[i + 1:]
    se = np.sqrt(before.var(ddof=1) / len(before) +
                 after.var(ddof=1) / len(after)) or 1.0
    z = abs(float(after.mean() - before.mean()) / se)
    pv = float(math.erfc(z / math.sqrt(2.0)))
    out[tcol] = pd.Series([None] * len(out), dtype=object)
    out.loc[i, tcol] = "step_change"
    out[pcol] = np.nan
    out.loc[i, pcol] = pv
    return out


def _run_row_mode(ds, post: list[tuple[str, str]]) -> pd.DataFrame:
    """Row-returning pipelines (no STATS): bounded by LIMIT — or by the
    reference's implicit result-truncation default of 1000 rows
    (esql.query.result_truncation_default_size) when no LIMIT is given.
    With SORT the scale shape is per-batch partial top-k (each batch
    emits at most `limit` rows), driver merge of (batches x limit)."""
    specs: list[tuple[str, bool, str]] = []
    limit = None
    keep = None
    for cmd, body in post:
        if cmd == "SORT":
            specs.extend(_parse_sort_specs(body))
        elif cmd == "LIMIT":
            limit = int(body)
        elif cmd == "KEEP":
            keep = [c.strip() for c in body.split(",")]
        else:
            raise ValueError(f"unsupported row-mode command: {cmd}")
    if limit is None:
        limit = 1000  # implicit truncation, EsqlPlugin QUERY_RESULT_TRUNCATION

    if specs:
        n = limit

        def partial_topk(t: pa.Table) -> pa.Table:
            df = _sort_frame(t.to_pandas(), specs).head(n)
            return pa.Table.from_pandas(df, preserve_index=False)

        parts = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
        if any(sp[0] not in parts.columns for sp in specs):
            # a fully-filtered stream reaches the driver with NO schema
            # (Ray emits zero-row bundles schema-less); rebuild the typed
            # empty frame from the plan's schema so SORT/KEEP still work
            parts = _empty_frame(ds)
        out = _sort_frame(parts, specs).head(limit)
    else:
        out = ds.limit(limit).to_pandas()
        if out.shape == (0, 0):
            out = _empty_frame(ds)
    if keep:
        out = out[_expand_cols(keep, list(out.columns))]
    return out.reset_index(drop=True)


def _empty_frame(ds) -> pd.DataFrame:
    """Typed empty pandas frame matching a Dataset's schema (edge path
    only — runs when a pipeline produced zero rows)."""
    sch = ds.schema()
    if sch is None:
        return pd.DataFrame()
    return pa.table({f.name: pa.array([], f.type)
                     for f in sch.base_schema}).to_pandas()


def _grok_fn(body: str):
    """GROK <col> <pattern> — %{SYNTAX:name} captures over the ingest
    grok pattern bank (x-pack esql Grok command shares the processor's
    bank), vectorized as pc.extract_regex per batch."""
    from .ingest import GROK_PATTERNS

    col, _, pattern = body.partition(" ")
    pattern = pattern.strip()
    if pattern.startswith('"') and pattern.endswith('"'):
        pattern = pattern[1:-1]

    types: dict[str, str] = {}

    def sub(m):
        if m.group(3):
            types[m.group(2)] = m.group(3)
        return f"(?P<{m.group(2)}>{GROK_PATTERNS[m.group(1)]})"

    rx = re.sub(r"%\{(\w+):(\w+)(?::(int|long|float|double|boolean))?\}",
                sub, pattern)

    def f(t: pa.Table) -> pa.Table:
        st = pc.extract_regex(t[col], rx)
        for field in st.type:
            v = pc.struct_field(st, field.name)
            typ = types.get(field.name)
            if typ in ("int", "long"):
                v = pc.cast(v, pa.int64())
            elif typ in ("float", "double"):
                v = pc.cast(v, pa.float64())
            elif typ == "boolean":
                v = pc.equal(pc.utf8_lower(v), "true")
            t = t.append_column(field.name, v)
        return t

    return f
