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

Only literal comparisons, AND conjunctions and binary arithmetic are
supported — enough to run the reference's documented example pipelines.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_CMP = {"==": "equal", "!=": "not_equal", ">=": "greater_equal",
        "<=": "less_equal", ">": "greater", "<": "less"}
_AGGS = {"COUNT", "SUM", "AVG", "MIN", "MAX"}


def _lit(tok: str):
    tok = tok.strip()
    if tok.startswith('"') and tok.endswith('"'):
        return tok[1:-1]
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    return float(tok)


def parse(query: str) -> list[tuple[str, str]]:
    """Split an ES|QL string into (COMMAND, body) stages."""
    stages = []
    for seg in query.split("|"):
        seg = seg.strip()
        if not seg:
            continue
        cmd, _, body = seg.partition(" ")
        stages.append((cmd.upper(), body.strip()))
    if not stages or stages[0][0] != "FROM":
        raise ValueError("ES|QL query must start with FROM")
    return stages


def _where_fn(body: str):
    conds = []
    for clause in re.split(r"\s+AND\s+", body, flags=re.I):
        m = re.fullmatch(r"([\w.]+)\s*(==|!=|>=|<=|>|<)\s*(.+)", clause.strip())
        if not m:
            raise ValueError(f"unsupported WHERE clause: {clause!r}")
        conds.append((m.group(1), _CMP[m.group(2)], _lit(m.group(3))))

    def f(t: pa.Table) -> pa.Table:
        mask = None
        for col, op, lit in conds:
            m = getattr(pc, op)(t[col], lit)
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask)

    return f


def _eval_fn(body: str):
    name, _, expr = body.partition("=")
    name = name.strip()
    m = re.fullmatch(r"([\w.]+)\s*([+\-*/])\s*([\w.\"]+)", expr.strip())
    if not m:
        raise ValueError(f"unsupported EVAL expression: {expr!r}")
    lhs, op, rhs = m.groups()
    opf = {"+": pc.add, "-": pc.subtract, "*": pc.multiply,
           "/": pc.divide}[op]

    def f(t: pa.Table) -> pa.Table:
        a = t[lhs]
        b = t[rhs] if rhs in t.column_names else _lit(rhs)
        return t.append_column(name, opf(a, b))

    return f


def _parse_stats(body: str) -> tuple[list[tuple[str, str, str]], list[str]]:
    aggs_part, _, by_part = body.partition(" BY ")
    by = [c.strip() for c in by_part.split(",") if c.strip()]
    specs = []
    for item in aggs_part.split(","):
        alias, _, call = item.partition("=")
        m = re.fullmatch(r"(\w+)\(\s*(\*|[\w.]+)\s*\)", call.strip())
        if not m or m.group(1).upper() not in _AGGS:
            raise ValueError(f"unsupported STATS agg: {item!r}")
        specs.append((alias.strip(), m.group(1).upper(), m.group(2)))
    return specs, by


def run(sf_dir: str, query: str, *, reader=None) -> pd.DataFrame:
    """Execute an ES|QL pipe query; returns the reduced pandas result."""
    import os

    import ray.data as rd

    stages = parse(query)
    table = stages[0][1].split()[0]

    # column pruning: every identifier later stages reference
    used: set[str] = set()
    for cmd, body in stages[1:]:
        used.update(re.findall(r"[A-Za-z_][\w.]*", body))
    if reader is not None:
        ds = reader(table)
    else:
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, f"{table}.parquet")
        schema = pq.read_schema(path).remove_metadata()
        cols = [c for c in schema.names if c in used] or schema.names
        ds = rd.read_parquet(
            path, columns=cols,
            schema=pa.schema([schema.field(c) for c in cols]))

    stats_specs = by = None
    post: list[tuple[str, str]] = []
    for cmd, body in stages[1:]:
        if cmd == "WHERE" and stats_specs is None:
            ds = ds.map_batches(_where_fn(body), batch_format="pyarrow")
        elif cmd == "EVAL" and stats_specs is None:
            ds = ds.map_batches(_eval_fn(body), batch_format="pyarrow")
        elif cmd == "STATS":
            stats_specs, by = _parse_stats(body)
        elif cmd in ("SORT", "LIMIT", "KEEP", "WHERE"):
            post.append((cmd, body))
        else:
            raise ValueError(f"unsupported ES|QL command: {cmd}")

    if stats_specs is None:
        raise ValueError("only STATS-terminated pipelines are supported")
    specs, by = stats_specs, by or []

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if df.empty:
            return pa.table({})
        g = df.groupby(by) if by else df.assign(__g=0).groupby("__g")
        out = {}
        for alias, fn, col in specs:
            if fn == "COUNT":
                out[f"__c_{alias}"] = g.size()
            elif fn in ("SUM", "AVG"):
                out[f"__s_{alias}"] = g[col].sum()
                out[f"__c_{alias}"] = g[col].size()
            elif fn == "MIN":
                out[f"__mn_{alias}"] = g[col].min()
            elif fn == "MAX":
                out[f"__mx_{alias}"] = g[col].max()
        res = pd.DataFrame(out).reset_index()
        if not by:
            res = res.drop(columns="__g")
        return pa.Table.from_pandas(res, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if by:
        merged = parts.groupby(by, as_index=False).sum(min_count=1)
    else:
        agg = {c: ("min" if c.startswith("__mn") else
                   "max" if c.startswith("__mx") else "sum")
               for c in parts.columns}
        merged = pd.DataFrame([{c: parts[c].agg(f) for c, f in agg.items()}])
    # min/max partials merge by min/max, not sum
    for alias, fn, _ in specs:
        if fn == "MIN" and by:
            merged[f"__mn_{alias}"] = (
                parts.groupby(by)[f"__mn_{alias}"].min().to_numpy())
        if fn == "MAX" and by:
            merged[f"__mx_{alias}"] = (
                parts.groupby(by)[f"__mx_{alias}"].max().to_numpy())

    out = merged[by].copy() if by else pd.DataFrame(index=[0])
    for alias, fn, _ in specs:
        if fn == "COUNT":
            out[alias] = merged[f"__c_{alias}"].astype("int64")
        elif fn == "SUM":
            out[alias] = merged[f"__s_{alias}"]
        elif fn == "AVG":
            out[alias] = merged[f"__s_{alias}"] / merged[f"__c_{alias}"]
        elif fn == "MIN":
            out[alias] = merged[f"__mn_{alias}"]
        elif fn == "MAX":
            out[alias] = merged[f"__mx_{alias}"]

    for cmd, body in post:
        if cmd == "SORT":
            keys, asc = [], []
            for item in body.split(","):
                toks = item.split()
                keys.append(toks[0])
                asc.append(not (len(toks) > 1 and toks[1].upper() == "DESC"))
            out = out.sort_values(keys, ascending=asc)
        elif cmd == "LIMIT":
            out = out.head(int(body))
        elif cmd == "KEEP":
            out = out[[c.strip() for c in body.split(",")]]
        elif cmd == "WHERE":  # post-STATS HAVING-style filter
            m = re.fullmatch(r"([\w.]+)\s*(==|!=|>=|<=|>|<)\s*(.+)",
                             body.strip())
            col, op, lit = m.group(1), m.group(2), _lit(m.group(3))
            import operator as _op

            f = {"==": _op.eq, "!=": _op.ne, ">": _op.gt, ">=": _op.ge,
                 "<": _op.lt, "<=": _op.le}[op]
            out = out[f(out[col], lit)]
    return out.reset_index(drop=True)
