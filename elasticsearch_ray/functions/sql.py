"""Minimal _sql API translator (x-pack sql / RestSqlQueryAction analog):
parse a restricted ANSI subset and plan it onto the Ray Dataset API with
column pruning + predicate pushdown at the read, a distributed sort and a
limit. Grammar:

    SELECT col | FN(col|*) AS alias [, ...] FROM <table>
    [WHERE col <op> literal [AND ...]]      op in = != <> < <= > >=
    [GROUP BY col[, ...]]                   FN in COUNT SUM AVG MIN MAX
    [HAVING alias <op> literal]
    [ORDER BY col [ASC|DESC][, ...]]
    [LIMIT n]

Aggregate plans run as per-batch partial combiners (the group-cardinality
table is all that reaches the driver); plain-projection plans stay a
pruned read + pushed predicate + distributed sort + limit.

The reference compiles SQL to QueryDSL + field extractors
(x-pack/plugin/sql); this translator compiles to a Dataset plan instead."""

from __future__ import annotations

import re


class SqlParseError(ValueError):
    pass


_OPS = {"=", "!=", "<>", "<", "<=", ">", ">="}


def parse_sql(sql: str) -> dict:
    s = sql.strip().rstrip(";")
    m = re.match(
        r"(?is)^SELECT\s+(?P<cols>.+?)\s+FROM\s+(?P<table>\w+)"
        r"(?:\s+WHERE\s+(?P<where>.+?))?"
        r"(?:\s+GROUP\s+BY\s+(?P<group>.+?))?"
        r"(?:\s+HAVING\s+(?P<having>.+?))?"
        r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?"
        r"(?:\s+LIMIT\s+(?P<limit>\d+))?$", s)
    if not m:
        raise SqlParseError(f"unsupported SQL: {sql!r}")
    cols = [c.strip() for c in m.group("cols").split(",")]
    aggs = []  # (alias, FN, src_col)
    plain = []
    for c in cols:
        am = re.fullmatch(
            r"(?i)(COUNT|SUM|AVG|MIN|MAX)\(\s*(\*|\w+)\s*\)\s+AS\s+(\w+)", c)
        if am:
            aggs.append((am.group(3), am.group(1).upper(), am.group(2)))
        elif re.fullmatch(r"\w+", c):
            plain.append(c)
        else:
            raise SqlParseError(
                "projections must be columns or FN(col) AS alias")
    group = []
    if m.group("group"):
        group = [g.strip() for g in m.group("group").split(",")]
        if any(not re.fullmatch(r"\w+", g) for g in group):
            raise SqlParseError("GROUP BY takes plain columns")
        if set(plain) - set(group):
            raise SqlParseError("non-aggregated projection outside GROUP BY")
    elif aggs and plain:
        raise SqlParseError("mixing aggregates and columns needs GROUP BY")
    having = None
    if m.group("having"):
        hm = re.match(r"^\s*(\w+)\s*(=|!=|<>|<=|>=|<|>)\s*([-\d.]+)\s*$",
                      m.group("having"))
        if not hm:
            raise SqlParseError(f"unsupported HAVING: {m.group('having')!r}")
        having = (hm.group(1), hm.group(2),
                  float(hm.group(3)) if "." in hm.group(3)
                  else int(hm.group(3)))
    preds = []
    if m.group("where"):
        for clause in re.split(r"(?i)\s+AND\s+", m.group("where")):
            pm = re.match(
                r"^\s*(\w+)\s*(=|!=|<>|<=|>=|<|>)\s*"
                r"('(?:[^']*)'|[-\d.]+)\s*$", clause)
            if not pm:
                raise SqlParseError(f"unsupported predicate: {clause!r}")
            col, op, lit = pm.groups()
            val = lit[1:-1] if lit.startswith("'") else (
                float(lit) if "." in lit else int(lit))
            preds.append((col, op, val))
    order = []
    if m.group("order"):
        for part in m.group("order").split(","):
            om = re.match(r"^\s*(\w+)(?:\s+(ASC|DESC))?\s*$", part,
                          re.IGNORECASE)
            if not om:
                raise SqlParseError(f"unsupported ORDER BY: {part!r}")
            # a repeated key is a no-op after its first appearance (and
            # Ray's sort rejects duplicate key columns) — keep the first
            if any(o[0] == om.group(1) for o in order):
                continue
            order.append((om.group(1),
                          (om.group(2) or "ASC").upper() == "DESC"))
    return {"cols": cols, "plain": plain, "aggs": aggs, "group": group,
            "having": having, "table": m.group("table"), "preds": preds,
            "order": order,
            "limit": int(m.group("limit")) if m.group("limit") else None}


def run_sql(sql: str, sf_dir: str, *, ds_factory):
    """Execute a parsed plan: ds_factory(sf_dir, table, columns, flt) must
    return a Dataset (the ops._ds reader — injected to avoid a cycle)."""
    import pyarrow.compute as pc

    plan = parse_sql(sql)
    if plan["aggs"]:
        need = list(dict.fromkeys(
            plan["group"] + [a[2] for a in plan["aggs"] if a[2] != "*"]
            + [p[0] for p in plan["preds"]]))
    else:
        need = list(dict.fromkeys(
            plan["cols"] + [p[0] for p in plan["preds"]]
            + [o[0] for o in plan["order"]]))
    flt = None
    for col, op, val in plan["preds"]:
        f = pc.field(col)
        e = {"=": f == val, "!=": f != val, "<>": f != val, "<": f < val,
             "<=": f <= val, ">": f > val, ">=": f >= val}[op]
        flt = e if flt is None else flt & e
    ds = ds_factory(sf_dir, plan["table"], need, flt)
    if plan["aggs"]:
        return _run_agg(ds, plan)
    if plan["order"]:
        ds = ds.sort(key=[o[0] for o in plan["order"]],
                     descending=[o[1] for o in plan["order"]])
    if plan["limit"] is not None:
        ds = ds.limit(plan["limit"])
    out = ds.to_pandas()
    if out.empty and not set(plan["cols"]) <= set(out.columns):
        import pandas as pd

        return pd.DataFrame({c: [] for c in plan["cols"]})
    return out[plan["cols"]]


def _run_agg(ds, plan: dict):
    """GROUP BY plan: per-batch partial combiner (SUM/COUNT carry sums and
    counts, MIN/MAX carry extrema), driver merge on the group-cardinality
    table, then HAVING / ORDER BY / LIMIT / projection."""
    import operator as _op

    import pandas as pd
    import pyarrow as pa

    group, aggs = plan["group"], plan["aggs"]

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if df.empty:
            return pa.table({})
        g = df.groupby(group) if group else df.assign(__g=0).groupby("__g")
        out = {}
        for alias, fn, col in aggs:
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
        if not group:
            res = res.drop(columns="__g")
        return pa.Table.from_pandas(res, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if group:
        merged = parts.groupby(group, as_index=False).sum(min_count=1)
        for alias, fn, _ in aggs:
            if fn == "MIN":
                merged[f"__mn_{alias}"] = (
                    parts.groupby(group)[f"__mn_{alias}"].min().to_numpy())
            if fn == "MAX":
                merged[f"__mx_{alias}"] = (
                    parts.groupby(group)[f"__mx_{alias}"].max().to_numpy())
    else:
        spec = {c: ("min" if c.startswith("__mn") else
                    "max" if c.startswith("__mx") else "sum")
                for c in parts.columns}
        merged = pd.DataFrame([{c: parts[c].agg(f) for c, f in spec.items()}])

    out = merged[group].copy() if group else pd.DataFrame(index=[0])
    for alias, fn, _ in aggs:
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

    if plan["having"]:
        col, op, lit = plan["having"]
        f = {"=": _op.eq, "!=": _op.ne, "<>": _op.ne, ">": _op.gt,
             ">=": _op.ge, "<": _op.lt, "<=": _op.le}[op]
        out = out[f(out[col], lit)]
    if plan["order"]:
        out = out.sort_values([o[0] for o in plan["order"]],
                              ascending=[not o[1] for o in plan["order"]])
    if plan["limit"] is not None:
        out = out.head(plan["limit"])
    names = [c if re.fullmatch(r"\w+", c) else
             re.search(r"(?i)\s+AS\s+(\w+)\s*$", c).group(1)
             for c in plan["cols"]]
    return out[names].reset_index(drop=True)
