"""Minimal _sql API translator (x-pack sql / RestSqlQueryAction analog):
parse a restricted ANSI subset and plan it onto the Ray Dataset API with
column pruning + predicate pushdown at the read, a distributed sort and a
limit. Grammar:

    SELECT col[, col...] FROM <table>
    [WHERE col <op> literal [AND ...]]      op in = != <> < <= > >=
    [ORDER BY col [ASC|DESC][, ...]]
    [LIMIT n]

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
        r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?"
        r"(?:\s+LIMIT\s+(?P<limit>\d+))?$", s)
    if not m:
        raise SqlParseError(f"unsupported SQL: {sql!r}")
    cols = [c.strip() for c in m.group("cols").split(",")]
    if any(not re.fullmatch(r"\w+", c) for c in cols):
        raise SqlParseError("only plain column projections are supported")
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
            order.append((om.group(1),
                          (om.group(2) or "ASC").upper() == "DESC"))
    return {"cols": cols, "table": m.group("table"), "preds": preds,
            "order": order,
            "limit": int(m.group("limit")) if m.group("limit") else None}


def run_sql(sql: str, sf_dir: str, *, ds_factory):
    """Execute a parsed plan: ds_factory(sf_dir, table, columns, flt) must
    return a Dataset (the ops._ds reader — injected to avoid a cycle)."""
    import pyarrow.compute as pc

    plan = parse_sql(sql)
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
