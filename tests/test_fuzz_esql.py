"""Differential fuzz: random ES|QL pipelines vs DuckDB.

Each case draws random WHERE predicates, an optional EVAL, a random set of
STATS aggregates and an optional BY key, renders BOTH the pipe query and
the equivalent SQL, and requires value-identical results. This pins the
executor's partial-combiner merge (SUM/COUNT/AVG/MIN/MAX) and predicate
lowering against an independent engine, beyond the fixed gate pipelines."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.functions import esql

SF = "/root/testdata/sf0.001"
EV = f"read_parquet('{SF}/events.parquet')"


def _case(rng: np.random.Generator):
    preds, sql_preds = [], []
    if rng.random() < 0.7:
        thr = int(rng.integers(0, 80))
        preds.append(f"value >= {thr}")
        sql_preds.append(f"value >= {thr}")
    if rng.random() < 0.5:
        ty = rng.choice(["click", "view", "purchase", "error", "signup"])
        op = rng.choice(["==", "!="])
        preds.append(f'event_type {op} "{ty}"')
        sql_preds.append(f"event_type {'=' if op == '==' else '<>'} '{ty}'")
    ev = rng.random() < 0.5
    col = "v2" if ev else "value"
    mult = int(rng.integers(2, 5))

    aggs, sql_aggs = [], []
    for fn in rng.choice(["COUNT", "SUM", "AVG", "MIN", "MAX"],
                         size=rng.integers(1, 4), replace=False):
        alias = f"a_{fn.lower()}"
        src = "*" if fn == "COUNT" else col
        aggs.append(f"{alias} = {fn}({src})")
        sql_aggs.append(f"{fn}({'*' if fn == 'COUNT' else col}) AS {alias}")
    by = rng.random() < 0.7

    q = "FROM events"
    sql = ""
    if preds:
        q += " | WHERE " + " AND ".join(preds)
    if ev:
        q += f" | EVAL v2 = value * {mult}"
    q += " | STATS " + ", ".join(aggs)
    if by:
        q += " BY event_type | SORT event_type"
    where = (" WHERE " + " AND ".join(sql_preds)) if sql_preds else ""
    inner = (f"SELECT *, value * {mult} AS v2 FROM {EV}" if ev
             else f"SELECT * FROM {EV}")
    if by:
        sql = (f"SELECT event_type, {', '.join(sql_aggs)} FROM ({inner}) t"
               f"{where} GROUP BY event_type ORDER BY event_type")
    else:
        sql = f"SELECT {', '.join(sql_aggs)} FROM ({inner}) t{where}"
    return q, sql, by


@pytest.mark.parametrize("seed", [7, 11, 13])
def test_esql_random_pipelines_match_duckdb(ray_session, seed):
    rng = np.random.default_rng(seed)
    for _ in range(12):
        q, sql, by = _case(rng)
        got = esql.run(SF, q)
        want = duckdb.sql(sql).df()
        if got.empty and want.empty:
            continue
        cols = sorted(want.columns)
        pd.testing.assert_frame_equal(
            got[cols].reset_index(drop=True),
            want[cols].reset_index(drop=True),
            check_dtype=False, atol=1e-9, rtol=1e-12,
            obj=f"esql {q!r}")
