"""Differential fuzz: random _sql translator plans vs DuckDB.

Random projections/predicates/GROUP BY/HAVING/ORDER/LIMIT over the events
table; the translator's Dataset plan must match DuckDB running the same
statement. Complements test_fuzz_esql (the pipe-language twin)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import os as _os

# fresh-seed sweeps: GRAFT_SEED_OFFSET=N shifts every parameterized seed
_SEED_OFF = int(_os.environ.get("GRAFT_SEED_OFFSET", "0"))

from elasticsearch_ray.functions.sql import run_sql
from elasticsearch_ray.pipelines.ops import _ds

SF = "/root/testdata/sf0.001"
EV = f"read_parquet('{SF}/events.parquet')"


def _agg_case(rng: np.random.Generator) -> str:
    parts = ["SELECT event_type"]
    aggs = []
    for fn in rng.choice(["COUNT", "SUM", "AVG", "MIN", "MAX"],
                         size=rng.integers(1, 4), replace=False):
        src = "*" if fn == "COUNT" else rng.choice(["value", "user_id"])
        aggs.append(f"{fn}({src}) AS a_{fn.lower()}")
    sql = f"SELECT event_type, {', '.join(aggs)} FROM events"
    if rng.random() < 0.6:
        sql += f" WHERE value >= {int(rng.integers(0, 60))}"
    sql += " GROUP BY event_type"
    if rng.random() < 0.4 and any(a.startswith("COUNT") for a in aggs):
        sql += " HAVING a_count >= 1"
    sql += " ORDER BY event_type"
    if rng.random() < 0.3:
        sql += f" LIMIT {int(rng.integers(1, 6))}"
    return sql


def _row_case(rng: np.random.Generator) -> str:
    cols = ["event_id", "user_id", "value"]
    sql = f"SELECT {', '.join(cols)} FROM events"
    sql += f" WHERE value >= {int(rng.integers(0, 80))}"
    key = rng.choice(["value", "event_id", "user_id"])
    sql += f" ORDER BY {key} DESC, event_id LIMIT {int(rng.integers(1, 20))}"
    return sql


@pytest.mark.parametrize("seed", [s + _SEED_OFF for s in (3, 17)])
def test_sql_random_plans_match_duckdb(ray_session, seed):
    rng = np.random.default_rng(seed)
    for i in range(10):
        sql = _agg_case(rng) if i % 2 == 0 else _row_case(rng)
        got = run_sql(sql, SF, ds_factory=_ds)
        # DuckDB can't reference the HAVING alias; inline it
        dsql = sql.replace("HAVING a_count >= 1", "HAVING COUNT(*) >= 1")
        dsql = dsql.replace("FROM events", f"FROM {EV}")
        want = duckdb.sql(dsql).df()
        cols = sorted(want.columns)
        pd.testing.assert_frame_equal(
            got[cols].reset_index(drop=True),
            want[cols].reset_index(drop=True),
            check_dtype=False, atol=1e-9, rtol=1e-12, obj=f"sql {sql!r}")


def _expr_case(rng: np.random.Generator) -> str:
    """Scalar-expression surface (session 12): expression projections,
    expression WHERE conjuncts, LIKE, GROUP BY expression keys."""
    kind = rng.integers(0, 3)
    if kind == 0:
        a, b = int(rng.integers(2, 9)), int(rng.integers(1, 50))
        sql = (f"SELECT event_id, ROUND(value / {a}.0, 2) AS v{a}, "
               f"ABS(value - {b}) AS d{b} FROM events "
               f"WHERE value >= {int(rng.integers(0, 50))} "
               f"ORDER BY d{b}, event_id LIMIT {int(rng.integers(3, 15))}")
    elif kind == 1:
        m, r = int(rng.integers(2, 7)), int(rng.integers(0, 2))
        sql = (f"SELECT event_id, user_id FROM events "
               f"WHERE user_id % {m} = {r} AND value < 90 "
               f"ORDER BY event_id LIMIT {int(rng.integers(5, 25))}")
    else:
        w = int(rng.integers(10, 40))
        sql = (f"SELECT FLOOR(value / {w}.0) AS bucket, COUNT(*) AS c "
               f"FROM events GROUP BY FLOOR(value / {w}.0) "
               f"ORDER BY bucket")
    return sql


@pytest.mark.parametrize("seed", [s + _SEED_OFF for s in (23, 71)])
def test_sql_expression_plans_match_duckdb(ray_session, seed):
    rng = np.random.default_rng(seed)
    for _ in range(8):
        sql = _expr_case(rng)
        got = run_sql(sql, SF, ds_factory=_ds)
        want = duckdb.sql(sql.replace("FROM events", f"FROM {EV}")).df()
        cols = sorted(want.columns)
        pd.testing.assert_frame_equal(
            got[cols].reset_index(drop=True),
            want[cols].reset_index(drop=True),
            check_dtype=False, atol=1e-9, rtol=1e-12, obj=f"sql {sql!r}")


def _distinct_case(rng: np.random.Generator) -> str:
    cols = list(rng.choice(["event_type", "user_id"],
                           size=int(rng.integers(1, 3)), replace=False))
    sql = f"SELECT DISTINCT {', '.join(cols)} FROM events"
    if rng.random() < 0.5:
        sql += f" WHERE value >= {int(rng.integers(0, 120))}"
    sql += f" ORDER BY {', '.join(cols)}"
    if rng.random() < 0.5:
        sql += f" LIMIT {int(rng.integers(2, 30))}"
    return sql


@pytest.mark.parametrize("seed", [s + _SEED_OFF for s in (23, 41)])
def test_sql_distinct_plans_match_duckdb(ray_session, seed):
    rng = np.random.default_rng(seed)
    for _ in range(8):
        sql = _distinct_case(rng)
        got = run_sql(sql, SF, ds_factory=_ds)
        want = duckdb.sql(sql.replace("FROM events", f"FROM {EV}")).df()
        cols = sorted(want.columns)
        pd.testing.assert_frame_equal(
            got[cols].reset_index(drop=True),
            want[cols].reset_index(drop=True),
            check_dtype=False, obj=f"sql {sql!r}")


def _bool_pred(rng: np.random.Generator, depth: int = 0) -> str:
    """Random boolean WHERE tree in plain SQL (valid for BOTH engines)."""
    if depth >= 2 or rng.random() < 0.4:
        kind = rng.integers(0, 3)
        if kind == 0:
            op = rng.choice([">", ">=", "<", "<=", "=", "<>"])
            return f"value {op} {int(rng.integers(0, 120))}"
        if kind == 1:
            ty = rng.choice(["click", "view", "purchase", "error"])
            return f"event_type = '{ty}'"
        return f"event_type LIKE '{rng.choice(['c%', '%w', '%rr%', 'v_ew'])}'"
    a = _bool_pred(rng, depth + 1)
    b = _bool_pred(rng, depth + 1)
    form = rng.integers(0, 3)
    if form == 0:
        return f"({a} AND {b})"
    if form == 1:
        return f"({a} OR {b})"
    return f"NOT ({a} OR {b})"


@pytest.mark.parametrize("seed", [s + _SEED_OFF for s in range(16)])
def test_sql_boolean_where_trees_match_duckdb(ray_session, seed):
    """Round-4 grammar depth: random OR/NOT/LIKE predicate trees through
    run_sql vs DuckDB on the same text."""
    rng = np.random.default_rng(8_800_000 + seed)
    sql = ("SELECT event_type, COUNT(*) AS n FROM events "
           f"WHERE {_bool_pred(rng)} "
           "GROUP BY event_type ORDER BY event_type")
    got = run_sql(sql, SF, ds_factory=_ds)
    want = duckdb.sql(sql.replace("FROM events", f"FROM {EV}")).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, obj=f"sql {sql!r}")
