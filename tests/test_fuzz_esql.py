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

import os as _os

# fresh-seed sweeps: GRAFT_SEED_OFFSET=N shifts every parameterized seed
_SEED_OFF = int(_os.environ.get("GRAFT_SEED_OFFSET", "0"))

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
        filt = sql_filt = ""
        if rng.random() < 0.4:
            # per-aggregate WHERE (esql FilteredExpression, 8.16) — the
            # SQL twin is the standard FILTER clause
            fthr = int(rng.integers(0, 100))
            filt = f" WHERE value < {fthr}"
            sql_filt = f" FILTER (WHERE value < {fthr})"
        aggs.append(f"{alias} = {fn}({src}){filt}")
        sql_aggs.append(
            f"{fn}({'*' if fn == 'COUNT' else col}){sql_filt} AS {alias}")
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


@pytest.mark.parametrize("seed", [s + _SEED_OFF for s in (7, 11, 13)])
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


DOC = f"read_parquet('{SF}/documents.parquet')"

# (esql expr, duckdb expr) pairs over events/documents — every new scalar
# and multivalue function family member with a SQL twin
_SCALAR_PAIRS = [
    ("ABS(value - 50)", "abs(value - 50)"),
    ("ROUND(SQRT(value), 4)", "round(sqrt(value), 4)"),
    ("ROUND(CBRT(value), 6)", "round(cbrt(value), 6)"),
    ("ROUND(EXP(value / 100), 6)", "round(exp(value / 100), 6)"),
    ("ROUND(LOG(value + 1), 6)", "round(ln(value + 1), 6)"),
    ("ROUND(HYPOT(value, value), 4)",
     "round(sqrt(2 * value * value), 4)"),
    ("SIGNUM(value - 40)", "sign(value - 40)::DOUBLE"),
    ("GREATEST(value, 50.0)", "greatest(value, 50.0)"),
    ("REPEAT(event_type, 2)", "repeat(event_type, 2)"),
    ("BIT_LENGTH(event_type)", "(8 * length(event_type))::BIGINT"),
    ("TO_BASE64(event_type)", "to_base64(event_type::BLOB)"),
    ("SUBSTRING(event_type, 2, 3)", "substring(event_type, 2, 3)"),
    ("TO_BOOLEAN(value - 50)", "(value - 50) <> 0"),
    ("TO_VERSION(event_type)", "event_type"),
    # `%` operator (floor-mod == trunc-mod for the non-negative operands
    # generated here)
    ("user_id % 7", "user_id % 7"),
    ("ROUND(value % 9.5, 6)", "round(fmod(value, 9.5), 6)"),
    ("ROUND(SINH(value / 100), 6)", "round((exp(value / 100) - exp(-(value / 100))) / 2, 6)"),
    ("ROUND(TANH(value / 100), 6)", "round((exp(2 * (value / 100)) - 1) / (exp(2 * (value / 100)) + 1), 6)"),
    ("ROUND(TO_RADIANS(value), 6)", "round(radians(value), 6)"),
    ("ROUND(TO_DEGREES(value / 60), 6)", "round(degrees(value / 60), 6)"),
]

_MV_PAIRS = [
    ('MV_COUNT(SPLIT(text, " "))',
     "len(str_split(text, ' '))::BIGINT"),
    ('MV_FIRST(MV_SORT(SPLIT(text, " ")))',
     "list_sort(str_split(text, ' '))[1]"),
    ('MV_LAST(MV_SORT(SPLIT(text, " ")))',
     "list_sort(str_split(text, ' '))[-1]"),
    ('MV_COUNT(MV_DEDUPE(SPLIT(text, " ")))',
     "len(list_distinct(str_split(text, ' ')))::BIGINT"),
    ('MV_CONCAT(MV_SLICE(MV_SORT(SPLIT(text, " ")), 0, 1), ",")',
     "array_to_string(list_sort(str_split(text, ' '))[1:2], ',')"),
]


@pytest.mark.parametrize("seed", [s + _SEED_OFF for s in (3, 19)])
def test_esql_function_fuzz_vs_duckdb(ray_session, seed):
    rng = np.random.default_rng(seed)
    for _ in range(8):
        pairs = [(_SCALAR_PAIRS[i])
                 for i in rng.choice(len(_SCALAR_PAIRS), size=3,
                                     replace=False)]
        thr = int(rng.integers(0, 60))
        evals = ", ".join(f"c{i} = {e}" for i, (e, _) in enumerate(pairs))
        cols = ", ".join(f"c{i}" for i in range(len(pairs)))
        q = (f"FROM events | WHERE value > {thr} | EVAL {evals}"
             f" | KEEP event_id, {cols} | SORT event_id | LIMIT 150")
        sqle = ", ".join(f"{s} AS c{i}" for i, (_, s) in enumerate(pairs))
        sql = (f"SELECT event_id, {sqle} FROM {EV} WHERE value > {thr} "
               f"ORDER BY event_id LIMIT 150")
        got, want = esql.run(SF, q), duckdb.sql(sql).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False, atol=1e-9, obj=f"esql {q!r}")


def test_esql_mv_fuzz_vs_duckdb(ray_session):
    rng = np.random.default_rng(23)
    for _ in range(5):
        pairs = [(_MV_PAIRS[i])
                 for i in rng.choice(len(_MV_PAIRS), size=2, replace=False)]
        lo = int(rng.integers(0, 300))
        evals = ", ".join(f"m{i} = {e}" for i, (e, _) in enumerate(pairs))
        cols = ", ".join(f"m{i}" for i in range(len(pairs)))
        q = (f"FROM documents | WHERE doc_id >= {lo} | EVAL {evals}"
             f" | KEEP doc_id, {cols} | SORT doc_id | LIMIT 120")
        sqle = ", ".join(f"{s} AS m{i}" for i, (_, s) in enumerate(pairs))
        sql = (f"SELECT doc_id, {sqle} FROM {DOC} WHERE doc_id >= {lo} "
               f"ORDER BY doc_id LIMIT 120")
        got, want = esql.run(SF, q), duckdb.sql(sql).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False, atol=1e-9, obj=f"esql {q!r}")


@pytest.mark.parametrize("seed", [s + _SEED_OFF for s in (3, 19)])
def test_esql_fuzz_expression_aggs_and_like_lists(ray_session, seed):
    """Session-11 grammar: expression arguments inside aggregates and
    LIKE/RLIKE pattern lists, randomized against DuckDB."""
    rng = np.random.default_rng(seed)
    exprs = [("value * 2 + 1", "value * 2 + 1"),
             ("value * value", "value * value"),
             ("ABS(value - 50)", "abs(value - 50)")]
    for _ in range(8):
        pats = rng.choice(["c*", "v*", "p*", "e*", "s*"],
                          size=rng.integers(1, 3), replace=False)
        like = "(" + ", ".join(f'"{p}"' for p in pats) + ")"
        sql_like = " OR ".join(
            f"event_type LIKE '{p.replace('*', '%')}'" for p in pats)
        aggs, sql_aggs = [], []
        for i, fn in enumerate(rng.choice(["SUM", "AVG", "MIN", "MAX"],
                                          size=rng.integers(1, 3),
                                          replace=False)):
            e, se = exprs[int(rng.integers(0, len(exprs)))]
            aggs.append(f"a{i} = {fn}({e})")
            sql_aggs.append(f"{fn.lower()}({se}) AS a{i}")
        q = (f"FROM events | WHERE event_type LIKE {like} "
             f"| STATS {', '.join(aggs)} BY event_type | SORT event_type")
        sql = (f"SELECT event_type, {', '.join(sql_aggs)} FROM {EV} "
               f"WHERE {sql_like} GROUP BY event_type ORDER BY event_type")
        got = esql.run(SF, q)
        want = duckdb.sql(sql).df()
        cols = sorted(want.columns)
        pd.testing.assert_frame_equal(
            got[cols].reset_index(drop=True),
            want[cols].reset_index(drop=True),
            check_dtype=False, atol=1e-9, rtol=1e-12, obj=f"esql {q!r}")


def _hash_cast_case(rng: np.random.Generator):
    """Row-mode pipelines over random hash/inline-cast EVAL expressions
    (session-13 surface: MD5/SHA256/HASH + `::` casts) vs DuckDB."""
    k = int(rng.integers(2, 9))
    pool = [
        ("m", "MD5(event_type)", "md5(event_type)"),
        ("s", "SHA256(event_type)", "sha256(event_type)"),
        ("h", f'HASH("md5", CONCAT(event_type, "{k}"))',
         f"md5(event_type || '{k}')"),
        ("ci", "value::long", "trunc(value)::BIGINT"),
        ("cs", f"(event_id % {k})::string", f"(event_id % {k})::VARCHAR"),
        ("cb", f"(value > {k * 10})::string",
         f"CASE WHEN value > {k * 10} THEN 'true' ELSE 'false' END"),
        ("cd", f"(event_id % {k})::double", f"(event_id % {k})::DOUBLE"),
    ]
    picks = rng.choice(len(pool), size=int(rng.integers(2, 5)),
                       replace=False)
    cols = [pool[i] for i in sorted(picks)]
    thr = int(rng.integers(100, 900))
    q = ("FROM events | WHERE event_id < " + str(thr)
         + " | EVAL " + ", ".join(f"{a} = {e}" for a, e, _ in cols)
         + " | KEEP event_id, " + ", ".join(a for a, _, _ in cols)
         + " | SORT event_id | LIMIT 1000")
    sql = ("SELECT event_id, "
           + ", ".join(f"{s} AS {a}" for a, _, s in cols)
           + f" FROM {EV} WHERE event_id < {thr} ORDER BY event_id"
           + " LIMIT 1000")
    return q, sql


@pytest.mark.parametrize("seed", [s + _SEED_OFF for s in (17, 23, 29)])
def test_esql_hash_cast_fuzz(ray_session, seed):
    rng = np.random.default_rng(seed)
    for _ in range(10):
        q, sql = _hash_cast_case(rng)
        got = esql.run(SF, q).reset_index(drop=True)
        want = duckdb.sql(sql).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _gen_bool_tree(rng: np.random.Generator, depth: int = 0):
    """Random boolean predicate tree -> (esql_src, sql_src)."""
    if depth >= 2 or rng.random() < 0.4:
        kind = rng.integers(0, 4)
        if kind == 0:
            thr = int(rng.integers(0, 120))
            op = rng.choice([">", ">=", "<", "<=", "==", "!="])
            sop = {"==": "=", "!=": "<>"}.get(op, op)
            return f"value {op} {thr}", f"value {sop} {thr}"
        if kind == 1:
            ty = rng.choice(["click", "view", "purchase", "error"])
            return (f'event_type == "{ty}"', f"event_type = '{ty}'")
        if kind == 2:
            c = rng.choice(["c", "v", "p", "e"])
            return (f'STARTS_WITH(event_type, "{c}")',
                    f"starts_with(event_type, '{c}')")
        n = int(rng.integers(4, 9))
        return (f"LENGTH(event_type) == {n}",
                f"length(event_type) = {n}")
    a_e, a_s = _gen_bool_tree(rng, depth + 1)
    b_e, b_s = _gen_bool_tree(rng, depth + 1)
    form = rng.integers(0, 3)
    if form == 0:
        return f"({a_e} AND {b_e})", f"({a_s} AND {b_s})"
    if form == 1:
        return f"({a_e} OR {b_e})", f"({a_s} OR {b_s})"
    return f"NOT ({a_e} OR {b_e})", f"NOT ({a_s} OR {b_s})"


@pytest.mark.parametrize("seed", [_SEED_OFF + s for s in range(24)])
def test_fuzz_boolean_where_trees(ray_session, seed):
    """Round-4 grammar depth: random OR/NOT/parenthesized predicate trees
    (with function-call leaves) vs DuckDB on the same events table."""
    rng = np.random.default_rng(7_700_000 + seed)
    pe, ps = _gen_bool_tree(rng)
    q = (f"FROM events | WHERE {pe} "
         f"| STATS n = COUNT(*), s = SUM(value) BY event_type "
         f"| SORT event_type")
    sql = (f"SELECT event_type, COUNT(*) AS n, SUM(value) AS s FROM {EV} "
           f"WHERE {ps} GROUP BY event_type ORDER BY event_type")
    mine = esql.run(SF, q).reset_index(drop=True)
    want = duckdb.sql(sql).df().reset_index(drop=True)
    assert len(mine) == len(want), (pe, len(mine), len(want))
    if len(mine):
        assert (mine["event_type"] == want["event_type"]).all(), pe
        assert (mine["n"].astype("int64")
                == want["n"].astype("int64")).all(), pe
        assert np.allclose(mine["s"].astype(float),
                           want["s"].astype(float)), pe
