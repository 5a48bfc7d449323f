"""ES|QL scalar-expression engine (esql_expr): parser unit tests plus
end-to-end differential checks of WHERE/EVAL grammar against DuckDB.

Reference surface: x-pack/plugin/esql EsqlBaseParser.g4 booleanExpression
and the EsqlFunctionRegistry scalar functions.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from elasticsearch_ray.functions import esql
from elasticsearch_ray.functions.esql_expr import (
    compile_eval, compile_predicate, parse_expr)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- parser unit

def test_precedence_and_or_not():
    # NOT binds tighter than AND which binds tighter than OR
    ast = parse_expr('a == 1 OR NOT b == 2 AND c == 3')
    assert ast[0] == "or"
    assert ast[2][0] == "and" and ast[2][1][0] == "not"


def test_arith_precedence():
    ast = parse_expr("a + b * 2 - c / 4")
    # ((a + (b*2)) - (c/4))
    assert ast == ("arith", "-",
                   ("arith", "+", ("col", "a"),
                    ("arith", "*", ("col", "b"), ("lit", 2))),
                   ("arith", "/", ("col", "c"), ("lit", 4)))


def test_rejects_trailing_garbage():
    with pytest.raises(ValueError):
        parse_expr("a == 1 extra tokens")
    with pytest.raises(ValueError):
        parse_expr("a ==")


def test_predicate_batch_semantics():
    t = pa.table({"x": [1, 2, 3, None], "s": ["ab", "cd", "ae", None]})
    f = compile_predicate('x >= 2 OR s LIKE "a?"')
    out = f(t)
    assert out["x"].to_pylist() == [1, 2, 3]
    f2 = compile_predicate("x IS NULL")
    assert f2(t)["s"].to_pylist() == [None]
    f3 = compile_predicate("x IN (1, 3) AND NOT s RLIKE \"c.\"")
    assert f3(t)["x"].to_pylist() == [1, 3]


def test_eval_chained_and_overwrite():
    t = pa.table({"x": [1, 2]})
    t = compile_eval("y", "x * 10")(t)
    t = compile_eval("y", "y + COALESCE(NULL, 5)")(t)
    assert t["y"].to_pylist() == [15, 25]


# ------------------------------------------------ differential vs DuckDB

CASES = [
    ("""FROM events
        | WHERE value > 10 AND (event_type == "click" OR event_type == "view")
        | STATS c = COUNT(*)""",
     """SELECT count(*) c FROM events
        WHERE value > 10 AND (event_type = 'click' OR event_type = 'view')"""),
    ("""FROM events | WHERE event_type IN ("click", "view") AND NOT value <= 5
        | STATS c = COUNT(*)""",
     """SELECT count(*) c FROM events
        WHERE event_type IN ('click','view') AND NOT value <= 5"""),
    ("""FROM events | WHERE event_type LIKE "cl*" | STATS c = COUNT(*)""",
     """SELECT count(*) c FROM events WHERE event_type LIKE 'cl%'"""),
    ("""FROM events
        | EVAL v2 = ROUND(value * 2 + 1, 1), ln = LENGTH(event_type)
        | WHERE v2 > 20 | STATS s = SUM(ln), m = MAX(v2)""",
     """SELECT sum(ln) s, max(v2) m FROM (
          SELECT round(value*2+1, 1) v2, length(event_type) ln FROM events)
        WHERE v2 > 20"""),
    ("""FROM events
        | EVAL u = TO_UPPER(event_type), p = SUBSTRING(event_type, 2, 3)
        | STATS c = COUNT(*) BY u, p | SORT u, p""",
     """SELECT upper(event_type) u, substring(event_type, 2, 3) p,
          count(*) c FROM events GROUP BY 1,2 ORDER BY 1,2"""),
    ("""FROM events
        | EVAL b = CASE(value > 50, "hi", value > 20, "mid", "lo")
        | STATS c = COUNT(*) BY b | SORT b""",
     """SELECT CASE WHEN value > 50 THEN 'hi' WHEN value > 20 THEN 'mid'
          ELSE 'lo' END b, count(*) c FROM events GROUP BY 1 ORDER BY 1"""),
    ("""FROM events
        | EVAL g = GREATEST(value, 50.0), q = MOD(TO_INTEGER(value), 7)
        | STATS s = SUM(g), t = SUM(q)""",
     """SELECT sum(greatest(value, 50.0)) s,
          sum(trunc(value)::BIGINT % 7) t FROM events"""),
    ("""FROM events
        | EVAL c = CONCAT(event_type, "_", TO_STRING(TO_INTEGER(value)))
        | STATS n = COUNT(*) BY c | SORT n DESC, c | LIMIT 5""",
     """SELECT event_type || '_' || trunc(value)::BIGINT::VARCHAR c,
          count(*) n FROM events GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 5"""),
]


@pytest.mark.parametrize("eq,sql", CASES, ids=[c[0].split("|")[1].strip()[:40]
                                               for c in CASES])
def test_expression_grammar_vs_duckdb(ray_session, eq, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(sql).df()
    out = esql.run(SF, eq).reset_index(drop=True)
    out = out[sorted(out.columns)]
    want = want[sorted(want.columns)]
    pd.testing.assert_frame_equal(out, want, check_dtype=False, atol=1e-9)


# ---------------------------------------------------------------- mv + scalar
def _ev(expr, t):
    from elasticsearch_ray.functions.esql_expr import evaluate, parse_expr

    r = evaluate(parse_expr(expr), t)
    return r.to_pylist() if hasattr(r, "to_pylist") else r


@pytest.fixture()
def mv_table():
    import pyarrow as pa

    return pa.table({
        "x": pa.array([1.0, 4.0, 9.0, None]),
        "y": pa.array([2.0, 3.0, -4.0, 5.0]),
        "s": pa.array(["abc", "hello", None, "zz"]),
        "lst": pa.array([[3, 1, 2, 1], [], None, [9]],
                        pa.list_(pa.int64())),
        "lst2": pa.array([[10], [20, 30], [40], None],
                         pa.list_(pa.int64())),
        "ts": pa.array([0, 90061000, 86400000, 172800000],
                       pa.timestamp("ms")),
    })


def test_mv_reductions(mv_table):
    assert _ev("MV_COUNT(lst)", mv_table) == [4, 0, None, 1]
    assert _ev("MV_SUM(lst)", mv_table) == [7.0, None, None, 9.0]
    assert _ev("MV_AVG(lst)", mv_table) == [1.75, None, None, 9.0]
    assert _ev("MV_MIN(lst)", mv_table) == [1.0, None, None, 9.0]
    assert _ev("MV_MAX(lst)", mv_table) == [3.0, None, None, 9.0]
    assert _ev("MV_MEDIAN(lst)", mv_table) == [1.5, None, None, 9.0]
    assert _ev("MV_FIRST(lst)", mv_table) == [3, None, None, 9]
    assert _ev("MV_LAST(lst)", mv_table) == [1, None, None, 9]


def test_mv_sort_dedupe_slice_append(mv_table):
    assert _ev("MV_SORT(lst)", mv_table) == [[1, 1, 2, 3], [], None, [9]]
    assert _ev('MV_SORT(lst, "DESC")', mv_table) == \
        [[3, 2, 1, 1], [], None, [9]]
    assert _ev("MV_DEDUPE(lst)", mv_table) == [[1, 2, 3], [], None, [9]]
    assert _ev("MV_SLICE(lst, 0, 1)", mv_table) == [[3, 1], [], None, [9]]
    assert _ev("MV_APPEND(lst, lst2)", mv_table) == \
        [[3, 1, 2, 1, 10], [20, 30], [40], [9]]
    assert _ev('MV_CONCAT(lst, "-")', mv_table) == \
        ["3-1-2-1", "", None, "9"]


def test_scalar_math_null_propagation(mv_table):
    import math

    cb = _ev("CBRT(x)", mv_table)
    assert cb[0] == 1.0 and cb[3] is None
    hy = _ev("HYPOT(x, y)", mv_table)
    assert hy[1] == 5.0 and hy[3] is None
    assert _ev("SIGNUM(y)", mv_table) == [1.0, 1.0, -1.0, 1.0]
    assert abs(_ev("LOG(2, x)", mv_table)[1] - 2.0) < 1e-12
    assert _ev("PI()", mv_table) == math.pi


def test_string_and_base64(mv_table):
    assert _ev("REPEAT(s, 2)", mv_table) == \
        ["abcabc", "hellohello", None, "zzzz"]
    assert _ev("BIT_LENGTH(s)", mv_table) == [24, 40, None, 16]
    assert _ev("TO_BASE64(s)", mv_table) == \
        ["YWJj", "aGVsbG8=", None, "eno="]
    assert _ev("FROM_BASE64(TO_BASE64(s))", mv_table) == \
        ["abc", "hello", None, "zz"]


def test_date_diff_format_parse(mv_table):
    # ChronoUnit.between semantics: whole elapsed units, trunc toward 0
    assert _ev('DATE_DIFF("hour", ts, ts)', mv_table) == [0, 0, 0, 0]
    got = _ev('DATE_FORMAT("yyyy-MM-dd HH:mm:ss", ts)', mv_table)
    assert got[1] == "1970-01-02 01:01:01"
    import datetime

    parsed = _ev('DATE_PARSE("yyyy-MM-dd", "2024-03-05")', mv_table)
    assert parsed[0] == datetime.datetime(2024, 3, 5)


def test_date_diff_negative_truncates_toward_zero():
    import pyarrow as pa

    t = pa.table({
        "a": pa.array([0, 0], pa.timestamp("ms")),
        # +36h and -36h: whole days elapsed = 1 and -1 (not 2/-2)
        "b": pa.array([129600000, -129600000], pa.timestamp("ms")),
    })
    assert _ev('DATE_DIFF("day", a, b)', t) == [1, -1]
